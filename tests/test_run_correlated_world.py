"""Flag -> Config wiring of scripts/run_correlated_world.py.

Every long-run artifact (combined protocol, trial grid, schedule demo) and
the supervisor's --bleu_only auto-rescue goes through this driver, but a
real invocation trains flagship dims (CPU-prohibitive), so these tests run
main() in-process with the pipeline entry points monkeypatched and assert
the Config each segment receives. World generation runs for real (tiny).
"""

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PATH = os.path.join(_REPO, "scripts", "run_correlated_world.py")

spec = importlib.util.spec_from_file_location("run_correlated_world", _PATH)
rcw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rcw)


def _argv(tmp_path, *extra):
    return [
        "run_correlated_world.py",
        "--images", "8",
        "--world_dir", str(tmp_path / "w"),
        "--world30_dir", str(tmp_path / "w30"),
        "--out", str(tmp_path / "out"),
        *extra,
    ]


def test_bleu_only_wiring(tmp_path, monkeypatch):
    from diffusion_image_captioning_tpu import pipeline

    calls = {}

    def fake_bleu_only(cfg, d, d30, out_dir="."):
        calls.update(cfg=cfg, d=d, d30=d30, out=out_dir)
        return 0.123

    monkeypatch.setattr(pipeline, "run_flickr_bleu_only", fake_bleu_only)
    monkeypatch.setattr(
        pipeline, "run_flickr_training",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("trained!")),
    )
    monkeypatch.setattr(sys, "argv", _argv(
        tmp_path, "--bleu_only", "--epochs", "2", "--resume",
        "--schedule_offset", "2", "--schedule_total", "10",
        "--images30k", "6", "--bleu_draws", "3",
        "--bleu_group", "64", "--eval_group", "16",
    ))
    rcw.main()
    cfg = calls["cfg"]
    # the rescue must reconstruct the SEGMENT's config exactly (codec name
    # + eval key stream), restore rather than train, and keep the global
    # schedule position
    assert cfg.continue_train is True
    assert cfg.epoch_num == 2
    assert cfg.schedule_offset_epochs == 2
    assert cfg.schedule_total_epochs == 10
    assert cfg.bleu_draws == 3
    assert cfg.bleu_sample_group == 64
    assert cfg.eval_loss_group == 16
    assert calls["out"] == str(tmp_path / "out")
    assert calls["d30"] is not None  # combined world forwarded


def test_segments_resume_global_schedule(tmp_path, monkeypatch):
    from diffusion_image_captioning_tpu import pipeline

    seen = []
    monkeypatch.setattr(
        pipeline, "run_flickr_training",
        lambda cfg, d, d30, out_dir=".": seen.append(cfg) or (None, [], 0.0),
    )
    monkeypatch.setattr(sys, "argv", _argv(
        tmp_path, "--epochs", "4", "--segments", "2", "--global_schedule",
    ))
    rcw.main()
    assert len(seen) == 2
    assert [c.epoch_num for c in seen] == [2, 2]
    assert [c.continue_train for c in seen] == [False, True]
    assert [c.schedule_offset_epochs for c in seen] == [0, 2]
    assert [c.schedule_total_epochs for c in seen] == [4, 4]


def test_reference_semantics_default_no_schedule(tmp_path, monkeypatch):
    from diffusion_image_captioning_tpu import pipeline

    seen = []
    monkeypatch.setattr(
        pipeline, "run_flickr_training",
        lambda cfg, d, d30, out_dir=".": seen.append(cfg) or (None, [], 0.0),
    )
    monkeypatch.setattr(sys, "argv", _argv(
        tmp_path, "--epochs", "4", "--segments", "2",
    ))
    rcw.main()
    # without --global_schedule each segment restarts the anneal — the
    # reference's CONTINUE_TRAIN semantics (CLIP-DDPM.py:505-508,520-522)
    assert [c.schedule_offset_epochs for c in seen] == [0, 0]
    assert [c.schedule_total_epochs for c in seen] == [0, 0]
