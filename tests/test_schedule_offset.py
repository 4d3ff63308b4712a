"""Schedule-correct segmented training (Config.schedule_offset_epochs).

The reference's CONTINUE_TRAIN restarts the LR schedule, optimizer and RNG
streams from zero (CLIP-DDPM.py:505-508,520-522) — so a 10-epoch protocol
driven as 1-epoch segments trains at CONSTANT lr (VERDICT round-3 missing
#3). With schedule_offset_epochs/schedule_total_epochs a segment instead
resumes the anneal, the shuffle stream, the val key chain, the Adam moments
and the step counter at its global position: a segmented run must match the
monolithic run's loss trajectory EPOCH FOR EPOCH, bit for bit.
"""

import numpy as np
import pytest

from diffusion_image_captioning_tpu import schedules
from diffusion_image_captioning_tpu.config import Config
from diffusion_image_captioning_tpu.data import Batcher
from tests.tiny import TINY


class TestLearningRateWindow:
    def test_window_matches_monolithic_slice(self):
        for sched in ("linspace", "logspace", "cosine_annealing"):
            mono = schedules.learning_rates(
                TINY.replace(epoch_num=10, scheduler=sched)
            )
            for off in (0, 3, 9):
                seg = schedules.learning_rates(
                    TINY.replace(
                        epoch_num=1,
                        scheduler=sched,
                        schedule_offset_epochs=off,
                        schedule_total_epochs=10,
                    )
                )
                np.testing.assert_array_equal(seg, mono[off : off + 1], sched)

    def test_default_is_reference_restart(self):
        # offset/total left at (0, 0): a 1-epoch segment sees the schedule's
        # FIRST value — exactly the reference CONTINUE_TRAIN restart.
        seg = schedules.learning_rates(TINY.replace(epoch_num=1))
        assert seg[0] == TINY.learning_rate

    def test_overrun_raises(self):
        with pytest.raises(ValueError):
            schedules.learning_rates(
                TINY.replace(
                    epoch_num=4,
                    schedule_offset_epochs=8,
                    schedule_total_epochs=10,
                )
            )


class TestBatcherAdvance:
    def test_advance_replays_stream(self):
        cols = {"x": np.arange(40).reshape(20, 2)}
        idx = np.arange(20)
        mono = Batcher(cols, idx, 4, shuffle=True, seed=5)
        epoch0 = [b["x"].copy() for b in mono]
        epoch1 = [b["x"].copy() for b in mono]

        seg = Batcher(cols, idx, 4, shuffle=True, seed=5)
        seg.advance_epochs(1)
        np.testing.assert_array_equal(
            np.stack([b["x"] for b in seg]), np.stack(epoch1)
        )
        fresh = Batcher(cols, idx, 4, shuffle=True, seed=5)
        fresh.advance_epochs(0)
        np.testing.assert_array_equal(
            np.stack([b["x"] for b in fresh]), np.stack(epoch0)
        )

    def test_unshuffled_advance_is_noop(self):
        cols = {"x": np.arange(20)}
        b = Batcher(cols, np.arange(20), 4, shuffle=False)
        b.advance_epochs(3)
        first = next(iter(b))
        np.testing.assert_array_equal(first["x"], np.arange(4))


class TestSegmentedEqualsMonolithic:
    def test_two_segments_match_monolithic(self, tmp_path):
        """Full pipeline: 2x 1-epoch schedule-correct segments reproduce the
        monolithic 2-epoch anneal's history bit for bit (and the reference-
        semantics restart does NOT, proving the flag changes training)."""
        import jax

        from diffusion_image_captioning_tpu import pipeline
        from diffusion_image_captioning_tpu.data.synthetic import (
            synthetic_flickr_dirs,
        )

        # shapes chosen to share compile-cache entries with test_cli_smoke
        cfg = TINY.replace(
            epoch_num=2,
            refine_steps_eval=2,
            refine_steps_demo=3,
            bleu_draws=1,
        )
        world = synthetic_flickr_dirs(str(tmp_path / "w"), n=40)

        mono_dir = str(tmp_path / "mono")
        _, hist_mono, _ = pipeline.run_flickr_training(
            cfg, world, None, out_dir=mono_dir
        )

        seg_dir = str(tmp_path / "seg")
        seg_cfg = cfg.replace(epoch_num=1, schedule_total_epochs=2)
        _, h0, _ = pipeline.run_flickr_training(
            seg_cfg, world, None, out_dir=seg_dir
        )
        _, h1, _ = pipeline.run_flickr_training(
            seg_cfg.replace(continue_train=True, schedule_offset_epochs=1),
            world, None, out_dir=seg_dir,
        )

        assert len(hist_mono) == 2 and len(h0) == 1 and len(h1) == 1
        for key in hist_mono[0]:
            if key == "epoch":
                continue
            assert h0[0][key] == hist_mono[0][key], key
            assert h1[0][key] == hist_mono[1][key], (
                key, h1[0][key], hist_mono[1][key],
            )

        # Reference-semantics restart (no offset) diverges at epoch 1: the
        # LR restarts at learning_rate and the optimizer state resets.
        ref_dir = str(tmp_path / "ref")
        ref_cfg = cfg.replace(epoch_num=1)
        pipeline.run_flickr_training(ref_cfg, world, None, out_dir=ref_dir)
        _, r1, _ = pipeline.run_flickr_training(
            ref_cfg.replace(continue_train=True), world, None, out_dir=ref_dir
        )
        assert r1[0]["train_x_t"] != hist_mono[1]["train_x_t"]
        del jax  # imported for backend init ordering only


class TestBleuOnly:
    def test_rescue_reproduces_missing_bleu_lines(self, tmp_path):
        """pipeline.run_flickr_bleu_only: truncate a finished run's log to
        just before its BLEU lines (the state a segment is left in when the
        eval leg wedges after the in-fit checkpoint save — observed
        2026-08-20 on the v2 combined protocol) and re-append them from the
        checkpoint. The restored log must be BYTE-IDENTICAL: run_val_bleu's
        key stream depends only on the seed and the saved val split."""
        from diffusion_image_captioning_tpu import pipeline
        from diffusion_image_captioning_tpu.config import model_name
        from diffusion_image_captioning_tpu.data.synthetic import (
            synthetic_flickr_dirs,
        )

        # same shapes as TestSegmentedEqualsMonolithic (compile-cache reuse)
        cfg = TINY.replace(
            epoch_num=2,
            refine_steps_eval=2,
            refine_steps_demo=3,
            bleu_draws=1,
        )
        world = synthetic_flickr_dirs(str(tmp_path / "w"), n=40)
        out = str(tmp_path / "run")
        _, _, bleu = pipeline.run_flickr_training(cfg, world, None, out_dir=out)

        log = tmp_path / "run" / (model_name(cfg) + ".txt")
        full = log.read_bytes()
        cut = full.rindex(b"BLEU-4 score:")
        log.write_bytes(full[:cut])

        got = pipeline.run_flickr_bleu_only(cfg, world, None, out_dir=out)
        assert got == bleu
        assert log.read_bytes() == full
