"""CLI smoke tests — drive the user-facing scripts as real subprocesses.

The reference's "CLI" is editing module constants and running the file
(SURVEY.md L7); ours is argparse scripts whose flag surface keeps growing
(--cpu, generic Config flags). Everything else in the suite imports the
library directly, so argparse/entry regressions were previously invisible.
These run the two training CLIs end-to-end on CPU at the shared tiny shape
(tests/tiny.py TINY — persistent-cache-friendly) in a fresh interpreter.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")

# Mirror tests/tiny.py TINY so the subprocess hits the same cached XLA
# programs (single CPU core; cold compiles are minutes).
TINY_FLAGS = [
    "--dim", "32", "--n_layers", "2", "--n_heads", "4", "--hidden_dim", "64",
    "--vocab_size", "50", "--max_length", "8", "--batch_size", "4",
    "--sample_size", "6", "--compute_dtype", "float32", "--epoch_num", "1",
    "--step_tot", "100", "--refine_steps_eval", "2", "--refine_steps_demo", "3",
]


def run_cli(script: str, args, cwd: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    # The parent suite forces 8 virtual devices; the CLI runs single-device.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args, "--cpu"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (
        f"{script} failed ({proc.returncode})\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    return proc


import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """One tiny train_clip_ddpm.py run shared by the eval-script smokes:
    returns (out_dir, run_name, captions_csv, stdout)."""
    from diffusion_image_captioning_tpu.data.synthetic import (
        synthetic_flickr_dirs,
    )

    out = tmp_path_factory.mktemp("trained_run")
    d8k = synthetic_flickr_dirs(str(out / "flickr8k"), n=60)
    proc = run_cli(
        "train_clip_ddpm.py",
        ["--flickr8k_dir", d8k, "--out_dir", str(out), *TINY_FLAGS],
        cwd=str(out),
    )
    logs = [p for p in os.listdir(out) if p.endswith(".txt")]
    assert len(logs) == 1, logs
    name = logs[0][: -len(".txt")]  # summary file is {MODEL_NAME}.txt
    return str(out), name, os.path.join(d8k, "captions.txt"), proc.stdout


def test_train_clip_ddpm_cli(trained_run):
    out, name, _, stdout = trained_run
    assert "final BLEU-4:" in stdout
    txt = open(os.path.join(out, name + ".txt")).read()
    for marker in ("epoch 0 average", "inferred:", "BLEU-4 score:"):
        assert marker in txt, (marker, txt[-2000:])


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    """Tiny synthetic COCO val2014 layout: 3 JPEGs + caption JSON."""
    import json

    import numpy as np
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "val2014"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        fn = f"img_{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
        ).save(img_dir / fn)
        images.append({"id": i, "file_name": fn})
        annotations.append({"image_id": i, "caption": f"a dog in park {i}"})
    ann = root / "captions.json"
    ann.write_text(json.dumps({"images": images, "annotations": annotations}))
    return str(img_dir), str(ann)


def test_coco_bleu_cli(trained_run, coco_fixture):
    """COCO zero-shot evaluator as a subprocess — the FULL script path
    (load checkpoint -> on-device CLIP encode -> sample -> score) in one
    process against a synthetic COCO-format fixture (COCO_BLEU.py:203-268
    contract; VERDICT round-4 weak #5): random CLIP weights gated behind
    --allow_random_clip, run-name guard against the checkpoint codec,
    prints the averaged BLEU over the TRUE image count (the zero-padded
    ragged tail row is excluded from the divisor)."""
    out, name, captions, _ = trained_run
    img_dir, ann = coco_fixture
    proc = run_cli(
        "coco_bleu.py",
        [name, "--ckpt_dir", out, "--coco_root", img_dir, "--ann_file", ann,
         "--captions", captions, "--allow_random_clip",
         "--batch_size", "2", "--limit", "3"],
        cwd=out,
    )
    score = float(proc.stdout.strip().splitlines()[-1])
    assert 0.0 <= score <= 1.0
    # 3 annotated images at batch_size 2 = one full + one zero-padded
    # batch; the divisor must be the true count, not the padded 4.
    assert "[coco] scored 3 images" in proc.stderr, proc.stderr[-1500:]


def test_caption_image_cli(trained_run, coco_fixture):
    """Zero-shot single-image captioning (notebook cell 24) end to end."""
    out, name, captions, _ = trained_run
    img_dir, _ = coco_fixture
    proc = run_cli(
        "caption_image.py",
        [os.path.join(img_dir, "img_0.jpg"), name, "--ckpt_dir", out,
         "--captions", captions, "--allow_random_clip", "--steps", "2"],
        cwd=out,
    )
    assert proc.stdout.strip(), proc.stdout  # decoded caption printed


def test_extract_clip_features_cli(trained_run, coco_fixture, tmp_path):
    """Fresh CLIP feature extraction (replaces the reference's downloaded
    pickles, CLIP-DDPM.py:123-126): unique-image dedup + row-aligned output."""
    import numpy as np

    img_dir, _ = coco_fixture
    csv = tmp_path / "captions.txt"
    # 5 caption rows over 3 unique images — exercises the dedup/scatter
    rows = [
        ("img_0.jpg", "a dog runs"), ("img_0.jpg", "a dog sits"),
        ("img_1.jpg", "two people walk"), ("img_2.jpg", "a red bicycle"),
        ("img_2.jpg", "the bicycle leans"),
    ]
    csv.write_text(
        "image,caption\n" + "\n".join(f'{i},"{c}"' for i, c in rows) + "\n"
    )
    proc = run_cli(
        "extract_clip_features.py",
        ["--images_dir", img_dir, "--captions", str(csv),
         "--out_dir", str(tmp_path), "--allow_random_clip",
         "--batch_size", "2"],
        cwd=str(tmp_path),
    )
    assert "wrote" in proc.stdout
    feats = np.load(tmp_path / "image_clip.npy")
    assert feats.shape == (5, 512)
    # rows of the same image share one feature; distinct images differ
    assert np.allclose(feats[0], feats[1]) and np.allclose(feats[3], feats[4])
    assert not np.allclose(feats[0], feats[2])


def test_serving_soak_cli(trained_run):
    """Short CPU soak of the caption server through the full harness
    (scripts/serving_soak.py): server subprocess + closed-loop HTTP
    clients + stall watchdog + JSON capacity report. The real-TPU 30-min
    soak reuses exactly this path (VERDICT round-4 stretch #8)."""
    import json as _json

    out, name, captions, _ = trained_run
    proc = run_cli(
        "serving_soak.py",
        [name, "--ckpt_dir", out, "--captions", captions,
         "--minutes", "0.1", "--clients", "2", "--rows", "2",
         "--port", "8517", "--max_batch", "4", "--steps", "2",
         "--out", os.path.join(out, "soak.json")],
        cwd=out,
    )
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["wedged"] is False
    assert report["captions"] > 0
    assert report["errors"] == 0
    assert report["latency"]["p50_ms"] > 0


def test_lm_trial_cli(tmp_path):
    csv = tmp_path / "train.csv"
    rows = [
        "a dog runs across the park", "the cat sits on a mat",
        "two people walk near the water", "a child plays with a ball",
        "a man rides a red bicycle", "the bird flies over the snow",
        "a woman reads by the tree", "three dogs chase a stick",
        "the group stands on the beach", "a boy jumps into the grass",
        "a girl wears a blue hat", "the crowd smiles at the camera",
    ]
    csv.write_text("text\n" + "\n".join(rows) + "\n")
    proc = run_cli(
        "lm_trial.py",
        ["--train_csv", str(csv), "--out_dir", str(tmp_path),
         "--dim", "32", "--n_layers", "2", "--n_heads", "4",
         "--hidden_dim", "64", "--vocab_size", "200", "--max_length", "16",
         "--batch_size", "4", "--epoch_num", "1",
         "--compute_dtype", "float32"],
        cwd=str(tmp_path),
    )
    assert "losses:" in proc.stdout, proc.stdout
    logs = [p for p in os.listdir(tmp_path) if p.endswith(".txt")]
    assert len(logs) == 1, logs
    txt = (tmp_path / logs[0]).read_text()
    assert "epoch 0 average" in txt
    # multi-step restore demo (lm-trial/main.ipynb cell 21): 5 refinement
    # decodes from x_25 plus the t-effectiveness sweep
    for marker in (
        "origin text:", "x_0 ground truth:", "t = 25", "inferred:",
        "text t effectiveness", "t: 5 restore:", "t: 480 restore:",
    ):
        assert marker in txt, (marker, txt[-2000:])
    assert txt.count("inferred:") == 5, txt[-2000:]


def test_plot_trials_cli(tmp_path):
    """Co-plot THIS framework's archived run with the reference's own trial
    logs — the cross-repo plotting claim, exercised mechanically."""
    import glob

    ours = os.path.join(REPO, "runs", "flagship_synthetic_correlated_32ep_round2.txt")
    theirs = sorted(glob.glob("/root/reference/trial_lr/*.txt"))[:2]
    if not (os.path.exists(ours) and theirs):
        import pytest

        pytest.skip("archived logs not present")
    out = tmp_path / "cmp.png"
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "plot_trials.py"),
         ours, *theirs, "--out", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
    assert "warning: no epoch lines" not in proc.stdout


def test_combined_summary_cli(tmp_path):
    """combined_summary.py parses a synthetic runs_combined layout: run-log
    epoch lines (reference byte format per train.py:524-527), per-segment
    wall lines across supervisor generations in mtime order, K-draw BLEU
    lines counted from the end, and the epoch-count-matched A30 ratio."""
    run_log = tmp_path / "epoch1_tiny_run.txt"
    run_log.write_text(
        "epoch 0 average x_t_loss, x_1_loss, prob_loss, val losses: "
        "7.1, 6.2, 4.0, 6.0, 5.4, 2.2\n"
        "train steps/s: 19.912\n"
        "some demo line\n"
        "BLEU-4 score: 0.2686055621426921\n"
        "epoch 0 average x_t_loss, x_1_loss, prob_loss, val losses: "
        "6.0, 5.4, 2.0, 5.8, 5.2, 1.8\n"
        "train steps/s: 19.907\n"
        "BLEU-4 draws (n=3): mean 0.201169 sd 0.000500 "
        "values [0.2015, 0.2008, 0.2012]\n"
        "BLEU-4 score: 0.20116914132329689\n"
    )
    gen1 = tmp_path / "gen1_logs"
    gen1.mkdir()
    old_seg = gen1 / "segment_a1.log"
    old_seg.write_text("segment 1/1 done (1000 s)\nwall: 1000 s; log: x\n")
    killed = tmp_path / "segment_a1.log"  # stalled segment: no wall line
    killed.write_text("WARNING: something\n")
    new_seg = tmp_path / "segment_a2.log"
    new_seg.write_text("segment 1/1 done (2000 s)\nwall: 2000 s; log: x\n")
    # chronological order: gen1 segment first, then the current generation
    os.utime(old_seg, (1_000_000, 1_000_000))
    os.utime(killed, (1_000_100, 1_000_100))
    os.utime(new_seg, (1_000_200, 1_000_200))

    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "combined_summary.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "completed epochs: 2" in out
    lines = out.splitlines()
    row1 = next(l for l in lines if l.strip().startswith("1 "))
    row2 = next(l for l in lines if l.strip().startswith("2 "))
    assert "1000" in row1 and "19.912" in row1 and "0.2686" in row1
    assert "2000" in row2 and "0.2012" in row2
    assert "K-draw mean 0.201169 sd 0.000500" in row2


def test_combined_summary_cli_multiepoch_segments(tmp_path):
    """v2 layout: 2-epoch segments (one wall + one BLEU per SEGMENT, two
    'epoch N average' lines each), plus the no-trailing-newline BLEU line
    gluing the next segment's first epoch line onto it."""
    run_log = tmp_path / "epoch2_tiny_run.txt"
    run_log.write_text(
        # one steps/s line per SEGMENT (train.py writes it once per fit)
        "epoch 0 average x_t_loss, x_1_loss, prob_loss, val losses: "
        "7.1, 6.2, 4.0, 6.0, 5.4, 2.2\n"
        "epoch 1 average x_t_loss, x_1_loss, prob_loss, val losses: "
        "6.5, 5.8, 3.0, 5.9, 5.3, 2.0\n"
        "train steps/s: 19.907\n"
        "BLEU-4 draws (n=3): mean 0.201169 sd 0.000500 "
        "values [0.2015, 0.2008, 0.2012]\n"
        # reference byte parity: no trailing newline -> next segment glues on
        "BLEU-4 score: 0.20116914132329689"
        "epoch 0 average x_t_loss, x_1_loss, prob_loss, val losses: "
        "6.0, 5.4, 2.0, 5.8, 5.2, 1.8\n"
    )
    seg = tmp_path / "segment_a1.log"
    seg.write_text("segment 1/1 done (2400 s)\nwall: 2400 s; log: x\n")

    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "combined_summary.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # 3 epoch lines, 1 BLEU -> 2 epochs/segment; 3rd epoch is in-flight
    assert "completed epochs: 3 (1 segments x 2 epochs)" in out
    lines = out.splitlines()
    row1 = next(l for l in lines if l.strip().startswith("1 "))
    row2 = next(l for l in lines if l.strip().startswith("2 "))
    row3 = next(l for l in lines if l.strip().startswith("3 "))
    assert "0.2012" not in row1 and "19.907" not in row1  # mid-segment row
    # wall + BLEU + per-segment steps/s all land on the segment-final epoch
    assert "2400" in row2 and "0.2012" in row2 and "19.907" in row2
    assert "K-draw mean 0.201169 sd 0.000500" in row2
    assert "6.000" in row3  # glued epoch line parsed
    # completed-wall epochs = 2 -> mean 1200 s/epoch; A30 ratio over 2 epochs
    assert "mean epoch wall: 1200 s" in out
    assert "vs A30 end-to-end at 2 epochs" in out
    assert "K-draw" not in row1  # mid-segment epoch carries no BLEU at all
    assert "sum of completed-segment walls: 2400 s" in out
    # epoch-count-matched ratio: 39600 * 2/10 / 2400 = 3.30x
    assert "3.30x" in out


def test_trial_grid_summary_cli(tmp_path):
    """trial_grid_summary.py: per-arm table (K-draw mean when present, last
    single-draw score otherwise), DONE-gated ordering checks, FAIL on an
    inverted ordering."""
    for arm, body, done in [
        ("baseline",
         "BLEU-4 draws (n=3): mean 0.2500 sd 0.0010 values [..]\n"
         "BLEU-4 score: 0.25", True),
        ("add", "BLEU-4 score: 0.11", True),
        ("xt100", "BLEU-4 score: 0.30", True),   # inverted vs reference
        ("cosine", "BLEU-4 score: 0.20", False),  # not DONE -> no check
        # no-BLEU trajectory axis: reference log ends without a BLEU line,
        # so the summary prints a final-epoch loss row instead
        ("dynamic1",
         "epoch 0 average x_t_loss, x_1_loss, prob_loss, val losses: "
         "4.0, 4.5, 31.0, 4.5, 5.4, 24.5\n"
         "epoch 4 average x_t_loss, x_1_loss, prob_loss, val losses: "
         "6.125, 4.25, 20.5, 6.5, 4.75, 21.25\n", True),
    ]:
        d = tmp_path / arm
        d.mkdir()
        (d / "epoch5_x.txt").write_text(body)
        if done:
            (d / "DONE").touch()

    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "trial_grid_summary.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "| baseline | 0.2500 +- 0.0010 | 0.1876 | done |" in out
    assert "| add | 0.1100 | 0.1033 | done |" in out
    assert "PASS  concat > add: 0.2500 vs 0.1100" in out
    assert "FAIL  x0 > x_{t-100}: 0.2500 vs 0.3000" in out
    assert "----  linspace > cosine: awaiting arms" in out  # not DONE
    assert "orderings reproduced: 1/2" in out
    assert ("dynamic1: epoch 4 train x_t/x_1/prob 6.125/4.250/20.500 "
            "val 6.500/4.750/21.250") in out
    assert "train_embed_slice: awaiting arm" in out


def test_combined_summary_phases(tmp_path):
    """--phases aggregates DIC_PHASE_TIMES stderr lines from completed
    segment logs into the per-segment overhead budget (pipeline milestones,
    fit train/val split, val-BLEU sample/score split, checkpoint saves)."""
    seg = tmp_path / "segment_a1.log"
    seg.write_text(
        "[phase] pipeline data: 20.0s (total 20.0s)\n"
        "[phase] pipeline model init + restore: 60.0s (total 80.0s)\n"
        "[phase] epoch 0: train 1000.0s (19937 steps) val 50.0s (311 batches)\n"
        "[phase] checkpoint save (early-stop): 30.0s\n"
        "[phase] epoch 1: train 990.0s (19937 steps) val 50.0s (311 batches)\n"
        "[phase] pipeline fit (train+val epochs + ckpt): 2120.0s (total 2200.0s)\n"
        "[phase] pipeline demos: 10.0s (total 2210.0s)\n"
        "[phase] val BLEU: sample 200.0s score 40.0s (3 draw(s) x 311 batches, group 64)\n"
        "[phase] pipeline val BLEU: 240.0s (total 2450.0s)\n"
        "[phase] checkpoint save (final): 30.0s\n"
        "[phase] pipeline final save: 30.0s (total 2480.0s)\n"
        "wall: 2480 s; log: x\n"
    )
    stalled = tmp_path / "segment_a2.log"  # no wall line: must be ignored
    stalled.write_text("[phase] pipeline data: 99.0s (total 99.0s)\n")

    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "combined_summary.py"),
         "--out", str(tmp_path), "--phases"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "mean over 1 completed segments" in out
    assert "data" in out and "20.0 s" in out            # not the stalled 99.0
    assert "(sum of pipeline phases)" in out and "2480.0 s" in out
    assert "train 995.0 s, val 50.0 s" in out           # mean of 1000, 990
    # non-train share: 1 - (995*2)/2480 = 19.8%
    assert "non-train overhead share of a segment: 19.8%" in out
    assert "sample 200.0 s, score 40.0 s" in out
    assert "checkpoint saves: 2 x 30.0 s mean" in out
