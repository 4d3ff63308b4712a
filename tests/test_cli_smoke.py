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


def test_train_clip_ddpm_cli(tmp_path):
    from diffusion_image_captioning_tpu.data.synthetic import (
        synthetic_flickr_dirs,
    )

    d8k = synthetic_flickr_dirs(str(tmp_path / "flickr8k"), n=60)
    proc = run_cli(
        "train_clip_ddpm.py",
        ["--flickr8k_dir", d8k, "--out_dir", str(tmp_path), *TINY_FLAGS],
        cwd=str(tmp_path),
    )
    assert "final BLEU-4:" in proc.stdout
    logs = [p for p in os.listdir(tmp_path) if p.endswith(".txt")]
    assert len(logs) == 1, logs
    txt = (tmp_path / logs[0]).read_text()
    for marker in ("epoch 0 average", "inferred:", "BLEU-4 score:"):
        assert marker in txt, (marker, txt[-2000:])


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
    assert "epoch 0 average" in (tmp_path / logs[0]).read_text()


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
