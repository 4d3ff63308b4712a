#!/usr/bin/env python
"""Plot the combined-protocol v1 (LR-restart segments) vs v2
(schedule-correct segments) BLEU trajectories + applied learning rates.

Round-3 VERDICT #3 asked for the v1 BLEU swing (0.185 <-> 0.266 epoch to
epoch) to be verified as an LR-restart artifact: v1 re-entered the linspace
schedule at 1e-4 every 1-epoch segment, v2 resumes the 10-epoch anneal at
its global position (run_correlated_world.py --schedule_offset/--schedule_
total). If the explanation is right, v2's trajectory should not oscillate.

Pure matplotlib + stdlib parsing (no jax import — safe next to a stepping
TPU job). Output: runs_combined_v2/v1_vs_v2.png

Usage: python scripts/plot_combined_v2.py [--v1 runs_combined]
       [--v2 runs_combined_v2] [--out runs_combined_v2/v1_vs_v2.png]
"""
import argparse
import glob
import os
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def parse_run(out_dir: str):
    """(epochs_of_bleu, bleu_means, bleu_sds, seg_epochs) from a run log."""
    logs = glob.glob(os.path.join(out_dir, "epoch*_*.txt"))
    assert len(logs) == 1, logs
    seg_epochs = int(re.match(r"epoch(\d+)_", os.path.basename(logs[0])).group(1))
    with open(logs[0], "rb") as f:
        text = f.read().decode("utf-8", "replace")
    scores = [float(x) for x in re.findall(r"BLEU-4 score: ([\d.]+)", text)]
    draws = re.findall(r"BLEU-4 draws \(n=\d+\): mean ([\d.]+) sd ([\d.]+)", text)
    means, sds = [], []
    for i, s in enumerate(scores):
        k = i - (len(scores) - len(draws))  # draws lines count from the end
        if 0 <= k < len(draws):
            means.append(float(draws[k][0]))
            sds.append(float(draws[k][1]))
        else:
            means.append(s)
            sds.append(0.0)
    epochs = [seg_epochs * (i + 1) for i in range(len(scores))]
    return epochs, means, sds, seg_epochs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--v1", default="runs_combined")
    ap.add_argument("--v2", default="runs_combined_v2")
    ap.add_argument("--out", default="runs_combined_v2/v1_vs_v2.png")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--end_lr", type=float, default=5e-5)
    args = ap.parse_args()

    e1, m1, s1, _ = parse_run(args.v1)
    e2, m2, s2, _ = parse_run(args.v2)

    fig, (ax, ax_lr) = plt.subplots(
        2, 1, figsize=(8, 7), sharex=True,
        gridspec_kw={"height_ratios": [2.2, 1]},
    )
    ax.errorbar(e1, m1, yerr=s1, marker="o", capsize=3, label="v1: 1-epoch segments, LR restart (reference CONTINUE_TRAIN semantics)")
    ax.errorbar(e2, m2, yerr=s2, marker="s", capsize=3, label="v2: 2-epoch segments, schedule-correct anneal")
    ax.set_ylabel("from-noise val BLEU-4 (K-draw mean ± sd)")
    ax.set_title("Combined protocol (199,370 captions, 19,937 steps/epoch, one v5e chip)")
    ax.legend(fontsize=8, loc="lower left")
    ax.grid(alpha=0.3)

    ep = np.arange(1, args.epochs + 1)
    anneal = np.linspace(args.lr, args.end_lr, args.epochs)
    ax_lr.step(ep, np.full(args.epochs, args.lr), where="mid", label="v1 applied LR (restarts at 1e-4 every segment)")
    ax_lr.step(ep, anneal, where="mid", label="v2 applied LR (10-epoch linspace anneal)")
    ax_lr.set_xlabel("epoch")
    ax_lr.set_ylabel("learning rate")
    ax_lr.legend(fontsize=8)
    ax_lr.grid(alpha=0.3)

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} (v1: {len(m1)} points, v2: {len(m2)} points)")


if __name__ == "__main__":
    main()
