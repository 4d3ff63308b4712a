#!/usr/bin/env python
"""Trial-comparison plots — the notebook's parse-and-plot tooling
(CLIP-DDPM.ipynb cell 26, ``extract_float`` + matplotlib grids) as a CLI.
Works on BOTH this framework's logs and the reference's archived
``trial_*/*.txt`` logs (the line format is byte-compatible).

    python scripts/plot_trials.py runs/*.txt /root/reference/trial_lr/*.txt \
        --out comparison.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_image_captioning_tpu.logging_utils import (  # noqa: E402
    parse_bleu,
    parse_epoch_lines,
)

SERIES = ("train_x_t", "train_x_1", "train_prob", "val_x_t", "val_x_1", "val_prob")


def short_label(path: str, maxlen: int = 40) -> str:
    base = os.path.basename(path).replace(".txt", "")
    return base if len(base) <= maxlen else base[:maxlen] + "…"


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logs", nargs="+")
    p.add_argument("--out", default="trials.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 4, figsize=(22, 8))
    bleu_labels, bleu_scores = [], []
    for path in args.logs:
        rows = parse_epoch_lines(path)
        if not rows:
            print(f"warning: no epoch lines in {path}")
        else:
            epochs = [r["epoch"] for r in rows]
            for ax, key in zip(axes.flat, SERIES):
                ax.plot(epochs, [r[key] for r in rows], label=short_label(path))
        # final BLEU-4 line (CLIP-DDPM.py:631 / ipynb cell 26's score figures)
        score = parse_bleu(path)
        if score is not None:
            bleu_labels.append(short_label(path, 24))
            bleu_scores.append(score)
            print(f"BLEU-4 {score:.4f}  {os.path.basename(path)}")
    for ax, key in zip(axes.flat, SERIES):
        ax.set_title(key)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    bleu_ax = axes.flat[6]
    if bleu_scores:
        y = range(len(bleu_scores))
        bleu_ax.barh(list(y), bleu_scores)
        bleu_ax.set_yticks(list(y))
        bleu_ax.set_yticklabels(bleu_labels, fontsize=5)
        bleu_ax.set_title("final BLEU-4")
        bleu_ax.grid(alpha=0.3, axis="x")
    else:
        bleu_ax.axis("off")
    axes.flat[7].axis("off")
    axes.flat[0].legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
