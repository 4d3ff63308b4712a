#!/usr/bin/env python
"""Summarize the ablation grid in runs/trial_grid/ against the reference's
trial orderings.

The reference's scientific contribution is its trial grid
(/root/reference/trial_add_concat/, trial_x_01_prediction/,
trial_rounding_weight/, trial_lr/, trial_classification_free/ — the
BASELINE.md BLEU rows). scripts/run_trial_grid.sh reruns those axes at the
8k protocol scale on the correlated synthetic world; this tool parses each
arm's run log and checks whether the reference's BLEU *orderings* reproduce:

  concat > add             (0.1876 vs 0.1033)
  x0 > x_{t-100}           (0.1876 vs 0.1575)
  lambda 0.3 > 0.5         (0.1876 vs trial_rounding_weight's 0.5 arm)
  linspace > logspace      (0.1876 vs 0.1699/0.1643)
  linspace > cosine        (0.1876 vs 0.1848)
  CFG w>0 hurts            (0.1876 vs 0.1395 @ w=1, 0.0759 @ w=0.3)

Pure stdlib — safe to run next to a stepping TPU job. Emits a markdown
table (for docs/PERF.md) plus PASS/FAIL lines per ordering.

Usage: python scripts/trial_grid_summary.py [--out runs/trial_grid] [--md]
"""
import argparse
import glob
import os
import re

# (arm, reference BLEU-4 or None, reference log provenance). None = the
# reference log for that axis ends WITHOUT a BLEU line (train_embed,
# dynamic1) — the arm is run for at-scale loss-trajectory sanity only.
REFERENCE = {
    "baseline": (0.1876, "trial_lr/epoch15_..lr1E-04-5E-05_schedulerlinspace.. (README.md:7)"),
    "add": (0.1033, "trial_add_concat/..clipadd..epoch15.."),
    "xt100": (0.1575, "trial_x_01_prediction/..x_0_predictFalse.."),
    "round05": (0.2193, "trial_rounding_weight/..round5E-01.. (combined-set run)"),
    "cosine": (0.1848, "trial_lr/..schedulercosine_annealing.."),
    "logspace": (0.1699, "trial_lr/..logspace.. (second arm 0.1643)"),
    "cfg_w1": (0.1395, "trial_classification_free/..class_weight1E+00.."),
    "cfg_w03": (0.0759, "trial_classification_free/..class_weight3E-01.."),
    "train_embed": (None, "trial_train_embedding/epoch15_..train-embedTrue.. (no BLEU line)"),
    "train_embed_slice": (None, "same reference log as train_embed — the reference ran WITH the char-slice quirk (CLIP-DDPM.py:184), so THIS arm is its apples-to-apples pairing; the quirk-off train_embed arm isolates the bug's cost"),
    "dynamic1": (None, "trial_rounding_weight/..dynamic1.. (no BLEU line)"),
}

# Final-epoch (epoch 14) loss lines of the reference logs for the no-BLEU
# axes, train x_t/x_1/prob then val x_t/x_1/prob — the trajectory-sanity
# anchor the at-scale arms are compared against (VERDICT round-4 missing
# #1). Both reference logs ran the full 15-epoch protocol at constant
# lr 1e-4; the arms here run 5 epochs, so compare SHAPE (which terms fall,
# which rise under the dynamic-lambda re-weighting), not absolute values.
REF_FINAL_LOSSES = {
    "train_embed": ((0.736, 0.055, 0.591), (0.707, 0.035, 0.526)),
    "train_embed_slice": ((0.736, 0.055, 0.591), (0.707, 0.035, 0.526)),
    "dynamic1": ((6.398, 4.607, 18.467), (6.425, 4.531, 21.537)),
}

# The headline orderings (VERDICT round-3 next #2). Each entry is
# (label, lhs arm, rhs arm): PASS iff bleu[lhs] > bleu[rhs].
ORDERINGS = [
    ("concat > add", "baseline", "add"),
    ("x0 > x_{t-100}", "baseline", "xt100"),
    ("lambda 0.3 > 0.5", "baseline", "round05"),
    ("linspace > logspace", "baseline", "logspace"),
    ("linspace > cosine", "baseline", "cosine"),
    ("CFG w=1 hurts", "baseline", "cfg_w1"),
    ("CFG w=0.3 hurts", "baseline", "cfg_w03"),
]

# WITHIN-axis orderings, reported but NON-GATING (VERDICT round-3 weak #2:
# the 7 gating checks above are all baseline-vs-arm, which silently scoped
# out the reference's cosine>logspace and w1>w0.3 internal rankings — both
# of which REVERSE on the 5-epoch surrogate). Each entry is
# (label, lhs, rhs); the reference agrees when lhs > rhs, and the expected
# direction is spelled out in the label itself (ADVICE round-4).
WITHIN_AXIS = [
    ("cosine > logspace (reference: 0.1848 > 0.1699/0.1643)",
     "cosine", "logspace"),
    ("CFG w=1.0 > w=0.3 (reference: 0.1395 > 0.0759)",
     "cfg_w1", "cfg_w03"),
]


def parse_arm(arm_dir: str):
    """Final-epoch BLEU of an arm: K-draw mean/sd when present, else the
    last single-draw score. Returns (mean, sd, n_bleu_blocks) or None."""
    # sorted + last by name: deterministic when an arm dir accumulates
    # logs from re-runs at different epoch counts (ADVICE round-3)
    logs = sorted(glob.glob(os.path.join(arm_dir, "epoch*_*.txt")))
    if not logs:
        return None
    with open(logs[-1], "rb") as f:
        text = f.read().decode("utf-8", "replace")
    draws = re.findall(
        r"BLEU-4 draws \(n=\d+\): mean ([\d.]+) sd ([\d.]+)", text
    )
    scores = re.findall(r"BLEU-4 score: ([\d.]+)", text)
    if not scores:
        return None
    if draws:
        mean, sd = float(draws[-1][0]), float(draws[-1][1])
    else:
        mean, sd = float(scores[-1]), float("nan")
    return mean, sd, len(scores)


def parse_final_losses(arm_dir: str):
    """Last 'epoch N average' line of an arm's run log -> (epoch_idx,
    (train x_t, x_1, prob), (val x_t, x_1, prob)), or None."""
    logs = sorted(glob.glob(os.path.join(arm_dir, "epoch*_*.txt")))
    if not logs:
        return None
    with open(logs[-1], "rb") as f:
        text = f.read().decode("utf-8", "replace")
    rows = re.findall(
        r"^epoch (\d+) average x_t_loss, x_1_loss, prob_loss, val losses: "
        r"([\d.eE+-]+), ([\d.eE+-]+), ([\d.eE+-]+), "
        r"([\d.eE+-]+), ([\d.eE+-]+), ([\d.eE+-]+)",
        text, re.M,
    )
    if not rows:
        return None
    ep, *vals = rows[-1]
    v = [float(x) for x in vals]
    return int(ep), tuple(v[:3]), tuple(v[3:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/trial_grid")
    ap.add_argument("--md", action="store_true", help="markdown table only")
    args = ap.parse_args()

    results = {}
    for arm in REFERENCE:
        arm_dir = os.path.join(args.out, arm)
        parsed = parse_arm(arm_dir)
        done = os.path.exists(os.path.join(arm_dir, "DONE"))
        if parsed:
            results[arm] = (*parsed, done)

    header = (
        "| arm | synthetic BLEU-4 (K-draw mean +- sd) | reference BLEU-4 | status |\n"
        "|---|---|---|---|"
    )
    print(header)
    for arm, (ref_bleu, _prov) in REFERENCE.items():
        ref_s = f"{ref_bleu:.4f}" if ref_bleu is not None else "— (log ends w/o BLEU)"
        if arm in results:
            mean, sd, nseg, done = results[arm]
            sd_s = f" +- {sd:.4f}" if sd == sd else ""
            status = "done" if done else f"in flight ({nseg} segments)"
            print(f"| {arm} | {mean:.4f}{sd_s} | {ref_s} | {status} |")
        else:
            print(f"| {arm} | — | {ref_s} | not run |")
    if args.md:
        return

    print()
    n_pass = n_avail = 0
    for label, lhs, rhs in ORDERINGS:
        if lhs in results and rhs in results and results[lhs][3] and results[rhs][3]:
            n_avail += 1
            a, b = results[lhs][0], results[rhs][0]
            ok = a > b
            n_pass += ok
            print(f"{'PASS' if ok else 'FAIL'}  {label}: {a:.4f} vs {b:.4f}")
        else:
            print(f"----  {label}: awaiting arms")
    if n_avail:
        print(f"\norderings reproduced: {n_pass}/{n_avail}")

    # Within-axis rankings: reported, NON-gating (they do not count toward
    # the reproduced total — disclosure of where the 5-epoch surrogate
    # deviates from the reference's internal orderings).
    print("\nwithin-axis (reported, non-gating):")
    for label, lhs, rhs in WITHIN_AXIS:
        if lhs in results and rhs in results and results[lhs][3] and results[rhs][3]:
            a, b = results[lhs][0], results[rhs][0]
            tag = "agrees " if a > b else "REVERSED"
            print(f"{tag}  {label}: {a:.4f} vs {b:.4f}")
        else:
            print(f"----      {label}: awaiting arms")

    # Trajectory-sanity rows for the no-BLEU axes (reference logs end
    # without BLEU lines): final-epoch losses side by side with the
    # reference's epoch-14 anchor. Shape is the claim — under dynamic
    # lambda the prob term must FALL while x_t/x_1 drift up; under
    # train_embedding all three sit 1-2 orders below the frozen-embed
    # arms (16-d learned space).
    print("\ntrajectory arms (final epoch vs reference epoch-14 anchor):")
    for arm, anchors in REF_FINAL_LOSSES.items():
        got = parse_final_losses(os.path.join(args.out, arm))
        if got is None:
            print(f"----      {arm}: awaiting arm")
            continue
        ep, tr, va = got
        (rtr, rva) = anchors
        print(
            f"  {arm}: epoch {ep} train x_t/x_1/prob "
            f"{tr[0]:.3f}/{tr[1]:.3f}/{tr[2]:.3f} val "
            f"{va[0]:.3f}/{va[1]:.3f}/{va[2]:.3f}  "
            f"(reference ep14: train {rtr[0]}/{rtr[1]}/{rtr[2]} "
            f"val {rva[0]}/{rva[1]}/{rva[2]})"
        )


if __name__ == "__main__":
    main()
