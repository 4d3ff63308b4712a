#!/usr/bin/env python
"""Check the schedule-correct TPU demonstration (round-3 VERDICT #3).

runs/sched_demo/mono holds a monolithic 4-epoch anneal on the 800-image
correlated world; runs/sched_demo/seg the same protocol driven as two
2-epoch --global_schedule segments (run_correlated_world.py
--schedule_offset/--schedule_total). Schedule-correct segmentation resumes
the LR anneal, shuffle stream, val-key chain, Adam moments and step counter
at the global epoch position, so the segmented run's per-epoch loss lines
must equal the monolithic run's EPOCH FOR EPOCH — the CPU-tiny version of
this claim is asserted bit-for-bit in tests/test_schedule_offset.py::
TestSegmentedEqualsMonolithic; this tool asserts it on the real-TPU
artifact. Pure stdlib — safe next to a stepping TPU job.

Usage: python scripts/sched_demo_check.py [--dir runs/sched_demo]
Exit 0 iff every epoch's six losses match exactly.
"""
import argparse
import glob
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from diffusion_image_captioning_tpu.logging_utils import parse_epoch_lines

KEYS = ("train_x_t", "train_x_1", "train_prob", "val_x_t", "val_x_1",
        "val_prob")


def run_rows(out_dir: str):
    logs = sorted(glob.glob(os.path.join(out_dir, "epoch*_*.txt")))
    assert len(logs) == 1, (out_dir, logs)
    return parse_epoch_lines(logs[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/sched_demo")
    args = ap.parse_args()

    mono = run_rows(os.path.join(args.dir, "mono"))
    seg = run_rows(os.path.join(args.dir, "seg"))
    if len(mono) != len(seg):
        print(f"FAIL: {len(mono)} monolithic epochs vs {len(seg)} segmented")
        raise SystemExit(1)

    worst = 0.0
    ok = True
    for i, (m, s) in enumerate(zip(mono, seg)):
        diffs = {k: abs(m[k] - s[k]) for k in KEYS}
        bad = {k: d for k, d in diffs.items() if d != 0.0}
        worst = max(worst, *diffs.values())
        line = "exact" if not bad else f"DIFFERS {bad}"
        print(f"epoch {i}: {line}")
        ok &= not bad
    print(f"{'PASS' if ok else 'FAIL'}: {len(mono)} epochs, "
          f"max |diff| = {worst:g}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
