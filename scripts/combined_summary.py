#!/usr/bin/env python
"""Summarize the combined-protocol artifacts in runs_combined/.

Parses the reference-byte-format run log plus every completed segment log
(current supervisor generation and the archived gen*_logs/) and prints the
per-epoch table the docs quote: epoch wall, in-epoch train steps/s, epoch
average losses, and the K-draw BLEU series. Pure stdlib — safe to run next
to a stepping TPU job (no jax import, no tunnel dial).

Protocol being summarized: the reference's Flickr30k+8k combined datum —
10 epochs, batch 8, 11 h on one A30 (/root/reference/README.md:15).

Usage: python scripts/combined_summary.py [--out runs_combined]
"""
import argparse
import glob
import os
import re


def segment_sort_key(path: str, out_dir: str):
    """Deterministic epoch-order key for a segment log path.

    (generation, prefix, attempt): archived gen2_logs/ sorts before
    gen3_logs/ sorts before the live run dir; within a generation the
    manual bootstrap segment (segment_m1) ran before the supervisor's
    attempt chain (segment_a1, a2, ...).
    """
    rel = os.path.relpath(path, out_dir)
    parts = rel.split(os.sep)
    gen = 10**9  # live run dir = the latest generation
    if len(parts) > 1:
        g = re.match(r"gen(\d+)_logs$", parts[0])
        if g:
            gen = int(g.group(1))
    m = re.match(r"segment_([a-z]+)(\d+)\.log$", parts[-1])
    prefix, attempt = (m.group(1), int(m.group(2))) if m else ("z", 0)
    return (gen, 0 if prefix == "m" else 1, attempt, rel)


def collect_epoch_walls(out_dir: str):
    """Return [(relpath, wall_s, exact), ...] for segments whose EPOCHS
    completed, in epoch order.

    exact=True: the segment printed its final "wall: N s" line.
    exact=False: the segment finished fit (its epochs are real and
    checkpointed — a --bleu_only rescue appends the missing score) but was
    killed in a post-fit eval leg before the wall line printed (observed
    2026-08-20, v2 segment a2); wall_s is then the last DIC_PHASE_TIMES
    pipeline total, a LOWER BOUND that excludes the wedge burn and the
    rescue attempt. Skipping such segments instead would silently mispair
    every later segment's wall with the wrong epochs AND make the protocol
    total look faster than measured.

    Shared with bench.py so the benched per-epoch walls can never drift
    from the committed artifact.
    """
    seg_logs = sorted(
        glob.glob(os.path.join(out_dir, "segment_*.log"))
        + glob.glob(os.path.join(out_dir, "gen*_logs", "segment_*.log")),
        key=lambda p: segment_sort_key(p, out_dir),
    )
    walls = []
    for path in seg_logs:
        with open(path, "rb") as f:
            data = f.read().decode("utf-8", "replace")
        rel = os.path.relpath(path, out_dir)
        m = re.search(r"^wall: (\d+(?:\.\d+)?) s", data, re.M)
        if m:
            walls.append((rel, float(m.group(1)), True))
        elif re.search(r"^\[phase\] pipeline fit \(", data, re.M):
            totals = re.findall(
                r"^\[phase\] pipeline [^:]+: [\d.]+s \(total ([\d.]+)s\)",
                data, re.M,
            )
            walls.append((rel, float(totals[-1]), False))
    # Reconcile against the contractual run log: every COUNTED segment owns
    # exactly one "BLEU-4 score:" write (direct or via --bleu_only rescue).
    # A fit-completed-but-killed segment whose rescue ALSO failed is
    # superseded by a full retrain (own wall line + own BLEU write) — keeping
    # its lower-bound entry would double-count those epochs and mispair every
    # later segment (ADVICE round-4). Drop surplus exact=False entries,
    # latest first (retrains supersede the most recent wedges).
    run_logs = glob.glob(os.path.join(out_dir, "epoch*_*.txt"))
    if len(run_logs) == 1 and walls:
        with open(run_logs[0], "rb") as f:
            n_seg = len(re.findall(rb"BLEU-4 score:", f.read()))
        while len(walls) > n_seg:
            drop = next(
                (i for i in range(len(walls) - 1, -1, -1) if not walls[i][2]),
                None,
            )
            if drop is None:
                break
            walls.pop(drop)
    return walls


def phase_budget(out_dir: str) -> None:
    """Aggregate DIC_PHASE_TIMES lines across completed segments into the
    per-segment overhead budget docs/PERF.md quotes.

    Emitter shapes (all stderr, captured in the segment logs):
      [phase] pipeline <label>: X.Xs (total Y.Ys)   (pipeline.py milestones)
      [phase] epoch N: train X.Xs (M steps) val Y.Ys (K batches)  (train.fit)
      [phase] val BLEU: sample X.Xs score Y.Ys (...)  (pipeline.run_val_bleu)
      [phase] checkpoint save (<tag>): X.Xs           (pipeline checkpoint_fn)
    Only segments whose epochs completed (collect_epoch_walls) are counted,
    so the budget matches the walls in the epoch table.
    """
    seg_logs = [p for p, _, _ in collect_epoch_walls(out_dir)]
    pipe = {}   # label -> [seconds per completed segment]
    tr, va = [], []  # per-epoch train/val seconds across segments
    bleu_sample, bleu_score, ck = [], [], []
    for rel in seg_logs:
        with open(os.path.join(out_dir, rel), "rb") as f:
            data = f.read().decode("utf-8", "replace")
        for lab, sec in re.findall(
            r"^\[phase\] pipeline ([^:]+): ([\d.]+)s ", data, re.M
        ):
            pipe.setdefault(lab, []).append(float(sec))
        for t, v in re.findall(
            r"^\[phase\] epoch \d+: train ([\d.]+)s \(\d+ steps\) "
            r"val ([\d.]+)s ", data, re.M,
        ):
            tr.append(float(t))
            va.append(float(v))
        for s, c in re.findall(
            r"^\[phase\] val BLEU: sample ([\d.]+)s score ([\d.]+)s ",
            data, re.M,
        ):
            bleu_sample.append(float(s))
            bleu_score.append(float(c))
        ck.extend(float(s) for s in re.findall(
            r"^\[phase\] checkpoint save \([^)]*\): ([\d.]+)s", data, re.M))
    if not pipe:
        print("no [phase] lines found (run with DIC_PHASE_TIMES=1)")
        return
    nseg = max(len(v) for v in pipe.values())
    print(f"per-segment phase budget (mean over {nseg} completed segments):")
    total = 0.0
    for lab, vals in pipe.items():
        mean = sum(vals) / len(vals)
        total += mean
        print(f"  {lab:<32} {mean:8.1f} s")
    print(f"  {'(sum of pipeline phases)':<32} {total:8.1f} s")
    if tr:
        mt, mv = sum(tr) / len(tr), sum(va) / len(va)
        print(f"per-epoch inside fit (mean over {len(tr)} epochs): "
              f"train {mt:.1f} s, val {mv:.1f} s")
        print(f"non-train overhead share of a segment: "
              f"{1 - (mt * len(tr) / nseg) / total:.1%}")
    if bleu_sample:
        print(f"val BLEU leg (mean over {len(bleu_sample)} evals): "
              f"sample {sum(bleu_sample) / len(bleu_sample):.1f} s, "
              f"score {sum(bleu_score) / len(bleu_score):.1f} s")
    if ck:
        print(f"checkpoint saves: {len(ck)} x "
              f"{sum(ck) / len(ck):.1f} s mean")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs_combined")
    ap.add_argument("--a30_wall_s", type=float, default=11 * 3600.0)
    ap.add_argument("--phases", action="store_true",
                    help="print the per-segment phase/overhead budget "
                         "aggregated from DIC_PHASE_TIMES lines")
    args = ap.parse_args()

    if args.phases:
        phase_budget(args.out)
        return

    # One "wall: N s" line per segment that ran to completion; killed or
    # stalled segments never reach the print. Order on disk is not epoch
    # order across supervisor generations, so sort by a deterministic key
    # parsed from the path (NOT mtime — a fresh checkout resets mtimes):
    # generation dir rank (gen2_logs < gen3_logs < current run dir), then
    # the one-off manual "m" prefix before supervisor "a" attempts, then
    # attempt number.
    walls = collect_epoch_walls(args.out)

    # epoch_num is part of the run-name codec: 1-epoch segments (v1) name the
    # log epoch1_*, 2-epoch segments (v2) epoch2_*.
    logs = glob.glob(os.path.join(args.out, "epoch*_*.txt"))
    assert len(logs) == 1, f"expected one run log in {args.out}, found {logs}"
    with open(logs[0], "rb") as f:
        text = f.read().decode("utf-8", "replace")
    rates = [float(x) for x in re.findall(r"^train steps/s: ([\d.]+)", text, re.M)]
    # one "epoch N average" line per trained epoch; one BLEU-4 block per
    # SEGMENT (the eval runs after the segment's epoch loop, reference
    # CLIP-DDPM.py:604-631), so with multi-epoch segments len(avgs) =
    # seg_epochs * len(bleus).
    # NOT ^-anchored: the unterminated "BLEU-4 score: X" (reference byte
    # parity) glues the next segment's first epoch line onto it.
    avgs = re.findall(r"epoch \d+ average [^:]*: (.*)$", text, re.M)
    # Float captures accept an exponent suffix: a tiny early score prints
    # as e.g. 6.5e-05 and a bare [\d.]+ silently truncates it to 6.5
    # (ADVICE round-4).
    _FLOAT = r"(\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)"
    bleus = [float(x) for x in re.findall(
        r"^BLEU-4 score: " + _FLOAT, text, re.M)]
    draws = re.findall(
        r"^BLEU-4 draws \(n=\d+\): mean " + _FLOAT + " sd " + _FLOAT,
        text, re.M)
    # Additive EMA score lines (Config.ema_decay > 0): one per segment,
    # written BEFORE that segment's raw "BLEU-4 score:" line.
    emas = [float(x) for x in re.findall(
        r"^BLEU-4 ema \(decay=[^)]*\): " + _FLOAT, text, re.M)]

    n = len(avgs) or len(bleus)
    nseg = len(bleus)
    # epochs per segment = the codec's leading epoch_num field (each segment
    # is one run invocation, so its epoch_num IS the segment length)
    seg_epochs = int(re.match(r"epoch(\d+)_", os.path.basename(logs[0])).group(1))
    print(f"completed epochs: {n} ({nseg} segments x {seg_epochs} epochs)")
    print("epoch  wall_s  steps/s   BLEU-4            epoch-average line")
    for i in range(n):
        # wall + BLEU + the per-fit steps/s line (train.py writes it once
        # per segment) land on the last epoch of each completed segment
        seg = (i + 1) // seg_epochs - 1 if (i + 1) % seg_epochs == 0 else None
        rate = f"{rates[seg]:.3f}" if seg is not None and seg < len(rates) else ""
        wall = ""
        if seg is not None and seg < len(walls):
            _, w, exact = walls[seg]
            wall = f"{w:.0f}" if exact else f">={w:.0f}"
        bleu = f"{bleus[seg]:.4f}" if seg is not None and seg < len(bleus) else ""
        dr = ""
        # draws lines exist only for segments run with --bleu_draws > 1; they
        # appear in the same order as their BLEU-4 score lines, counted from
        # the end (early segments predate the K-draw flag).
        if seg is not None:
            k = seg - (nseg - len(draws))
            if 0 <= k < len(draws):
                dr = f" (K-draw mean {draws[k][0]} sd {draws[k][1]})"
            ke = seg - (nseg - len(emas))
            if 0 <= ke < len(emas):
                dr += f" (ema {emas[ke]:.4f})"
        if i < len(avgs):
            tr = [f"{float(x):.3f}" for x in avgs[i].split(", ")[:3]]
            avg = "train x_t/x_1/prob = " + "/".join(tr)
        else:
            avg = "?"
        print(f"{i + 1:>5}  {wall:>6}  {rate:>7}   {bleu:>6}{dr}  {avg}")

    n_done = seg_epochs * len(walls)  # epochs inside completed-wall segments
    total = sum(w for _, w, _ in walls)
    inexact = [rel for rel, _, exact in walls if not exact]
    if inexact:
        print(f"NOTE: lower-bound walls (segment killed in a post-fit eval leg,"
              f" wedge burn + rescue excluded): {', '.join(inexact)}")
    print(f"\nsum of completed-segment walls: {total:.0f} s = {total / 3600:.2f} h")
    if n_done:
        print(
            f"mean epoch wall: {total / n_done:.0f} s; "
            f"projected 10-epoch: {total / n_done * 10 / 3600:.2f} h"
        )
    if n_done and total:
        # epoch-count-matched ratio: A30 wall for the SAME number of epochs
        # (11 h / 10 epochs) against our measured walls for those epochs.
        a30_same = args.a30_wall_s * n_done / 10.0
        print(
            f"vs A30 end-to-end at {n_done} epochs "
            f"({a30_same:.0f} s of its {args.a30_wall_s:.0f} s): "
            f"{a30_same / total:.2f}x"
        )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `... | head` closing stdout is not an error
        pass
