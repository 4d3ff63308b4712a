#!/bin/bash
# Serialized round-4 TPU job queue: wait for the combined-protocol v2
# supervisor to finish (runs_combined_v2/ reaches 10/10 epochs), run the
# schedule demo while the TPU compile cache is warm (it is BOUNDED: two
# ~15-min timeout-capped legs, and it is a VERDICT #3 deliverable), then
# the full CPU pytest suite (unbounded-ish on a cold CPU cache — the
# 2026-08-20 reboot wiped .jax_cache, so cold XLA:CPU compiles could run
# hours; it gets the tail of the round under its own timeout), then the
# trial grid with whatever remains. TPU jobs MUST be serialized on this
# box (CLAUDE.md) — this chain removes idle time at the boundary without
# overlapping clients.
#
# Launch detached:
#   nohup setsid bash scripts/round4_queue.sh > /tmp/round4_queue.log 2>&1 &
# Stop: touch runs/trial_grid/STOP (grid) / runs_combined_v2/STOP (v2),
# or touch /tmp/round4_queue.STOP to skip the grid launch entirely.
set -u
cd "$(dirname "$0")/.."

V2_OUT=${V2_OUT:-runs_combined_v2}
V2_EPOCHS=${V2_EPOCHS:-10}
GRID_OUT=${GRID_OUT:-runs/trial_grid}
COOLDOWN=${COOLDOWN:-300}

v2_done() {
  segs=$(cat "$V2_OUT"/epoch2_*.txt 2>/dev/null |
         grep -oa "BLEU-4 score:" | wc -l)
  echo $((segs * 2))
}

echo "[queue] waiting for $V2_OUT to reach $V2_EPOCHS epochs"
while :; do
  if [ -f /tmp/round4_queue.STOP ]; then
    echo "[queue] STOP sentinel — exiting without launching the grid"
    exit 0
  fi
  n=$(v2_done)
  if [ "$n" -ge "$V2_EPOCHS" ]; then
    # the supervisor may still be writing its completion lines / the last
    # checkpoint — wait for its segment child to exit too
    pid=$(cat "$V2_OUT/segment.pid" 2>/dev/null || echo "")
    if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
      echo "[queue] v2 complete ($n/$V2_EPOCHS) and segment child gone"
      break
    fi
  fi
  sleep 60
done

echo "[queue] settling 120s before the schedule demo (fresh tunnel client)"
sleep 120

# Schedule-correct TPU demonstration (round-3 VERDICT #3): a monolithic
# 4-epoch anneal vs 2x2-epoch --global_schedule segments on the 800-image
# correlated world — the segmented run's per-epoch loss lines must match the
# monolithic run's (CPU-tiny version: tests/test_schedule_offset.py::
# test_two_segments_match_monolithic). Short legs; plain timeout, no
# supervisor.
echo "[queue] schedule-correct segmentation demo -> runs/sched_demo/"
mkdir -p runs/sched_demo/mono runs/sched_demo/seg
# No DIC_*_BACKEND=pallas forcing: the guards consult .jax_cache markers and
# skip their probe children when warm, but forcing skips the HANG-guard too —
# on a cold/busted cache the Mosaic compile runs inline and can hang
# (observed 2026-08-20, v2 segment a1). Guards give pallas either way.
timeout 1800 \
  python scripts/run_correlated_world.py --epochs 4 --images 800 \
  --out runs/sched_demo/mono > runs/sched_demo/mono.log 2>&1
echo "[queue] sched demo mono rc=$?"
sleep 60
timeout 1800 \
  python scripts/run_correlated_world.py --epochs 4 --segments 2 \
  --global_schedule --images 800 \
  --out runs/sched_demo/seg > runs/sched_demo/seg.log 2>&1
echo "[queue] sched demo seg rc=$?"
python scripts/sched_demo_check.py > runs/sched_demo/CHECK.txt 2>&1
echo "[queue] sched demo check: $(tail -1 runs/sched_demo/CHECK.txt)"

# Full CPU test suite in the quiet window after the demo (VERDICT #6): the
# one core is free (no host-leg starvation, CLAUDE.md) and the CPU-forced
# env dials no tunnel client. Cold-cache duration is the unbounded leg, so
# it runs after the bounded demo; partial output still lands in the log.
echo "[queue] running full CPU pytest suite (TPU quiet window)"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 10000 \
  python -m pytest tests/ -q > /tmp/pytest_r4.log 2>&1
echo "[queue] pytest rc=$? -> /tmp/pytest_r4.log: $(tail -1 /tmp/pytest_r4.log)"
cp /tmp/pytest_r4.log runs/pytest_r4.log 2>/dev/null || true
sleep 60

mkdir -p "$GRID_OUT"
echo "[queue] launching trial grid -> $GRID_OUT/grid.log"
bash scripts/run_trial_grid.sh > "$GRID_OUT/grid.log" 2>&1
echo "[queue] grid driver exited rc=$?"
