#!/bin/bash
# Serialized round-4 TPU job queue: wait for the combined-protocol v2
# supervisor to finish (runs_combined_v2/ reaches 10/10 epochs), cool the
# tunnel down, then launch the trial-grid driver. TPU jobs MUST be
# serialized on this box (CLAUDE.md) — this chain removes idle time at the
# boundary without overlapping clients.
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

echo "[queue] cooling down ${COOLDOWN}s before the grid launch"
sleep "$COOLDOWN"

mkdir -p "$GRID_OUT"
echo "[queue] launching trial grid -> $GRID_OUT/grid.log"
bash scripts/run_trial_grid.sh > "$GRID_OUT/grid.log" 2>&1
echo "[queue] grid driver exited rc=$?"
