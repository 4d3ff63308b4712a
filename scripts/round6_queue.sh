#!/bin/bash
# Round-6 serialized TPU queue. Waits for the combined-v3 supervisor, then
# drives the remaining TPU legs one at a time — new-axis grid arms
# (train_embed, dynamic1), the 15-epoch schedule-axis probe arms
# (cosine, logspace), the optional cfg_w03 15-epoch arm — and finally the
# round's bench, each behind a tunnel health probe and a per-leg start
# cutoff so nothing launches that cannot finish before the deadline guard
# quiets the box (scripts/deadline_guard.sh). All legs are idempotent
# (grid DONE markers / supervisor BLEU counting), so re-running this
# script continues where it stopped.
#
# Usage (epoch-second cutoffs; a leg whose cutoff has passed is skipped):
#   V3_SUPER_PID=7120 \
#   ARMS5_CUTOFF_TS=$(date -ud '2026-08-22 06:45' +%s) \
#   ARMS15_CUTOFF_TS=$(date -ud '2026-08-22 06:00' +%s) \
#   CFG15_CUTOFF_TS=$(date -ud '2026-08-22 04:45' +%s) \
#   BENCH_CUTOFF_TS=$(date -ud '2026-08-22 07:45' +%s) \
#   nohup setsid bash scripts/round6_queue.sh > runs/round6_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

V3_SUPER_PID=${V3_SUPER_PID:-}
ARMS5_CUTOFF_TS=${ARMS5_CUTOFF_TS:?}
ARMS15_CUTOFF_TS=${ARMS15_CUTOFF_TS:?}
CFG15_CUTOFF_TS=${CFG15_CUTOFF_TS:?}
BENCH_CUTOFF_TS=${BENCH_CUTOFF_TS:?}
SETTLE=${SETTLE:-300}

log() { echo "[queue $(date -u '+%m-%d %H:%M:%S')] $*"; }

probe() {
  # Real jitted-matmul probe (CLAUDE.md: a light device-list probe passes
  # on tunnels that then wedge the real job).
  timeout 95 python -c "import jax, jax.numpy as jnp; x = jnp.ones((256, 256)); print(jax.jit(lambda a: (a @ a).sum())(x))" >/dev/null 2>&1
}

ensure_tunnel() {
  local n=0
  until probe; do
    n=$((n + 1))
    log "health probe $n failed/hung — 300 s cooldown"
    if [ "$n" -ge 6 ]; then log "6 failed probes — proceeding anyway"; break; fi
    sleep 300
  done
}

# One grid leg: $1 = GRID_OUT, $2 = EPOCHS, $3 = SEG_CAP_S, $4 = arm name,
# $5 = start cutoff. The grid driver itself is wedge-supervised per arm.
grid_leg() {
  local out=$1 epochs=$2 cap=$3 arm=$4 cutoff=$5
  if [ -f "$out/$arm/DONE" ]; then log "leg $arm@$out already DONE"; return; fi
  if [ -f "$out/STOP" ] || [ -f runs/trial_grid/STOP ]; then
    log "leg $arm@$out skipped: STOP sentinel"; return
  fi
  if [ "$(date +%s)" -ge "$cutoff" ]; then
    log "leg $arm@$out skipped: past start cutoff"; return
  fi
  sleep "$SETTLE"
  ensure_tunnel
  log "leg $arm@$out starting (EPOCHS=$epochs)"
  GRID_OUT=$out EPOCHS=$epochs SEG_EPOCHS=5 SEG_CAP_S=$cap ARMS=$arm \
    bash scripts/run_trial_grid.sh >> "$out/queue_r6.log" 2>&1
  log "leg $arm@$out finished ($(ls "$out/$arm/DONE" 2>/dev/null || echo 'NO DONE marker'))"
}

if [ -n "$V3_SUPER_PID" ]; then
  log "waiting on combined-v3 supervisor pid $V3_SUPER_PID"
  while kill -0 "$V3_SUPER_PID" 2>/dev/null; do sleep 60; done
  log "combined-v3 supervisor exited"
fi

# The two reference trial axes the 8-arm grid skipped (VERDICT #3) — same
# 5-epoch grid protocol as the other arms.
grid_leg runs/trial_grid       5  3000 train_embed "$ARMS5_CUTOFF_TS"
grid_leg runs/trial_grid       5  3000 dynamic1    "$ARMS5_CUTOFF_TS"
# The 15-epoch truncation-hypothesis probe (VERDICT #4) — full reference
# protocol length, 3x 5-epoch segments per arm.
grid_leg runs/trial_grid_15ep 15  3000 cosine      "$ARMS15_CUTOFF_TS"
grid_leg runs/trial_grid_15ep 15  3000 logspace    "$ARMS15_CUTOFF_TS"
# Optional CFG-collapse probe (VERDICT #5): CFG arms run ~1.8x slower
# (always-computed second forward) — bigger cap, earliest cutoff.
grid_leg runs/trial_grid_15ep 15  4200 cfg_w03     "$CFG15_CUTOFF_TS"

# Final bench on a settled box; one retry on a wedged/empty dial
# (1/10 dials wedged with zero output on 2026-08-21).
if [ "$(date +%s)" -lt "$BENCH_CUTOFF_TS" ]; then
  sleep 600
  for i in 1 2; do
    ensure_tunnel
    log "bench attempt $i"
    BENCH_EXTRAS_FILE=runs/bench_extras_r6.json \
      timeout 1200 python bench.py > runs/bench_r6.json 2> runs/bench_r6.log
    rc=$?
    if [ "$rc" -eq 0 ] && [ -s runs/bench_r6.json ]; then
      log "bench ok: $(cat runs/bench_r6.json)"
      break
    fi
    log "bench attempt $i rc=$rc — 330 s quiet + probe + retry"
    sleep 330
  done
else
  log "bench skipped: past cutoff (driver's round-end bench still runs)"
fi
log "queue complete"
