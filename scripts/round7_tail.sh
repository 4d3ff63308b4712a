#!/bin/bash
# Round-7 tail: the two TPU legs that come AFTER round6_queue.sh drains —
# (1) the dict_char_slice quirk-ON variant of the train_embed arm
#     (VERDICT round-4 next #2; see run_trial_grid.sh arm_flags), and
# (2) the 30-min production-serving soak (VERDICT round-4 stretch #8,
#     scripts/serving_soak.py) against the combined-v3 checkpoint.
# Both cutoff-gated so nothing starts that can't finish before the
# deadline guard quiets the box (scripts/deadline_guard.sh at 08:00/08:15).
#
# Usage:
#   QUEUE_PID=7686 \
#   SLICE5_CUTOFF_TS=$(date -ud '2026-08-22 06:55' +%s) \
#   SLICE2_CUTOFF_TS=$(date -ud '2026-08-22 07:20' +%s) \
#   SOAK_END_TS=$(date -ud '2026-08-22 07:50' +%s) \
#   nohup setsid bash scripts/round7_tail.sh > runs/round7_tail.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

QUEUE_PID=${QUEUE_PID:-}
SLICE5_CUTOFF_TS=${SLICE5_CUTOFF_TS:?}
SLICE2_CUTOFF_TS=${SLICE2_CUTOFF_TS:?}
SOAK_END_TS=${SOAK_END_TS:?}
SETTLE=${SETTLE:-300}

log() { echo "[tail $(date -u '+%m-%d %H:%M:%S')] $*"; }

probe() {
  timeout 95 python -c "import jax, jax.numpy as jnp; x = jnp.ones((256, 256)); print(jax.jit(lambda a: (a @ a).sum())(x))" >/dev/null 2>&1
}

ensure_tunnel() {
  local n=0
  until probe; do
    n=$((n + 1))
    log "health probe $n failed/hung — 300 s cooldown"
    if [ "$n" -ge 4 ]; then log "4 failed probes — proceeding anyway"; break; fi
    sleep 300
  done
}

if [ -n "$QUEUE_PID" ]; then
  log "waiting on round6 queue pid $QUEUE_PID"
  while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 60; done
  log "queue exited"
fi

# ---- leg 1: train_embed_slice (quirk-ON apples-to-apples arm) ----------
now=$(date +%s)
EP=""
if [ "$now" -lt "$SLICE5_CUTOFF_TS" ]; then EP=5
elif [ "$now" -lt "$SLICE2_CUTOFF_TS" ]; then EP=2
fi
if [ -f runs/trial_grid/STOP ]; then
  log "slice leg skipped: STOP sentinel"
elif [ -z "$EP" ]; then
  log "slice leg skipped: past start cutoffs"
elif [ -f runs/trial_grid/train_embed_slice/DONE ]; then
  log "slice leg already DONE"
else
  sleep "$SETTLE"
  ensure_tunnel
  log "train_embed_slice starting (EPOCHS=$EP)"
  GRID_OUT=runs/trial_grid EPOCHS=$EP SEG_EPOCHS=5 SEG_CAP_S=3000 \
  ARMS=train_embed_slice bash scripts/run_trial_grid.sh \
    >> runs/trial_grid/queue_r7.log 2>&1
  log "train_embed_slice finished ($(ls runs/trial_grid/train_embed_slice/DONE 2>/dev/null || echo 'NO DONE marker'))"
fi

# ---- leg 2: serving soak against the v3 checkpoint ---------------------
now=$(date +%s)
mins=$(( (SOAK_END_TS - now - SETTLE) / 60 ))
[ "$mins" -gt 30 ] && mins=30
ckpt_log=$(ls runs_combined_v3/epoch*_*.txt 2>/dev/null | head -1)
if [ "$mins" -lt 10 ]; then
  log "soak skipped: only ${mins} min before SOAK_END_TS"
elif [ -z "$ckpt_log" ]; then
  log "soak skipped: no runs_combined_v3 checkpoint/codec log"
elif [ ! -f /tmp/corrworld_ck/captions.txt ]; then
  log "soak skipped: /tmp/corrworld_ck/captions.txt missing"
else
  name=$(basename "$ckpt_log" .txt)
  sleep "$SETTLE"
  ensure_tunnel
  log "serving soak starting (${mins} min, ckpt $name)"
  timeout $(( mins * 60 + 1500 )) python scripts/serving_soak.py "$name" \
    --ckpt_dir runs_combined_v3 --captions /tmp/corrworld_ck/captions.txt \
    --minutes "$mins" --out runs/serving_soak_r7.json \
    > runs/serving_soak_r7.log 2>&1
  log "soak rc=$? ($(tail -c 300 runs/serving_soak_r7.json 2>/dev/null | head -c 200))"
fi
log "tail complete"
