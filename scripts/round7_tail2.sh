#!/bin/bash
# Round-7 tail, v2 (supersedes round7_tail.sh — reprioritized after the
# 01:45-03:00 tunnel wedge forced the dynamic1 arm to be cut from the
# main queue): after round6_queue.sh drains,
#   (1) rerun the dynamic1 arm (VERDICT round-4 missing #1b — the only
#       reference trial axis still without an at-scale run),
#   (2) the dict_char_slice quirk-ON train_embed variant (VERDICT #2),
#   (3) the serving soak (stretch #8) with whatever time remains.
# All cutoff-gated against the 08:00/08:15 deadline guard.
#
# Usage:
#   QUEUE_PID=7686 \
#   DYN_CUTOFF_TS=$(date -ud '2026-08-22 07:00' +%s) \
#   SLICE5_CUTOFF_TS=$(date -ud '2026-08-22 06:55' +%s) \
#   SLICE2_CUTOFF_TS=$(date -ud '2026-08-22 07:35' +%s) \
#   SOAK_END_TS=$(date -ud '2026-08-22 07:50' +%s) \
#   nohup setsid bash scripts/round7_tail2.sh > runs/round7_tail2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

QUEUE_PID=${QUEUE_PID:-}
DYN_CUTOFF_TS=${DYN_CUTOFF_TS:?}
SLICE5_CUTOFF_TS=${SLICE5_CUTOFF_TS:?}
SLICE2_CUTOFF_TS=${SLICE2_CUTOFF_TS:?}
SOAK_END_TS=${SOAK_END_TS:?}
SETTLE=${SETTLE:-240}

log() { echo "[tail2 $(date -u '+%m-%d %H:%M:%S')] $*"; }

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

# ---- leg 1: dynamic1 rerun (cut from the main queue by the wedge) ------
if [ -f runs/trial_grid/dynamic1/DONE ]; then
  log "dynamic1 already DONE"
elif [ -f runs/trial_grid/STOP ]; then
  log "dynamic1 skipped: STOP sentinel"
elif [ "$(date +%s)" -ge "$DYN_CUTOFF_TS" ]; then
  log "dynamic1 skipped: past start cutoff"
else
  sleep "$SETTLE"
  ensure_tunnel
  log "dynamic1 rerun starting (EPOCHS=5)"
  GRID_OUT=runs/trial_grid EPOCHS=5 SEG_EPOCHS=5 SEG_CAP_S=3000 \
  ARMS=dynamic1 bash scripts/run_trial_grid.sh \
    >> runs/trial_grid/queue_r7.log 2>&1
  log "dynamic1 finished ($(ls runs/trial_grid/dynamic1/DONE 2>/dev/null || echo 'NO DONE marker'))"
fi

# ---- leg 2: train_embed_slice (quirk-ON apples-to-apples arm) ----------
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
  sleep 60
  ensure_tunnel
  log "train_embed_slice starting (EPOCHS=$EP)"
  GRID_OUT=runs/trial_grid EPOCHS=$EP SEG_EPOCHS=5 SEG_CAP_S=3000 \
  ARMS=train_embed_slice bash scripts/run_trial_grid.sh \
    >> runs/trial_grid/queue_r7.log 2>&1
  log "train_embed_slice finished ($(ls runs/trial_grid/train_embed_slice/DONE 2>/dev/null || echo 'NO DONE marker'))"
fi

# ---- leg 3: serving soak against the v3 checkpoint ---------------------
now=$(date +%s)
mins=$(( (SOAK_END_TS - now - 60) / 60 ))
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
  sleep 60
  ensure_tunnel
  log "serving soak starting (${mins} min, ckpt $name)"
  timeout $(( mins * 60 + 1500 )) python scripts/serving_soak.py "$name" \
    --ckpt_dir runs_combined_v3 --captions /tmp/corrworld_ck/captions.txt \
    --minutes "$mins" --out runs/serving_soak_r7.json \
    > runs/serving_soak_r7.log 2>&1
  log "soak rc=$? ($(tail -c 300 runs/serving_soak_r7.json 2>/dev/null | head -c 200))"
fi
log "tail2 complete"
