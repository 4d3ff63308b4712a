#!/bin/bash
# Round-8 (final-round) serialized TPU queue. The 08-22 03:38 machine
# restart killed the overnight round-7 tail mid-flight: the dynamic1 rerun
# had wedged (0/5), the cosine 15-epoch arm died ~1 min after init, and
# logspace 15-epoch never started. /tmp/corrworld_ck and .jax_cache were
# wiped with the VM, so leg 1 also pays the world-regen + cold-cache cost.
#
# Legs, in VERDICT round-4 priority order, each start-cutoff-gated against
# the 09:25 STOP / 09:45 kill deadline guard:
#   (1) dynamic1 rerun, 5 ep          (missing #1b — last untested trial axis)
#   (2) cosine 15 ep                  (missing #3 — the 5-ep reversal probe)
#   (3) logspace 15 ep                (other half of the verdict pair)
#   (4) train_embed_slice quirk arm   (next #2; degrades 5->2 ep when late)
#   (5) full CPU pytest               (next #7; after the TPU queue drains)
#
# Usage:
#   DYN_CUTOFF_TS=$(date -ud '2026-08-22 06:30' +%s) \
#   COS_CUTOFF_TS=$(date -ud '2026-08-22 07:10' +%s) \
#   LOG_CUTOFF_TS=$(date -ud '2026-08-22 08:00' +%s) \
#   SLICE5_CUTOFF_TS=$(date -ud '2026-08-22 08:40' +%s) \
#   SLICE2_CUTOFF_TS=$(date -ud '2026-08-22 09:00' +%s) \
#   nohup setsid bash scripts/round8_queue.sh > runs/round8_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DYN_CUTOFF_TS=${DYN_CUTOFF_TS:?}
COS_CUTOFF_TS=${COS_CUTOFF_TS:?}
LOG_CUTOFF_TS=${LOG_CUTOFF_TS:?}
SLICE5_CUTOFF_TS=${SLICE5_CUTOFF_TS:?}
SLICE2_CUTOFF_TS=${SLICE2_CUTOFF_TS:?}
SETTLE=${SETTLE:-300}

log() { echo "[q8 $(date -u '+%m-%d %H:%M:%S')] $*"; }

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x = jnp.ones((256, 256)); print(jax.jit(lambda a: (a @ a).sum())(x))" >/dev/null 2>&1
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

grid_leg() {  # grid_leg <arm> <grid_out> <epochs> <cutoff_ts>
  local arm=$1 out=$2 ep=$3 cutoff=$4
  if [ -f "$out/$arm/DONE" ]; then
    log "$arm already DONE"
  elif [ -f "$out/STOP" ]; then
    log "$arm skipped: STOP sentinel"
  elif [ "$(date +%s)" -ge "$cutoff" ]; then
    log "$arm skipped: past start cutoff"
  else
    ensure_tunnel
    log "$arm starting (EPOCHS=$ep -> $out)"
    GRID_OUT="$out" EPOCHS="$ep" SEG_EPOCHS=5 SEG_CAP_S=3000 \
    ARMS="$arm" bash scripts/run_trial_grid.sh \
      >> "$out/queue_r8.log" 2>&1
    log "$arm finished ($(ls "$out/$arm/DONE" 2>/dev/null || echo 'NO DONE marker'))"
    sleep "$SETTLE"
  fi
}

grid_leg dynamic1 runs/trial_grid     5  "$DYN_CUTOFF_TS"
grid_leg cosine   runs/trial_grid_15ep 15 "$COS_CUTOFF_TS"
grid_leg logspace runs/trial_grid_15ep 15 "$LOG_CUTOFF_TS"

now=$(date +%s)
EP=""
if [ "$now" -lt "$SLICE5_CUTOFF_TS" ]; then EP=5
elif [ "$now" -lt "$SLICE2_CUTOFF_TS" ]; then EP=2
fi
if [ -n "$EP" ] && [ ! -f runs/trial_grid/STOP ] \
    && [ ! -f runs/trial_grid/train_embed_slice/DONE ]; then
  grid_leg train_embed_slice runs/trial_grid "$EP" "$SLICE2_CUTOFF_TS"
else
  log "slice leg skipped (EP='$EP')"
fi

# ---- tail: full CPU pytest on the now-quiet box (cold .jax_cache) ------
log "pytest starting (CPU backend, tunnel-free)"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python -m pytest tests/ -q > runs/pytest_r6.log 2>&1 &
PYPID=$!
echo "$PYPID" > runs/pytest_r6.pid
wait "$PYPID"
rc=$?
rm -f runs/pytest_r6.pid
log "pytest rc=$rc ($(tail -1 runs/pytest_r6.log))"
log "queue complete"
