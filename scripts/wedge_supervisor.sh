#!/bin/bash
# Wedge-supervised long-run driver for the remote-TPU environment.
#
# The remote tunnel can wedge a device call mid-epoch (CLAUDE.md: observed
# repeatedly 2026-08-17..19; the host futex-waits forever, and fit()'s
# StallWatchdog only WARNS on stderr). This supervisor makes reference-
# protocol-scale runs survivable: it drives ONE 1-epoch continue_train
# segment per child process (scripts/run_correlated_world.py), watches the
# segment log for the watchdog line, kills a stalled child's process group,
# cools down (redialing a freshly-wedged tunnel too quickly wedges again),
# and retries with --resume from the last checkpoint. Progress is counted
# from the run log itself (one "BLEU-4 score:" per completed segment), so
# the supervisor is idempotent — re-running it continues where it stopped.
#
# Usage:
#   EPOCHS=10 OUT=runs_combined \
#   EXTRA="--images 8091 --images30k 31783 --train_set_ratio 0.8 --bleu_draws 3" \
#   bash scripts/wedge_supervisor.sh
set -u
cd "$(dirname "$0")/.."

EPOCHS=${EPOCHS:-10}
OUT=${OUT:-runs_combined}
SEG_EPOCHS=${SEG_EPOCHS:-1}      # epochs per child segment: >1 amortizes the
                                 # ~2-3 min fresh-process retrace over several
                                 # epochs (round-3 VERDICT: the largest fixed
                                 # per-epoch overhead) at the price of a
                                 # bigger rollback on a kill — mid-segment
                                 # epochs aren't checkpointed, so a killed
                                 # N-epoch segment retries all N from the
                                 # previous segment's checkpoint. EPOCHS must
                                 # divide evenly. NOTE: epoch_num is in the
                                 # run-name codec — all attempts of one
                                 # protocol must use the same SEG_EPOCHS.
COOLDOWN=${COOLDOWN:-300}        # after a kill: let the tunnel recover
SETTLE=${SETTLE:-300}            # after a clean exit: quiet gap before the
                                 # next dial. Raised 60 -> 300 in round 5:
                                 # ALL 4 gen2 v2 kills were start-of-train
                                 # wedges whose dial came ~60 s after the
                                 # previous client exited, while every
                                 # >=300 s-gap dial succeeded (docs/PERF.md
                                 # round-4 boundary-wedge section)
STALL_S=${STALL_S:-420}          # watchdog fires after this many silent s
DRAIN_STEPS=${DRAIN_STEPS:-500}  # in-epoch breather cadence (train.py
DRAIN_SLEEP=${DRAIN_SLEEP:-0.5}  # DIC_DRAIN_*): long continuously-stepping
                                 # epochs wedge the tunnel (9/9 on
                                 # 2026-08-19); periodic drains bound the
                                 # async queue and give it quiet points
SEG_CAP_S=${SEG_CAP_S:-$((3000 * SEG_EPOCHS))}  # hard per-segment cap: the
                                 # watchdog covers only the train/val loops; a
                                 # wedge in data load / BLEU / demos is caught
                                 # by this (default scales with SEG_EPOCHS)
EXTRA=${EXTRA:---images 8091 --images30k 31783 --train_set_ratio 0.8 --bleu_draws 3}
POLL=${POLL:-30}                 # seconds between child liveness/stall checks
CHILD=${CHILD:-scripts/run_correlated_world.py}  # segment driver (a stub
                                 # under test — tests/test_wedge_supervisor.py)
PROBE=${PROBE:-1}                # after a FAILED attempt: health-probe the
                                 # tunnel with a real jitted matmul in a
                                 # sacrificial child before relaunching
                                 # (CLAUDE.md recovery protocol — a light
                                 # device-list probe passes on tunnels that
                                 # then wedge the real job). A hung probe
                                 # costs PROBE_S + cooldown, not a 425 s
                                 # watchdog window. Empty disables (tests).
PROBE_S=${PROBE_S:-95}
PROBE_CMD=${PROBE_CMD:-"python -c \"import jax, jax.numpy as jnp; x = jnp.ones((256, 256)); print(jax.jit(lambda a: (a @ a).sum())(x))\""}
GLOBAL_LR=${GLOBAL_LR:-}         # non-empty: schedule-correct segments — each
                                 # 1-epoch segment resumes the LR anneal (and
                                 # shuffle/key streams) at its global epoch
                                 # position over the EPOCHS-long protocol
                                 # instead of the reference CONTINUE_TRAIN
                                 # restart (run_correlated_world
                                 # --schedule_offset/--schedule_total)

mkdir -p "$OUT"

if [ $((EPOCHS % SEG_EPOCHS)) -ne 0 ]; then
  echo "[supervisor] EPOCHS=$EPOCHS must divide evenly by SEG_EPOCHS=$SEG_EPOCHS" >&2
  exit 2
fi

completed() {
  # one contractual "BLEU-4 score:" write per completed SEG_EPOCHS-epoch
  # segment (the run-name codec puts epoch_num first: epoch<SEG_EPOCHS>_*);
  # -a because the log glues binary-ish bytes from demo decodes on some worlds
  segs=$(cat "$OUT"/epoch"${SEG_EPOCHS}"_*.txt 2>/dev/null |
         grep -oa "BLEU-4 score:" | wc -l)
  echo $((segs * SEG_EPOCHS))
}

# Continue the attempt numbering from any existing segment logs: a
# relaunched supervisor restarting at a1 OVERWRITES the previous
# generation's logs (observed 2026-08-20 — the original segment_a1.log was
# clobbered and had to be recovered from git; epoch/wall pairing in
# combined_summary keys on these files).
attempt=0
for f in "$OUT"/segment_a*.log; do
  [ -e "$f" ] || continue
  i=${f##*_a}
  i=${i%.log}
  if [ "$i" -gt "$attempt" ] 2>/dev/null; then attempt=$i; fi
done
while :; do
  if [ -f "$OUT/STOP" ]; then
    echo "[supervisor] STOP sentinel found — exiting cleanly at $(completed)/$EPOCHS"
    break
  fi
  done_n=$(completed)
  if [ "$done_n" -ge "$EPOCHS" ]; then
    echo "[supervisor] complete: $done_n/$EPOCHS epochs"
    break
  fi
  attempt=$((attempt + 1))
  if [ "$attempt" -gt $((EPOCHS * 4)) ]; then
    echo "[supervisor] giving up after $attempt attempts ($done_n/$EPOCHS)"
    exit 1
  fi
  resume=""
  if ls -d "$OUT"/epoch"${SEG_EPOCHS}"_*.ckpt >/dev/null 2>&1; then resume="--resume"; fi
  sched=""
  if [ -n "$GLOBAL_LR" ]; then
    sched="--schedule_offset $done_n --schedule_total $EPOCHS"
  fi
  # BLEU-only rescue: if the PREVIOUS attempt got through fit (its epochs
  # are checkpointed — the phase line below prints after the in-fit final
  # save) but died in the post-fit eval legs (demos/BLEU wedge, observed
  # 2026-08-20 on v2 segment a2), a full retry would re-train checkpointed
  # epochs. Recover the missing BLEU lines from the checkpoint instead
  # (run_correlated_world --bleu_only; key stream depends only on seed +
  # saved val split, so the scores are the ones the dead segment owed).
  # Guard against double-rescue: a segment that died AFTER its BLEU write
  # landed (e.g. SEG_CAP_S expiry during the final save) advances completed()
  # — rescuing it would append a DUPLICATE BLEU line and over-count the
  # protocol by SEG_EPOCHS. Only rescue when the failed attempt did NOT
  # advance the completed count from its launch-time value.
  mode=""
  if [ -n "${prev_failed:-}" ] && [ -z "${last_was_rescue:-}" ] \
     && [ -n "${last_seglog:-}" ] \
     && [ "$done_n" -eq "${last_launch_done:--1}" ] \
     && grep -aq "pipeline fit (train+val epochs + ckpt)" "$last_seglog"; then
    mode="--bleu_only"
  fi
  last_was_rescue=$mode
  last_launch_done=$done_n
  if [ -n "$PROBE" ] && [ -n "${prev_failed:-}" ]; then
    # The tunnel is suspect (previous attempt failed). Probe with a real
    # jitted matmul — not jax.devices(), which passes on tunnels that then
    # wedge the real job (observed 2026-08-20, gen1 rescue_a2) — and keep
    # cooling down until a probe completes. Bounded: after 8 failed probes
    # (~50 min) launch anyway rather than spin forever.
    probes=0
    until timeout "$PROBE_S" bash -c "$PROBE_CMD" >/dev/null 2>&1; do
      probes=$((probes + 1))
      echo "[supervisor] health probe $probes failed/hung — cooldown $COOLDOWN s"
      if [ "$probes" -ge 8 ]; then
        echo "[supervisor] $probes failed probes — launching anyway"
        break
      fi
      sleep "$COOLDOWN"
    done
  fi
  seglog="$OUT/segment_a${attempt}.log"
  last_seglog="$seglog"
  echo "[supervisor] attempt $attempt: epoch $((done_n + 1))/$EPOCHS ${mode:-${resume:-fresh}} -> $seglog"
  DIC_PHASE_TIMES=1 \
  DIC_STALL_TIMEOUT_S=$STALL_S \
  DIC_DRAIN_EVERY_STEPS=$DRAIN_STEPS DIC_DRAIN_SLEEP_S=$DRAIN_SLEEP \
  setsid timeout "$SEG_CAP_S" \
    python "$CHILD" \
    --epochs "$SEG_EPOCHS" --segments 1 $mode $resume $sched $EXTRA --out "$OUT" >"$seglog" 2>&1 &
  pid=$!
  echo "$pid" > "$OUT/segment.pid"   # PID-targeted kill only — never pkill -f
  stalled=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep "$POLL"
    if grep -aq "no progress" "$seglog"; then
      echo "[supervisor] watchdog stall in $seglog — killing pg $pid"
      kill -9 -- -"$pid" 2>/dev/null || kill -9 "$pid" 2>/dev/null
      stalled=1
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  echo "[supervisor] segment rc=$rc stalled=$stalled done=$(completed)/$EPOCHS"
  if [ "$stalled" -eq 1 ] || [ "$rc" -ne 0 ]; then
    prev_failed=1
    sleep "$COOLDOWN"
  else
    prev_failed=""
    sleep "$SETTLE"
  fi
done

# Remove the pid file once no child is live: pid_max is 32768 here, so a
# stale segment.pid can come to name an unrelated recycled process — and
# deadline_guard.sh kills process GROUPS by these files.
rm -f "$OUT/segment.pid"

wall_total=$(grep -ah "^wall: " "$OUT"/segment_a*.log 2>/dev/null |
             awk '{s += $2} END {printf "%.0f", s}')
echo "[supervisor] sum of segment walls: ${wall_total:-?} s (excludes cooldowns)"
