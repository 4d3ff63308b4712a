#!/bin/bash
# Stale-log guard: kill a training segment whose log stopped ADVANCING.
#
# Complements wedge_supervisor.sh's detection, which has two layers:
#   (a) grep the segment log for the in-process StallWatchdog's
#       "no progress" line — covers the train/val loops only, and
#   (b) the hard SEG_CAP_S timeout (50 min at grid scale).
# A tunnel wedge BEFORE the first watchdog poke falls through (a) and
# waits out (b): observed 2026-08-22 06:55 (cosine 15-ep segment a2) —
# the log went silent immediately after "pipeline model init + restore",
# the box sat 100% idle, the tunnel loopback was flat, and no
# "no progress" line ever appeared because fit() had not yet reached its
# first poke. This guard bounds that class at STALL_WRITE_S: if the
# newest segment_a*.log under a watched dir has not been written for
# STALL_WRITE_S seconds while its recorded segment process group is
# alive, kill the group. The supervisor's normal failed-attempt path
# (COOLDOWN + jitted-matmul probe + retry from the last checkpoint)
# takes over — this guard never relaunches anything itself.
#
# STALL_WRITE_S must exceed every HEALTHY silent window of the watched
# protocol. At trial-grid scale (8,091 images, batch 8): epoch lines
# land every ~3.2 min, the 3-draw BLEU leg is silent ~4 min, tracing
# ~2-3 min — 600 s clears all of them. Do NOT use the default against
# combined-scale (199,370-caption) runs, whose in-epoch silent window is
# ~17.5 min — raise STALL_WRITE_S above the epoch wall there.
#
# PID-targeted kills only (CLAUDE.md: never pattern-kill). The pid file
# names a process group (the supervisor's setsid child); to guard
# against pid recycling (pid_max 32768 here) the pid's cmdline must
# contain MATCH before any kill.
#
#   DIRS="runs/trial_grid_15ep/cosine runs/trial_grid_15ep/logspace" \
#   END_TS=$(date -ud '09:45' +%s) \
#   nohup setsid bash scripts/stale_log_guard.sh > runs/stale_guard.log 2>&1 &
set -u
DIRS=${DIRS:?space-separated run dirs (each holding segment.pid)}
STALL_WRITE_S=${STALL_WRITE_S:-600}
POLL=${POLL:-30}
END_TS=${END_TS:-0}                      # exit (0) at this epoch time; 0 = run forever
MATCH=${MATCH:-run_correlated_world}     # pid-recycling safety: cmdline substring

log() { echo "[stale-guard $(date -u '+%m-%d %H:%M:%S')] $*"; }

log "armed: dirs=[$DIRS] stall=${STALL_WRITE_S}s poll=${POLL}s end_ts=$END_TS"
while :; do
  if [ "$END_TS" -gt 0 ] && [ "$(date +%s)" -ge "$END_TS" ]; then
    log "end ts reached — exiting"
    exit 0
  fi
  for d in $DIRS; do
    pf="$d/segment.pid"
    [ -f "$pf" ] || continue
    pid=$(cat "$pf" 2>/dev/null)
    [ -n "$pid" ] || continue
    kill -0 "$pid" 2>/dev/null || continue
    # tr: cmdline is NUL-separated; grep -a treats it as text anyway but
    # normalize so MATCH can span argv boundaries reliably.
    tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -aq "$MATCH" || continue
    seglog=$(ls -t "$d"/segment_a*.log 2>/dev/null | head -1)
    [ -n "$seglog" ] || continue
    age=$(( $(date +%s) - $(stat -c %Y "$seglog") ))
    if [ "$age" -ge "$STALL_WRITE_S" ]; then
      log "silent ${age}s: $seglog — killing pg $pid"
      kill -9 -- -"$pid" 2>/dev/null || kill -9 "$pid" 2>/dev/null
    fi
  done
  sleep "$POLL"
done
