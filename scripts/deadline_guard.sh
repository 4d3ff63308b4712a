#!/bin/bash
# Hard end-of-round deadline guard (VERDICT round-4 next #1b).
#
# Round 4 forfeited its contractual perf number: the driver's round-end
# `bench.py` ran while the builder's own queue still held TPU legs and a
# full CPU pytest on the single core (BENCH_r04.json rc=124). The queue's
# deadline comments were never enforced (`TPU_END_TS` defaulted to 0). This
# guard is the enforcement: ONE absolute deadline by which the box is QUIET.
#
#   T - GRACE_S : drop STOP sentinels so supervisor/grid loops exit cleanly
#                 between legs (graceful path — preferred, keeps artifacts).
#   T           : kill -9 every process GROUP named by a pid file (the
#                 supervisor launches children with setsid, so the group id
#                 is the child pid). PID-targeted only — never pattern kills
#                 (CLAUDE.md: a pattern can match this session itself).
#   T + eps     : verify quiet — every named pid dead, and the tunnel
#                 loopback (127.0.0.1:8092 proxy; CLAUDE.md) moves no bytes
#                 over a QUIET_SAMPLE_S window. Evidence lands in $REPORT.
#
# Usage (launch detached at round start, deadline well before round end):
#   DEADLINE_TS=$(date -ud '19:00' +%s) \
#   nohup setsid bash scripts/deadline_guard.sh > runs/deadline_guard.log 2>&1 &
# Exit: 0 = box verified quiet, 1 = survivors remain (report says who).
set -u
cd "$(dirname "$0")/.."

DEADLINE_TS=${DEADLINE_TS:?absolute epoch seconds when the box must be QUIET}
GRACE_S=${GRACE_S:-600}
STOP_FILES=${STOP_FILES:-runs/trial_grid/STOP runs_combined_v2/STOP runs_combined/STOP}
PID_GLOBS=${PID_GLOBS:-runs/trial_grid/*/segment.pid runs_combined*/segment.pid runs/*/segment.pid runs/*.pid}
REPORT=${REPORT:-runs/quiet_check.json}
QUIET_SAMPLE_S=${QUIET_SAMPLE_S:-10}
POLL=${POLL:-15}

lo_bytes() {  # rx+tx byte counters on the loopback interface. printf %.0f:
  # awk's default %.6g OFMT renders sums >~1e6 in exponential notation
  # ("9.74691e+10" after a day of tunnel traffic), which breaks bash
  # arithmetic — caught by the full-suite run at 16:09 after 48 GB on lo.
  awk '$1 == "lo:" {printf "%.0f", $2 + $10}' /proc/net/dev
}

is_alive() {  # alive and not a zombie (an unreaped child passes kill -0)
  kill -0 "$1" 2>/dev/null || return 1
  [ "$(sed 's/.*) //' "/proc/$1/stat" 2>/dev/null | awk '{print $1}')" != "Z" ]
}

echo "[guard] armed: STOP at $((DEADLINE_TS - GRACE_S)), kill at $DEADLINE_TS (now $(date +%s))"
while [ "$(date +%s)" -lt $((DEADLINE_TS - GRACE_S)) ]; do
  left=$((DEADLINE_TS - GRACE_S - $(date +%s)))
  sleep $((left < 1 ? 1 : (left < POLL ? left : POLL)))
done

for f in $STOP_FILES; do
  mkdir -p "$(dirname "$f")"
  touch "$f"
done
echo "[guard] STOP sentinels dropped: $STOP_FILES"

while [ "$(date +%s)" -lt "$DEADLINE_TS" ]; do
  left=$((DEADLINE_TS - $(date +%s)))
  sleep $((left < 1 ? 1 : (left < POLL ? left : POLL)))
done

killed=""
for pf in $PID_GLOBS; do
  [ -f "$pf" ] || continue
  pid=$(cat "$pf" 2>/dev/null)
  case "$pid" in ''|*[!0-9]*) continue ;; esac
  if is_alive "$pid"; then
    kill -9 -- -"$pid" 2>/dev/null || true
    kill -9 "$pid" 2>/dev/null || true
    killed="$killed $pid"
    echo "[guard] killed pg $pid ($pf)"
  fi
done
sleep 2

survivors=""
for pf in $PID_GLOBS; do
  [ -f "$pf" ] || continue
  pid=$(cat "$pf" 2>/dev/null)
  case "$pid" in ''|*[!0-9]*) continue ;; esac
  if is_alive "$pid"; then survivors="$survivors $pid"; fi
done

b0=$(lo_bytes)
sleep "$QUIET_SAMPLE_S"
b1=$(lo_bytes)
lo_delta=$((b1 - b0))

quiet=true
[ -z "$survivors" ] || quiet=false
mkdir -p "$(dirname "$REPORT")"
printf '{"deadline_ts": %s, "checked_at": %s, "killed": [%s], "survivors": [%s], "lo_bytes_delta_%ss": %s, "quiet": %s}\n' \
  "$DEADLINE_TS" "$(date +%s)" \
  "$(echo "$killed" | tr -s ' ' ',' | sed 's/^,//;s/,$//')" \
  "$(echo "$survivors" | tr -s ' ' ',' | sed 's/^,//;s/,$//')" \
  "$QUIET_SAMPLE_S" "$lo_delta" "$quiet" > "$REPORT"
echo "[guard] quiet=$quiet lo_delta=${lo_delta}B/${QUIET_SAMPLE_S}s survivors:${survivors:-none} -> $REPORT"
[ "$quiet" = true ]
