#!/bin/bash
# Progress watchdog for resume-safe chip runs under run_guarded.sh.
#
# The axon tunnel can drop an in-flight device call, leaving the client
# blocked on a futex forever (observed round 5: endurance stalled 2 h at
# epoch 35 with zero CPU). run_guarded.sh only restarts on RSS or exit, so a
# hang needs an external nudge: this watchdog kills the guard's CHILD (by
# PID read from /proc — never by name pattern) when the progress file stops
# advancing, and the guard's retry loop resumes the run.
#
# Usage: stall_watchdog.sh GUARD_PID PROGRESS_PATH [STALL_MIN] [GRACE_MIN]
#   PROGRESS_PATH  file OR directory; for a directory the newest mtime in
#                  the tree counts as progress (per-case/per-epoch outputs)
#   STALL_MIN  minutes without a progress mtime bump => hang (default 20)
#   GRACE_MIN  minutes a fresh child gets before the rule applies (default 35,
#              covering the 10-14 min remote first-compile)
set -u
GUARD=$1; PROG=$2; STALL=${3:-20}; GRACE=${4:-35}

last_mtime() {
  if [ -d "$1" ]; then
    find "$1" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
  elif [ -f "$1" ]; then
    stat -c %Y "$1"
  fi
}

while kill -0 "$GUARD" 2>/dev/null; do
  sleep 120
  child=$(cat "/proc/$GUARD/task/$GUARD/children" 2>/dev/null | awk '{print $1}')
  [ -n "${child:-}" ] || continue
  # child age (seconds): from its /proc dir birth
  started=$(stat -c %Y "/proc/$child" 2>/dev/null) || continue
  now=$(date +%s)
  age=$(( now - started ))
  [ "$age" -lt $(( GRACE * 60 )) ] && continue
  m=$(last_mtime "$PROG")
  [ -n "${m:-}" ] || continue
  prog_age=$(( now - m ))
  if [ "$prog_age" -gt $(( STALL * 60 )) ]; then
    echo "[watchdog $(date +%H:%M:%S)] child $child stalled (${prog_age}s since progress); killing" >&2
    kill "$child" 2>/dev/null
    sleep 60   # let the guard restart before re-checking
  fi
done
echo "[watchdog] guard $GUARD gone; exiting" >&2
