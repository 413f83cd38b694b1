#!/bin/bash
# RSS-guarded restart wrapper for long resume-safe runs on the axon tunnel.
#
# The axon tunnel client leaks every host->device transfer buffer (measured
# round 2, docs/roadmap.md), so any multi-hour single process eventually
# OOMs the host. Every long-running driver in this repo (luna_proxy.py,
# toy_accept.py, nndet_train --resume) is resume-safe at epoch/stage
# granularity, which makes the fix mechanical: run the command, kill it when
# its RSS crosses the threshold, rerun until it exits 0.
#
# Usage:
#   scripts_dev/run_guarded.sh [-t rss_gb] [-n max_attempts] -- CMD [ARGS...]
# Example:
#   scripts_dev/run_guarded.sh -t 85 -- python scripts_dev/luna_proxy.py

THRESH_GB=85
MAX_ATTEMPTS=15
while getopts "t:n:" opt; do
  case $opt in
    t) THRESH_GB=$OPTARG ;;
    n) MAX_ATTEMPTS=$OPTARG ;;
    *) exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ "$1" = "--" ] && shift
[ $# -ge 1 ] || { echo "usage: run_guarded.sh [-t rss_gb] [-n attempts] -- CMD..." >&2; exit 2; }

THRESH_KB=$((THRESH_GB * 1024 * 1024))
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "[run_guarded] attempt $attempt: $*" >&2
  "$@" &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    rss=$(awk '/VmRSS/{print $2}' "/proc/$pid/status" 2>/dev/null || echo 0)
    if [ "${rss:-0}" -gt "$THRESH_KB" ]; then
      echo "[run_guarded] RSS ${rss}kB > ${THRESH_GB}GB; restarting" >&2
      kill "$pid"
      sleep 15
    fi
  done
  wait "$pid"
  code=$?
  if [ "$code" -eq 0 ]; then
    echo "[run_guarded] completed after $attempt attempt(s)" >&2
    exit 0
  fi
  echo "[run_guarded] exit code $code; rerunning (resume-safe)" >&2
  sleep 10
done
echo "[run_guarded] gave up after $MAX_ATTEMPTS attempts" >&2
exit 1
