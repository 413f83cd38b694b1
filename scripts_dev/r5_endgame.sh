#!/bin/bash
# Round-5 endgame: wait for the CV campaign to release the chip (or the
# wall-clock deadline), then run the deploy-point + single-model inference
# benches exclusively and snapshot partial campaign scores. Safety net: runs
# unattended so the round always ends with committed bench artifacts even if
# the operator session dies.
set -u
REPO=/root/repo
cd "$REPO"
DEADLINE=${R5_DEADLINE:-"17:00"}   # UTC HH:MM, today
LOG=/tmp/r5_endgame.log
exec >> "$LOG" 2>&1

deadline_ts=$(date -d "today $DEADLINE" +%s)
echo "[endgame $(date +%H:%M:%S)] waiting for campaign guard or deadline $DEADLINE"
while true; do
  gpid=$(cat /tmp/proxy_guard.pid 2>/dev/null || echo 0)
  if [ "$gpid" = "0" ] || ! kill -0 "$gpid" 2>/dev/null; then
    echo "[endgame $(date +%H:%M:%S)] campaign guard gone"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline_ts" ]; then
    echo "[endgame $(date +%H:%M:%S)] deadline hit; stopping campaign (resume-safe)"
    kill "$(cat /tmp/watchdog_proxy.pid 2>/dev/null)" 2>/dev/null
    kill "$gpid" 2>/dev/null
    sleep 2
    # the guard's child python (known cmdline, single instance) — find via
    # the guard's process group rather than pattern-kill
    for child in $(ls /proc/ 2>/dev/null | grep -E '^[0-9]+$'); do
      ppid=$(awk '/^PPid/{print $2}' /proc/$child/status 2>/dev/null || echo "")
      [ "$ppid" = "$gpid" ] && kill "$child" 2>/dev/null
    done
    sleep 10
    break
  fi
  sleep 60
done

# toy-accept gate may still hold the chip; give it a bounded grace window
tpid=$(cat /tmp/toy_plane8.pid 2>/dev/null || echo 0)
for i in $(seq 1 20); do
  [ "$tpid" = "0" ] || ! kill -0 "$tpid" 2>/dev/null && break
  echo "[endgame] toy gate still running ($i/20)"
  sleep 60
done

echo "[endgame $(date +%H:%M:%S)] snapshotting partial campaign scores"
timeout 1200 python scripts_dev/score_partial.py --allow-incomplete || true

echo "[endgame $(date +%H:%M:%S)] deploy-point inference bench (5 models x 8 TTA)"
timeout 2400 python bench.py --mode infer --tta --models 5 \
  > /tmp/r5_bench_infer_deploy.json 2> /tmp/r5_bench_infer_deploy.err \
  && cp /tmp/r5_bench_infer_deploy.json artifacts/bench_infer_deploy_r05.json
echo "[endgame] deploy -> $(tail -1 /tmp/r5_bench_infer_deploy.json 2>/dev/null | head -c 300)"

echo "[endgame $(date +%H:%M:%S)] single-model inference bench"
timeout 1500 python bench.py --mode infer \
  > /tmp/r5_bench_infer_single.json 2> /tmp/r5_bench_infer_single.err \
  && cp /tmp/r5_bench_infer_single.json artifacts/bench_infer_r05.json
echo "[endgame] single -> $(tail -1 /tmp/r5_bench_infer_single.json 2>/dev/null | head -c 300)"

echo "[endgame $(date +%H:%M:%S)] exclusive default train bench (plane_sub:8 default)"
timeout 1500 python bench.py --steps 60 \
  > /tmp/r5_bench_train_default.json 2> /tmp/r5_bench_train_default.err \
  && cp /tmp/r5_bench_train_default.json artifacts/bench_train_r05_default_exclusive.json
echo "[endgame] train -> $(tail -1 /tmp/r5_bench_train_default.json 2>/dev/null | head -c 300)"

cd "$REPO"
git add artifacts/ 2>/dev/null
git commit -m "Round-5 endgame artifacts: deploy/single inference benches, partial CV scores" 2>/dev/null || true
echo "[endgame $(date +%H:%M:%S)] done"
