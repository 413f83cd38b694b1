#!/bin/bash
# Round-5 chip schedule: wait for the endurance leg to free the chip, then
# run the 5-fold LUNA-proxy campaign (resume-safe) under the RSS guard and
# the stall watchdog. Environment documented in scripts_dev/luna_proxy.py.
set -u
REPO=/root/repo
cd "$REPO"

END_GUARD=${1:-0}   # pid of the endurance run_guarded.sh, 0 = don't wait
echo "[r5] waiting for endurance to finish (artifacts/endurance.json, guard $END_GUARD)"
while [ ! -f "$REPO/artifacts/endurance.json" ]; do
  if [ "$END_GUARD" = "0" ] || ! kill -0 "$END_GUARD" 2>/dev/null; then
    echo "[r5] endurance guard gone / not given; proceeding"
    break
  fi
  sleep 60
done
echo "[r5] chip free at $(date +%H:%M:%S); preparing campaign"

# fold 0 trained 12 epochs in round 4; retrain it deeper this round:
# drop the completion marker and the swept plan so train resumes to the new
# epoch target and the sweep reruns (run_sweep invalidates states older than
# the refreshed checkpoint).
F0=/tmp/luna_proxy/models/Task916_LunaProxy/RetinaUNetV001/fold0
if [ -f "$F0/.train_done" ]; then
  rm -f "$F0/.train_done" "$F0/plan_inference.pkl" "$F0/sweep_results.json"
fi
# consolidated plan (if any) also goes stale once folds retrain
rm -rf /tmp/luna_proxy/models/Task916_LunaProxy/RetinaUNetV001/consolidated

export PROXY_NUM_CASES=125 PROXY_INPLANE=256 PROXY_BATCH=4
export PROXY_EPOCHS=16 PROXY_STEPS=400 PROXY_SWA=2 PROXY_VAL_STEPS=32
export PROXY_EPOCHS_REST=16 PROXY_SWA_REST=2 PROXY_STEPS_REST=400
export PROXY_FOLDS=0,1,2,3,4
export PROXY_OUT="$REPO/artifacts/luna_proxy.json"

nohup bash scripts_dev/run_guarded.sh -t 85 -- python scripts_dev/luna_proxy.py \
  > /tmp/proxy_r5.log 2>&1 &
GUARD=$!
echo $GUARD > /tmp/proxy_guard.pid
echo "[r5] campaign guard pid $GUARD"

nohup bash scripts_dev/stall_watchdog.sh "$GUARD" \
  /tmp/luna_proxy/models/Task916_LunaProxy/RetinaUNetV001 25 40 \
  > /tmp/watchdog_proxy.log 2>&1 &
echo $! > /tmp/watchdog_proxy.pid
echo "[r5] watchdog pid $(cat /tmp/watchdog_proxy.pid)"
