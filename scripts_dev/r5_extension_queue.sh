#!/bin/bash
# Round-5 accuracy-extension queue: after the in-flight fold-3 extension run
# (guard pid in /tmp/proxy_guard.pid) completes and its rescored pooled CPM
# is committed, chain further fold extensions — folds 2+4, then 0+1 — each
# as its own campaign process so every increment's rescored
# artifacts/luna_proxy.json is committed before the next starts. Unattended
# safety net: the round must end with whatever CPM the clock allowed, banked.
#
# Each run reuses the resume machinery in scripts_dev/luna_proxy.py: deleting
# a fold's .train_done + plan_inference.pkl makes exactly that fold retrain
# (resume from model_last.ckpt to the overrides.json epoch target) and
# re-sweep (run_sweep drops states older than the refreshed checkpoint);
# stage 5-7 then re-consolidate and rescore the pooled CV CPM.
set -u
REPO=/root/repo
cd "$REPO"
M=/tmp/luna_proxy/models/Task916_LunaProxy/RetinaUNetV001
LOG=/tmp/r5_extension.log
exec >> "$LOG" 2>&1
DEADLINE=${R5X_DEADLINE:-"21:00"}   # UTC HH:MM today: no NEW run after this
deadline_ts=$(date -d "today $DEADLINE" +%s)

say() { echo "[ext $(date +%H:%M:%S)] $*"; }

wait_guard() {
  while :; do
    gpid=$(cat /tmp/proxy_guard.pid 2>/dev/null || echo 0)
    if [ "$gpid" = "0" ] || ! kill -0 "$gpid" 2>/dev/null; then break; fi
    sleep 60
  done
}

commit_artifacts() {
  local msg="$1"
  python scripts_dev/audit_missed.py \
    "$M/cpm_predictions.csv" /tmp/luna_proxy/raw/annotations.csv \
    artifacts/luna_proxy_missed_audit.json >/dev/null 2>&1 || true
  git add artifacts/luna_proxy.json artifacts/luna_proxy_partial.json \
    artifacts/luna_proxy_missed_audit.json 2>/dev/null
  git commit -m "$msg" 2>/dev/null && say "committed: $msg" || say "nothing to commit"
}

launch_run() {  # $1 = comma list of folds to extend, $2 = epoch target
  local foldlist="$1" target="$2"
  echo "{\"epochs_rest\": $target, \"swa_rest\": 2, \"steps_rest\": 400}" \
    > /tmp/luna_proxy/overrides.json
  for f in ${foldlist//,/ }; do
    rm -f "$M/fold$f/.train_done" "$M/fold$f/plan_inference.pkl" \
      "$M/fold$f/sweep_results.json"
  done
  rm -rf "$M/consolidated"
  export PROXY_NUM_CASES=125 PROXY_INPLANE=256 PROXY_BATCH=4
  export PROXY_EPOCHS=16 PROXY_STEPS=400 PROXY_SWA=2 PROXY_VAL_STEPS=32
  export PROXY_EPOCHS_REST=16 PROXY_SWA_REST=2 PROXY_STEPS_REST=400
  export PROXY_FOLDS=0,1,2,3,4
  export PROXY_OUT="$REPO/artifacts/luna_proxy.json"
  nohup bash scripts_dev/run_guarded.sh -t 85 -- python scripts_dev/luna_proxy.py \
    > "/tmp/proxy_r5x_$foldlist.log" 2>&1 &
  local guard=$!
  echo $guard > /tmp/proxy_guard.pid
  nohup bash scripts_dev/stall_watchdog.sh "$guard" "$M" 25 40 \
    > "/tmp/watchdog_r5x_$foldlist.log" 2>&1 &
  echo $! > /tmp/watchdog_proxy.pid
  say "launched extension run folds=$foldlist target=$target guard=$guard"
}

say "queue start; deadline $DEADLINE"
# ---- leg 0: the already-running fold-3 extension -------------------------
wait_guard
commit_artifacts "Extend fold 3 (+8 epochs to 24): rescored pooled CV CPM + refreshed audit"

# ---- leg 1: folds 2 + 4 ---------------------------------------------------
if [ "$(date +%s)" -lt "$deadline_ts" ]; then
  launch_run "2,4" 22
  wait_guard
  commit_artifacts "Extend folds 2+4 (+8 epochs to 24): rescored pooled CV CPM + refreshed audit"
else
  say "deadline passed; skipping folds 2,4"
fi

# ---- leg 2: folds 0 + 1 ---------------------------------------------------
if [ "$(date +%s)" -lt "$deadline_ts" ]; then
  launch_run "0,1" 22
  wait_guard
  commit_artifacts "Extend folds 0+1 (+epochs to 24): rescored pooled CV CPM + refreshed audit"
else
  say "deadline passed; skipping folds 0,1"
fi

say "queue done"
