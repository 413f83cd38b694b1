#!/bin/bash
# Round-5 chip queue: endurance -> train-bench A/Bs -> 5-fold proxy campaign.
# Serializes EVERYTHING that touches the chip (and keeps the host quiet
# during benches — VERDICT r4 hygiene item).
set -u
REPO=/root/repo
cd "$REPO"
LOG=/tmp/r5_queue.log
exec >> "$LOG" 2>&1

END_GUARD=${1:-0}
echo "[queue $(date +%H:%M:%S)] waiting for endurance (guard $END_GUARD)"
while [ ! -f "$REPO/artifacts/endurance.json" ]; do
  if [ "$END_GUARD" = "0" ] || ! kill -0 "$END_GUARD" 2>/dev/null; then
    echo "[queue] endurance guard gone; proceeding"
    break
  fi
  sleep 60
done
echo "[queue $(date +%H:%M:%S)] chip free; bench A/B block"

run_bench() {
  local name=$1; shift
  echo "[queue $(date +%H:%M:%S)] bench $name: $*"
  timeout 1500 python bench.py "$@" > "/tmp/r5_bench_${name}.json" 2> "/tmp/r5_bench_${name}.err"
  echo "[queue] $name -> $(tail -1 /tmp/r5_bench_${name}.json 2>/dev/null | head -c 400)"
}

# 1. regression point: defaults (two_pass), same as BENCH_r04 protocol
run_bench baseline --steps 60
# 2. plane-stratified IN stats, stride 4 and 8
run_bench plane4 --steps 60 --in_stats plane_sub:4
run_bench plane8 --steps 60 --in_stats plane_sub:8
# 3. TPU-native RNG for the augmentation stream
run_bench rbg --steps 60 --prng rbg
# 4. combo only when both individual levers beat baseline (each bench pays
#    a 10-14 min uncached remote compile; don't spend one on a dead combo)
if python - << 'EOF'
import json, sys
def v(n):
    try:
        return json.loads(open(f"/tmp/r5_bench_{n}.json").read().strip().splitlines()[-1])["value"]
    except Exception:
        return 0.0
sys.exit(0 if v("plane4") > v("baseline") and v("rbg") > v("baseline") else 1)
EOF
then
  run_bench plane4_rbg --steps 60 --in_stats plane_sub:4 --prng rbg
else
  echo "[queue] skipping combo bench (levers did not both beat baseline)"
fi

# 5. deploy-point inference: 5-model x 8-TTA, uncontended (VERDICT r4 #4).
#    The fold-vmapped fused path makes this one compile + one device call
#    chain per tile batch for all five folds.
run_bench infer_deploy --mode infer --tta --models 5
cp /tmp/r5_bench_infer_deploy.json "$REPO/artifacts/bench_infer_deploy_r05.json" 2>/dev/null
# single-model no-TTA point for continuity with r4
run_bench infer_single --mode infer
cp /tmp/r5_bench_infer_single.json "$REPO/artifacts/bench_infer_r05.json" 2>/dev/null

echo "[queue $(date +%H:%M:%S)] bench block done; launching campaign"
bash scripts_dev/r5_campaign.sh 0
