#!/bin/bash
# Round-4 post-proxy chip queue: runs the remaining chip jobs in priority
# order once the LUNA-proxy driver (run_guarded.sh pid in /tmp/proxy.pid)
# exits. Each stage is individually time-bounded (real-TPU compiles go
# through a remote service at 3-25 min per train step, so the bounds are
# generous) and the round end simply truncates the tail of the queue.
# Every stage writes its result straight into artifacts/ so the driver's
# end-of-round auto-commit captures whatever completed.
set -u
cd /root/repo
LOG=/tmp/r4_queue.log
say() { echo "[r4q $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

PROXY_PID=$(cat /tmp/proxy.pid 2>/dev/null || echo "")
if [ -n "$PROXY_PID" ]; then
  say "waiting for proxy pid $PROXY_PID"
  while [ -d "/proc/$PROXY_PID" ]; do sleep 30; done
fi
say "proxy done; starting chip queue"

# 0. missed-GT rank audit over the proxy CV predictions (CPU only, fast)
say "missed-GT audit"
timeout 900 python scripts_dev/audit_missed.py \
  /tmp/luna_proxy/models/Task916_LunaProxy/RetinaUNetV001/cpm_predictions.csv \
  /tmp/luna_proxy/raw/annotations.csv \
  /root/repo/artifacts/luna_proxy_missed_audit.json > /tmp/r4_audit.log 2>&1
say "audit exit $? ($(tail -1 /tmp/r4_audit.log 2>/dev/null | head -c 120))"

# 1. inference bench: plain + deployment point (5 folds x 8-way TTA)
say "bench infer plain"
timeout 2400 python bench.py --mode infer > /tmp/r4_bench_infer.json 2>/tmp/r4_bench_infer.err \
  && cp /tmp/r4_bench_infer.json artifacts/bench_infer_r04.json
say "infer: $(grep -h '"metric"' /tmp/r4_bench_infer.json | tail -1)"
say "bench infer 5-fold x TTA"
timeout 3000 python bench.py --mode infer --tta --models 5 \
  > /tmp/r4_bench_infer_deploy.json 2>/tmp/r4_bench_infer_deploy.err \
  && cp /tmp/r4_bench_infer_deploy.json artifacts/bench_infer_deploy_r04.json
say "deploy: $(grep -h '"metric"' /tmp/r4_bench_infer_deploy.json | tail -1)"

# 2. train bench A/B: two_pass (default) vs one_pass_head (short probes)
say "bench train two_pass"
timeout 2400 python bench.py --steps 40 --patch 96 128 128 \
  > /tmp/r4_bench_two_pass.json 2>/tmp/r4_bench_two_pass.err \
  && cp /tmp/r4_bench_two_pass.json artifacts/bench_train_two_pass_r04.json
say "bench train one_pass_head"
timeout 2400 python bench.py --steps 40 --patch 96 128 128 --in_stats one_pass_head \
  > /tmp/r4_bench_head.json 2>/tmp/r4_bench_head.err \
  && cp /tmp/r4_bench_head.json artifacts/bench_train_one_pass_head_r04.json
say "A/B two_pass: $(grep -h '"metric"' /tmp/r4_bench_two_pass.json | tail -1)"
say "A/B head:     $(grep -h '"metric"' /tmp/r4_bench_head.json | tail -1)"

# 3. hollow_square confirmation: TOY_NUM_TRAIN=24
say "toy accept TOY_NUM_TRAIN=24 (hollow confirmation)"
TOY_NUM_TRAIN=24 TOY_OUT=/root/repo/artifacts/toy_accept_train24.json \
  timeout 5400 python scripts_dev/toy_accept.py > /tmp/r4_toy24.log 2>&1
say "toy24 exit $?"

# 4. endurance: reference-scale schedule, resume-safe, runs until round end
say "endurance (until round end)"
bash scripts_dev/run_guarded.sh -t 85 -- python scripts_dev/endurance.py \
  > /tmp/r4_endurance.log 2>&1
say "queue complete"
