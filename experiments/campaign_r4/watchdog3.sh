#!/bin/bash
# Round-4 watchdog, v3: the tunnel died again mid-afternoon (last answer
# 13:46Z, hung by 15:10Z — same init-hang mode as the round-3 outage).
# This run covers what v2's pass could not: the fixed two-K estimator,
# the 64M-VMEM ROWS=1088 spatial serving cell, and the train-kernel
# ablation that decides the temporal MFU work.
#
# Launch:  nohup bash experiments/campaign_r4/watchdog3.sh &
# Status:  tail experiments/campaign_r4/watchdog.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DIR=experiments/campaign_r4
LOG="$DIR/watchdog.log"
echo $$ > "$DIR/watchdog.pid"

probe() {
  timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import sys
import jax
d = jax.devices()[0]
print("probe:", d, d.platform, flush=True)
sys.exit(0 if d.platform != "cpu" else 1)
EOF
}

echo "$(date -u +%FT%TZ) watchdog v3 armed (pid $$)" >> "$LOG"
until probe; do
  rc=$?
  echo "$(date -u +%FT%TZ) tunnel down (probe rc=$rc)" >> "$LOG"
  sleep 150
done
echo "$(date -u +%FT%TZ) tunnel UP — v3 campaign starts" >> "$LOG"

run_step() {
  local name="$1" budget="$2"
  echo "$(date -u +%FT%TZ) === $name ===" >> "$LOG"
  timeout "$budget" python "experiments/$name.py" > "$DIR/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) $name rc=$rc" >> "$LOG"
}

run_step kernel_parity 900
run_step rows_ladder 2400
run_step train_kernel_ablation 2400
run_step temporal_train_split 1200
echo "$(date -u +%FT%TZ) === bench.py ===" >> "$LOG"
timeout 3000 python bench.py > "$DIR/bench.stdout.json" 2> "$DIR/bench.stderr.log"
echo "$(date -u +%FT%TZ) bench rc=$?" >> "$LOG"
echo "$(date -u +%FT%TZ) v3 campaign COMPLETE" >> "$LOG"
touch "$DIR/DONE3"
