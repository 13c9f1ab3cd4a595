#!/bin/bash
# Round-4 on-chip measurement campaign watchdog.
#
# Polls the axon TPU tunnel (down again at round-4 start, same failure mode
# as the round-3 outage: backend init hangs). The moment a device answers
# with a non-cpu platform, runs the measurement sequence from
# experiments/campaign_r3/README.md and lands every log here.
#
# Launch:  nohup bash experiments/campaign_r4/watchdog.sh &
# Status:  tail experiments/campaign_r4/watchdog.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DIR=experiments/campaign_r4
mkdir -p "$DIR"
LOG="$DIR/watchdog.log"

probe() {
  timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import sys
import jax
d = jax.devices()[0]
print("probe:", d, d.platform, flush=True)
sys.exit(0 if d.platform != "cpu" else 1)
EOF
}

echo "$(date -u +%FT%TZ) watchdog armed (pid $$)" >> "$LOG"
until probe; do
  echo "$(date -u +%FT%TZ) tunnel down (probe rc=$?)" >> "$LOG"
  sleep 150
done
echo "$(date -u +%FT%TZ) tunnel UP — campaign starts" >> "$LOG"

run_step() {
  local name="$1" budget="$2"
  echo "$(date -u +%FT%TZ) === $name ===" >> "$LOG"
  timeout "$budget" python "experiments/$name.py" > "$DIR/$name.log" 2>&1
  echo "$(date -u +%FT%TZ) $name rc=$?" >> "$LOG"
}

run_step kernel_parity 900
run_step train_bwd_ladder 1800
run_step serving_profile 1200
run_step batched_dot_probe 1200
run_step rows_ladder 1800
run_step direct_profile 2400
run_step serving_check 900
run_step e2e_train_check 1200
echo "$(date -u +%FT%TZ) === end_to_end example ===" >> "$LOG"
timeout 2400 python examples/end_to_end.py > "$DIR/end_to_end.log" 2>&1
echo "$(date -u +%FT%TZ) end_to_end rc=$?" >> "$LOG"
echo "$(date -u +%FT%TZ) === bench.py ===" >> "$LOG"
timeout 2400 python bench.py > "$DIR/bench.stdout.json" 2> "$DIR/bench.stderr.log"
echo "$(date -u +%FT%TZ) bench rc=$?" >> "$LOG"
echo "$(date -u +%FT%TZ) campaign COMPLETE" >> "$LOG"
