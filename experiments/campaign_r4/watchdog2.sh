#!/bin/bash
# Round-4 on-chip measurement campaign watchdog, v2.
#
# Supersedes watchdog.sh (same polling loop, fixed rc reporting) and adds
# the auto-retune step: after the two ladders land, apply_tuning.py
# rewrites the kernel constants on >=5% measured wins, so every later
# stage — and the driver's own end-of-round bench.py — runs with the
# winners even if nobody is at the keyboard when the tunnel answers.
#
# Launch:  nohup bash experiments/campaign_r4/watchdog2.sh &
# Status:  tail experiments/campaign_r4/watchdog.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DIR=experiments/campaign_r4
mkdir -p "$DIR"
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

echo "$(date -u +%FT%TZ) watchdog v2 armed (pid $$)" >> "$LOG"
until probe; do
  rc=$?
  echo "$(date -u +%FT%TZ) tunnel down (probe rc=$rc)" >> "$LOG"
  sleep 150
done
echo "$(date -u +%FT%TZ) tunnel UP — campaign starts" >> "$LOG"

run_step() {
  local name="$1" budget="$2"
  echo "$(date -u +%FT%TZ) === $name ===" >> "$LOG"
  timeout "$budget" python "experiments/$name.py" > "$DIR/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) $name rc=$rc" >> "$LOG"
}

run_step kernel_parity 900
run_step train_bwd_ladder 1800
run_step rows_ladder 1800

echo "$(date -u +%FT%TZ) === apply_tuning ===" >> "$LOG"
python experiments/apply_tuning.py --apply --dir "$DIR" \
  > "$DIR/apply_tuning.log" 2>&1
echo "$(date -u +%FT%TZ) apply_tuning rc=$?" >> "$LOG"

run_step serving_profile 1200
run_step batched_dot_probe 1200
run_step direct_profile 2400
run_step serving_check 900
run_step e2e_train_check 1200
echo "$(date -u +%FT%TZ) === end_to_end example ===" >> "$LOG"
timeout 2400 python examples/end_to_end.py > "$DIR/end_to_end.log" 2>&1
echo "$(date -u +%FT%TZ) end_to_end rc=$?" >> "$LOG"
echo "$(date -u +%FT%TZ) === bench.py ===" >> "$LOG"
timeout 3000 python bench.py > "$DIR/bench.stdout.json" 2> "$DIR/bench.stderr.log"
echo "$(date -u +%FT%TZ) bench rc=$?" >> "$LOG"
echo "$(date -u +%FT%TZ) campaign COMPLETE" >> "$LOG"
touch "$DIR/DONE"
