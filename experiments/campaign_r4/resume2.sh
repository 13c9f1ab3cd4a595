#!/bin/bash
# Round-4 campaign tail: the stages the dead watchdog never reached.
# Waits for any existing TPU job (pid in $1) to exit, then runs the
# remaining measurement stages serially. Logs land next to this script.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DIR=experiments/campaign_r4
LOG="$DIR/resume2.log"
echo "$(date -u +%FT%TZ) resume2 armed (pid $$)" >> "$LOG"

if [ "${1:-}" != "" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

run_step() {
  local name="$1" budget="$2"; shift 2
  echo "$(date -u +%FT%TZ) === $name ===" >> "$LOG"
  timeout "$budget" python "experiments/$name.py" "$@" > "$DIR/$name.log" 2>&1
  echo "$(date -u +%FT%TZ) $name rc=$?" >> "$LOG"
}

run_step rows_ladder 2400 2 3
run_step direct_profile 2400
run_step serving_check 1200
run_step e2e_train_check 1500
echo "$(date -u +%FT%TZ) resume2 COMPLETE" >> "$LOG"
touch "$DIR/RESUME2_DONE"
