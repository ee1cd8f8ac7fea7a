#!/bin/bash
# Drain the round-3 on-chip measurement queue (DEVICE_QUEUE_r3.log.README).
# Run with the tunnel healthy; appends one line per measurement to the log.
set -u
cd /root/repo
LOG=DEVICE_QUEUE_r3.log
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  local tag="$1"; shift
  echo "$(date +%H:%M:%S) START $tag" >> "$LOG"
  out=$(timeout 900 "$@" 2>&1)
  rc=$?
  json=$(echo "$out" | grep -E '^\{' | tail -1)
  if [ $rc -eq 0 ] && [ -n "$json" ]; then
    echo "$(date +%H:%M:%S) OK $tag $json" >> "$LOG"
  else
    echo "$(date +%H:%M:%S) FAIL($rc) $tag :: $(echo "$out" | tail -3 | tr '\n' ' | ')" >> "$LOG"
  fi
}

echo "$(date +%H:%M:%S) queue drain start (session $(date +%F))" >> "$LOG"
run pool            python bench.py --pool
run pool-groups4    python bench.py --pool --pool-groups 4
run pool-blocks8    python bench.py --pool --pool-blocks 8
run pool-b8-g4      python bench.py --pool --pool-blocks 8 --pool-groups 4
run acc-pool-g2     python scripts/validate_accuracy.py --pool --pool-groups 2
run headline        python bench.py
echo "$(date +%H:%M:%S) queue drain done" >> "$LOG"
