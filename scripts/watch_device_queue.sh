#!/bin/bash
# Probe the TPU tunnel every 5 minutes; when the execute path is healthy
# (a fetched checksum returns), drain the pending on-chip measurement
# queue (heterogeneous grouped-pool numbers) into DEVICE_QUEUE_r3.log.
# Detach with: nohup scripts/watch_device_queue.sh & echo $! > /tmp/dq.pid
set -u
cd /root/repo
LOG=DEVICE_QUEUE_r3.log
export PYTHONPATH=/root/.axon_site:/root/repo

probe() {
  timeout 180 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
v = float((x @ x).sum())
assert v == 128.0 * 128 * 128
EOF
}

run() {
  local tag="$1"; shift
  echo "$(date +%H:%M:%S) START $tag" >> "$LOG"
  out=$(timeout 1200 "$@" 2>&1)
  rc=$?
  json=$(echo "$out" | grep -E '^\{' | tail -1)
  if [ $rc -eq 0 ] && [ -n "$json" ]; then
    echo "$(date +%H:%M:%S) OK $tag $json" >> "$LOG"
  else
    echo "$(date +%H:%M:%S) FAIL($rc) $tag :: $(echo "$out" | tail -3 | tr '\n' ' | ')" >> "$LOG"
  fi
}

echo "$(date +%H:%M:%S) watcher start (het-grouped queue, session $(date +%F))" >> "$LOG"
n=0
while true; do
  if probe; then
    echo "$(date +%H:%M:%S) tunnel healthy; draining het-grouped queue" >> "$LOG"
    run het-pool-g4       python bench.py --pool --pool-groups 4 --hrir-seconds 0.09,0.25,0.5,0.09
    run het-pool-b8-g4    python bench.py --pool --pool-blocks 8 --pool-groups 4 --hrir-seconds 0.09,0.25,0.5,0.09
    run het-acc-pool-g2   python scripts/validate_accuracy.py --pool --pool-groups 2 --hrir-seconds 0.05,0.25
    echo "$(date +%H:%M:%S) het-grouped queue drain done" >> "$LOG"
    break
  fi
  n=$((n+1))
  echo "$(date +%H:%M:%S) wedged ($n)" >> "$LOG"
  sleep 300
done
