#!/bin/bash
# Round-4c addendum: batch-scaling sweep. The half-window redesign
# halved the carry and the analysis working set, so the batch ceiling
# measured in round 3 (B=32768 "+1.2% for 2x memory") and the config-3/6
# batch choices (B=4096/8192, picked under the full-window footprint)
# are stale — re-sweep the big-B column at HEAD.
set -u
cd /root/repo
LOG=DEVICE_QUEUE_r4.log
export PYTHONPATH=/root/.axon_site:/root/repo
ts() { date +%H:%M:%S; }
note() { echo "$(ts) $*" >> "$LOG"; }

run_job() {
  local name="$1"; shift
  note "START $name"
  local out rc
  out=$(timeout --signal=TERM --kill-after=60 1200 "$@" 2>/dev/null | grep -E '^\{' | tail -1)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    note "OK $name $out"
  else
    note "FAIL $name rc=$rc ${out:0:200}"
  fi
}

note "r4c batch-sweep watcher start (HEAD $(git rev-parse --short HEAD))"
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
print(float((x@x.T).sum()))" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then note "tunnel healthy; draining r4c queue"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

# Headline bake at B=32768 (round 3: 30,532x, +1.2% over 16384 for 2x
# memory — the carry has since halved; does big-B now pay?)
run_job headline-b32768  python bench.py --batch 32768 --deadline 900

# Multi-block serving tier kept scaling 8192 -> 16384 (38.6k -> 41.0k);
# next doubling.
run_job pool-b8-b32768   python bench.py --pool --pool-blocks 8 --batch 32768 --deadline 900

# config-3 (7.1 surround, 8 speakers) ran B=4096 under the full-window
# footprint; config-6 (7.1.4 Atmos, 12 speakers) ran B=8192.
run_job config3-b8192    python bench.py --speakers 8 --batch 8192 --deadline 900
run_job config6-b16384   python bench.py --speakers 12 --batch 16384 --deadline 900

note "r4c queue drain done"
