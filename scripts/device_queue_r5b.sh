#!/bin/bash
# Round-5 re-drain: the two rows the first queue lost —
#   - hotswap-ring (first attempt hit a tunnel readback wedge)
#   - profile-config6 (queue process died mid-run)
set -u
cd /root/repo
LOG=DEVICE_QUEUE_r5.log
export PYTHONPATH=/root/.axon_site:/root/repo
ts() { date +%H:%M:%S; }
note() { echo "$(ts) $*" >> "$LOG"; }

run_job() {
  local name="$1" ok_rcs="$2"; shift 2
  note "START $name"
  local out rc
  out=$(timeout --signal=TERM --kill-after=60 1500 "$@" 2>/dev/null | grep -E '^\{' | tail -1)
  rc=$?
  if [[ " $ok_rcs " == *" $rc "* ]] && [ -n "$out" ]; then
    note "OK $name $out"
  else
    note "FAIL $name rc=$rc ${out:0:200}"
  fi
}

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
print(float((x@x.T).sum()))" >/dev/null 2>&1
}

note "r5b re-drain start (HEAD $(git rev-parse --short HEAD))"
for i in $(seq 1 24); do
  if probe; then note "tunnel healthy; draining r5b"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

run_job hotswap-ring 0 python bench.py --pool-hotswap
timeout 1500 python scripts/profile_chain.py --speakers 12 --batch 8192 \
  > PROFILE_r5_config6.txt 2>&1 && note "OK profile-config6" || note "FAIL profile-config6"

note "r5b re-drain done"
