#!/bin/bash
# Round-5c: config-6 correction. The 7.1.4 bench request resolved to the
# same 8-speaker render as config-3 (heights drop through hesuvi14), but
# the planner sized for 12 and shipped chunk2/split2 needlessly. Measure:
#   - config6 at the corrected plan (expect ~config-3's number)
#   - a TRUE 12-speaker chain (--synthetic-hrir) as the honest 7.1.4 row
#   - its floor-map profile
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

note "r5c config-6 correction start (HEAD $(git rev-parse --short HEAD))"
for i in $(seq 1 24); do
  if probe; then note "tunnel healthy; draining r5c"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

run_job config6-fixed-plan 0 python bench.py --speakers 12 --batch 8192
run_job config6-true12     0 python bench.py --speakers 12 --synthetic-hrir --batch 8192
timeout 1500 python scripts/profile_chain.py --speakers 12 --synthetic-hrir --batch 8192 \
  > PROFILE_r5_config6.txt 2>&1 && note "OK profile-config6-true12" || note "FAIL profile-config6-true12"

note "r5c drain done"
