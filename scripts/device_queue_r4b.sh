#!/bin/bash
# Round-4 addendum queue (the jobs appended to device_queue_r4.sh after
# launch — bash had buffered the original script, so they never ran).
set -u
cd /root/repo
LOG=DEVICE_QUEUE_r4.log
ts() { date +%H:%M:%S; }
note() { echo "$(ts) $*" >> "$LOG"; }

run_job() {
  local name="$1"; shift
  note "START $name"
  local out rc
  out=$(timeout --signal=TERM --kill-after=60 900 "$@" 2>/dev/null | tail -1)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    note "OK $name $out"
  else
    note "FAIL $name rc=$rc ${out:0:200}"
  fi
}

note "addendum watcher start (HEAD $(git rev-parse --short HEAD))"
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
print(float((x@x.T).sum()))" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then note "tunnel healthy; draining addendum queue"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

# re-measure config5-b16384 after the ladder reorder (expect the
# half-batch split rung ~20k; the old order shipped 2.8k on M=2)
run_job config5-b16384-v2 python bench.py --hrir-seconds 1.0 --batch 16384

# tier knee: M=2/M=4 fill the latency/throughput tradeoff table
run_job pool-blocks2     python bench.py --pool --pool-blocks 2
run_job pool-blocks4     python bench.py --pool --pool-blocks 4

# (pallas jobs ran 04:09-04:13 at d706661 and are logged; the kernel
# and its bench/validate flags were retired at 60be625 — do not re-run.)

# floor-map re-profile + planner-vs-measured HBM
note "START profile-headline"
timeout --signal=TERM --kill-after=60 900 python scripts/profile_chain.py \
  --batch 8192 --blocks-per-step 8 > PROFILE_r4_headline.txt 2>/dev/null \
  && note "OK profile-headline $(tail -1 PROFILE_r4_headline.txt)" \
  || note "FAIL profile-headline rc=$?"
note "START profile-pool"
timeout --signal=TERM --kill-after=60 900 python scripts/profile_chain.py \
  --batch 8192 --pool > PROFILE_r4_pool.txt 2>/dev/null \
  && note "OK profile-pool $(tail -1 PROFILE_r4_pool.txt)" \
  || note "FAIL profile-pool rc=$?"
run_job hbm-pool         python scripts/measure_pool_hbm.py --batch 2048
run_job hbm-pool-m8      python scripts/measure_pool_hbm.py --batch 1024 --blocks-per-step 8

note "addendum queue drain done"
