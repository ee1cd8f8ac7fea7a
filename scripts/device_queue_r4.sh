#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 task 1): re-validate and
# re-measure the half-window redesign at HEAD across every tier/config.
# Appends one line per job to DEVICE_QUEUE_r4.log (same pattern as r3).
# Run from /root/repo. Each job is a fresh process; generous timeouts,
# never SIGKILL mid-dispatch (timeout sends SIGTERM first).
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

note "watcher start (round-4 half-window matrix, HEAD $(git rev-parse --short HEAD))"

# tunnel probe: a tiny fetched checksum
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
print(float((x@x.T).sum()))" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then note "tunnel healthy; draining round-4 queue"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

# --- on-device accuracy (quick, unblocks every claim) ---
run_job acc-plain    python scripts/validate_accuracy.py
run_job acc-pool     python scripts/validate_accuracy.py --pool
run_job acc-pool-g2  python scripts/validate_accuracy.py --pool --pool-groups 2
run_job acc-m4       python scripts/validate_accuracy.py --blocks-per-step 4

# --- headline + B sweep ---
run_job headline         python bench.py
run_job headline-b8192   python bench.py --batch 8192
run_job live-single      python bench.py --blocks-per-step 1 --batch 8192

# --- serving tiers ---
run_job pool             python bench.py --pool
run_job pool-b16384      python bench.py --pool --batch 16384
run_job pool-blocks8     python bench.py --pool --pool-blocks 8
run_job pool-b8-b16384   python bench.py --pool --pool-blocks 8 --batch 16384
run_job pool-g4          python bench.py --pool --pool-groups 4
run_job het-pool-g4      python bench.py --pool --pool-groups 4 --hrir-seconds 0.09,0.25,0.5,0.09
run_job het-pool-b8-g4   python bench.py --pool --pool-blocks 8 --pool-groups 4 --hrir-seconds 0.09,0.25,0.5,0.09
run_job pool-ragged      python bench.py --pool --pool-active-fraction 0.875

# --- configs ---
run_job config5          python bench.py --hrir-seconds 1.0 --batch 8192
run_job config5-b16384   python bench.py --hrir-seconds 1.0 --batch 16384
run_job config3          python bench.py --speakers 8 --batch 4096
run_job config6          python bench.py --speakers 12 --batch 8192

# --- M knee re-measure (M=16 was rejected when analysis cost 2x) ---
run_job m16              python bench.py --blocks-per-step 16

note "round-4 queue drain done"

# (pallas jobs ran 04:09-04:13 at d706661 and are logged; the kernel
# and its bench/validate flags were retired at 60be625 — do not re-run.)

# --- floor-map re-profile + planner-vs-measured HBM (VERDICT r3 #1/#5) ---
# Full per-fusion tables go to PROFILE_r4_*.txt; the log gets the JSON tail.
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
note "profile addendum drain done"

# --- tier knee: M=2/M=4 fill the latency/throughput tradeoff table ---
run_job pool-blocks2     python bench.py --pool --pool-blocks 2
run_job pool-blocks4     python bench.py --pool --pool-blocks 4
note "tier-knee addendum drain done"

# --- re-measure config5-b16384 after the ladder reorder (expects the
# half-batch split rung ~20k, was 2.8k on the M=2 rung) ---
run_job config5-b16384-v2 python bench.py --hrir-seconds 1.0 --batch 16384
note "ladder-fix addendum drain done"
