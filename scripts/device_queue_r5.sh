#!/bin/bash
# Round-5 on-chip measurement queue. Everything here is a VERDICT r4
# done-criterion that needs a real-chip number:
#   - hot-swap crossfade round cost, ring + M=8 tiers (Missing #1 (c))
#   - read-side page-concat MAC A/B at headline/B=8192/config-5 (Weak #2)
#   - accuracy gates at HEAD: 1e-5 contract + the shipped 1e-4 HIGH tier
#   - per-fusion floor maps for config-3 (7.1) and config-6 (7.1.4)
# One fresh process per row (bench.py is sync-proof: fetched checksums).
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

note "r5 queue start (HEAD $(git rev-parse --short HEAD))"
for i in $(seq 1 120); do
  if probe; then note "tunnel healthy; draining r5 queue"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

# --- Hot-swap crossfade round cost (VERDICT Missing #1, done-criterion c).
# Emits xfade ms/block + the steady round on the same shapes; vs_baseline
# is the ratio a swap round pays. Ring tier pays it for ceil(960/512)=2
# rounds; the M=8 tier for ONE round.
run_job hotswap-ring 0 python bench.py --pool-hotswap
run_job hotswap-m8   0 python bench.py --pool-hotswap --pool-blocks 8

# --- Read-side page-concat MAC A/B (VERDICT Weak #2): same session,
# fresh baseline rows next to the flagged rows so the comparison is not
# cross-day. Targets the ~0.66 ms/block Ykm term-add/layout line in
# PROFILE_r4_headline.txt.
run_job headline         0 python bench.py --deadline 900
run_job headline-concat  0 env AIRWAVE_PAGED_MAC_CONCAT=1 python bench.py --deadline 900
run_job b8192            0 python bench.py --batch 8192
run_job b8192-concat     0 env AIRWAVE_PAGED_MAC_CONCAT=1 python bench.py --batch 8192
run_job config5          0 python bench.py --hrir-seconds 1.0 --batch 8192
run_job config5-concat   0 env AIRWAVE_PAGED_MAC_CONCAT=1 python bench.py --hrir-seconds 1.0 --batch 8192

# --- Steady serving rows at HEAD (stream_pool grew xfade plumbing +
# batched attach resets this round; prove steady state didn't move).
run_job pool     0 python bench.py --pool
run_job pool-m8  0 python bench.py --pool --pool-blocks 8

# --- Accuracy gates at HEAD on-chip: the 1e-5 contract, and the newly
# SHIPPED 1e-4 HIGH tier (docs/architecture.md "Precision tiers").
run_job acc-plain    0 python scripts/validate_accuracy.py
run_job acc-pool     0 python scripts/validate_accuracy.py --pool
run_job acc-high-1e4 0 env AIRWAVE_MATMUL_PRECISION=high python scripts/validate_accuracy.py --contract 1e-4

note "r5 queue: profiles (config-3 / config-6 floor maps, VERDICT #7)"
timeout 1500 python scripts/profile_chain.py --speakers 8 --batch 8192 \
  > PROFILE_r5_config3.txt 2>&1 && note "OK profile-config3" || note "FAIL profile-config3"
timeout 1500 python scripts/profile_chain.py --speakers 12 --batch 8192 \
  > PROFILE_r5_config6.txt 2>&1 && note "OK profile-config6" || note "FAIL profile-config6"

note "r5 queue drain done"
