#!/bin/bash
# Round-4d addendum: the opt-in FAST MODE measured at HEAD. The
# precision ladder (DEFAULT 4.9e-3 / HIGH 4.2e-5 / HIGHEST 1.5e-7) was
# measured in round 1 on the pre-half-window chain; the documented
# opt-in (`AIRWAVE_MATMUL_PRECISION=default`, README "bf16 is opt-in
# fast mode only") has had no current number since. These rows are
# NOT headline candidates — bench.py stamps them matmul_precision +
# accuracy_contract=false — they answer "what does a user who accepts
# bf16-pass accuracy get at HEAD?".
set -u
cd /root/repo
LOG=DEVICE_QUEUE_r4.log
export PYTHONPATH=/root/.axon_site:/root/repo
ts() { date +%H:%M:%S; }
note() { echo "$(ts) $*" >> "$LOG"; }

# ok_rcs: space-separated list of acceptable exit codes (validate_accuracy
# exits 1 when over the 1e-5 contract — for a fast-mode row that IS the
# datum being recorded, not a harness failure).
run_job() {
  local name="$1" ok_rcs="$2"; shift 2
  note "START $name"
  local out rc
  out=$(timeout --signal=TERM --kill-after=60 1200 "$@" 2>/dev/null | grep -E '^\{' | tail -1)
  rc=$?
  if [[ " $ok_rcs " == *" $rc "* ]] && [ -n "$out" ]; then
    note "OK $name $out"
  else
    note "FAIL $name rc=$rc ${out:0:200}"
  fi
}

note "r4d fast-mode watcher start (HEAD $(git rev-parse --short HEAD))"
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
print(float((x@x.T).sum()))" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then note "tunnel healthy; draining r4d queue"; break; fi
  note "probe $i failed; sleeping 300s"
  sleep 300
done

# Headline bake at DEFAULT (single bf16 pass per matmul): round 1
# measured 41,767x when HIGHEST ran 22,076x (1.9x). At HEAD HIGHEST is
# 43,724x; how much does dropping 6 passes to 1 buy post-fold?
run_job fast-headline 0 env AIRWAVE_MATMUL_PRECISION=default \
  python bench.py --deadline 900

# The ladder midpoint (HIGH = 3 bf16 passes) at HEAD, for the record.
run_job high-headline 0 env AIRWAVE_MATMUL_PRECISION=high \
  python bench.py --deadline 900

# Fast mode on the multi-block serving tier (the throughput product).
run_job fast-pool-m8 0 env AIRWAVE_MATMUL_PRECISION=default \
  python bench.py --pool --pool-blocks 8 --batch 16384 --deadline 900

# What accuracy does fast mode actually deliver ON DEVICE at HEAD
# (expected ~5e-3; exit 1 = over the strict contract, which is the
# point of the row)?
run_job fast-acc "0 1" env AIRWAVE_MATMUL_PRECISION=default \
  python scripts/validate_accuracy.py

note "r4d queue drain done"
