"""Two-process multihost worker (spawned by test_parallel.py).

Each process owns 4 virtual CPU devices (8 global), joins the
jax.distributed coordinator, builds its HostShardSpec slice of a
deterministic global batch, assembles the globally-sharded input with
make_global_array, runs the stream-sharded chain for a few blocks, and
writes its ADDRESSABLE output rows to disk. The parent test compares the
union of both processes' rows against a single-process reference —
exercising the contiguity assumption in multihost.host_shard_spec across a
real process boundary.

Usage: python _multihost_worker.py COORD NPROC PID OUTDIR
"""

import os
import sys

# Before jax import: 4 virtual CPU devices per process.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GLOBAL_BATCH = 16
S, T, L, N_BLOCKS = 2, 8, 16, 3


def build_inputs():
    """Deterministic global problem — identical on every process."""
    rng = np.random.default_rng(7)
    hrir = (rng.standard_normal((S, 2, L)) * 0.3).astype(np.float32)
    x = (rng.standard_normal((N_BLOCKS, GLOBAL_BATCH, S, T)) * 0.5).astype(
        np.float32
    )
    return hrir, x


def main() -> int:
    coord, nproc, pid, outdir = sys.argv[1:5]
    from airwave_tpu.parallel import mesh as pmesh
    from airwave_tpu.parallel import multihost as mh

    mh.initialize(coordinator_address=coord, num_processes=int(nproc),
                  process_id=int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    from airwave_tpu.models.binaural import ChainState
    from airwave_tpu.ops import eq_block, upols

    from airwave_tpu.io.apo import EqualizerDefinition
    from airwave_tpu.ops import biquad_design as bd

    hrir, x = build_inputs()
    conv_params = upols.make_conv_params(hrir, T, pad_to_pow2=False)
    preamp, coeffs = bd.design_cascade(
        EqualizerDefinition(preamp_db=-3.0), 48_000.0
    )
    eq_params = eq_block.make_eq_params(coeffs, preamp, T)

    mesh = mh.global_mesh()
    spec = mh.host_shard_spec(GLOBAL_BATCH, mesh)

    def make_state():
        return ChainState(
            conv=upols.make_conv_state(GLOBAL_BATCH, S,
                                       conv_params.partition_count, T),
            eq=eq_block.make_eq_state(GLOBAL_BATCH),
        )

    with mesh:
        state = jax.jit(
            make_state, out_shardings=pmesh.chain_state_shardings(mesh)
        )()
    step = pmesh.stream_sharded_step(mesh, transition_length=960,
                                     eq_crossfading=False)

    collected = []
    for i in range(N_BLOCKS):
        xg = mh.make_global_array(x[i][spec.local_slice], spec, mesh)
        state, y = step(conv_params, eq_params, eq_params, state, xg)
        rows = {}
        for shard in y.addressable_shards:
            start = shard.index[0].start or 0
            rows[start] = np.asarray(shard.data)
        collected.append(rows)

    out = {"start": spec.local_start, "count": spec.local_count}
    for i, rows in enumerate(collected):
        for start, data in rows.items():
            out[f"block{i}_row{start}"] = data
    np.savez(os.path.join(outdir, f"out_{pid}.npz"), **{
        k: v for k, v in out.items() if not isinstance(v, int)
    }, start=out["start"], count=out["count"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
