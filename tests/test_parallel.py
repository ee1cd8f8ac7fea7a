"""Sharded-step tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from airwave_tpu.models.binaural import ChainState
from airwave_tpu.ops import eq_block, upols
from airwave_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _build(batch, S=2, T=64, L=200):
    rng = np.random.default_rng(0)
    hrir = rng.standard_normal((S, 2, L)).astype(np.float32) * 0.2
    conv_params = upols.make_conv_params(hrir, T)
    eq_params = eq_block.unity_eq_params(T, 16)
    state = ChainState(
        conv=upols.make_conv_state(batch, S, conv_params.partition_count, T),
        eq=eq_block.make_eq_state(batch, 2, 16),
    )
    x = rng.standard_normal((batch, S, T)).astype(np.float32)
    return conv_params, eq_params, state, x, hrir


def test_stream_sharded_step_matches_single_device(devices):
    m = pmesh.make_mesh(devices, ("streams",))
    B, T = 16, 64
    conv_params, eq_params, state, x, _ = _build(B, T=T)

    # Single-device reference.
    from airwave_tpu.models.binaural import chain_step
    ref_state, ref_y = chain_step(
        conv_params, eq_params, eq_params, state, x,
        transition_length=960, spatial_enabled=True, eq_enabled=True,
    )
    ref_y = np.asarray(ref_y)

    conv_params2, eq_params2, state2, x2, _ = _build(B, T=T)
    state2 = pmesh.shard_chain_state(state2, m)
    step = pmesh.stream_sharded_step(m, transition_length=960)
    new_state, y = step(conv_params2, eq_params2, eq_params2, state2, x2)
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-5)
    # Carry stays stream-sharded for the next step.
    assert "streams" in str(new_state.conv.fdl.sharding)
    # And the compiled steady-state program has no collectives.
    compiled = step.lower(
        conv_params2, eq_params2, eq_params2, new_state, x2
    ).compile()
    hlo = compiled.as_text()
    assert "all-reduce" not in hlo and "collective-permute" not in hlo


def test_stream_speaker_sharded_step_psum_downmix(devices):
    m = pmesh.make_mesh(devices, ("streams", "speakers"), shape=(4, 2))
    B, S, T = 8, 2, 64
    conv_params, eq_params, state, x, hrir = _build(B, S=S, T=T)

    from airwave_tpu.models.binaural import chain_step
    _, ref_y = chain_step(
        conv_params, eq_params, eq_params, state, x,
        transition_length=960, spatial_enabled=True, eq_enabled=True,
    )

    conv_params2, eq_params2, state2, x2, _ = _build(B, S=S, T=T)
    step = pmesh.stream_speaker_sharded_step(m, transition_length=960)
    _, y = step(conv_params2, eq_params2, eq_params2, state2, x2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-5)


def test_multihost_helpers_single_process(devices):
    """Single-process semantics of the multi-host utilities: the host owns
    the whole batch, and make_global_array assembles a stream-sharded array
    identical to a plain device_put."""
    import jax
    import numpy as np
    from airwave_tpu.parallel import multihost as mh

    mh.initialize()  # no-op single process
    mesh = mh.global_mesh()
    spec = mh.host_shard_spec(16, mesh)
    assert spec.local_count == 16 and spec.local_start == 0

    rng = np.random.default_rng(0)
    rows = rng.standard_normal((16, 2, 8)).astype(np.float32)
    arr = mh.make_global_array(rows, spec, mesh)
    assert arr.shape == (16, 2, 8)
    assert "streams" in str(arr.sharding)
    np.testing.assert_array_equal(np.asarray(arr), rows)

    # Feeds the sharded step directly.
    conv_params, eq_params, state, _, _ = _build(16, T=8, L=16)
    state = pmesh.shard_chain_state(state, mesh)
    step = pmesh.stream_sharded_step(mesh, transition_length=960)
    _, y = step(conv_params, eq_params, eq_params, state, arr[:, :, :8])
    assert y.shape == (16, 2, 8)


def test_stream_sharded_bake_matches_bake(devices):
    import jax.numpy as jnp
    import numpy as np
    from airwave_tpu.models import bake as bake_mod

    m = pmesh.make_mesh(devices, ("streams",))
    B, S, T, N = 16, 2, 64, 5
    rng = np.random.default_rng(0)
    hrir = (rng.standard_normal((S, 2, 200)) * 0.3).astype(np.float32)
    x = (rng.standard_normal((B, S, N * T)) * 0.4).astype(np.float32)

    want, _ = bake_mod.bake(hrir, x, 48_000.0, block_size=T, pad_to_pow2=True)

    conv_params, eq_params, state, _, _ = _build(B, S=S, T=T, L=200)
    from airwave_tpu.ops import upols as upols_mod
    conv_params = upols_mod.make_conv_params(hrir, T)  # same hrir
    state = pmesh.shard_chain_state(state, m)
    blocks = jnp.asarray(np.moveaxis(x.reshape(B, S, N, T), 2, 0))
    runner = pmesh.stream_sharded_bake(m, transition_length=960,
                                       eq_enabled=False)
    _, y_blocks = runner(conv_params, eq_params, eq_params, state, blocks)
    got = np.moveaxis(np.asarray(y_blocks), 0, 2).reshape(B, 2, N * T)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_stream_sharded_bake_multi_matches_bake(devices):
    """The M-block lookahead (headline-throughput) bake on the 8-device
    mesh WITH the folded EQ enabled (the exact headline path: the EQ's
    matrices fold into the synthesis weights): streams sharded, paged
    carry chip-local, output block-identical to the single-device bake at
    f32 tolerance, zero collectives."""
    import jax.numpy as jnp
    from airwave_tpu.models import bake as bake_mod
    from airwave_tpu.models.binaural import ChainState as CS
    from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
    from airwave_tpu.ops import biquad_design as bd

    m = pmesh.make_mesh(devices, ("streams",))
    B, S, T, M, NSTEPS = 16, 2, 64, 4, 3
    rng = np.random.default_rng(1)
    hrir = (rng.standard_normal((S, 2, 200)) * 0.3).astype(np.float32)
    x = (rng.standard_normal((B, S, NSTEPS * M * T)) * 0.4).astype(np.float32)

    preamp, coeffs = bd.design_cascade(
        EqualizerDefinition(-2.0, (
            EqualizerFilter(1, 1, True, FilterType.PEAKING, 900.0, 3.0, 1.1),
        )),
        48_000.0,
    )
    want, _ = bake_mod.bake(hrir, x, 48_000.0, coeffs, preamp, block_size=T,
                            pad_to_pow2=False, blocks_per_step=M)

    conv_params = upols.make_conv_params(hrir, T, pad_to_pow2=False,
                                         lookahead=M)
    eq_params = eq_block.make_eq_params(coeffs, preamp, T, 16)
    state = CS(
        conv=upols.make_conv_state_paged(
            B, S, conv_params.partition_count, T, M
        ),
        eq=eq_block.make_eq_state(B, 2, 16),
    )
    n_pages = len(state.conv.pages)
    shardings = pmesh.stream_sharded_bake_multi(
        m, n_pages, transition_length=960, eq_enabled=True
    )
    steps = jnp.asarray(
        np.moveaxis(x.reshape(B, S, NSTEPS, M, T), 2, 0)
    )  # [N, B, S, M, T]
    new_state, y_steps = shardings(
        conv_params, eq_params, eq_params, state, steps
    )
    got = np.transpose(np.asarray(y_steps), (1, 3, 0, 2, 4)).reshape(
        B, 2, NSTEPS * M * T
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert "streams" in str(new_state.conv.pages[0].sharding)
    hlo = shardings.lower(
        conv_params, eq_params, eq_params, new_state, steps
    ).compile().as_text()
    assert "all-reduce" not in hlo and "collective-permute" not in hlo


@pytest.mark.heavy
def test_two_process_multihost_parity(tmp_path):
    """VERDICT #7: a REAL 2-process jax.distributed run (4 virtual CPU
    devices each, 8 global) exercising host_shard_spec + make_global_array
    + the stream-sharded step across a process boundary, with output parity
    against a single-process reference. Also exercises the host-device
    contiguity assumption in multihost.host_shard_spec on a genuinely
    multi-process mesh."""
    import os
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # Keep the repo importable; drop the TPU plugin site dir so the worker
    # boots a plain CPU backend.
    env_base["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(tmp_path)],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\n{out.decode()[-2000:]}\n"
            f"{err.decode()[-2000:]}"
        )

    # Assemble both processes' rows.
    import importlib.util

    spec = importlib.util.spec_from_file_location("mh_worker", worker)
    wk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wk)
    hrir, x = wk.build_inputs()
    B, n_blocks = wk.GLOBAL_BATCH, wk.N_BLOCKS
    got = np.zeros((n_blocks, B, 2, wk.T), np.float32)
    covered = np.zeros(B, bool)
    for pid in range(2):
        with np.load(tmp_path / f"out_{pid}.npz") as data:
            start, count = int(data["start"]), int(data["count"])
            assert count == B // 2
            covered[start:start + count] = True
            for key in data.files:
                if not key.startswith("block"):
                    continue
                blk, row = key.replace("block", "").split("_row")
                rows = data[key]
                got[int(blk), int(row):int(row) + rows.shape[0]] = rows
    assert covered.all(), "both processes together must cover the batch"

    # Single-process reference (same deterministic problem).
    from airwave_tpu.io.apo import EqualizerDefinition
    from airwave_tpu.models.binaural import chain_step_fn
    from airwave_tpu.ops import biquad_design as bd

    conv_params = upols.make_conv_params(hrir, wk.T, pad_to_pow2=False)
    preamp, coeffs = bd.design_cascade(
        EqualizerDefinition(preamp_db=-3.0), 48_000.0
    )
    eq_params = eq_block.make_eq_params(coeffs, preamp, wk.T)
    state = ChainState(
        conv=upols.make_conv_state(B, wk.S, conv_params.partition_count, wk.T),
        eq=eq_block.make_eq_state(B),
    )
    for i in range(n_blocks):
        state, y = chain_step_fn(
            conv_params, eq_params, eq_params, state, x[i],
            transition_length=960, spatial_enabled=True, eq_enabled=True,
            eq_crossfading=False,
        )
        np.testing.assert_allclose(got[i], np.asarray(y), atol=1e-5)


def test_host_shard_spec_multi_axis_mesh():
    """On a 2-D (streams x speakers) mesh the batch divides by the STREAMS
    axis only; make_global_array replicates each row block across the
    speakers axis."""
    import jax
    import numpy as np
    from airwave_tpu.parallel import multihost as mh

    devices = jax.devices()[:8]
    mesh = pmesh.make_mesh(devices, ("streams", "speakers"), shape=(4, 2))
    spec = mh.host_shard_spec(16, mesh)
    # 16 rows over 4 streams coordinates, not over 8 devices.
    assert spec.local_count == 16 and spec.local_start == 0

    rng = np.random.default_rng(7)
    rows = rng.standard_normal((16, 3)).astype(np.float32)
    arr = mh.make_global_array(rows, spec, mesh)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), rows)
    # Every device's shard is the row block of its streams coordinate.
    for shard in arr.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), rows[shard.index[0]]
        )
