"""Native assembler (C++ and Python fallback parity) + StreamPool tests."""

import numpy as np
import pytest

from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.apo import EqualizerDefinition
from airwave_tpu.io.wav import WAVData
from airwave_tpu.native import RaggedAssembler, native_available
from airwave_tpu.ops import upols
from airwave_tpu.oracle.upols_oracle import UPOLSOracle
from airwave_tpu.runtime.stream_pool import StreamPool
from airwave_tpu.assets import channel_maps as cm


@pytest.fixture(params=["native", "python"])
def impl(request):
    if request.param == "native" and not native_available():
        pytest.skip("no compiler for the native assembler")
    return request.param == "python"


def test_native_library_builds():
    assert native_available(), "g++ is baked into this image; must build"


def test_assembler_push_harvest_scatter_pop(impl):
    a = RaggedAssembler(4, 2, block=8, capacity=64, force_python=impl)
    rng = np.random.default_rng(0)
    c0 = rng.standard_normal((2, 10)).astype(np.float32)
    c2 = rng.standard_normal((2, 8)).astype(np.float32)
    a.push(0, c0)
    a.push(2, c2)
    a.push(1, rng.standard_normal((2, 3)).astype(np.float32))  # not ready
    assert a.pending(0) == 10 and a.ready_count() == 2

    indices, blocks = a.harvest(8)
    assert list(indices) == [0, 2]
    np.testing.assert_array_equal(blocks[0], c0[:, :8])
    np.testing.assert_array_equal(blocks[1], c2)
    assert a.pending(0) == 2 and a.ready_count() == 0

    a.scatter(indices, blocks * 2.0)
    out = a.pop(0, 12)  # 8 real + 4 underflow zeros
    np.testing.assert_array_equal(out[:, :8], c0[:, :8] * 2.0)
    np.testing.assert_array_equal(out[:, 8:], 0)
    assert a.out_available(2) == 8


def test_assembler_wraparound_and_overflow(impl):
    a = RaggedAssembler(1, 1, block=4, capacity=8, force_python=impl)
    seq = np.arange(1, 100, dtype=np.float32)
    cursor = 0
    popped = []
    for round_idx in range(10):
        chunk = seq[cursor:cursor + 6][None]
        cursor += 6
        a.push(0, chunk)
        while a.ready_count():
            idx, blk = a.harvest(1)
            a.scatter(idx, blk)
        popped.append(a.pop(0, 6))
    out = np.concatenate(popped, axis=1)[0]
    nonzero = out[out != 0]
    np.testing.assert_array_equal(nonzero, seq[: len(nonzero)])

    with pytest.raises(OverflowError):
        a.push(0, np.ones((1, 100), np.float32))


def test_assembler_push_many_pop_many(impl):
    a = RaggedAssembler(4, 2, block=8, capacity=32, force_python=impl)
    rng = np.random.default_rng(3)
    chunks = rng.standard_normal((3, 2, 8)).astype(np.float32)
    streams = np.array([0, 2, 3], np.int32)
    a.push_many(streams, chunks)
    idx, blocks = a.harvest(8)
    assert list(idx) == [0, 2, 3]
    np.testing.assert_array_equal(blocks, chunks)
    a.scatter(idx, blocks * 3.0)
    out = a.pop_many(streams, 12)  # 8 real + 4 underflow zeros each
    np.testing.assert_array_equal(out[:, :, :8], chunks * 3.0)
    np.testing.assert_array_equal(out[:, :, 8:], 0)
    # All-or-nothing: fill stream 2, then a batch including it pushes
    # NOTHING anywhere.
    a.push(2, rng.standard_normal((2, 32)).astype(np.float32))
    with pytest.raises(OverflowError):
        a.push_many(streams, chunks)
    assert a.pending(0) == 0 and a.pending(3) == 0


def test_assembler_batch_api_contract_edges(impl):
    """Review-pinned contract edges: duplicate stream ids respect
    all-or-nothing capacity accounting, invalid ids fail BEFORE any ring
    is drained, and zero-length batches are uniform no-ops."""
    a = RaggedAssembler(4, 2, block=8, capacity=16, force_python=impl)
    rng = np.random.default_rng(7)
    # Duplicates: stream 0 holds 4 frames; two 8-frame chunks for it pass
    # the naive per-entry check (4+8<=16) but must be refused atomically.
    a.push(0, rng.standard_normal((2, 4)).astype(np.float32))
    dup = rng.standard_normal((2, 2, 8)).astype(np.float32)
    with pytest.raises(OverflowError):
        a.push_many(np.array([0, 0], np.int32), dup)
    assert a.pending(0) == 4  # nothing was written
    # Duplicates that DO fit both land.
    a2 = RaggedAssembler(4, 2, block=8, capacity=32, force_python=impl)
    a2.push_many(np.array([1, 1], np.int32), dup)
    assert a2.pending(1) == 16
    # Invalid id mid-batch: nothing drained from the valid stream.
    ok = rng.standard_normal((2, 8)).astype(np.float32)
    assert a2.try_push_out(1, ok)
    with pytest.raises(ValueError):
        a2.pop_many(np.array([1, 9999], np.int32), 8)
    assert a2.out_available(1) == 8  # still there
    # Zero-length batches: no-ops on both implementations — but a stale
    # id still raises, payload size notwithstanding.
    a2.push_many(np.zeros(0, np.int32), np.zeros((0, 2, 8), np.float32))
    out = a2.pop_many(np.zeros(0, np.int32), 8)
    assert out.shape == (0, 2, 8)
    a2.push_many(np.array([2], np.int32), np.zeros((1, 2, 0), np.float32))
    assert a2.pending(2) == 0
    with pytest.raises(ValueError):
        a2.push_many(np.array([9999], np.int32),
                     np.zeros((1, 2, 0), np.float32))


def test_native_and_python_agree():
    if not native_available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(3)
    a = RaggedAssembler(3, 2, 8, 64, force_python=False)
    b = RaggedAssembler(3, 2, 8, 64, force_python=True)
    assert a.is_native and not b.is_native
    for _ in range(20):
        stream = int(rng.integers(0, 3))
        n = int(rng.integers(1, 12))
        chunk = rng.standard_normal((2, n)).astype(np.float32)
        a.push(stream, chunk)
        b.push(stream, chunk)
        ia, xa = a.harvest(3)
        ib, xb = b.harvest(3)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(xa, xb)
        a.scatter(ia, xa)
        b.scatter(ib, xb)
        na = a.pop(stream, 5)
        nb = b.pop(stream, 5)
        np.testing.assert_array_equal(na, nb)


def make_renderer(frames=700, seed=5, sample_rate=48_000.0, block=64,
                  lookahead=1):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((14, frames)) * 0.2).astype(np.float32)
    return prepare_renderer(WAVData(sample_rate, audio), cm.STEREO,
                            sample_rate, block, lookahead=lookahead), audio


def test_conv_step_rolled_matches_conv_step():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    T, B, S = 64, 4, 2
    hrir = rng.standard_normal((S, 2, 200)).astype(np.float32) * 0.3
    params = upols.make_conv_params(hrir, T)
    s1 = upols.make_conv_state(B, S, params.partition_count, T)
    s2 = upols.make_conv_state(B, S, params.partition_count, T)
    for i in range(9):
        x = jnp.asarray(rng.standard_normal((B, S, T)).astype(np.float32))
        s1, y1 = upols.conv_step(params, s1, x)
        s2, y2 = upols.conv_step_rolled(params, s2, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_conv_step_rolled_mask_freezes_inactive_streams():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    T, B, S = 64, 3, 2
    hrir = rng.standard_normal((S, 2, 150)).astype(np.float32) * 0.3
    params = upols.make_conv_params(hrir, T)
    state = upols.make_conv_state(B, S, params.partition_count, T)
    x1 = jnp.asarray(rng.standard_normal((B, S, T)).astype(np.float32))
    state, _ = upols.conv_step_rolled(params, state, x1)
    frozen_fdl = np.asarray(state.fdl)[..., 1].copy()  # fdl is batch-minor

    x2 = jnp.asarray(rng.standard_normal((B, S, T)).astype(np.float32))
    mask = jnp.asarray([True, False, True])
    state, _ = upols.conv_step_rolled(params, state, x2, mask)
    np.testing.assert_array_equal(np.asarray(state.fdl)[..., 1], frozen_fdl)
    assert not np.array_equal(np.asarray(state.fdl)[..., 0], frozen_fdl)


@pytest.mark.heavy
def test_conv_step_masked_ring_with_debt_roll_matches_rolled():
    """The pool's shared-cursor ring lowering: inactive lanes preserved by
    the masked slot write, rejoining lanes re-aligned by conv_roll_lanes.
    Must match the shift-register step's per-stream math to f32 rounding
    under random pause patterns, including pauses longer than a full
    cursor lap (a lap is the identity — no data ever lost)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    T, B, S = 64, 5, 2
    hrir = rng.standard_normal((S, 2, 400)).astype(np.float32) * 0.3
    params = upols.make_conv_params(hrir, T)
    p2 = params.partition_count
    s_ring = upols.make_conv_state(B, S, p2, T)
    s_roll = upols.make_conv_state(B, S, p2, T)
    debt = np.zeros(B, np.int64)
    paused_long = False
    for step in range(3 * p2 + 8):
        active = rng.random(B) < 0.55
        if step < 2:
            active[:] = True
        # Hold lane 0 inactive for over a full lap once, to cover wrap.
        if p2 + 2 <= step <= 2 * p2 + 4:
            active[0] = False
            paused_long = True
        x = jnp.asarray(
            rng.standard_normal((B, S, T)).astype(np.float32)
            * active[:, None, None]
        )
        m = jnp.asarray(active)
        rejoin = np.where(active & (debt % p2 != 0))[0]
        if len(rejoin):
            s_ring = upols.conv_roll_lanes(
                s_ring, jnp.asarray(rejoin, np.int32),
                jnp.asarray(debt[rejoin], np.int32),
            )
        s_ring, y_ring = upols.conv_step(params, s_ring, x, m)
        s_roll, y_roll = upols.conv_step_rolled(params, s_roll, x, m)
        debt[active] = 0
        debt[~active] += 1
        ya = np.asarray(y_ring)[active]
        yb = np.asarray(y_roll)[active]
        if ya.size:
            rel = np.sqrt(np.mean((ya - yb) ** 2)) / max(
                np.sqrt(np.mean(yb**2)), 1e-9
            )
            assert rel < 1e-6, (step, rel)
    assert paused_long


def test_stream_pool_ragged_multistream_pauses_match_oracle():
    """Multi-stream pool where streams starve at different rounds (the
    debt/roll path): every stream's output must still match its own
    oracle chain exactly — pauses are invisible to the per-stream math."""
    block = 64
    renderer, audio = make_renderer(block=block)
    pool = StreamPool(4, 48_000.0, renderer, eq_definition=None,
                      block_size=block)
    streams = [pool.attach() for _ in range(3)]
    rng = np.random.default_rng(21)
    n_blocks = 12
    sigs = [
        (rng.standard_normal((2, n_blocks * block)) * 0.3).astype(np.float32)
        for _ in streams
    ]
    # Schedule: stream 0 feeds every round, stream 1 every 2nd, stream 2
    # in bursts of 3 with long gaps (debt exceeding a cursor lap).
    fed = [0, 0, 0]
    for rnd in range(40):
        feeds = [True, rnd % 2 == 0, rnd % 24 < 3]
        for i, s in enumerate(streams):
            if feeds[i] and fed[i] < n_blocks:
                pool.push(s, sigs[i][:, fed[i] * block:(fed[i] + 1) * block])
                fed[i] += 1
        pool.pump()
        for i, s in enumerate(streams):  # drain to keep out rings free
            n = pool.available(s)
            if n:
                sigs[i].dtype  # no-op, keep loop shape obvious
    outs = [[] for _ in streams]
    for rnd in range(80):
        if all(f >= n_blocks for f in fed):
            break
        for i, s in enumerate(streams):
            if fed[i] < n_blocks:
                pool.push(s, sigs[i][:, fed[i] * block:(fed[i] + 1) * block])
                fed[i] += 1
        pool.pump()
    for i, s in enumerate(streams):
        outs[i] = pool.pull(s, n_blocks * block)

    m = cm.hesuvi_14_channel(cm.STEREO.channels)
    for i in range(len(streams)):
        ref = np.zeros((2, n_blocks * block))
        for spk_idx, speaker in enumerate((cm.FL, cm.FR)):
            li, ri = m.indices(speaker)
            for ear, ch in ((0, li), (1, ri)):
                o = UPOLSOracle(audio[ch], block)
                ref[ear] += np.concatenate(
                    [o.process(sigs[i][spk_idx, j * block:(j + 1) * block])
                     for j in range(n_blocks)]
                )
        err = np.sqrt(np.mean((outs[i] - ref) ** 2)) / np.sqrt(
            np.mean(ref**2)
        )
        assert err < 1e-5, (i, err)


def test_atmos_714_renderer_skips_heights_and_selects_input():
    """7.1.4 layout through the height-less hesuvi14 map: the four top
    channels are skipped at preparation (ref HRIRManager.swift:370-372 —
    unmapped speakers `continue`; fail only when none resolve), and
    select_input maps a 12-channel chunk onto the 8 resolved speakers."""
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.ATMOS_7_1_4,
                                48_000.0, 64)
    assert renderer.num_speakers == 8
    assert renderer.layout_channels == 12
    assert cm.TFL not in renderer.speakers
    assert renderer.speakers[:4] == (cm.FL, cm.FR, cm.FC, cm.LFE)
    chunk = rng.standard_normal((12, 40)).astype(np.float32)
    picked = renderer.select_input(chunk)
    assert picked.shape == (8, 40)
    np.testing.assert_array_equal(picked, chunk[list(renderer.input_indices)])
    # A fully-unmappable layout still fails preparation.
    heights_only = cm.InputLayout((cm.TFL, cm.TFR, cm.TBL, cm.TBR), "tops")
    from airwave_tpu.graph.renderer import RendererPreparationError
    with pytest.raises(RendererPreparationError):
        prepare_renderer(WAVData(48_000.0, audio), heights_only,
                         48_000.0, 64,
                         channel_map=cm.hesuvi_14_channel(
                             heights_only.channels))


def test_atmos_714_pool_end_to_end_drops_heights():
    """Config-6 serving path: a 12-channel 7.1.4 stream renders through
    the pool identically to pushing the mapped 8-speaker subset — the
    height channels carry (dropped) content and must not affect output."""
    block = 64
    rng = np.random.default_rng(13)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.ATMOS_7_1_4,
                                48_000.0, block)
    pool_full = StreamPool(2, 48_000.0, renderer, block_size=block)
    pool_sub = StreamPool(2, 48_000.0, renderer, block_size=block)
    s_f = pool_full.attach()
    s_s = pool_sub.attach()
    n = 4 * block
    sig12 = (rng.standard_normal((12, n)) * 0.3).astype(np.float32)
    pool_full.push(s_f, sig12)
    pool_sub.push(s_s, sig12[list(renderer.input_indices)])
    pool_full.pump()
    pool_sub.pump()
    a = pool_full.pull(s_f, n)
    b = pool_sub.pull(s_s, n)
    np.testing.assert_array_equal(a, b)
    assert np.any(a != 0) and np.all(np.isfinite(a))


def test_atmos_714_speaker_sharded_step_on_mesh():
    """Config-6 on the virtual mesh: the 7.1.4 renderer's 8 resolved
    speakers shard over a 2-D (streams x speakers) mesh and psum to the
    same stereo downmix as the single-device chain."""
    import jax
    from airwave_tpu.parallel import mesh as pmesh
    from airwave_tpu.models.binaural import ChainState, chain_step
    from airwave_tpu.ops import eq_block

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    block = 32
    rng = np.random.default_rng(17)
    audio = (rng.standard_normal((14, 120)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.ATMOS_7_1_4,
                                48_000.0, block)
    assert renderer.num_speakers == 8
    import jax.numpy as jnp

    B = 8
    eq_params = eq_block.unity_eq_params(block)
    state = ChainState(
        conv=upols.make_conv_state(B, 8, renderer.partition_count, block),
        eq=eq_block.make_eq_state(B),
    )
    x12 = rng.standard_normal((B, 12, block)).astype(np.float32) * 0.3
    x = jnp.asarray(x12[:, list(renderer.input_indices)])
    _, ref_y = chain_step(
        renderer.conv_params, eq_params, eq_params, state, x,
        transition_length=960, spatial_enabled=True, eq_enabled=True,
    )
    m = pmesh.make_mesh(devices[:8], ("streams", "speakers"), shape=(2, 4))
    state2 = ChainState(
        conv=upols.make_conv_state(B, 8, renderer.partition_count, block),
        eq=eq_block.make_eq_state(B),
    )
    step = pmesh.stream_speaker_sharded_step(m, transition_length=960)
    _, y = step(renderer.conv_params, eq_params, eq_params, state2, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-5)


def test_stream_pool_snapshot_restore_bit_identical_resume():
    """Checkpoint mid-life (including a paused lane with alignment debt)
    and resume in a fresh pool: subsequent audio must be bit-identical."""
    block = 64
    renderer, _ = make_renderer(block=block)
    a = StreamPool(4, 48_000.0, renderer, block_size=block)
    rng = np.random.default_rng(41)
    s0, s1 = a.attach(), a.attach()
    sig0 = (rng.standard_normal((2, 8 * block)) * 0.3).astype(np.float32)
    sig1 = (rng.standard_normal((2, 8 * block)) * 0.3).astype(np.float32)
    # s0 steps 4 rounds; s1 only 2 (debt accrues on s1).
    for i in range(4):
        a.push(s0, sig0[:, i * block:(i + 1) * block])
        if i < 2:
            a.push(s1, sig1[:, i * block:(i + 1) * block])
        a.pump()
    a.pull(s0, 4 * block)
    a.pull(s1, 2 * block)
    snap = a.snapshot()
    assert snap["debt"][s1] > 0  # the paused lane carries real debt

    b = StreamPool(4, 48_000.0, renderer, block_size=block)
    b.restore(snap)
    for pool in (a, b):
        for i in range(4, 8):
            pool.push(s0, sig0[:, i * block:(i + 1) * block])
        for i in range(2, 8):
            pool.push(s1, sig1[:, i * block:(i + 1) * block])
        pool.pump()
    np.testing.assert_array_equal(a.pull(s0, 4 * block),
                                  b.pull(s0, 4 * block))
    np.testing.assert_array_equal(a.pull(s1, 6 * block),
                                  b.pull(s1, 6 * block))
    # Restored bookkeeping: the free list excludes restored streams.
    s2 = b.attach()
    assert s2 not in (s0, s1)


def test_stream_pool_snapshot_restore_mid_eq_crossfade():
    """Checkpoint DURING a live EQ retarget ramp: the restored pool must
    continue the crossfade bit-identically — the snapshot carries the EQ
    machine's active/from targets and ramp clock, not just device state."""
    block = 64
    renderer, _ = make_renderer(block=block)
    eq_a = EqualizerDefinition(preamp_db=-6.0)
    eq_b = EqualizerDefinition(preamp_db=+3.0)
    a = StreamPool(2, 48_000.0, renderer, eq_definition=eq_a,
                   block_size=block)
    s = a.attach()
    rng = np.random.default_rng(43)
    sig = (rng.standard_normal((2, 30 * block)) * 0.3).astype(np.float32)
    # Finish the activation ramp, then retarget and step PART of the new
    # ramp (transition_length = 960 = 15 blocks at block 64).
    for i in range(16):
        a.push(s, sig[:, i * block:(i + 1) * block])
        a.pump()
    a.pull(s, 16 * block)
    a.set_equalizer(eq_b)
    for i in range(16, 20):  # 4 of 15 ramp blocks
        a.push(s, sig[:, i * block:(i + 1) * block])
        a.pump()
    a.pull(s, 4 * block)
    snap = a.snapshot()
    assert snap["eq_runtime"]["transition_from"] is not None

    c = StreamPool(2, 48_000.0, renderer, eq_definition=eq_a,
                   block_size=block)
    c.restore(snap)
    for pool in (a, c):
        for i in range(20, 30):
            pool.push(s, sig[:, i * block:(i + 1) * block])
            pool.pump()
    np.testing.assert_array_equal(a.pull(s, 10 * block),
                                  c.pull(s, 10 * block))


_POOL_ENV_PROBE = r"""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import StreamPool
from airwave_tpu.assets import channel_maps as cm

block = 64
audio = (np.random.default_rng(5).standard_normal((14, 300)) * 0.2
         ).astype(np.float32)
renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                            48_000.0, block)
pool = StreamPool(3, 48_000.0, renderer, block_size=block)
streams = [pool.attach() for _ in range(2)]
rng = np.random.default_rng(9)
n = 6
sigs = [(rng.standard_normal((2, n * block)) * 0.3).astype(np.float32)
        for _ in streams]
fed = [0, 0]
for rnd in range(3 * n):
    for i, s in enumerate(streams):
        if fed[i] < n and (i == 0 or rnd % 2 == 0):  # ragged lane 1
            pool.push(s, sigs[i][:, fed[i] * block:(fed[i] + 1) * block])
            fed[i] += 1
    pool.pump()
np.save(OUT_PATH, np.stack([pool.pull(s, n * block) for s in streams]))
"""


@pytest.mark.heavy
def test_pool_step_env_variants_match(tmp_path):
    """AIRWAVE_POOL_STEP is a module-level env flag (the rolled
    shift-register lowering is kept for re-measurement) — subprocess
    differential pins it against bit-rot, ragged schedule included."""
    import os
    import subprocess
    import sys

    outs = {}
    for variant in ("ring", "rolled"):
        out = tmp_path / f"{variant}.npy"
        code = f"OUT_PATH = {str(out)!r}\n" + _POOL_ENV_PROBE
        env = dict(os.environ)
        env["AIRWAVE_POOL_STEP"] = variant
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       cwd="/root/repo", timeout=300)
        outs[variant] = np.load(out)
    rel = np.sqrt(np.mean((outs["rolled"] - outs["ring"]) ** 2)) / max(
        np.sqrt(np.mean(outs["ring"] ** 2)), 1e-9
    )
    assert rel < 1e-6, rel
    assert np.any(outs["ring"] != 0)


def test_stream_pool_sharded_over_mesh_matches_unsharded():
    """Multi-chip serving: a pool whose lane state shards over a 1-D
    "streams" mesh must render byte-compatible audio with the unsharded
    pool under the same ragged schedule (pauses included — the debt roll
    crosses shards too)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = Mesh(np.array(devices[:8]), ("streams",))
    block = 64
    renderer, _ = make_renderer(block=block)
    sharded = StreamPool(8, 48_000.0, renderer, block_size=block, mesh=mesh)
    plain = StreamPool(8, 48_000.0, renderer, block_size=block)
    with pytest.raises(ValueError):
        StreamPool(9, 48_000.0, renderer, block_size=block, mesh=mesh)
    streams = [(sharded.attach(), plain.attach()) for _ in range(3)]
    rng = np.random.default_rng(31)
    n = 6
    sigs = [(rng.standard_normal((2, n * block)) * 0.3).astype(np.float32)
            for _ in streams]
    fed = [0] * len(streams)
    for rnd in range(3 * n):
        feeds = [True, rnd % 2 == 0, rnd % 3 == 0]  # ragged pauses
        for i, (s_s, s_p) in enumerate(streams):
            if feeds[i] and fed[i] < n:
                chunk = sigs[i][:, fed[i] * block:(fed[i] + 1) * block]
                sharded.push(s_s, chunk)
                plain.push(s_p, chunk)
                fed[i] += 1
        sharded.pump()
        plain.pump()
    for i, (s_s, s_p) in enumerate(streams):
        a = sharded.pull(s_s, n * block)
        b = plain.pull(s_p, n * block)
        rel = np.sqrt(np.mean((a - b) ** 2)) / max(
            np.sqrt(np.mean(b**2)), 1e-9
        )
        assert rel < 1e-6, (i, rel)
        assert np.any(a != 0)


def test_pool_ring_all_fast_variant_matches_masked():
    """When every attached stream is harvested, pump takes the unmasked
    ring_all variant. Its audio must match a pool forced onto the masked
    path (by keeping one extra idle stream attached) for the same
    signal."""
    block = 64
    renderer, _ = make_renderer(block=block)
    fast = StreamPool(4, 48_000.0, renderer, block_size=block)
    masked = StreamPool(4, 48_000.0, renderer, block_size=block)
    s_f = fast.attach()
    s_m = masked.attach()
    masked.attach()  # idle lane: every round has an unharvested attached
    rng = np.random.default_rng(15)
    sig = (rng.standard_normal((2, 6 * block)) * 0.3).astype(np.float32)
    for i in range(6):
        fast.push(s_f, sig[:, i * block:(i + 1) * block])
        masked.push(s_m, sig[:, i * block:(i + 1) * block])
        fast.pump()
        masked.pump()
    a = fast.pull(s_f, 6 * block)
    b = masked.pull(s_m, 6 * block)
    rel = np.sqrt(np.mean((a - b) ** 2)) / max(np.sqrt(np.mean(b**2)), 1e-9)
    assert rel < 1e-6, rel


def test_stream_pool_prewarm_is_a_semantic_noop():
    """prewarm() compiles every bucket shape; it must not disturb any
    attached stream's audio — even called mid-life between two blocks of
    a live stream (its lane rides the cursor advances as alignment debt)."""
    block = 64
    renderer, _ = make_renderer(block=block)
    warm = StreamPool(4, 48_000.0, renderer, block_size=block)
    plain = StreamPool(4, 48_000.0, renderer, block_size=block)
    rng = np.random.default_rng(11)
    sig = (rng.standard_normal((2, 4 * block)) * 0.3).astype(np.float32)
    s_w, s_p = warm.attach(), plain.attach()
    warm.prewarm()
    for i in range(4):
        warm.push(s_w, sig[:, i * block:(i + 1) * block])
        plain.push(s_p, sig[:, i * block:(i + 1) * block])
        warm.pump()
        plain.pump()
        if i == 1:
            warm.prewarm(up_to=2)  # mid-life, with a live stream attached
    a = warm.pull(s_w, 4 * block)
    b = plain.pull(s_p, 4 * block)
    rel = np.sqrt(np.mean((a - b) ** 2)) / max(
        np.sqrt(np.mean(b**2)), 1e-9
    )
    assert rel < 1e-6, rel


def test_stream_pool_end_to_end_matches_oracle():
    block = 64
    renderer, audio = make_renderer(block=block)
    pool = StreamPool(
        max_streams=4, sample_rate=48_000.0, renderer=renderer,
        eq_definition=None, block_size=block,
    )
    s_a = pool.attach()
    s_b = pool.attach()
    rng = np.random.default_rng(9)
    sig_a = rng.standard_normal((2, 5 * block)).astype(np.float32) * 0.3
    sig_b = rng.standard_normal((2, 3 * block)).astype(np.float32) * 0.3

    # Ragged pushes: stream A in odd chunks, stream B all at once.
    cursor = 0
    for n in (17, 100, 60, 83, block * 5 - 260):
        pool.push(s_a, sig_a[:, cursor:cursor + n])
        cursor += n
        pool.pump()
    pool.push(s_b, sig_b)
    pool.pump()

    got_a = pool.pull(s_a, 5 * block)
    got_b = pool.pull(s_b, 3 * block)

    m = cm.hesuvi_14_channel(cm.STEREO.channels)
    for got, sig, nblk in ((got_a, sig_a, 5), (got_b, sig_b, 3)):
        ref = np.zeros((2, nblk * block))
        for spk_idx, speaker in enumerate((cm.FL, cm.FR)):
            li, ri = m.indices(speaker)
            for ear, ch in ((0, li), (1, ri)):
                o = UPOLSOracle(audio[ch], block)
                ref[ear] += np.concatenate(
                    [o.process(sig[spk_idx, i * block:(i + 1) * block])
                     for i in range(nblk)]
                )
        err = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref**2))
        assert err < 1e-5, err


def test_stream_pool_attach_detach_recycles_cleanly():
    block = 64
    renderer, _ = make_renderer(block=block)
    pool = StreamPool(4, 48_000.0, renderer, block_size=block)
    s1 = pool.attach()
    pool.push(s1, np.ones((2, block), np.float32))
    pool.pump()
    assert pool.available(s1) == block
    pool.detach(s1)
    s2 = pool.attach()
    assert s2 == s1  # slot recycled
    assert pool.available(s2) == 0
    # Fresh state: silence in, silence out.
    pool.push(s2, np.zeros((2, block), np.float32))
    pool.pump()
    np.testing.assert_array_equal(pool.pull(s2, block), 0)


def test_stream_pool_eq_and_capacity():
    block = 64
    renderer, _ = make_renderer(block=block)
    pool = StreamPool(
        2, 48_000.0, renderer,
        eq_definition=EqualizerDefinition(preamp_db=-6.0),
        block_size=block,
    )
    a = pool.attach()
    b = pool.attach()
    with pytest.raises(RuntimeError):
        pool.attach()
    pool.push(a, np.ones((2, block), np.float32) * 0.5)
    pool.pump()
    out = pool.pull(a, block)
    assert np.all(np.isfinite(out)) and np.any(out != 0)


def test_stream_pool_set_equalizer_none_semantics():
    """EQ-less pool + set_equalizer(None) stays disabled (constructor
    symmetry); an active EQ retargeted to None crossfades to unity and
    keeps the EQ step in the chain for the ramp."""
    block = 64
    renderer, _ = make_renderer(block=block)
    pool = StreamPool(2, 48_000.0, renderer, eq_definition=None,
                      block_size=block)
    assert not pool._eq_enabled
    pool.set_equalizer(None)
    assert not pool._eq_enabled  # no unity-EQ path, no re-jit

    pool.set_equalizer(EqualizerDefinition(preamp_db=-6.0))
    assert pool._eq_enabled
    pool.set_equalizer(None)  # removal: unity crossfade, EQ stays in-step
    assert pool._eq_enabled
    a = pool.attach()
    pool.push(a, np.ones((2, block), np.float32) * 0.25)
    pool.pump()
    out = pool.pull(a, block)
    assert np.all(np.isfinite(out))


def test_pool_slow_reader_backpressure_without_loss():
    """A slow reader must never lose rendered audio or raise out of
    pump(): pump defers harvesting a stream whose output ring is full, so
    backpressure reaches the producer through the INPUT ring (push raises
    OverflowError) while every rendered block stays intact and ordered.
    Regression for the render server's single-pump architecture, where a
    post-render scatter OverflowError would have killed the pump thread."""
    block = 64
    renderer, _ = make_renderer(block=block)
    # Input and output rings of only 2 blocks each.
    pool = StreamPool(2, 48_000.0, renderer, eq_definition=None,
                      block_size=block, ring_blocks=2)
    fast = StreamPool(2, 48_000.0, renderer, eq_definition=None,
                      block_size=block, ring_blocks=16)
    s = pool.attach()
    f = fast.attach()
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal((2, 6 * block)) * 0.4).astype(np.float32)

    def feed(i):
        pool.push(s, audio[:, i * block:(i + 1) * block])
        pool.pump()
        fast.push(f, audio[:, i * block:(i + 1) * block])
        fast.pump()

    got = []
    # Blocks 0-1 render and fill the out ring; 2-3 buffer in the input
    # ring (pump defers their harvest); block 4 hits the producer.
    for i in range(4):
        feed(i)
    assert pool.available(s) == 2 * block
    with pytest.raises(OverflowError):
        pool.push(s, audio[:, 4 * block:5 * block])
    # Reader catches up: pulls free the out ring, pump resumes, and the
    # remaining input flows through with nothing dropped or reordered.
    got.append(pool.pull(s, 2 * block))
    pool.pump()
    for i in range(4, 6):
        feed(i)
        got.append(pool.pull(s, pool.available(s)))
    got.append(pool.pull(s, 6 * block - sum(g.shape[1] for g in got)))
    got = np.concatenate(got, axis=1)
    want = fast.pull(f, 6 * block)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert pool.available(s) == 0
    pool.detach(s)
    assert not pool._pending_out


def test_pool_randomized_interleaving_matches_reference_pool():
    """Differential fuzz: a random interleaving of ragged pushes, pumps,
    and partial pulls against a 2-block-ring pool must produce byte-exact
    output (order + underflow zero-fill) versus an unconstrained-ring
    pool fed the same schedule. Covers the gated-harvest backpressure and
    stash paths under schedules no hand-written case would try."""
    block = 64
    renderer, _ = make_renderer(block=block)
    tight = StreamPool(2, 48_000.0, renderer, eq_definition=None,
                       block_size=block, ring_blocks=2)
    roomy = StreamPool(2, 48_000.0, renderer, eq_definition=None,
                       block_size=block, ring_blocks=64)
    s_t, s_r = tight.attach(), roomy.attach()
    rng = np.random.default_rng(17)
    audio = (rng.standard_normal((2, 40 * block)) * 0.4).astype(np.float32)
    fed = 0
    got_t, got_r = [], []
    for _ in range(300):
        op = rng.choice(["push", "pump", "pull"])
        if op == "push" and fed < audio.shape[1]:
            n = int(rng.integers(1, 3 * block))
            chunk = audio[:, fed:fed + n]
            try:
                tight.push(s_t, chunk)
            except OverflowError:
                continue  # backpressure: the roomy pool must not advance
            roomy.push(s_r, chunk)
            fed += chunk.shape[1]
        elif op == "pump":
            tight.pump()
            roomy.pump()
        else:
            n = int(rng.integers(1, 2 * block))
            avail = min(tight.available(s_t), roomy.available(s_r))
            take = min(n, avail)
            if take:
                got_t.append(tight.pull(s_t, take))
                got_r.append(roomy.pull(s_r, take))
    # Drain everything renderable.
    for _ in range(64):
        tight.pump()
        roomy.pump()
        avail = min(tight.available(s_t), roomy.available(s_r))
        if avail == 0:
            break
        got_t.append(tight.pull(s_t, avail))
        got_r.append(roomy.pull(s_r, avail))
    a = np.concatenate(got_t, axis=1)
    b = np.concatenate(got_r, axis=1)
    np.testing.assert_array_equal(a, b)
    assert a.shape[1] >= fed - 2 * block  # nothing renderable was lost


# --- multi-block (blocks_per_step=M) throughput tier --------------------------------


def test_assembler_multiframe_harvest_and_scatter(impl):
    """The multi-block tier's data plane: harvest_allowed(frames=M*block)
    pops whole steps (lanes with less buffered input are skipped) and
    scatter() takes arbitrary frame counts — native/python parity."""
    force_python = impl == "python"
    if not force_python and not native_available():
        pytest.skip("no native toolchain")
    block, M = 8, 3
    a = RaggedAssembler(4, 2, block, capacity=block * 8,
                        force_python=force_python)
    rng = np.random.default_rng(7)
    a.push(0, rng.standard_normal((2, M * block)).astype(np.float32))
    a.push(1, rng.standard_normal((2, M * block - 1)).astype(np.float32))
    a.push(2, rng.standard_normal((2, 2 * M * block)).astype(np.float32))
    allow = np.ones(4, np.int32)
    idx, blocks = a.harvest_allowed(4, allow, frames=M * block)
    # Stream 1 has one frame too few for a whole step.
    np.testing.assert_array_equal(idx, [0, 2])
    assert blocks.shape == (2, 2, M * block)
    assert a.pending(0) == 0 and a.pending(1) == M * block - 1
    assert a.pending(2) == M * block
    # Variable-frame scatter (all-or-nothing).
    out = rng.standard_normal((2, 2, M * block)).astype(np.float32)
    a.scatter(idx, out)
    np.testing.assert_array_equal(a.pop(0, M * block), out[0])
    np.testing.assert_array_equal(a.pop(2, M * block), out[1])
    big = np.zeros((1, 2, block * 8 + block), np.float32)
    with pytest.raises(OverflowError):
        a.scatter(np.array([3], np.int32), big)
    assert a.out_available(3) == 0  # nothing was written


def test_conv_step_paged_masked_with_debt_roll_matches_single_block():
    """The multi-block pool's device math at the op level: the masked paged
    step preserves idle lanes by recycling their oldest page, and
    conv_roll_lanes_paged re-aligns them at rejoin — per-lane audio must
    match M single-block masked steps to f32 rounding under random pause
    patterns, including a pause longer than a full page cycle."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    T, B, S, M = 64, 5, 2, 4
    hrir = rng.standard_normal((S, 2, 400)).astype(np.float32) * 0.3
    params_m = upols.make_conv_params(hrir, T, pad_to_pow2=False,
                                      lookahead=M)
    params_1 = upols.make_conv_params(hrir, T, pad_to_pow2=False)
    p2 = params_m.partition_count
    n_pages = p2 // M
    s_paged = upols.make_conv_state_paged(B, S, p2, T, M)
    s_roll = upols.make_conv_state(B, S, params_1.partition_count, T)
    debt = np.zeros(B, np.int64)
    paused_long = False
    for rnd in range(4 * n_pages + 6):
        active = rng.random(B) < 0.6
        if rnd < 2:
            active[:] = True
        # Lane 0: one pause spanning more than a full page cycle.
        if n_pages + 1 <= rnd <= 2 * n_pages + 3:
            active[0] = False
            paused_long = True
        x = jnp.asarray(
            rng.standard_normal((B, S, M, T)).astype(np.float32)
            * active[:, None, None, None]
        )
        m = jnp.asarray(active)
        rejoin = np.where(active & (debt % n_pages != 0))[0]
        if len(rejoin):
            s_paged = upols.conv_roll_lanes_paged(
                s_paged, jnp.asarray(rejoin, np.int32),
                jnp.asarray(debt[rejoin], np.int32),
            )
        s_paged, y_paged = upols.conv_step_paged(params_m, s_paged, x,
                                                 active_mask=m)
        ys = []
        for j in range(M):
            s_roll, yj = upols.conv_step_rolled(params_1, s_roll,
                                                x[:, :, j], m)
            ys.append(np.asarray(yj))
        y_ref = np.stack(ys, axis=1)  # [B, M, E, T]
        debt[active] = 0
        debt[~active] += 1
        ya = np.asarray(y_paged)[active]
        yb = y_ref[active]
        if ya.size:
            rel = np.sqrt(np.mean((ya - yb) ** 2)) / max(
                np.sqrt(np.mean(yb**2)), 1e-9
            )
            assert rel < 1e-6, (rnd, rel)
    assert paused_long


def _settle_eq_ramp(pools, streams_per_pool, step_frames):
    """Run the activation unity->target ramp to completion on silence so a
    cross-granularity comparison starts from the shared steady state (ramp
    OBSERVATION is round-granular: <=1 block of skew on the default pool,
    <=1 step on the multi-block tier — documented semantics)."""
    rounds = 2 * (960 // step_frames + 2)
    for _ in range(rounds):
        for pool, streams in zip(pools, streams_per_pool):
            for s in streams:
                pool.push(s, np.zeros((2, step_frames), np.float32))
            pool.pump()
    for pool, streams in zip(pools, streams_per_pool):
        for s in streams:
            pool.pull(s, rounds * step_frames)


@pytest.mark.heavy
def test_stream_pool_multiblock_matches_single_block_ragged():
    """blocks_per_step=M (paged line + folded EQ + page-granular debt
    rolls) must render the same audio as the single-block ring pool for
    the same signals under a ragged pause schedule."""
    block, M, B = 64, 4, 4
    renderer1, _ = make_renderer(block=block)
    rendererM, _ = make_renderer(block=block, lookahead=M)
    eq = EqualizerDefinition(preamp_db=-2.0)
    p1 = StreamPool(B, 48_000.0, renderer1, eq_definition=eq,
                    block_size=block, ring_blocks=64)
    pM = StreamPool(B, 48_000.0, rendererM, eq_definition=eq,
                    block_size=block, ring_blocks=64, blocks_per_step=M)
    assert pM.step_frames == M * block
    streams1 = [p1.attach() for _ in range(B)]
    streamsM = [pM.attach() for _ in range(B)]
    _settle_eq_ramp((p1, pM), (streams1, streamsM), M * block)

    rng = np.random.default_rng(0)
    n = 16  # M-block chunks per stream
    x = (rng.standard_normal((B, 2, n * M * block)) * 0.3).astype(np.float32)
    fed = [0] * B
    for rnd in range(6 * n):
        if all(f >= n for f in fed):
            break
        for j in range(B):
            # Ragged: lane j pauses on rounds where rnd % (j+2) == 0.
            if fed[j] < n and (j == 0 or rnd % (j + 2) != 0):
                lo = fed[j] * M * block
                chunk = x[j, :, lo:lo + M * block]
                p1.push(streams1[j], chunk)
                pM.push(streamsM[j], chunk)
                fed[j] += 1
        p1.pump()
        pM.pump()
    total = n * M * block
    out1 = np.stack([p1.pull(s, total) for s in streams1])
    outM = np.stack([pM.pull(s, total) for s in streamsM])
    rel = np.sqrt(np.mean((out1 - outM) ** 2)) / max(
        np.sqrt(np.mean(out1**2)), 1e-9
    )
    assert rel < 2e-6, rel
    assert np.any(out1 != 0)
    # The tier really batches: M blocks per round per lane.
    assert pM.rounds * M <= p1.rounds + M


def test_stream_pool_multiblock_eq_retarget_matches_single_block():
    """A live EQ retarget mid-stream on an all-active multi-block pool:
    the 20 ms crossfade (unfused M-block EQ path) must match the
    single-block pool sample-for-sample — all-active rounds observe the
    publication at the same sample boundary."""
    block, M = 64, 4
    renderer1, _ = make_renderer(block=block)
    rendererM, _ = make_renderer(block=block, lookahead=M)
    eq_a = EqualizerDefinition(preamp_db=-6.0)
    eq_b = EqualizerDefinition(preamp_db=+3.0)
    p1 = StreamPool(2, 48_000.0, renderer1, eq_definition=eq_a,
                    block_size=block, ring_blocks=64)
    pM = StreamPool(2, 48_000.0, rendererM, eq_definition=eq_a,
                    block_size=block, ring_blocks=64, blocks_per_step=M)
    s1, sM = p1.attach(), pM.attach()
    _settle_eq_ramp((p1, pM), ([s1], [sM]), M * block)

    rng = np.random.default_rng(5)
    n = 12
    x = (rng.standard_normal((2, n * M * block)) * 0.3).astype(np.float32)
    for i in range(n):
        if i == 3:  # retarget between rounds (same sample position)
            p1.set_equalizer(eq_b)
            pM.set_equalizer(eq_b)
        chunk = x[:, i * M * block:(i + 1) * M * block]
        p1.push(s1, chunk)
        pM.push(sM, chunk)
        p1.pump()
        pM.pump()
    a = p1.pull(s1, n * M * block)
    b = pM.pull(sM, n * M * block)
    rel = np.sqrt(np.mean((a - b) ** 2)) / max(np.sqrt(np.mean(a**2)), 1e-9)
    assert rel < 2e-6, rel
    assert np.any(a != 0)


def test_stream_pool_multiblock_snapshot_restore_bit_identical():
    """Checkpoint a multi-block pool mid-life (paused lane with
    page-granular debt included) and resume in a fresh pool:
    continuation must be bit-identical."""
    block, M = 64, 4
    renderer, _ = make_renderer(block=block, lookahead=M)
    step = M * block
    a = StreamPool(4, 48_000.0, renderer, block_size=block,
                   ring_blocks=64, blocks_per_step=M)
    rng = np.random.default_rng(41)
    s0, s1 = a.attach(), a.attach()
    sig0 = (rng.standard_normal((2, 8 * step)) * 0.3).astype(np.float32)
    sig1 = (rng.standard_normal((2, 8 * step)) * 0.3).astype(np.float32)
    for i in range(4):
        a.push(s0, sig0[:, i * step:(i + 1) * step])
        if i < 2:
            a.push(s1, sig1[:, i * step:(i + 1) * step])
        a.pump()
    a.pull(s0, 4 * step)
    a.pull(s1, 2 * step)
    snap = a.snapshot()
    assert snap["debt"][s1] > 0

    b = StreamPool(4, 48_000.0, renderer, block_size=block,
                   ring_blocks=64, blocks_per_step=M)
    b.restore(snap)
    for pool in (a, b):
        for i in range(4, 8):
            pool.push(s0, sig0[:, i * step:(i + 1) * step])
        for i in range(2, 8):
            pool.push(s1, sig1[:, i * step:(i + 1) * step])
        pool.pump()
    np.testing.assert_array_equal(a.pull(s0, 4 * step), b.pull(s0, 4 * step))
    np.testing.assert_array_equal(a.pull(s1, 6 * step), b.pull(s1, 6 * step))


def test_multiblock_pool_validates_renderer_lookahead():
    block, M = 64, 4
    renderer1, _ = make_renderer(block=block)
    rendererM, _ = make_renderer(block=block, lookahead=M)
    with pytest.raises(ValueError, match="lookahead"):
        StreamPool(2, 48_000.0, renderer1, block_size=block,
                   blocks_per_step=M)
    pool = StreamPool(2, 48_000.0, rendererM, block_size=block,
                      blocks_per_step=M)
    with pytest.raises(ValueError, match="lookahead"):
        pool.set_renderer(renderer1)
    # A fresh lookahead-M renderer hot-swaps fine.
    renderer2, _ = make_renderer(block=block, lookahead=M, seed=9)
    pool.set_renderer(renderer2)
    with pytest.raises(ValueError):
        StreamPool(2, 48_000.0, rendererM, block_size=block,
                   blocks_per_step=0)


@pytest.mark.heavy
def test_stream_pool_multiblock_prewarm_and_recycle():
    """prewarm() on the multi-block tier is a semantic no-op, and
    attach/detach recycles lanes cleanly (a zeroed lane is
    rotation-invariant on the paged line too)."""
    block, M = 64, 2
    renderer, _ = make_renderer(block=block, lookahead=M)
    step = M * block
    warm = StreamPool(4, 48_000.0, renderer, block_size=block,
                      ring_blocks=64, blocks_per_step=M)
    plain = StreamPool(4, 48_000.0, renderer, block_size=block,
                       ring_blocks=64, blocks_per_step=M)
    rng = np.random.default_rng(11)
    sig = (rng.standard_normal((2, 4 * step)) * 0.3).astype(np.float32)
    s_w, s_p = warm.attach(), plain.attach()
    warm.prewarm()
    for i in range(4):
        warm.push(s_w, sig[:, i * step:(i + 1) * step])
        plain.push(s_p, sig[:, i * step:(i + 1) * step])
        warm.pump()
        plain.pump()
        if i == 1:
            warm.prewarm(up_to=2)
    a = warm.pull(s_w, 4 * step)
    b = plain.pull(s_p, 4 * step)
    rel = np.sqrt(np.mean((a - b) ** 2)) / max(np.sqrt(np.mean(b**2)), 1e-9)
    assert rel < 1e-6, rel
    # Recycle: detach + attach resets the lane.
    warm.detach(s_w)
    s2 = warm.attach()
    warm.push(s2, np.zeros((2, step), np.float32))
    warm.pump()
    np.testing.assert_array_equal(warm.pull(s2, step), 0)


@pytest.mark.heavy
def test_stream_pool_multiblock_sharded_over_mesh_matches_unsharded():
    """The throughput tier shards over a streams mesh like the default
    pool: SPMD rounds with page-granular debt rolls crossing shards."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = Mesh(np.array(devices[:8]), ("streams",))
    block, M = 64, 2
    renderer, _ = make_renderer(block=block, lookahead=M)
    step = M * block
    sharded = StreamPool(8, 48_000.0, renderer, block_size=block,
                         ring_blocks=64, blocks_per_step=M, mesh=mesh)
    plain = StreamPool(8, 48_000.0, renderer, block_size=block,
                       ring_blocks=64, blocks_per_step=M)
    streams = [(sharded.attach(), plain.attach()) for _ in range(3)]
    rng = np.random.default_rng(31)
    n = 6
    sigs = [(rng.standard_normal((2, n * step)) * 0.3).astype(np.float32)
            for _ in streams]
    fed = [0] * len(streams)
    for rnd in range(3 * n):
        feeds = [True, rnd % 2 == 0, rnd % 3 == 0]  # ragged pauses
        for i, (s_s, s_p) in enumerate(streams):
            if feeds[i] and fed[i] < n:
                chunk = sigs[i][:, fed[i] * step:(fed[i] + 1) * step]
                sharded.push(s_s, chunk)
                plain.push(s_p, chunk)
                fed[i] += 1
        sharded.pump()
        plain.pump()
    for i, (s_s, s_p) in enumerate(streams):
        a = sharded.pull(s_s, n * step)
        b = plain.pull(s_p, n * step)
        rel = np.sqrt(np.mean((a - b) ** 2)) / max(
            np.sqrt(np.mean(b**2)), 1e-9
        )
        assert rel < 1e-6, (i, rel)
        assert np.any(a != 0)


def test_pool_step_identity_variants_match_all_variants():
    """The saturated fast path (ring_id / paged_id: idx == arange, no
    input scatter / output gather) must be numerically identical to the
    *_all variants it replaces — states and output rows."""
    import jax.numpy as jnp
    from airwave_tpu.ops import eq_block
    from airwave_tpu.ops.biquad_design import design_cascade
    from airwave_tpu.runtime.stream_pool import PoolState, pool_step_body

    rng = np.random.default_rng(17)
    T, B, S, M = 64, 6, 2, 4
    hrir = rng.standard_normal((S, 2, 300)).astype(np.float32) * 0.3
    preamp, coeffs = design_cascade(EqualizerDefinition(preamp_db=-2.0),
                                    48_000.0)
    eq_p = eq_block.make_eq_params(coeffs, preamp, T)
    idx = jnp.arange(B, dtype=jnp.int32)

    # Single-block tier.
    params1 = upols.make_conv_params(hrir, T)
    for crossfading in (False, True):
        st = PoolState(
            conv=upols.make_conv_state(B, S, params1.partition_count, T),
            eq=eq_block.make_eq_state(B, 2),
        )
        x = jnp.asarray(rng.standard_normal((B, S, T)).astype(np.float32))
        sa, ya = pool_step_body(params1, eq_p, eq_p, st, x, idx,
                                transition_length=960, eq_enabled=True,
                                eq_crossfading=crossfading,
                                variant="ring_all")
        sb, yb = pool_step_body(params1, eq_p, eq_p, st, x, idx,
                                transition_length=960, eq_enabled=True,
                                eq_crossfading=crossfading,
                                variant="ring_id")
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        np.testing.assert_array_equal(np.asarray(sa.conv.fdl),
                                      np.asarray(sb.conv.fdl))
        np.testing.assert_array_equal(np.asarray(sa.eq.s_to),
                                      np.asarray(sb.eq.s_to))

    # Multi-block tier (folded steady state AND unfused crossfade path).
    paramsM = upols.make_conv_params(hrir, T, lookahead=M)
    for crossfading in (False, True):
        st = PoolState(
            conv=upols.make_conv_state_paged(
                B, S, paramsM.partition_count, T, M),
            eq=eq_block.make_eq_state(B, 2),
        )
        x = jnp.asarray(
            rng.standard_normal((B, S, M, T)).astype(np.float32))
        sa, ya = pool_step_body(paramsM, eq_p, eq_p, st, x, idx,
                                transition_length=960, eq_enabled=True,
                                eq_crossfading=crossfading,
                                variant="paged_all")
        sb, yb = pool_step_body(paramsM, eq_p, eq_p, st, x, idx,
                                transition_length=960, eq_enabled=True,
                                eq_crossfading=crossfading,
                                variant="paged_id")
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
        for pa, pb in zip(sa.conv.pages, sb.conv.pages):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        np.testing.assert_array_equal(np.asarray(sa.eq.s_to),
                                      np.asarray(sb.eq.s_to))


def test_pump_selects_identity_variant_when_saturated():
    """A full pool with every lane fed steps through the identity variant
    (verified indirectly: output parity with a half-full pool rendering
    the same signals, which steps through ring_all/ring)."""
    block, B = 64, 4
    renderer, _ = make_renderer(block=block)
    full = StreamPool(B, 48_000.0, renderer, block_size=block,
                      ring_blocks=32)
    half = StreamPool(2 * B, 48_000.0, renderer, block_size=block,
                      ring_blocks=32)
    sf = [full.attach() for _ in range(B)]
    sh = [half.attach() for _ in range(B)]
    rng = np.random.default_rng(23)
    n = 6
    x = (rng.standard_normal((B, 2, n * block)) * 0.3).astype(np.float32)
    for i in range(n):
        for j in range(B):
            chunk = x[j, :, i * block:(i + 1) * block]
            full.push(sf[j], chunk)
            half.push(sh[j], chunk)
        full.pump()
        half.pump()
    a = np.stack([full.pull(s, n * block) for s in sf])
    b = np.stack([half.pull(s, n * block) for s in sh])
    np.testing.assert_allclose(a, b, atol=2e-6)
    assert np.any(a != 0)


def test_stale_native_library_binds_to_none_not_import_error(tmp_path):
    """A .so missing newer symbols (stale prebuilt artifact whose mtime
    passes the rebuild check) must degrade to the NumPy fallback
    (_bind -> None), never break import with AttributeError."""
    import subprocess
    from airwave_tpu import native

    src = tmp_path / "stub.cc"
    src.write_text('extern "C" int awv_create(int a, int b, int c, int d) '
                   '{ return 0; }\n')
    lib = tmp_path / "stub.so"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(src), "-o", str(lib)],
            check=True, capture_output=True, timeout=60,
        )
    except (OSError, subprocess.SubprocessError):
        pytest.skip("no native toolchain")
    assert native._bind(str(lib)) is None
    # And the real library (when built) still binds.
    if native.native_available():
        assert native._bind(native._LIB) is not None


def test_restore_rejects_cross_tier_snapshot():
    """A snapshot taken on one tier must not restore into a pool of the
    other (the carry pytrees differ structurally) — and the failed
    restore leaves the target pool fully usable."""
    block, M = 64, 2
    renderer1, _ = make_renderer(block=block)
    rendererM, _ = make_renderer(block=block, lookahead=M)
    p1 = StreamPool(2, 48_000.0, renderer1, block_size=block)
    pM = StreamPool(2, 48_000.0, rendererM, block_size=block,
                    blocks_per_step=M)
    snap1 = p1.snapshot()
    with pytest.raises(ValueError):
        pM.restore(snap1)
    with pytest.raises(ValueError):
        p1.restore(pM.snapshot())
    # The rejected pool still serves.
    s = pM.attach()
    pM.push(s, np.zeros((2, pM.step_frames), np.float32))
    pM.pump()
    assert pM.pull(s, pM.step_frames).shape == (2, pM.step_frames)


def test_pool_eq_retargets_keep_working_past_two_transitions():
    """Regression: the pool is its own control thread and must drain the
    EQ retirement handoff per round — without it the single-slot
    backpressure wedged the THIRD and every later retarget forever
    (active never reached the target, crossfading stayed latched)."""
    from airwave_tpu.io.apo import (EqualizerDefinition, EqualizerFilter,
                                    FilterType)

    def eq(gain):
        return EqualizerDefinition(-1.0, (
            EqualizerFilter(1, 1, True, FilterType.PEAKING, 900.0, gain,
                            1.0),
        ))

    block = 64
    renderer, _ = make_renderer(block=block)
    pool = StreamPool(2, 48_000.0, renderer, eq_definition=eq(1.0),
                      block_size=block)
    s = pool.attach()
    rng = np.random.default_rng(0)
    rounds_per_ramp = -(-960 // block) + 3
    for i, gain in enumerate((2.0, 3.0, 4.0, 5.0)):
        target = eq(gain)
        pool.set_equalizer(target)
        for _ in range(rounds_per_ramp):
            pool.push(s, (rng.standard_normal((2, block)) * 0.3
                          ).astype(np.float32))
            pool.pump()
            pool.pull(s, block)
        rt = pool.eq_runtime
        assert rt.active.definition == target, f"retarget {i} wedged"
        assert rt.pending_target is None and not rt.is_transitioning, i
