"""Profile-grouped serving: G (HRIR, EQ) profiles served in ONE step.

Parity contract: a grouped round over B lanes split into G contiguous
segments must match, to f32 rounding, G independent ungrouped rounds each
run on its segment with its own params and its OWN lane state (the tuple
design — runtime/stream_pool._pool_round_grouped). This is the device-side
foundation of the multi-profile StreamPool (one pool, G tenant profiles,
one dispatch per round — beyond the reference, which is single-profile by
construction; cf. one DeviceProfile at a time,
/root/reference/Airwave/DeviceProfileRuntimeCoordinator.swift:62-121).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.ops import eq_block, upols
from airwave_tpu.runtime.stream_pool import PoolState, pool_step_body

BLOCK = 64
S, E = 2, 2


def _hrir(rng, length, scale=0.4):
    h = (rng.standard_normal((S, E, length)) * scale).astype(np.float32)
    h[:, :, 0] += 0.7
    return h


def _group_params(lengths, block=BLOCK, lookahead=1, partitions=None):
    rng = np.random.default_rng(7)
    singles = []
    for ln in lengths:
        singles.append(
            upols.make_conv_params(
                _hrir(rng, ln), block, pad_to_pow2=False,
                lookahead=lookahead, partitions=partitions,
            )
        )
    return singles


def _eq_designs(sample_rate=48_000.0):
    defs = [
        None,
        EqualizerDefinition(-2.0, (
            EqualizerFilter(1, 1, True, FilterType.PEAKING, 900.0, 3.0, 1.1),
            EqualizerFilter(2, 2, True, FilterType.LOW_SHELF, 120.0, -2.5,
                            0.7),
        )),
        EqualizerDefinition(1.5, (
            EqualizerFilter(1, 1, True, FilterType.HIGH_SHELF, 8000.0, 4.0,
                            0.8),
        )),
    ]
    out = []
    for d in defs:
        preamp, coeffs = bd.design_cascade(d, sample_rate)
        out.append(eq_block.make_eq_params(coeffs, preamp, BLOCK,
                                           state_dim=32))
    return out


def test_make_conv_params_partitions_override_pads_and_validates():
    rng = np.random.default_rng(0)
    hrir = _hrir(rng, 3 * BLOCK)
    p = upols.make_conv_params(hrir, BLOCK, pad_to_pow2=False, partitions=7)
    assert p.partition_count == 7
    with pytest.raises(ValueError, match="cannot hold"):
        upols.make_conv_params(_hrir(rng, 8 * BLOCK), BLOCK,
                               pad_to_pow2=False, partitions=7)
    with pytest.raises(ValueError, match="divisible"):
        upols.make_conv_params(hrir, BLOCK,
                               pad_to_pow2=False, lookahead=2, partitions=7)
    # The padded tail is inert: outputs match the unpadded params.
    q = upols.make_conv_params(hrir, BLOCK, pad_to_pow2=False)
    rng2 = np.random.default_rng(1)
    x = (rng2.standard_normal((4, S, BLOCK)) * 0.5).astype(np.float32)
    sp = upols.make_conv_state(4, S, p.partition_count, BLOCK)
    sq = upols.make_conv_state(4, S, q.partition_count, BLOCK)
    outs = []
    for params, st in ((p, sp), (q, sq)):
        st2, y1 = upols.conv_step(params, st, jnp.asarray(x))
        _, y2 = upols.conv_step(params, st2, jnp.asarray(x))
        outs.append(np.concatenate([np.asarray(y1), np.asarray(y2)], -1))
    # The padded line contracts more (zero) rows, so the f32 reduction
    # order differs slightly; the tail itself is exactly inert.
    np.testing.assert_allclose(outs[0], outs[1], atol=5e-6)


def _mk_states(singles, Bg, M=1):
    if M > 1:
        convs = tuple(
            upols.make_conv_state_paged(Bg, S, p.partition_count, BLOCK, M)
            for p in singles
        )
    else:
        convs = tuple(
            upols.make_conv_state(Bg, S, p.partition_count, BLOCK)
            for p in singles
        )
    eqs = tuple(eq_block.make_eq_state(Bg, 2, 32) for _ in singles)
    return convs, eqs


@pytest.mark.parametrize("crossfading", [False, True])
@pytest.mark.heavy
def test_grouped_round_matches_per_group_rounds(crossfading):
    """pool_step_body with G-tuple params/state == G independent ungrouped
    rounds on the lane segments (masked ring variant, ragged harvests,
    heterogeneous per-group partition counts)."""
    G, Bg = 3, 4
    B = G * Bg
    singles = _group_params([2 * BLOCK, 4 * BLOCK, 3 * BLOCK])
    eq_to = _eq_designs()
    eq_from = _eq_designs()[::-1]
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((5, B, S, BLOCK)) * 0.5).astype(np.float32)
    masks = (rng.random((5, B)) < 0.8)
    masks[0] = True

    convs, eqs = _mk_states(singles, Bg)
    gstate = PoolState(conv=convs, eq=eqs)
    sstates = [PoolState(conv=c, eq=e)
               for c, e in zip(*_mk_states(singles, Bg))]
    for t in range(5):
        idx = np.flatnonzero(masks[t]).astype(np.int32)
        gstate, yg = pool_step_body(
            tuple(singles), tuple(eq_from), tuple(eq_to), gstate,
            jnp.asarray(x[t, masks[t]]), jnp.asarray(idx),
            transition_length=4 * BLOCK, eq_enabled=True,
            eq_crossfading=crossfading, variant="ring",
        )
        yg = np.asarray(yg)
        for g in range(G):
            sl = slice(g * Bg, (g + 1) * Bg)
            lidx = np.flatnonzero(masks[t, sl]).astype(np.int32)
            if lidx.size == 0:
                continue
            sstates[g], ys = pool_step_body(
                singles[g], eq_from[g], eq_to[g], sstates[g],
                jnp.asarray(x[t, sl][masks[t, sl]]), jnp.asarray(lidx),
                transition_length=4 * BLOCK, eq_enabled=True,
                eq_crossfading=crossfading, variant="ring",
            )
            sel = (idx >= g * Bg) & (idx < (g + 1) * Bg)
            np.testing.assert_allclose(yg[sel], np.asarray(ys), atol=2e-5)
    for g in range(G):
        np.testing.assert_allclose(
            np.asarray(gstate.conv[g].fdl), np.asarray(sstates[g].conv.fdl),
            rtol=1e-4, atol=1e-5,
        )


@pytest.mark.parametrize("crossfading", [False, True])
@pytest.mark.heavy
def test_grouped_paged_round_matches_per_group(crossfading):
    """The multi-block tier's grouped round (folded EQ in steady state,
    dual-cascade during ramps) == per-group ungrouped rounds."""
    G, Bg, M = 2, 4, 2
    B = G * Bg
    singles = _group_params([2 * BLOCK, 4 * BLOCK], lookahead=M)
    eq_to = _eq_designs()[1:3]
    eq_from = _eq_designs()[1:3]
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((3, B, S, M, BLOCK)) * 0.5).astype(np.float32)
    masks = (rng.random((3, B)) < 0.75)
    masks[0] = True

    convs, eqs = _mk_states(singles, Bg, M)
    gstate = PoolState(conv=convs, eq=eqs)
    sstates = [PoolState(conv=c, eq=e)
               for c, e in zip(*_mk_states(singles, Bg, M))]
    for t in range(3):
        idx = np.flatnonzero(masks[t]).astype(np.int32)
        gstate, yg = pool_step_body(
            tuple(singles), tuple(eq_from), tuple(eq_to), gstate,
            jnp.asarray(x[t, masks[t]]), jnp.asarray(idx),
            transition_length=4 * BLOCK, eq_enabled=True,
            eq_crossfading=crossfading, variant="paged",
        )
        yg = np.asarray(yg)
        for g in range(G):
            sl = slice(g * Bg, (g + 1) * Bg)
            lidx = np.flatnonzero(masks[t, sl]).astype(np.int32)
            if lidx.size == 0:
                continue
            sstates[g], ys = pool_step_body(
                singles[g], eq_from[g], eq_to[g], sstates[g],
                jnp.asarray(x[t, sl][masks[t, sl]]), jnp.asarray(lidx),
                transition_length=4 * BLOCK, eq_enabled=True,
                eq_crossfading=crossfading, variant="paged",
            )
            sel = (idx >= g * Bg) & (idx < (g + 1) * Bg)
            np.testing.assert_allclose(
                yg[sel], np.asarray(ys), rtol=1e-4, atol=5e-5,
            )
    for g in range(G):
        for pg, ps in zip(gstate.conv[g].pages, sstates[g].conv.pages):
            np.testing.assert_allclose(
                np.asarray(pg), np.asarray(ps), rtol=1e-4, atol=1e-5,
            )


# --- grouped StreamPool --------------------------------------------------

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import PoolProfile, StreamPool


def _renderer(frames, seed, block=BLOCK, lookahead=1, partitions=None,
              layout=cm.STEREO):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((14, frames)) * 0.2).astype(np.float32)
    return prepare_renderer(WAVData(48_000.0, audio), layout, 48_000.0,
                            block, lookahead=lookahead,
                            partitions=partitions)


def _eq_def(kind):
    if kind == 0:
        return None
    if kind == 1:
        return EqualizerDefinition(-1.5, (
            EqualizerFilter(1, 1, True, FilterType.PEAKING, 700.0, 2.5,
                            1.0),
        ))
    return EqualizerDefinition(2.0, (
        EqualizerFilter(1, 1, True, FilterType.HIGH_SHELF, 6000.0, -3.0,
                        0.8),
    ))


def _run_schedule(pools_and_streams, signal, schedule, step_frames):
    """Drive (pool, stream) lanes with a shared push schedule; returns
    per-lane concatenated pulls. pools may repeat (grouped pool)."""
    fed = [0] * len(pools_and_streams)
    rounds = len(schedule)
    for rnd in range(rounds):
        for i, (pool, stream) in enumerate(pools_and_streams):
            if schedule[rnd][i] and fed[i] < signal.shape[-1] // step_frames:
                lo = fed[i] * step_frames
                pool.push(stream, signal[i][:, lo:lo + step_frames])
                fed[i] += 1
        for pool in dict.fromkeys(p for p, _ in pools_and_streams):
            pool.pump()
    outs = []
    for i, (pool, stream) in enumerate(pools_and_streams):
        outs.append(pool.pull(stream, fed[i] * step_frames))
    return outs


def test_grouped_pool_matches_independent_pools_ragged():
    """G=2 grouped pool == 2 single-profile pools, ragged pauses, steady
    EQ (one group EQ'd, one unity)."""
    r0 = _renderer(2 * BLOCK, 20, partitions=5)
    r1 = _renderer(4 * BLOCK, 21, partitions=5)
    gpool = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(r0, _eq_def(1)), PoolProfile(r1, None),
    ])
    p0 = StreamPool(2, 48_000.0, r0, eq_definition=_eq_def(1),
                    block_size=BLOCK)
    p1 = StreamPool(2, 48_000.0, r1, block_size=BLOCK)
    lanes = [(gpool, gpool.attach(0)), (gpool, gpool.attach(0)),
             (gpool, gpool.attach(1)), (gpool, gpool.attach(1))]
    ref = [(p0, p0.attach()), (p0, p0.attach()),
           (p1, p1.attach()), (p1, p1.attach())]
    assert [s for _, s in lanes] == [0, 1, 2, 3]

    rng = np.random.default_rng(30)
    signal = (rng.standard_normal((4, 2, 6 * BLOCK)) * 0.4).astype(
        np.float32)
    schedule = (rng.random((9, 4)) < 0.7)
    schedule[0] = True
    got = _run_schedule(lanes, signal, schedule, BLOCK)
    want = _run_schedule(ref, signal, schedule, BLOCK)
    for g, w in zip(got, want):
        assert w.shape == g.shape and np.abs(w).max() > 1e-3
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=5e-5)


def test_grouped_pool_per_group_eq_retarget_crossfades_one_segment():
    """A group=1 retarget ramps only group 1's lanes; all-active schedule
    keeps the grouped pool's shared round clock == each ref pool's."""
    r0 = _renderer(2 * BLOCK, 22)
    r1 = _renderer(2 * BLOCK, 23)
    gpool = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(r0, _eq_def(1)), PoolProfile(r1, _eq_def(2)),
    ])
    p0 = StreamPool(2, 48_000.0, r0, eq_definition=_eq_def(1),
                    block_size=BLOCK)
    p1 = StreamPool(2, 48_000.0, r1, eq_definition=_eq_def(2),
                    block_size=BLOCK)
    lanes = [(gpool, gpool.attach(0)), (gpool, gpool.attach(0)),
             (gpool, gpool.attach(1)), (gpool, gpool.attach(1))]
    ref = [(p0, p0.attach()), (p0, p0.attach()),
           (p1, p1.attach()), (p1, p1.attach())]
    rng = np.random.default_rng(31)
    signal = (rng.standard_normal((4, 2, 8 * BLOCK)) * 0.4).astype(
        np.float32)
    fed = 0
    outs_g = [[] for _ in range(4)]
    outs_r = [[] for _ in range(4)]
    for rnd in range(8):
        if rnd == 3:
            gpool.set_equalizer(_eq_def(2), group=1)
            p1.set_equalizer(_eq_def(2))
        if rnd == 5:
            gpool.set_equalizer(None, group=0)  # unity ramp, group 0 only
            p0.set_equalizer(None)
        for i, (pool, stream) in enumerate(lanes):
            pool.push(stream, signal[i][:, fed * BLOCK:(fed + 1) * BLOCK])
        for i, (pool, stream) in enumerate(ref):
            pool.push(stream, signal[i][:, fed * BLOCK:(fed + 1) * BLOCK])
        fed += 1
        gpool.pump()
        p0.pump()
        p1.pump()
        for i, (pool, stream) in enumerate(lanes):
            outs_g[i].append(pool.pull(stream, BLOCK))
        for i, (pool, stream) in enumerate(ref):
            outs_r[i].append(pool.pull(stream, BLOCK))
    for i in range(4):
        g = np.concatenate(outs_g[i], axis=1)
        w = np.concatenate(outs_r[i], axis=1)
        assert np.abs(w).max() > 1e-3
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=5e-5)


@pytest.mark.heavy
def test_grouped_pool_multi_block_tier_matches_independent():
    """blocks_per_step=2 grouped (paged line + folded per-group EQ) == 2
    single-profile multi-block pools under step-granular pauses."""
    M = 2
    r0 = _renderer(2 * BLOCK, 24, lookahead=M, partitions=6)
    r1 = _renderer(3 * BLOCK, 25, lookahead=M, partitions=6)
    gpool = StreamPool(4, 48_000.0, block_size=BLOCK, blocks_per_step=M,
                       profiles=[PoolProfile(r0, _eq_def(1)),
                                 PoolProfile(r1, _eq_def(2))])
    p0 = StreamPool(2, 48_000.0, r0, eq_definition=_eq_def(1),
                    block_size=BLOCK, blocks_per_step=M)
    p1 = StreamPool(2, 48_000.0, r1, eq_definition=_eq_def(2),
                    block_size=BLOCK, blocks_per_step=M)
    lanes = [(gpool, gpool.attach(0)), (gpool, gpool.attach(0)),
             (gpool, gpool.attach(1)), (gpool, gpool.attach(1))]
    ref = [(p0, p0.attach()), (p0, p0.attach()),
           (p1, p1.attach()), (p1, p1.attach())]
    rng = np.random.default_rng(32)
    step = M * BLOCK
    signal = (rng.standard_normal((4, 2, 4 * step)) * 0.4).astype(
        np.float32)
    schedule = (rng.random((7, 4)) < 0.7)
    schedule[0] = True
    got = _run_schedule(lanes, signal, schedule, step)
    want = _run_schedule(ref, signal, schedule, step)
    for g, w in zip(got, want):
        assert np.abs(w).max() > 1e-3
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=5e-5)


def test_grouped_pool_bookkeeping_and_validation():
    r0 = _renderer(2 * BLOCK, 26)
    r1 = _renderer(2 * BLOCK, 27)
    with pytest.raises(ValueError, match="divide"):
        StreamPool(5, 48_000.0, block_size=BLOCK,
                   profiles=[PoolProfile(r0), PoolProfile(r1)])
    with pytest.raises(ValueError, match="not both"):
        StreamPool(4, 48_000.0, r0, block_size=BLOCK,
                   profiles=[PoolProfile(r0)])
    with pytest.raises(TypeError, match="renderer is required"):
        StreamPool(4, 48_000.0, block_size=BLOCK)
    # Different partition counts are ALLOWED — each group carries its own
    # delay line (the tuple design); only (speakers, block) must match.
    longer = _renderer(5 * BLOCK, 28)
    het = StreamPool(4, 48_000.0, block_size=BLOCK,
                     profiles=[PoolProfile(r0), PoolProfile(longer)])
    assert het._lane_cycles[0] != het._lane_cycles[-1]
    with pytest.raises(ValueError, match="share"):
        StreamPool(4, 48_000.0, block_size=BLOCK, profiles=[
            PoolProfile(r0),
            PoolProfile(_renderer(2 * BLOCK, 29, layout=cm.SURROUND_5_1)),
        ])

    pool = StreamPool(4, 48_000.0, block_size=BLOCK,
                      profiles=[PoolProfile(r0), PoolProfile(r1)])
    assert pool.groups == 2 and pool.group_size == 2
    a = pool.attach(0)
    b = pool.attach(0)
    assert {pool.group_of(a), pool.group_of(b)} == {0}
    with pytest.raises(RuntimeError, match="group 0 is full"):
        pool.attach(0)
    c = pool.attach(1)
    assert pool.group_of(c) == 1
    with pytest.raises(ValueError, match="out of range"):
        pool.attach(2)
    pool.detach(b)
    assert pool.attach(0) == b
    with pytest.raises(ValueError, match="group"):
        pool.set_renderer(r0)  # grouped pool needs group=
    # A grouped swap may change the group's partition count (its own
    # delay line is reallocated); (speakers, block) must stay.
    pool.set_renderer(longer, group=1)
    assert pool._lane_cycles[-1] == longer.partition_count
    with pytest.raises(ValueError, match="out of range"):
        pool.set_equalizer(_eq_def(1), group=7)


def test_grouped_pool_set_renderer_resets_only_that_group():
    r0 = _renderer(2 * BLOCK, 33)
    r1 = _renderer(2 * BLOCK, 34)
    r1b = _renderer(2 * BLOCK, 35)
    gpool = StreamPool(4, 48_000.0, block_size=BLOCK,
                       profiles=[PoolProfile(r0), PoolProfile(r1)])
    # Reference: group 0 keeps streaming continuously; group 1 restarts on
    # a fresh pool with the new bank at the swap point.
    p0 = StreamPool(2, 48_000.0, r0, block_size=BLOCK)
    s_g0, s_g1 = gpool.attach(0), gpool.attach(1)
    s_r0 = p0.attach()
    rng = np.random.default_rng(36)
    sig = (rng.standard_normal((2, 2, 6 * BLOCK)) * 0.4).astype(np.float32)
    for t in range(3):
        sl = np.s_[:, t * BLOCK:(t + 1) * BLOCK]
        gpool.push(s_g0, sig[0][sl])
        gpool.push(s_g1, sig[1][sl])
        p0.push(s_r0, sig[0][sl])
        gpool.pump()
        p0.pump()
    # crossfade=False pins the reset semantics (the crossfaded default is
    # differential-tested in test_hotswap.py).
    gpool.set_renderer(r1b, group=1, crossfade=False)
    p1b = StreamPool(2, 48_000.0, r1b, block_size=BLOCK)
    s_r1 = p1b.attach()
    for t in range(3, 6):
        sl = np.s_[:, t * BLOCK:(t + 1) * BLOCK]
        gpool.push(s_g0, sig[0][sl])
        gpool.push(s_g1, sig[1][sl])
        p0.push(s_r0, sig[0][sl])
        p1b.push(s_r1, sig[1][sl])
        gpool.pump()
        p0.pump()
        p1b.pump()
    # Group 0: uninterrupted parity across the swap.
    np.testing.assert_allclose(
        gpool.pull(s_g0, 6 * BLOCK), p0.pull(s_r0, 6 * BLOCK),
        rtol=1e-4, atol=5e-5,
    )
    # Group 1 after the swap: fresh history through the new bank.
    got1 = gpool.pull(s_g1, 6 * BLOCK)[:, 3 * BLOCK:]
    want1 = p1b.pull(s_r1, 3 * BLOCK)
    assert np.abs(want1).max() > 1e-3
    np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=5e-5)


def test_grouped_pool_snapshot_restore():
    r0 = _renderer(2 * BLOCK, 40)
    r1 = _renderer(2 * BLOCK, 41)
    profiles = [PoolProfile(r0, _eq_def(1)), PoolProfile(r1, _eq_def(2))]
    a = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=profiles)
    s0, s1 = a.attach(0), a.attach(1)
    rng = np.random.default_rng(42)
    sig = (rng.standard_normal((2, 2, 4 * BLOCK)) * 0.4).astype(np.float32)
    for t in range(2):
        sl = np.s_[:, t * BLOCK:(t + 1) * BLOCK]
        a.push(s0, sig[0][sl])
        a.push(s1, sig[1][sl])
        a.pump()
        a.pull(s0, BLOCK)
        a.pull(s1, BLOCK)
    a.set_equalizer(_eq_def(2), group=0)  # mid-flight retarget captured
    snap = a.snapshot()

    b = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=profiles)
    b.restore(snap)
    outs = []
    for pool in (a, b):
        for t in range(2, 4):
            sl = np.s_[:, t * BLOCK:(t + 1) * BLOCK]
            pool.push(s0, sig[0][sl])
            pool.push(s1, sig[1][sl])
            pool.pump()
        outs.append(np.stack([pool.pull(s0, 2 * BLOCK),
                              pool.pull(s1, 2 * BLOCK)]))
    np.testing.assert_array_equal(outs[0], outs[1])

    single = StreamPool(4, 48_000.0, r0, block_size=BLOCK)
    with pytest.raises(ValueError, match="profile groups"):
        single.restore(snap)


@pytest.mark.heavy
def test_grouped_pool_over_mesh_matches_unsharded():
    import jax
    from airwave_tpu.parallel import mesh as pmesh

    r0 = _renderer(2 * BLOCK, 50)
    r1 = _renderer(2 * BLOCK, 51)
    profiles = [PoolProfile(r0, _eq_def(1)), PoolProfile(r1, None)]
    mesh = pmesh.make_mesh(jax.devices("cpu")[:4], ("streams",))
    sharded = StreamPool(8, 48_000.0, block_size=BLOCK, profiles=profiles,
                         mesh=mesh)
    plain = StreamPool(8, 48_000.0, block_size=BLOCK, profiles=profiles)
    lanes_s = [sharded.attach(g) for g in (0, 0, 1, 1)]
    lanes_p = [plain.attach(g) for g in (0, 0, 1, 1)]
    rng = np.random.default_rng(52)
    sig = (rng.standard_normal((4, 2, 4 * BLOCK)) * 0.4).astype(np.float32)
    schedule = (rng.random((6, 4)) < 0.75)
    schedule[0] = True
    got = _run_schedule(list(zip([sharded] * 4, lanes_s)), sig, schedule,
                        BLOCK)
    want = _run_schedule(list(zip([plain] * 4, lanes_p)), sig, schedule,
                         BLOCK)
    for g, w in zip(got, want):
        assert np.abs(w).max() > 1e-3
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=5e-5)


@pytest.mark.heavy
def test_grouped_server_churn_across_groups():
    """CI-scale churn: waves of clients across both groups with live
    per-group retargets between waves; no slot leaks, per-group free
    lists intact, every render finite and shape-correct."""
    import time

    from airwave_tpu.shell.serve import RenderServer, render_via_server

    rng = np.random.default_rng(60)
    banks = [(rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
             for _ in range(2)]
    rends = [prepare_renderer(WAVData(48_000.0, a), cm.STEREO, 48_000.0,
                              BLOCK) for a in banks]
    pool = StreamPool(6, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(rends[0], _eq_def(1)), PoolProfile(rends[1], None),
    ])
    srv = RenderServer(pool, port=0)
    srv.start()
    try:
        import threading

        for wave in range(4):
            if wave == 2:
                srv.set_equalizer(_eq_def(2), group=1)
            k = 2 + wave % 2
            signals = [
                (rng.standard_normal(
                    (2, (1 + wave % 3) * BLOCK + wave % 13)) * 0.3
                 ).astype(np.float32)
                for _ in range(k)
            ]
            results = [None] * k
            threads = [
                threading.Thread(
                    target=lambda i=i: results.__setitem__(
                        i, render_via_server(srv.address, signals[i],
                                             chunk=83, group=i % 2)
                    )
                )
                for i in range(k)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            for i, r in enumerate(results):
                assert r is not None and r.shape == signals[i].shape, (
                    wave, i)
                assert np.all(np.isfinite(r))
        deadline = time.monotonic() + 5
        while pool._attached and time.monotonic() < deadline:
            time.sleep(0.01)
        assert not pool._attached
        for g, fl in enumerate(pool._free_by_group):
            assert sorted(fl) == list(range(g * 3, (g + 1) * 3)), (g, fl)
        assert srv.pump_errors == 0 and pool.render_errors == 0
    finally:
        srv.stop()


@pytest.mark.parametrize("M", [1, 2])
@pytest.mark.heavy
def test_grouped_pool_randomized_differential_with_churn(M):
    """Seeded fuzz (both serving tiers): grouped pool vs per-group pools
    under random ragged schedules, detach/attach churn, and per-group EQ
    retargets. The EQ ramp clock is round-based, so retargets happen at
    synchronized all-active stretches (short test crossfade) — everything
    else is random. Every pulled sample must match."""
    from airwave_tpu.config import AirwaveConfig

    cfg = AirwaveConfig(crossfade_duration_seconds=2 * BLOCK / 48_000.0)
    G, Bg = 2, 2
    B = G * Bg
    step = M * BLOCK
    for seed in (101, 202):
        rng = np.random.default_rng(seed)
        # Heterogeneous HRIR lengths (2 vs 6 partitions at M=1, 2 vs 3
        # pages at M=2): per-group delay lines + per-lane debt cycles.
        r0 = _renderer(2 * BLOCK, seed, lookahead=M)
        r1 = _renderer(5 * BLOCK, seed + 1, lookahead=M)
        assert r0.partition_count != r1.partition_count
        gpool = StreamPool(B, 48_000.0, block_size=BLOCK, config=cfg,
                           blocks_per_step=M,
                           profiles=[PoolProfile(r0, _eq_def(1)),
                                     PoolProfile(r1, _eq_def(2))])
        refs = [StreamPool(Bg, 48_000.0, r0, eq_definition=_eq_def(1),
                           block_size=BLOCK, config=cfg, blocks_per_step=M),
                StreamPool(Bg, 48_000.0, r1, eq_definition=_eq_def(2),
                           block_size=BLOCK, config=cfg, blocks_per_step=M)]
        # lane i of group g <-> ref pool g lane i; None = detached
        glanes = [[None] * Bg for _ in range(G)]
        rlanes = [[None] * Bg for _ in range(G)]
        got = {}
        want = {}

        def attach(g, i):
            glanes[g][i] = gpool.attach(g)
            rlanes[g][i] = refs[g].attach()
            got.setdefault((g, i), [])
            want.setdefault((g, i), [])

        for g in range(G):
            for i in range(Bg):
                attach(g, i)

        ramp_guard = 0
        for rnd in range(40):
            if ramp_guard == 0 and rng.random() < 0.15:
                # Synchronized retarget: all-active rounds for the whole
                # (short) ramp so both sides' round clocks agree.
                tg = int(rng.integers(0, G))
                new = _eq_def(int(rng.integers(0, 3)))
                gpool.set_equalizer(new, group=tg)
                refs[tg].set_equalizer(new)
                ramp_guard = 4
            active = (rng.random((G, Bg)) < 0.7) | (ramp_guard > 0)
            ramp_guard = max(0, ramp_guard - 1)
            for g in range(G):
                for i in range(Bg):
                    if glanes[g][i] is None:
                        if rng.random() < 0.3:
                            attach(g, i)
                        continue
                    if ramp_guard == 0 and rng.random() < 0.05:
                        gpool.detach(glanes[g][i])
                        refs[g].detach(rlanes[g][i])
                        glanes[g][i] = None
                        continue
                    if active[g, i]:
                        chunk = (rng.standard_normal((2, step)) * 0.4
                                 ).astype(np.float32)
                        gpool.push(glanes[g][i], chunk)
                        refs[g].push(rlanes[g][i], chunk)
            gpool.pump()
            for p in refs:
                p.pump()
            for g in range(G):
                for i in range(Bg):
                    if glanes[g][i] is None:
                        continue
                    a = gpool.available(glanes[g][i])
                    b = refs[g].available(rlanes[g][i])
                    assert a == b, (rnd, g, i, a, b)
                    if a:
                        got[(g, i)].append(gpool.pull(glanes[g][i], a))
                        want[(g, i)].append(refs[g].pull(rlanes[g][i], a))
        for key in got:
            if not got[key]:
                continue
            ga = np.concatenate(got[key], axis=1)
            wa = np.concatenate(want[key], axis=1)
            np.testing.assert_allclose(ga, wa, rtol=1e-4, atol=5e-5,
                                       err_msg=str((seed, key)))


def test_pool_snapshot_persists_to_disk_and_resumes(tmp_path):
    """save_pool_snapshot/load_pool_snapshot: a grouped pool checkpoint
    (mid-crossfade, with debt) survives disk and resumes bit-identically
    in a fresh pool; structure mismatches are typed errors."""
    from airwave_tpu.utils.checkpoint import (load_pool_snapshot,
                                              save_pool_snapshot)

    r0 = _renderer(2 * BLOCK, 70)
    r1 = _renderer(2 * BLOCK, 71)
    profiles = [PoolProfile(r0, _eq_def(1)), PoolProfile(r1, _eq_def(2))]
    a = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=profiles)
    s0, s1 = a.attach(0), a.attach(1)
    rng = np.random.default_rng(72)
    sig = (rng.standard_normal((2, 2, 6 * BLOCK)) * 0.4).astype(np.float32)
    for t in range(3):
        sl = np.s_[:, t * BLOCK:(t + 1) * BLOCK]
        a.push(s0, sig[0][sl])
        if t != 1:  # lane s1 pauses once: nonzero alignment debt
            a.push(s1, sig[1][sl])
        a.pump()
    a.set_equalizer(_eq_def(0), group=1)  # mid-flight retarget captured
    # Drain pre-snapshot renders (ring contents are transient by design
    # and not captured), so both pools render exactly the same 3 blocks
    # in the comparison phase.
    for s in (s0, s1):
        a.pull(s, a.available(s))
    path = str(tmp_path / "pool_ckpt")
    save_pool_snapshot(path, a.snapshot())

    b = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=profiles)
    b.restore(load_pool_snapshot(path, b))
    outs = []
    for pool, lanes in ((a, (s0, s1)), (b, (s0, s1))):
        for t in range(3, 6):
            sl = np.s_[:, t * BLOCK:(t + 1) * BLOCK]
            pool.push(lanes[0], sig[0][sl])
            pool.push(lanes[1], sig[1][sl])
            pool.pump()
        outs.append(np.stack([pool.pull(lanes[0], 3 * BLOCK),
                              pool.pull(lanes[1], 3 * BLOCK)]))
    assert np.abs(outs[0]).max() > 1e-3
    np.testing.assert_array_equal(outs[0], outs[1])

    # Structure mismatch (different partition shape) is a typed error.
    other = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(_renderer(5 * BLOCK, 73), None),
        PoolProfile(_renderer(5 * BLOCK, 74), None),
    ])
    with pytest.raises(ValueError):
        load_pool_snapshot(path, other)


def test_grouped_push_many_maps_layout_channels_vectorized():
    """Batch ingest with full layout channels on a grouped pool: each
    row maps through its stream's group's input indices (one gather, no
    per-stream host loop) — equivalent to per-stream push."""
    r0 = _renderer(2 * BLOCK, 80, layout=cm.ATMOS_7_1_4)
    r1 = _renderer(2 * BLOCK, 81, layout=cm.ATMOS_7_1_4)
    a = StreamPool(4, 48_000.0, block_size=BLOCK,
                   profiles=[PoolProfile(r0), PoolProfile(r1)])
    b = StreamPool(4, 48_000.0, block_size=BLOCK,
                   profiles=[PoolProfile(r0), PoolProfile(r1)])
    lanes_a = [a.attach(0), a.attach(1)]
    lanes_b = [b.attach(0), b.attach(1)]
    rng = np.random.default_rng(82)
    chunks = (rng.standard_normal((2, 12, 2 * BLOCK)) * 0.3).astype(
        np.float32)  # full 7.1.4 layout channels, heights dropped
    a.push_many(lanes_a, chunks)
    for lane, chunk in zip(lanes_b, chunks):
        b.push(lane, chunk)
    a.pump()
    b.pump()
    for la, lb in zip(lanes_a, lanes_b):
        np.testing.assert_array_equal(a.pull(la, 2 * BLOCK),
                                      b.pull(lb, 2 * BLOCK))
    with pytest.raises(ValueError, match="neither"):
        a.push_many(lanes_a, np.zeros((2, 5, BLOCK), np.float32))
