"""Profile-grouped primitives: G (HRIR, EQ) profiles served in ONE step.

Parity contract: a grouped step over B lanes split into G contiguous
segments must match, to f32 rounding, G independent ungrouped steps each
run on its segment with its own params. This is the device-side foundation
of the multi-profile StreamPool (one pool, G tenant profiles, one
dispatch per round — beyond the reference, which is single-profile by
construction; cf. one DeviceProfile at a time,
/root/reference/Airwave/DeviceProfileRuntimeCoordinator.swift:62-121).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.ops import eq_block, upols

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
    return singles, upols.stack_conv_params(singles)


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
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_stack_conv_params_validates_shapes():
    singles, _ = _group_params([2 * BLOCK, 3 * BLOCK, 3 * BLOCK],
                               partitions=4)
    bad = upols.make_conv_params(
        _hrir(np.random.default_rng(9), 2 * BLOCK), BLOCK,
        pad_to_pow2=False,
    )
    with pytest.raises(ValueError, match="partition"):
        upols.stack_conv_params([singles[0], bad])
    with pytest.raises(ValueError, match="at least one"):
        upols.stack_conv_params([])


def test_grouped_conv_step_matches_per_group_steps():
    G, Bg = 3, 4
    B = G * Bg
    singles, grouped = _group_params([2 * BLOCK, 4 * BLOCK, 3 * BLOCK],
                                     partitions=4)
    assert grouped.groups == G and grouped.partition_count == 4
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((5, B, S, BLOCK)) * 0.5).astype(np.float32)

    gstate = upols.make_conv_state(B, S, 4, BLOCK)
    sstates = [upols.make_conv_state(Bg, S, 4, BLOCK) for _ in range(G)]
    # Ragged activity exercises the masked ring path per group.
    masks = (rng.random((5, B)) < 0.8)
    masks[0] = True
    for t in range(5):
        m = jnp.asarray(masks[t])
        gstate, yg = upols.conv_step(grouped, gstate, jnp.asarray(x[t]), m)
        yg = np.asarray(yg)
        for g in range(G):
            sl = slice(g * Bg, (g + 1) * Bg)
            sstates[g], ys = upols.conv_step(
                singles[g], sstates[g], jnp.asarray(x[t, sl]),
                jnp.asarray(masks[t, sl]),
            )
            active = masks[t, sl]
            np.testing.assert_allclose(
                yg[sl][active], np.asarray(ys)[active], atol=2e-5,
            )
    for g in range(G):
        sl = slice(g * Bg, (g + 1) * Bg)
        np.testing.assert_allclose(
            np.asarray(gstate.fdl)[..., sl], np.asarray(sstates[g].fdl),
            rtol=1e-4, atol=1e-5,
        )


def test_grouped_eq_step_matches_per_group(crossfade=True):
    G, Bg = 3, 4
    B = G * Bg
    params = _eq_designs()
    stacked = eq_block.stack_eq_params(params)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((4, B, 2, BLOCK)) * 0.5).astype(np.float32)

    gstate = eq_block.make_eq_state(B, 2, 32)
    sstates = [eq_block.make_eq_state(Bg, 2, 32) for _ in range(G)]
    # Mid-ramp counters differ per lane.
    counters = rng.integers(0, 3 * BLOCK, B).astype(np.int32)
    gstate = gstate._replace(counter=jnp.asarray(counters))
    from_params = _eq_designs()[::-1]
    from_stacked = eq_block.stack_eq_params(from_params)
    for g in range(G):
        sstates[g] = sstates[g]._replace(
            counter=jnp.asarray(counters[g * Bg:(g + 1) * Bg])
        )
    for t in range(4):
        gstate, yg = eq_block.eq_step(
            from_stacked, stacked, gstate, jnp.asarray(x[t]),
            transition_length=4 * BLOCK, crossfade_active=crossfade,
        )
        yg = np.asarray(yg)
        for g in range(G):
            sl = slice(g * Bg, (g + 1) * Bg)
            sstates[g], ys = eq_block.eq_step(
                from_params[g], params[g], sstates[g],
                jnp.asarray(x[t, sl]),
                transition_length=4 * BLOCK, crossfade_active=crossfade,
            )
            np.testing.assert_allclose(yg[sl], np.asarray(ys), atol=2e-5)


def test_grouped_eq_step_steady_state():
    test_grouped_eq_step_matches_per_group(crossfade=False)


def test_grouped_paged_round_with_folded_eq_matches_per_group():
    G, Bg, M = 2, 4, 2
    B = G * Bg
    singles, grouped = _group_params([2 * BLOCK, 3 * BLOCK], lookahead=M,
                                     partitions=4)
    eq_params = _eq_designs()[1:3]
    eq_stacked = eq_block.stack_eq_params(eq_params)
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((3, B, S, M, BLOCK)) * 0.5).astype(np.float32)
    masks = (rng.random((3, B)) < 0.75)
    masks[0] = True

    gconv = upols.make_conv_state_paged(B, S, 4, BLOCK, M)
    geq = eq_block.make_eq_state(B, 2, 32)
    sconv = [upols.make_conv_state_paged(Bg, S, 4, BLOCK, M)
             for _ in range(G)]
    seq = [eq_block.make_eq_state(Bg, 2, 32) for _ in range(G)]

    for t in range(3):
        m = jnp.asarray(masks[t])
        gconv, geq, yg = eq_block.eq_folded_paged_round(
            grouped, eq_stacked, gconv, geq, jnp.asarray(x[t]),
            active_mask=m,
        )
        yg = np.asarray(yg)
        for g in range(G):
            sl = slice(g * Bg, (g + 1) * Bg)
            sconv[g], seq[g], ys = eq_block.eq_folded_paged_round(
                singles[g], eq_params[g], sconv[g], seq[g],
                jnp.asarray(x[t, sl]),
                active_mask=jnp.asarray(masks[t, sl]),
            )
            active = masks[t, sl]
            # Grouped vs single dots sum in different orders; the diff is
            # bounded f32 rounding (measured rel <= 3.5e-6 over 10 rounds).
            np.testing.assert_allclose(
                yg[sl][active], np.asarray(ys)[active], rtol=1e-4,
                atol=5e-5,
            )
    for g in range(G):
        sl = slice(g * Bg, (g + 1) * Bg)
        for pg, ps in zip(gconv.pages, sconv[g].pages):
            np.testing.assert_allclose(
                np.asarray(pg)[..., sl], np.asarray(ps), rtol=1e-4,
                atol=1e-5,
            )


def test_grouped_paged_step_plain_projection_matches():
    """conv_step_paged (no EQ fold) on grouped params: shared synthesis
    weights, per-group MAC."""
    G, Bg, M = 2, 3, 2
    B = G * Bg
    singles, grouped = _group_params([2 * BLOCK, 3 * BLOCK], lookahead=M,
                                     partitions=4)
    rng = np.random.default_rng(13)
    x = (rng.standard_normal((2, B, S, M, BLOCK)) * 0.5).astype(np.float32)
    gconv = upols.make_conv_state_paged(B, S, 4, BLOCK, M)
    sconv = [upols.make_conv_state_paged(Bg, S, 4, BLOCK, M)
             for _ in range(G)]
    for t in range(2):
        gconv, yg = upols.conv_step_paged(grouped, gconv, jnp.asarray(x[t]))
        yg = np.asarray(yg)
        for g in range(G):
            sl = slice(g * Bg, (g + 1) * Bg)
            sconv[g], ys = upols.conv_step_paged(
                singles[g], sconv[g], jnp.asarray(x[t, sl])
            )
            np.testing.assert_allclose(yg[sl], np.asarray(ys), atol=2e-5)
