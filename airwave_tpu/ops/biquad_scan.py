"""Associative-scan biquad cascade (the north star's named alternative path).

BASELINE.json names "an associative-scan biquad kernel" for the EQ; this
module provides it: the DF2T recurrence s[n] = A s[n-1] + B x[n] (constant
A, B per filter — see ops/biquad_design.biquad_state_space) is a first-order
affine recurrence, so the time axis parallelizes with
jax.lax.associative_scan over elements (A_prod, b) composing as

    (A2, b2) o (A1, b1) = (A2 @ A1, A2 @ b1 + b2)

log2(T) depth, any block length, full f32/f64 dtype support. The cascade
runs as a lax.scan over the (padded, masked) filter axis so compile size is
O(1) in filter count.

PRODUCTION NOTE: the block state-space lowering (ops/eq_block.py) is the
default device path — it turns the same math into MXU matmuls with ~24x
fewer FLOPs for T=512. The scan path exists for (a) arbitrary/odd block
lengths where precomputing block matrices is wasteful, (b) f64 validation
on CPU, and (c) parity with the stated design; both are tested against the
per-sample oracle.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from airwave_tpu.ops import biquad_design as bd

MAX_FILTERS = 64


class ScanEqParams(NamedTuple):
    # Per-filter DF2T pieces, padded to MAX_FILTERS with identity filters.
    A: jax.Array        # [F, 2, 2]
    Bv: jax.Array       # [F, 2]
    b0: jax.Array       # [F]
    active: jax.Array   # [F] float (1.0 = real filter)
    preamp: jax.Array   # [] linear gain


def make_scan_params(
    coefficients: Sequence[bd.BiquadCoefficients],
    preamp_linear: float,
    dtype=jnp.float32,
    max_filters: int = MAX_FILTERS,
) -> ScanEqParams:
    count = len(coefficients)
    assert count <= max_filters
    A = np.zeros((max_filters, 2, 2), np.float64)
    Bv = np.zeros((max_filters, 2), np.float64)
    b0 = np.ones(max_filters, np.float64)
    active = np.zeros(max_filters, np.float64)
    for i, c in enumerate(coefficients):
        Ai, Bi, _Ci, Di = bd.biquad_state_space(c)
        A[i], Bv[i], b0[i], active[i] = Ai, Bi, Di, 1.0
    return ScanEqParams(
        A=jnp.asarray(A, dtype),
        Bv=jnp.asarray(Bv, dtype),
        b0=jnp.asarray(b0, dtype),
        active=jnp.asarray(active, dtype),
        preamp=jnp.asarray(preamp_linear, dtype),
    )


def make_scan_state(batch: int, channels: int = 2,
                    max_filters: int = MAX_FILTERS,
                    dtype=jnp.float32) -> jax.Array:
    """State z [B, C, F, 2]."""
    return jnp.zeros((batch, channels, max_filters, 2), dtype)


def _one_filter(x, s0, A, Bv, b0):
    """One biquad over the whole block by associative scan.

    x [..., T]; s0 [..., 2]; returns (y [..., T], s_T [..., 2])."""
    T = x.shape[-1]
    # Elements: (A_t, b_t) with A_t = A constant, b_t = Bv * x_t.
    batch_shape = x.shape[:-1]
    A_elems = jnp.broadcast_to(A, batch_shape + (T, 2, 2))
    b_elems = x[..., :, None] * Bv  # [..., T, 2]

    def combine(left, right):
        A1, b1 = left
        A2, b2 = right
        return (
            jnp.einsum("...ij,...jk->...ik", A2, A1),
            jnp.einsum("...ij,...j->...i", A2, b1) + b2,
        )

    A_cum, b_cum = jax.lax.associative_scan(
        combine, (A_elems, b_elems), axis=-3
    )
    # s[t] = A_cum[t] @ s0 + b_cum[t]  (state AFTER sample t)
    s_t = jnp.einsum("...tij,...j->...ti", A_cum, s0) + b_cum
    # y[t] = b0 x[t] + z1[t-1]; z1[t-1] = s[t-1][0] (s0 for t=0).
    z1_prev = jnp.concatenate(
        [s0[..., None, 0], s_t[..., :-1, 0]], axis=-1
    )
    y = b0 * x + z1_prev
    return y, s_t[..., -1, :]


def eq_scan_block(params: ScanEqParams, state: jax.Array, x: jax.Array):
    """Full cascade over one block: x [B, C, T] -> (state', y [B, C, T]).

    Sequential over the (padded) filter axis via lax.scan; inactive filters
    pass the signal through untouched.
    """
    u = x * params.preamp

    def per_filter(signal, inputs):
        A, Bv, b0, active, s0 = inputs
        y, s_t = _one_filter(signal, s0, A, Bv, b0)
        out = active * y + (1.0 - active) * signal
        s_next = active * s_t + (1.0 - active) * s0
        return out, s_next

    # Move filter axis first for scan: state [F, B, C, 2].
    s = jnp.moveaxis(state, 2, 0)
    y, s_out = jax.lax.scan(
        per_filter, u,
        (params.A, params.Bv, params.b0, params.active, s),
    )
    return jnp.moveaxis(s_out, 0, 2), y
