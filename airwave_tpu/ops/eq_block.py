"""Block state-space parametric EQ with vectorized crossfade (JAX, TPU-first).

TPU-native re-design of the reference's per-sample float64 DF2T cascade and
its 20 ms crossfade machine
(/root/reference/Airwave/ParametricEqualizerProcessor.swift:58-97, 254-314).

The cascade is lowered host-side (ops/biquad_design.block_ssm) to block form;
here one step processes a [B, C, T] block with:

    y    = irfft(rfft(pad(x)) * hf)[:T] + s0 @ O^T     (FFT conv + MXU matmul)
    s_T  = s0 @ A_T^T + x @ G^T                        (MXU matmuls)

Crossfade: the carry holds *two* cascade states (from/to) plus a per-stream
sample counter; each block computes both cascades and blends with the exact
per-sample ramp progress = (counter + t + 1) / L clipped to [0, 1] — outside
a transition the clip makes the output exactly the 'to' cascade, matching the
reference's active-state fast path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from airwave_tpu.ops import biquad_design as bd


# Matmul precision for the numerics-bearing contractions. HIGHEST (bf16x6
# passes) holds the 1e-5 chain contract with ~50x margin; HIGH (bf16x3) is
# ~2x faster and still passes (see BENCH_NOTES.md); DEFAULT (single bf16
# pass) fails it outright. Override via AIRWAVE_MATMUL_PRECISION.
import os as _os

PRECISION = {
    "highest": __import__("jax").lax.Precision.HIGHEST,
    "high": __import__("jax").lax.Precision.HIGH,
    "default": __import__("jax").lax.Precision.DEFAULT,
}[_os.environ.get("AIRWAVE_MATMUL_PRECISION", "highest").lower()]


# Counter value meaning "no transition in progress" (any value >= the longest
# supported transition length works; ramps are <= 0.02 * 384kHz ≈ 7680).
COUNTER_IDLE = np.int32(1 << 24)


class EqParams(NamedTuple):
    # Lower-triangular Toeplitz of the block impulse response: the causal FIR
    # part as ONE dense MXU matmul (Hm[t, k] = h[t - k] for t >= k). For
    # T = 512 this is ~6x fewer FLOPs than the FFT formulation at the
    # required (HIGHEST) matmul precision, and shorter-summation = better
    # rounding (<= T products per output vs the DFT's spectral detour).
    Hm: jax.Array   # [T, T] float32
    O: jax.Array    # [T, N] float32
    A_T: jax.Array  # [N, N] float32
    G: jax.Array    # [N, T] float32


class EqState(NamedTuple):
    s_from: jax.Array  # [B, C, N] float32
    s_to: jax.Array    # [B, C, N] float32
    counter: jax.Array  # [B] int32 — samples elapsed in the current crossfade


def make_eq_params(
    coefficients: Sequence[bd.BiquadCoefficients],
    preamp_linear: float,
    block_size: int,
    state_dim: int = 128,
    dtype=jnp.float32,
) -> EqParams:
    ssm = bd.block_ssm(coefficients, preamp_linear, block_size, state_dim)
    T = block_size
    toeplitz = np.zeros((T, T), np.float64)
    for t in range(T):
        toeplitz[t, : t + 1] = ssm.h[t::-1]
    return EqParams(
        Hm=jnp.asarray(toeplitz, dtype),
        O=jnp.asarray(ssm.O, dtype),
        A_T=jnp.asarray(ssm.A_T, dtype),
        G=jnp.asarray(ssm.G, dtype),
    )


def unity_eq_params(block_size: int, state_dim: int = 128) -> EqParams:
    """The unity state (ref ParametricEqualizerProcessor.swift:128,158)."""
    return make_eq_params([], 1.0, block_size, state_dim)


def make_eq_state(batch: int, channels: int = 2, state_dim: int = 128) -> EqState:
    return EqState(
        s_from=jnp.zeros((batch, channels, state_dim), jnp.float32),
        s_to=jnp.zeros((batch, channels, state_dim), jnp.float32),
        counter=jnp.full((batch,), COUNTER_IDLE, jnp.int32),
    )


def _cascade_block(params: EqParams, s: jax.Array, x: jax.Array):
    """Run one cascade over a block. x [B, C, T], s [B, C, N].

    FIR part = one dense triangular-Toeplitz MXU matmul; the state carries
    all cross-block history exactly (ops/biquad_design.block_ssm). ~6x fewer
    FLOPs than the FFT formulation at the required matmul precision, and
    shorter summations (<= T products per output) round better.

    (A profile-grouped StreamPool runs one cascade per group on the
    group's own lane state — runtime/stream_pool._pool_round_grouped.)"""
    fir = jnp.einsum("bct,st->bcs", x, params.Hm,
                     preferred_element_type=jnp.float32,
                     precision=PRECISION)
    hi = PRECISION
    y = fir.astype(x.dtype) + jnp.einsum(
        "bcn,tn->bct", s, params.O, preferred_element_type=x.dtype,
        precision=hi,
    )
    s_next = jnp.einsum(
        "bcn,mn->bcm", s, params.A_T, preferred_element_type=s.dtype,
        precision=hi,
    ) + jnp.einsum("bct,nt->bcn", x, params.G,
                   preferred_element_type=s.dtype, precision=hi)
    return y, s_next


def eq_step(
    params_from: EqParams,
    params_to: EqParams,
    state: EqState,
    x: jax.Array,
    transition_length: int,
    crossfade_active: bool = True,
):
    """One EQ block: x [B, C, T] -> (state', y [B, C, T]).

    `crossfade_active` is a static flag: when False (steady state, no stream
    mid-ramp) only the active cascade runs — the host flips it per block, so
    the 2x dual-cascade cost is paid only during the 20 ms ramps.
    """
    T = x.shape[-1]
    y_to, s_to = _cascade_block(params_to, state.s_to, x)

    if not crossfade_active:
        counter = jnp.minimum(state.counter + T, COUNTER_IDLE)
        return EqState(s_from=state.s_from, s_to=s_to, counter=counter), y_to

    y_from, s_from = _cascade_block(params_from, state.s_from, x)
    t = jnp.arange(T, dtype=jnp.float32)
    progress = jnp.clip(
        (state.counter[:, None].astype(jnp.float32) + t + 1.0)
        / float(transition_length),
        0.0,
        1.0,
    )  # [B, T]
    w = progress[:, None, :]
    y = y_from * (1.0 - w) + y_to * w

    counter = jnp.minimum(state.counter + T, COUNTER_IDLE)
    return EqState(s_from=s_from, s_to=s_to, counter=counter), y


def eq_apply_folded(params: EqParams, state: EqState, fir: jax.Array,
                    drive: jax.Array):
    """M-block EQ from pre-folded responses (bake path, steady state only):
    fir [B, M, C, T], drive [B, M, C, N] -> (state', y [B, M, C, T]).

    The bake chain folds this EQ's Toeplitz FIR (x @ Hm^T) and state-drive
    map (x @ G^T) into the convolution's synthesis weights
    (ops/upols.paged_project), so by the time this runs the only remaining
    work is the genuinely sequential part: the [N]-dim state recurrence
    across the M blocks (tiny matmuls) and one batched state->output
    matmul. Math is block-for-block the eq_step(crossfade_active=False)
    recurrence — y_m = x_m @ Hm^T + s_m @ O^T, s_{m+1} = s_m @ A_T^T +
    x_m @ G^T — just with the x-dependent terms precomputed.

    (A profile-grouped StreamPool folds and applies per group on the
    group's own lane state — runtime/stream_pool._pool_round_grouped.)"""
    M = fir.shape[1]
    s = state.s_to
    states = []
    for m in range(M):
        states.append(s)
        s = jnp.einsum("bcn,mn->bcm", s, params.A_T,
                       preferred_element_type=s.dtype,
                       precision=PRECISION) + drive[:, m]
    sm = jnp.stack(states, axis=1)  # [B, M, C, N]
    y = fir + jnp.einsum("bmcn,tn->bmct", sm, params.O,
                         preferred_element_type=fir.dtype,
                         precision=PRECISION)
    # The block size IS fir's trailing axis (paged_project emits T
    # columns); deriving it removes a parameter that could silently
    # disagree with the tensor and skew the crossfade counter.
    counter = jnp.minimum(state.counter + M * fir.shape[-1], COUNTER_IDLE)
    return EqState(s_from=state.s_from, s_to=s, counter=counter), y


def eq_folded_paged_round(conv_params, eq_to: EqParams, conv_state,
                          eq_state: EqState, x: jax.Array,
                          acc_chunk: int | None = None,
                          active_mask: jax.Array | None = None):
    """One steady-state M-block round with the EQ folded into the
    synthesis DFT: x [B, S, M, T] -> (conv_state', eq_state', y [B,M,C,T]).

    The single definition of the fold wiring (conv_step_paged_raw -> ONE
    paged_project pass over the concatenated [Hm^T | G^T] post-matrix so
    Ykm is read once -> fir/drive split -> eq_apply_folded), shared by the
    bake chain (models/binaural.chain_step_multi_fn) and the serving
    pool's multi-block tier (runtime/stream_pool._pool_round_paged) so
    their math cannot silently diverge. active_mask is the serving pool's
    idle-lane preservation (see conv_step_paged_raw)."""
    from airwave_tpu.ops import upols

    conv_state, Ykm = upols.conv_step_paged_raw(
        conv_params, conv_state, x, acc_chunk, active_mask
    )
    T = x.shape[-1]
    post = jnp.concatenate([eq_to.Hm.T, eq_to.G.T], axis=1)
    both = upols.paged_project(conv_params, Ykm, post=post)
    fir, drive = both[..., :T], both[..., T:]
    eq_state, y = eq_apply_folded(eq_to, eq_state, fir, drive)
    return conv_state, eq_state, y.astype(x.dtype)


def eq_begin_transition(state: EqState, stream_mask: Optional[jax.Array] = None) -> EqState:
    """Host-published retarget: 'to' becomes 'from', counter restarts.

    The caller swaps params_from <- params_to and installs the new params_to;
    this mirrors beginTransition (ref ParametricEqualizerProcessor.swift:354-359).
    Freshly-targeted cascades start from zero state, like a newly prepared
    ParametricEqualizerState.
    """
    if stream_mask is None:
        return EqState(
            s_from=state.s_to,
            s_to=jnp.zeros_like(state.s_to),
            counter=jnp.zeros_like(state.counter),
        )
    m = stream_mask.astype(bool)
    return EqState(
        s_from=jnp.where(m[:, None, None], state.s_to, state.s_from),
        s_to=jnp.where(m[:, None, None], 0, state.s_to),
        counter=jnp.where(m, 0, state.counter),
    )


def eq_finish_transition(state: EqState,
                         stream_mask: Optional[jax.Array] = None) -> EqState:
    """Control-clock transition end: idle the (masked) lanes' counters so
    any later crossfading block renders them at exactly the 'to' cascade.

    A lane that paused mid-ramp holds a counter < L; once the wall-clock
    ramp ends it must JUMP to the target (the documented idle-through-ramp
    contract) rather than resume blending — which it otherwise would
    whenever the step still runs crossfading for someone else (a grouped
    pool's other groups, or a queued target blocked on retirement)."""
    if stream_mask is None:
        return EqState(s_from=state.s_from, s_to=state.s_to,
                       counter=jnp.full_like(state.counter, COUNTER_IDLE))
    m = stream_mask.astype(bool)
    return EqState(
        s_from=state.s_from, s_to=state.s_to,
        counter=jnp.where(m, COUNTER_IDLE, state.counter),
    )


def eq_reset(state: EqState, stream_mask: Optional[jax.Array] = None) -> EqState:
    """Zero filter histories (ref ParametricEqualizerProcessor.swift:341-352)."""
    if stream_mask is None:
        return EqState(
            s_from=jnp.zeros_like(state.s_from),
            s_to=jnp.zeros_like(state.s_to),
            counter=state.counter,
        )
    m = stream_mask.astype(bool)[:, None, None]
    return EqState(
        s_from=jnp.where(m, 0, state.s_from),
        s_to=jnp.where(m, 0, state.s_to),
        counter=state.counter,
    )
