"""Offline bake: render whole signals on-device with a lax.scan over blocks.

The BASELINE.json config-5 shape: inputs resident on device, the block loop
inside one jit (no per-block host dispatch), carry threaded by lax.scan.
This is what bench.py measures; exposed here as a library API and used by
high-throughput callers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airwave_tpu.models.binaural import ChainState, chain_step_fn
from airwave_tpu.ops import eq_block, upols


@functools.partial(
    jax.jit,
    static_argnames=("transition_length", "eq_enabled"),
    donate_argnums=(3,),
)
def bake_scan(conv_params, eq_from, eq_to, state, x_blocks,
              transition_length: int, eq_enabled: bool):
    """x_blocks [N, B, S, T] -> (state', y_blocks [N, B, 2, T])."""
    def body(s, xb):
        s, y = chain_step_fn(
            conv_params, eq_from, eq_to, s, xb,
            transition_length=transition_length,
            spatial_enabled=True,
            eq_enabled=eq_enabled,
            eq_crossfading=False,
        )
        return s, y

    return jax.lax.scan(body, state, x_blocks)


@functools.partial(
    jax.jit,
    static_argnames=("transition_length", "eq_enabled", "unroll"),
    donate_argnums=(3,),
)
def bake_scan_multi(conv_params, eq_from, eq_to, state, x_steps,
                    transition_length: int, eq_enabled: bool, unroll: int):
    """x_steps [N, B, S, M, T] -> (state', y_steps [N, B, M, 2, T]).

    The M-block lookahead path (upols.conv_step_paged): one delay-line read
    per M blocks. `unroll` must be the page count so page rotation stays
    free (see conv_step_paged)."""
    from airwave_tpu.models.binaural import chain_step_multi_fn

    def body(s, xs):
        s, y = chain_step_multi_fn(
            conv_params, eq_from, eq_to, s, xs,
            transition_length=transition_length,
            eq_enabled=eq_enabled,
            eq_crossfading=False,
        )
        return s, y

    return jax.lax.scan(body, state, x_steps, unroll=unroll)


def bake(
    hrir: np.ndarray,
    x: np.ndarray,
    sample_rate: float,
    eq_coefficients=None,
    eq_preamp: float = 1.0,
    block_size: int = 512,
    state: Optional[ChainState] = None,
    pad_to_pow2: bool = False,
    blocks_per_step: int = 1,
) -> Tuple[np.ndarray, ChainState]:
    """Render [B, S, n] through HRIRs [S, 2, L] (+ optional EQ) on device.

    Returns (y [B, 2, n], final ChainState) — the state can seed a
    continuation bake (checkpointable via utils/checkpoint).

    blocks_per_step=M > 1 renders M blocks per delay-line read (the paged
    lookahead path — ~1.2x faster on short IRs and ~2.7x on 1 s IRs,
    BENCH_NOTES.md round 2) with identical output to f32 tolerance. A
    continuation `state` must come from a bake with the same
    blocks_per_step (the carries differ).
    """
    x = np.asarray(x, np.float32)
    B, S, n = x.shape
    T = block_size
    M = int(blocks_per_step)
    stride = T * M
    padded = ((n + stride - 1) // stride) * stride
    if padded != n:
        x = np.concatenate(
            [x, np.zeros((B, S, padded - n), np.float32)], axis=-1
        )

    conv_params = upols.make_conv_params(hrir, T, pad_to_pow2=pad_to_pow2,
                                         lookahead=M)
    eq_enabled = eq_coefficients is not None
    if eq_enabled:
        eq_params = eq_block.make_eq_params(eq_coefficients, eq_preamp, T)
    else:
        eq_params = eq_block.unity_eq_params(T)
    transition_length = max(1, int(round(sample_rate * 0.020)))

    if M > 1:
        if state is None:
            state = ChainState(
                conv=upols.make_conv_state_paged(
                    B, S, conv_params.partition_count, T, M
                ),
                eq=eq_block.make_eq_state(B),
            )
        steps = jnp.asarray(np.moveaxis(
            x.reshape(B, S, padded // stride, M, T), 2, 0
        ))  # [N, B, S, M, T]
        state, y_steps = bake_scan_multi(
            conv_params, eq_params, eq_params, state, steps,
            transition_length=transition_length, eq_enabled=eq_enabled,
            unroll=len(state.conv.pages),
        )
        # y_steps [N, B, M, 2, T] -> [B, 2, N, M, T] -> [B, 2, padded]
        y = np.transpose(np.asarray(y_steps), (1, 3, 0, 2, 4)).reshape(
            B, 2, padded
        )
        return y[:, :, :n], state

    blocks = jnp.asarray(
        np.moveaxis(x.reshape(B, S, padded // T, T), 2, 0)
    )  # [N, B, S, T]
    if state is None:
        state = ChainState(
            conv=upols.make_conv_state(B, S, conv_params.partition_count, T),
            eq=eq_block.make_eq_state(B),
        )

    state, y_blocks = bake_scan(
        conv_params, eq_params, eq_params, state, blocks,
        transition_length=transition_length,
        eq_enabled=eq_enabled,
    )
    y = np.moveaxis(np.asarray(y_blocks), 0, 2).reshape(B, 2, padded)[:, :, :n]
    return y, state
