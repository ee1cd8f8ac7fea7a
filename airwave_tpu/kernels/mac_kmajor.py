"""Pallas TPU kernel: the UPOLS delay-line MAC at true-f32 VPU precision.

The chain's dominant op (ref ConvolutionEngine.swift:290-350 — the per-block
`sum_p FDL[p] * H[p]` accumulated for both ears) contracts only ~36 terms
(speakers x partitions x complex planes) per frequency bin, but must stream
the whole delay line from HBM. Lowered as an XLA dot_general it runs on the
MXU, where float32 costs a 6-pass bf16 decomposition (Precision.HIGHEST) —
measured ~0.8 ms/block of pure pass overhead at B=8192 on a v5e. The VPU,
by contrast, does exact single-pass f32 multiply-adds, and this op has so
few FLOPs (~1.2 G/block) that the VPU covers them inside the HBM read time.

So this kernel streams the k-major delay line [K, B, R] through VMEM
(Pallas auto-pipelined blocked in_specs, grid ordered so the per-bin filter
block stays resident across the batch sweep) and does the contraction as
four broadcast-multiply-reduces on the VPU. Accuracy equals the f32
reference bit-for-bit in expectation (no operand quantization at all);
speed approaches the single-read bandwidth floor.

Layout notes: R = speakers*partitions*planes (~36) sits on the lane axis,
padded to 128 by Mosaic — wasteful for compute but free for DMA (only real
bytes move HBM->VMEM), and the op is bandwidth-bound. K and B tile the
sublane/grid axes with divisor-chosen block sizes so no ragged masking is
needed (K = block+1 is odd: 513 = 27*19, 65 = 5*13, ...).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

VMEM_TILE_BUDGET = 4 * 1024 * 1024  # x-tile bytes; x2 pipeline buffers


def _batch_tile(batch: int, cap: int) -> int:
    """Largest batch tile <= cap that keeps Mosaic's tiling rule: the
    sublane-adjacent block dim must be a multiple of 8 or the full dim."""
    if batch <= cap:
        return batch
    for d in range(cap - cap % 8, 7, -8):
        if batch % d == 0:
            return d
    return batch


def _mac_body(n_out, x_ref, h_ref, o_ref):
    x = x_ref[...]                       # [K, bb, R]
    h = h_ref[...]                       # [K, O, R]
    for e in range(n_out):
        acc = jnp.sum(x * h[:, e, :][:, None, :], axis=-1)  # [K, bb]
        o_ref[e] = acc.T                                    # [bb, K]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mac_kmajor(fdl_flat: jax.Array, h_flat: jax.Array,
               interpret: bool = False) -> jax.Array:
    """fdl_flat [K, B, R] f32, h_flat [K, O, R] f32 -> [O, B, K] f32.

    Y[o, b, k] = sum_r fdl[k, b, r] * h[k, o, r], exact f32 accumulation.

    Blocks span all K bins (K = block+1 is odd, so it can't tile the
    8-sublane rule; as the full dim it's exempt) and a slice of the batch;
    the grid sweeps the batch only, keeping the filter block resident. In
    [K, B, R] storage a (K, bb, R) block is K contiguous bb*R-float chunks —
    DMA-friendly. The output keeps K on the lane axis (full-dim exempt
    again) with the batch tile on sublanes, via a cheap in-kernel
    transpose; the output index lives on the leading axis (Mosaic supports
    neither minor-axis scalar gathers nor lane-strided stores).
    """
    K, B, R = fdl_flat.shape
    O = h_flat.shape[1]
    r_pad = -(-R // 128) * 128  # VMEM tiles pad the lane dim to 128
    bb = _batch_tile(B, max(1, VMEM_TILE_BUDGET // (K * r_pad * 4)))
    return pl.pallas_call(
        functools.partial(_mac_body, O),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((K, bb, R), lambda j: (0, j, 0)),
            pl.BlockSpec((K, O, R), lambda j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((O, bb, K), lambda j: (0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((O, B, K), jnp.float32),
        interpret=interpret,
    )(fdl_flat, h_flat)
