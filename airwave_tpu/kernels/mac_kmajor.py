"""Pallas TPU kernel: the UPOLS delay-line MAC at true-f32 VPU precision.

The chain's dominant op (ref ConvolutionEngine.swift:290-350 — the per-block
`sum_p FDL[p] * H[p]` accumulated for both ears) contracts only ~36 terms
(speakers x partitions x complex planes) per frequency bin, but must stream
the whole delay line from HBM. Lowered as an XLA dot_general it runs on the
MXU, where float32 costs a 6-pass bf16 decomposition (Precision.HIGHEST) —
measured ~0.8 ms/block of pure pass overhead at B=8192 on a v5e. The VPU,
by contrast, does exact single-pass f32 multiply-adds, and this op has so
few FLOPs (~1.2 G/block) that the VPU covers them inside the HBM read time.

Layout is everything here. The delay line stores the batch MINOR —
[K, R, B] with R = speakers*partitions*planes — so a VMEM tile puts the
batch on the 128-lane axis (fully utilized at any real batch) and the R
contraction rows on sublanes (36 -> 40, 11% pad). The earlier batch-major
attempt put R on lanes: 36 -> 128 padding wasted 3.5x of both VMEM and VPU
throughput and measured 2.7x SLOWER than the dot_general route. K is padded
to a multiple of 8 by the caller (ops/upols.padded_bin_count) so bin blocks
tile Mosaic's 8-sublane rule for the output; padded rows carry zero filter
weights and contribute nothing.

The grid sweeps (bin-blocks, batch-blocks) with batch innermost, keeping
each filter block resident across its batch sweep. The reduce runs over the
sublane (middle) axis; the output keeps the batch on lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

VMEM_TILE_BUDGET = 4 * 1024 * 1024  # x-tile bytes; x2 pipeline buffers


def _tile(n: int, cap: int) -> int:
    """Largest multiple-of-8 divisor of n at most cap (n itself if n<=cap)."""
    if n <= cap:
        return n
    for d in range(cap - cap % 8, 7, -8):
        if n % d == 0:
            return d
    return n


def _mac_body(n_out, n_red, x_ref, h_ref, o_ref):
    # Fully unrolled slice-FMA accumulation, r outermost: each x slice is
    # read from VMEM ONCE and FMA'd into all n_out register-resident
    # accumulators (an e-outer loop re-reads every slice n_out times —
    # 4x the VMEM traffic; a sum() over the R axis materializes the whole
    # [kb, R, bb] product in VMEM per output — both measured slower).
    h = h_ref[...]                       # [kb, O, R]
    acc = [None] * n_out
    for r in range(n_red):
        xr = x_ref[:, r, :]              # [kb, bb]
        for e in range(n_out):
            term = xr * h[:, e, r][:, None]
            acc[e] = term if acc[e] is None else acc[e] + term
    for e in range(n_out):
        o_ref[e] = acc[e]                # [kb, bb]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mac_kmajor(fdl_flat: jax.Array, h_flat: jax.Array,
               interpret: bool = False) -> jax.Array:
    """fdl_flat [K, R, B] f32, h_flat [K, O, R] f32 -> [O, K, B] f32.

    Y[o, k, b] = sum_r fdl[k, r, b] * h[k, o, r], exact f32 accumulation.
    K must be a multiple of 8 (or fit one block); B a multiple of 128 (or
    fit one block) — the caller's padded_bin_count/batch guarantee this for
    production shapes, and interpret mode has no such constraints.
    """
    K, R, B = fdl_flat.shape
    O = h_flat.shape[1]
    r_sub = R + (-R) % 8  # sublane padding actually held in VMEM
    # Small bin blocks maximize the batch tile: HBM chunks are bb*4 bytes
    # (the batch is minor), so a wide bb keeps the DMA engine in large
    # contiguous spans; kb=8 is the smallest Mosaic-tileable bin block.
    kb = _tile(K, 8)
    bb_cap = max(128, VMEM_TILE_BUDGET // (kb * r_sub * 4))
    bb = B if B <= bb_cap else max(
        (d for d in range(bb_cap - bb_cap % 128, 127, -128) if B % d == 0),
        default=B,
    )
    return pl.pallas_call(
        functools.partial(_mac_body, O, R),
        grid=(K // kb, B // bb),
        in_specs=[
            pl.BlockSpec((kb, R, bb), lambda i, j: (i, 0, j)),
            pl.BlockSpec((kb, O, R), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((O, kb, bb), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((O, K, B), jnp.float32),
        interpret=interpret,
    )(fdl_flat, h_flat)
