"""Pallas TPU kernel: paged-delay-line MAC with in-VMEM page accumulation.

Motivation (BENCH_NOTES.md round-2 addendum): at config-5 (13 pages) the
XLA lowering writes every page-dot's 545 MB Ykm term to HBM and sums them
in one big fusion — ~1.27 ms/block of pure intermediate traffic. This
kernel runs the same per-bin [R x O] dots on the MXU but accumulates
across pages in a VMEM scratch accumulator, so the only HBM traffic is
the unavoidable page reads plus ONE Ykm write.

Layout contract (matches ops/upols._paged_mac's flattened operands):
    pages: n_pages tensors [Kp, R, B] float32   (R = S*C*M contraction rows)
    gmats: n_pages tensors [Kp, R, O] float32   (O = M*E*Q output columns)
    out:   [Kp, B, O] float32

Grid: (Kp/kt, B/bt); every cell accumulates all pages for its (k, b) tile.
Precision: the in-kernel dot_general requests Precision.HIGHEST like the
XLA path; parity vs the XLA lowering is asserted by tests (and should be
re-verified on-chip with scripts/validate_accuracy.py before trusting a
new toolchain — Mosaic owns the lowering here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, n_pages: int):
    # refs: page_0..page_{n-1}, g_0..g_{n-1}, out
    out_ref = refs[-1]
    pages = refs[:n_pages]
    gmats = refs[n_pages:2 * n_pages]
    acc = None
    for a in range(n_pages):
        term = jax.lax.dot_general(
            pages[a][:], gmats[a][:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [kt, bt, O]
        acc = term if acc is None else acc + term
    out_ref[:] = acc


def mac_paged(pages, gmats, *, k_tile: int = 8, b_tile: int = 256,
              interpret: bool = False) -> jax.Array:
    """pages/gmats: sequences of [Kp, R, B] / [Kp, R, O] -> Ykm [Kp, B, O]."""
    n_pages = len(pages)
    Kp, R, B = pages[0].shape
    O = gmats[0].shape[-1]

    def fit(tile: int, n: int) -> int:
        tile = min(tile, n)
        while n % tile:
            tile -= 1
        return tile

    k_tile = fit(k_tile, Kp)
    b_tile = fit(b_tile, B)

    page_spec = pl.BlockSpec(
        (k_tile, R, b_tile), lambda i, j: (i, 0, j),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (k_tile, R, O), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (k_tile, b_tile, O), lambda i, j: (i, j, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_pages=n_pages),
        grid=(Kp // k_tile, B // b_tile),
        in_specs=[page_spec] * n_pages + [g_spec] * n_pages,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, B, O), jnp.float32),
        interpret=interpret,
    )(*pages, *gmats)
