"""Fused Pallas TPU kernel for the UPOLS frequency-domain delay line.

The hot op of the render chain (SURVEY.md §3.1 "INNERMOST": the per-block
sum_p FDL[p] * H[p] over partitions, ref ConvolutionEngine.swift:290-350) is
HBM-bandwidth-bound: each block must read every FDL partition row and write
exactly one per speaker. This kernel fuses, per batch tile:

    1. DMA the tile's FDL rows HBM -> VMEM scratch
    2. overwrite the circular write slot with the new input spectra
    3. complex multiply-accumulate against the (pre-rotated) HRIR spectra
       for both ears on the VPU
    4. DMA only the UPDATED rows back through the aliased output

so per block the FDL costs exactly (read S*P rows + write S rows) — no
full-delay-line write-back, no rolled copies. The FDL buffers are threaded
functionally via input_output_aliases (in-place at the XLA level).

Spectra use a packed-real format with K = block_size lanes: bin 0 carries
(DC, Nyquist) in (re, im) — both real for a real signal — so K tiles the
128-lane VPU exactly (512 = 4 x 128). Bin-0 products are computed as
independent real DC*DC / Nyquist*Nyquist lanes, which is algebraically what
the reference's vDSP packed-real path does (ConvolutionEngine.swift:304-311).

Complex numbers are split (re, im) float32 planes throughout (TPU Pallas has
no complex dtype). Partition counts are exact (no pow2 padding): rotation is
a dynamic slice of flip-doubled HRIR rows, so odd counts cost nothing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PackedConvParams(NamedTuple):
    # Flip-doubled HRIR spectra rows [E, S, 2P, K] per plane; slicing
    # [.., start:start+P, :] rotates the partition axis for the current
    # write position.
    h_re: jax.Array
    h_im: jax.Array

    @property
    def num_ears(self) -> int:
        return self.h_re.shape[0]

    @property
    def num_speakers(self) -> int:
        return self.h_re.shape[1]

    @property
    def partition_count(self) -> int:
        return self.h_re.shape[2] // 2


class PackedConvState(NamedTuple):
    fdl_re: jax.Array   # [B, S*P, K] float32, rows s-major
    fdl_im: jax.Array   # [B, S*P, K]
    overlap: jax.Array  # [B, S, T] float32
    write_pos: jax.Array  # [] int32


def pack_spectrum(spec: jax.Array) -> tuple:
    """[..., T+1] complex -> packed (re, im) [..., T] with bin0 = (DC, Nyq)."""
    re = jnp.real(spec[..., :-1])
    im = jnp.imag(spec[..., :-1])
    im = im.at[..., 0].set(jnp.real(spec[..., -1]))
    return re, im


def unpack_spectrum(re: jax.Array, im: jax.Array) -> jax.Array:
    """Packed (re, im) [..., T] -> [..., T+1] complex."""
    nyquist = im[..., :1]
    im0 = im.at[..., 0].set(0.0)
    full_re = jnp.concatenate([re, nyquist], axis=-1)
    full_im = jnp.concatenate([im0, jnp.zeros_like(nyquist)], axis=-1)
    return full_re + 1j * full_im


def make_packed_params(hrir: np.ndarray, block_size: int) -> PackedConvParams:
    """Time-domain HRIRs [S, E, L] -> flip-doubled packed spectra rows."""
    from airwave_tpu.ops.upols import partition_spectra

    H = partition_spectra(hrir, block_size, pad_to_pow2=False)  # [S,E,P,K+1]
    re, im = pack_spectrum(jnp.asarray(H))
    re = jnp.concatenate([re[:, :, ::-1], re[:, :, ::-1]], axis=2)
    im = jnp.concatenate([im[:, :, ::-1], im[:, :, ::-1]], axis=2)
    # [S, E, 2P, K] -> [E, S, 2P, K]
    return PackedConvParams(
        h_re=jnp.transpose(re, (1, 0, 2, 3)).astype(jnp.float32),
        h_im=jnp.transpose(im, (1, 0, 2, 3)).astype(jnp.float32),
    )


def make_packed_state(batch: int, num_speakers: int, partition_count: int,
                      block_size: int, dtype=jnp.float32) -> PackedConvState:
    """dtype=jnp.bfloat16 is the opt-in "fast mode": halves the delay line's
    HBM traffic (the chain's dominant cost) at ~3e-3 relative error — outside
    the 1e-5 strict-parity contract, documented in docs/architecture.md."""
    return PackedConvState(
        fdl_re=jnp.zeros((batch, num_speakers * partition_count, block_size),
                         dtype),
        fdl_im=jnp.zeros((batch, num_speakers * partition_count, block_size),
                         dtype),
        overlap=jnp.zeros((batch, num_speakers, block_size), jnp.float32),
        write_pos=jnp.zeros((), jnp.int32),
    )


def _rotate_h(params: PackedConvParams, write_pos: jax.Array) -> tuple:
    """[E, S, 2P, K] -> [E, S*P, K]: row j of speaker s multiplies the FDL
    slot holding the block from (write_pos - j) blocks ago."""
    E, S, twoP, K = params.h_re.shape
    P = twoP // 2
    start = (P - 1) - write_pos.astype(jnp.int32)
    re = jax.lax.dynamic_slice_in_dim(params.h_re, start, P, axis=2)
    im = jax.lax.dynamic_slice_in_dim(params.h_im, start, P, axis=2)
    return re.reshape(E, S * P, K), im.reshape(E, S * P, K)


def _mac_kernel(S: int, P: int, E: int,
                # scalar prefetch
                w_ref,
                # inputs
                x_re_ref, x_im_ref, h_re_ref, h_im_ref,
                fdl_re_in, fdl_im_in,
                # outputs
                y_re_ref, y_im_ref, fdl_re_out, fdl_im_out,
                # scratch
                f_re, f_im, sems):
    bT = f_re.shape[0]
    b0 = pl.program_id(0) * bT
    K = f_re.shape[-1]
    w = w_ref[0]

    load_re = pltpu.make_async_copy(
        fdl_re_in.at[pl.ds(b0, bT)], f_re, sems.at[0]
    )
    load_im = pltpu.make_async_copy(
        fdl_im_in.at[pl.ds(b0, bT)], f_im, sems.at[1]
    )
    load_re.start()
    load_im.start()
    load_re.wait()
    load_im.wait()

    # Insert the new spectra at the circular slot for every speaker.
    for s in range(S):
        row = s * P + w
        f_re[:, pl.ds(row, 1), :] = x_re_ref[:, pl.ds(s, 1), :].astype(
            f_re.dtype
        )
        f_im[:, pl.ds(row, 1), :] = x_im_ref[:, pl.ds(s, 1), :].astype(
            f_im.dtype
        )

    # Packed-complex MAC over all S*P rows, accumulated in float32.
    fr = f_re[:, :, :].astype(jnp.float32)
    fi = f_im[:, :, :].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bT, K), 1)
    is_bin0 = lane == 0
    for e in range(E):
        hr = h_re_ref[e, :, :]
        hi = h_im_ref[e, :, :]
        a = jnp.sum(fr * hr, axis=1)   # sum(re*re)   [bT, K]
        b = jnp.sum(fi * hi, axis=1)   # sum(im*im)
        c = jnp.sum(fr * hi, axis=1)
        d = jnp.sum(fi * hr, axis=1)
        y_re_ref[:, e, :] = jnp.where(is_bin0, a, a - b)
        y_im_ref[:, e, :] = jnp.where(is_bin0, b, c + d)

    # Write back ONLY the updated rows through the aliased outputs.
    for s in range(S):
        row = s * P + w
        store_re = pltpu.make_async_copy(
            f_re.at[:, pl.ds(row, 1), :],
            fdl_re_out.at[pl.ds(b0, bT), pl.ds(row, 1), :],
            sems.at[2],
        )
        store_im = pltpu.make_async_copy(
            f_im.at[:, pl.ds(row, 1), :],
            fdl_im_out.at[pl.ds(b0, bT), pl.ds(row, 1), :],
            sems.at[3],
        )
        store_re.start()
        store_im.start()
        store_re.wait()
        store_im.wait()


def _fdl_mac_call(params: PackedConvParams, state: PackedConvState,
                  x_re, x_im, batch_tile: int, interpret: bool):
    B, SP, K = state.fdl_re.shape
    E, S, twoP, _ = params.h_re.shape
    P = twoP // 2
    assert SP == S * P
    assert B % batch_tile == 0, (B, batch_tile)

    fdl_dtype = state.fdl_re.dtype
    h_re, h_im = _rotate_h(params, state.write_pos)
    w = jnp.reshape(state.write_pos.astype(jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, S, K), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, S, K), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_re (rotated, full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_im
            pl.BlockSpec(memory_space=pl.ANY),   # fdl_re (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # fdl_im
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, E, K), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, E, K), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # fdl_re out (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # fdl_im out (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, SP, K), fdl_dtype),
            pltpu.VMEM((batch_tile, SP, K), fdl_dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(_mac_kernel, S, P, E)
    y_re, y_im, fdl_re, fdl_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, E, K), jnp.float32),
            jax.ShapeDtypeStruct((B, E, K), jnp.float32),
            jax.ShapeDtypeStruct((B, SP, K), fdl_dtype),
            jax.ShapeDtypeStruct((B, SP, K), fdl_dtype),
        ],
        # Operand indices include the scalar-prefetch arg: w=0, x_re=1,
        # x_im=2, h_re=3, h_im=4, fdl_re=5, fdl_im=6.
        input_output_aliases={5: 2, 6: 3},
        interpret=interpret,
    )(w, x_re, x_im, h_re, h_im, state.fdl_re, state.fdl_im)
    return y_re, y_im, fdl_re, fdl_im


VMEM_SCRATCH_BUDGET_BYTES = 8 * 1024 * 1024


def auto_batch_tile(batch: int, sp_rows: int, block_size: int,
                    itemsize: int, requested: int) -> int:
    """Largest divisor of `batch` <= requested whose two FDL scratch planes
    fit the VMEM budget (long IRs shrink the tile automatically)."""
    per_row = 2 * sp_rows * block_size * itemsize
    cap = max(1, VMEM_SCRATCH_BUDGET_BYTES // per_row)
    tile = min(requested, cap, batch)
    while batch % tile != 0:
        tile -= 1
    return max(tile, 1)


def conv_step_packed(params: PackedConvParams, state: PackedConvState,
                     x: jax.Array, batch_tile: int = 8,
                     interpret: bool = False):
    """One overlap-save block via the fused kernel.

    x: [B, S, T] float32 -> (state', y [B, E, T]). Drop-in semantics match
    ops.upols.conv_step (same math, packed storage, exact partition count).
    `batch_tile` is a request; it is clamped so the per-tile VMEM scratch
    fits the budget (important for >=1 s impulse responses).
    """
    B, S, T = x.shape
    P = params.partition_count
    batch_tile = auto_batch_tile(
        B, state.fdl_re.shape[1], T, state.fdl_re.dtype.itemsize, batch_tile
    )

    frame = jnp.concatenate([state.overlap, x], axis=-1)
    X = jnp.fft.rfft(frame, axis=-1)
    x_re, x_im = pack_spectrum(X)
    x_re = x_re.astype(jnp.float32)
    x_im = x_im.astype(jnp.float32)

    y_re, y_im, fdl_re, fdl_im = _fdl_mac_call(
        params, state, x_re, x_im, batch_tile, interpret
    )

    Y = unpack_spectrum(y_re, y_im)
    y = jnp.fft.irfft(Y, n=2 * T, axis=-1)[..., T:].astype(x.dtype)

    new_state = PackedConvState(
        fdl_re=fdl_re,
        fdl_im=fdl_im,
        overlap=x,
        write_pos=(state.write_pos + 1) % P,
    )
    return new_state, y
