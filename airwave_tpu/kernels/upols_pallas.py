"""Fused Pallas TPU kernel for the UPOLS frequency-domain delay line.

The hot op of the render chain (SURVEY.md §3.1 "INNERMOST": the per-block
sum_p FDL[p] * H[p] over partitions, ref ConvolutionEngine.swift:290-350) is
HBM-bandwidth-bound: each block must read every FDL partition row and write
exactly one per speaker. This kernel fuses, per batch tile:

    1. stream the tile's FDL rows HBM -> VMEM via pallas' AUTOMATIC
       pipelining (blocked in_specs double-buffer the reads across grid
       steps — measured 10x faster than hand-rolled sequential DMAs)
    2. complex multiply-accumulate against the (pre-rotated) HRIR spectra
       for both ears on the VPU

The circular-slot insertion itself runs as an XLA dynamic_update_slice on
the FDL float planes *before* the kernel (in place; Mosaic also requires
sublane-dim DMA slices to be 8-row aligned, so single-row in-kernel stores
are off the table), so per block the FDL costs exactly (write S rows + read
S*P rows) — no full-delay-line write-back, no rolled copies. Row counts are
padded to a multiple of 8 (Mosaic sublane tiling); padded HRIR rows are zero
and contribute nothing.

Spectra use a packed-real format with K = block_size lanes: bin 0 carries
(DC, Nyquist) in (re, im) — both real for a real signal — so K tiles the
128-lane VPU exactly (512 = 4 x 128). Bin-0 products are computed as
independent real DC*DC / Nyquist*Nyquist lanes, which is algebraically what
the reference's vDSP packed-real path does (ConvolutionEngine.swift:304-311).

Complex numbers are split (re, im) float32 planes throughout (TPU Pallas has
no complex dtype). Partition counts are exact (no pow2 padding): rotation is
a dynamic slice of flip-doubled HRIR rows, so odd counts cost nothing.

The delay line is the HALF-WINDOW form shared with the XLA path
(ops/upols.py): slots hold half-window analysis spectra u_t, the
overlap-save recombination is folded into the filter bank
(ops/upols._half_window_bank, Q = P + 1 coefficients), the analysis matmul
contracts T samples instead of 2T, and no overlap buffer is carried — ONE
carry format across the package.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airwave_tpu.ops.fftmm import irfft_mm as fftmm_irfft
from airwave_tpu.ops.fftmm import rfft_mm as fftmm_rfft


class PackedConvParams(NamedTuple):
    # Flip-doubled HALF-WINDOW filter-bank rows [E, S, 2Q, K] per plane,
    # Q = P + 1 coefficients (ops/upols._half_window_bank: the overlap-save
    # recombination is folded into the bank via the shift theorem, so the
    # delay line stores half-window analysis spectra and the per-block
    # analysis matmul contracts T samples instead of 2T). Slicing
    # [.., start:start+Q, :] rotates the coefficient axis for the current
    # write position — same carry format and partition math as the XLA
    # path's ConvParams/ConvState (ops/upols.py), packed storage aside.
    h_re: jax.Array
    h_im: jax.Array
    # Packed-bin MXU DFT weights (ops/fftmm): HALF-window analysis (first
    # T rows of the 2T transform) and second-half-only synthesis.
    wf: jax.Array   # [T, T, 2]
    wi: jax.Array   # [T, 2, T]

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
    # Slots hold half-window analysis spectra u_t — the raw previous block
    # never needs carrying (no overlap buffer), exactly like ops/upols
    # ConvState; rows s-major over the bank's Q = P + 1 coefficients.
    fdl_re: jax.Array   # [B, S*Q, K] float32
    fdl_im: jax.Array   # [B, S*Q, K]
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


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


ROW_ALIGN = 8  # Mosaic sublane tiling for f32


def make_packed_params(hrir: np.ndarray, block_size: int) -> PackedConvParams:
    """Time-domain HRIRs [S, E, L] -> flip-doubled packed HALF-WINDOW bank.

    The bank is built in f64 (like ops/upols.make_conv_params) and packs
    Q = P + 1 coefficients: G_0 = s⊙H_0, G_q = H_{q-1} + s⊙H_q, G_P =
    H_{P-1} (ops/upols._half_window_bank). Both DC and Nyquist rows of G
    stay real (s_0 = 1; s_T = (-1)^T with the fold applied on unpacked
    complex bins before packing), so the vDSP-style bin-0 = (DC, Nyquist)
    lanes pack exactly as before."""
    import math

    from airwave_tpu.ops.upols import _half_window_bank

    hrir = np.asarray(hrir, np.float32)
    length = hrir.shape[-1]
    real_p = max(1, math.ceil(length / block_size))
    lead = hrir.shape[:-1]
    padded = np.zeros(lead + (real_p * block_size,), np.float64)
    padded[..., :length] = hrir
    parts = padded.reshape(lead + (real_p, block_size))
    parts = np.concatenate([parts, np.zeros_like(parts)], axis=-1)
    H = np.fft.rfft(parts, axis=-1)     # [S, E, P, K+1] complex128
    G = _half_window_bank(H)            # [S, E, P+1, K+1]
    # Pack on the HOST (numpy) so only float planes are uploaded — tunneled
    # transports cannot transfer complex64 (utils/device_arrays).
    re = np.real(G[..., :-1]).astype(np.float32)
    im = np.imag(G[..., :-1]).astype(np.float32)
    im[..., 0] = np.real(G[..., -1]).astype(np.float32)
    re = np.concatenate([re[:, :, ::-1], re[:, :, ::-1]], axis=2)
    im = np.concatenate([im[:, :, ::-1], im[:, :, ::-1]], axis=2)
    # [S, E, 2Q, K] -> [E, S, 2Q, K]
    from airwave_tpu.ops import fftmm

    n = 2 * block_size
    return PackedConvParams(
        h_re=jnp.asarray(np.transpose(re, (1, 0, 2, 3)).copy()),
        h_im=jnp.asarray(np.transpose(im, (1, 0, 2, 3)).copy()),
        wf=fftmm.rfft_weights_half_packed(n),
        wi=fftmm.irfft_weights_packed(n, block_size, block_size),
    )


def make_packed_state(batch: int, num_speakers: int, partition_count: int,
                      block_size: int, dtype=jnp.float32) -> PackedConvState:
    """`partition_count` is the bank's coefficient count Q = P + 1 (pass
    params.partition_count). dtype=jnp.bfloat16 is the opt-in "fast mode":
    halves the delay line's HBM traffic (the chain's dominant cost) at
    ~3e-3 relative error — outside the 1e-5 strict-parity contract,
    documented in docs/architecture.md."""
    rows = _round_up(num_speakers * partition_count, ROW_ALIGN)
    return PackedConvState(
        fdl_re=jnp.zeros((batch, rows, block_size), dtype),
        fdl_im=jnp.zeros((batch, rows, block_size), dtype),
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
    re = re.reshape(E, S * P, K)
    im = im.reshape(E, S * P, K)
    rows = _round_up(S * P, ROW_ALIGN)
    if rows != S * P:  # zero rows: no MAC contribution
        pad = ((0, 0), (0, rows - S * P), (0, 0))
        re = jnp.pad(re, pad)
        im = jnp.pad(im, pad)
    return re, im


def _mac_kernel(E: int,
                # inputs (blocked/full VMEM refs)
                h_re_ref, h_im_ref, f_re_ref, f_im_ref,
                # outputs
                y_re_ref, y_im_ref):
    bT = f_re_ref.shape[0]
    K = f_re_ref.shape[-1]

    # Packed-complex MAC over all rows, accumulated in float32. The FDL
    # blocks stream through VMEM via pallas' automatic pipelining (blocked
    # in_specs double-buffer the HBM reads across grid steps).
    fr = f_re_ref[:, :, :].astype(jnp.float32)
    fi = f_im_ref[:, :, :].astype(jnp.float32)
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


def _insert_slot(state: PackedConvState, x_re, x_im, S: int, P: int):
    """Circular-slot write as an XLA dynamic_update_slice on the (donated)
    FDL — in place, S rows written."""
    w = state.write_pos.astype(jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    fdl_re, fdl_im = state.fdl_re, state.fdl_im
    dtype = fdl_re.dtype
    for s_idx in range(S):
        row = s_idx * P + w
        fdl_re = jax.lax.dynamic_update_slice(
            fdl_re, x_re[:, s_idx:s_idx + 1, :].astype(dtype),
            (zero, row, zero),
        )
        fdl_im = jax.lax.dynamic_update_slice(
            fdl_im, x_im[:, s_idx:s_idx + 1, :].astype(dtype),
            (zero, row, zero),
        )
    return fdl_re, fdl_im


def _fdl_mac_call(params: PackedConvParams, fdl_re, fdl_im,
                  write_pos, batch_tile: int, interpret: bool):
    B, rows, K = fdl_re.shape
    E, S, twoP, _ = params.h_re.shape
    P = twoP // 2
    assert rows == _round_up(S * P, ROW_ALIGN)
    assert B % batch_tile == 0, (B, batch_tile)

    h_re, h_im = _rotate_h(params, write_pos)  # [E, rows, K]

    kernel = functools.partial(_mac_kernel, E)
    y_re, y_im = pl.pallas_call(
        kernel,
        grid=(B // batch_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_re (rotated, full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_im
            pl.BlockSpec((batch_tile, rows, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # fdl_re (auto-pipelined)
            pl.BlockSpec((batch_tile, rows, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # fdl_im
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, E, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, E, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, E, K), jnp.float32),
            jax.ShapeDtypeStruct((B, E, K), jnp.float32),
        ],
        interpret=interpret,
    )(h_re, h_im, fdl_re, fdl_im)
    return y_re, y_im


VMEM_BUDGET_BYTES = 9 * 1024 * 1024


def auto_batch_tile(batch: int, sp_rows: int, block_size: int,
                    itemsize: int, requested: int, ears: int = 2) -> int:
    """Largest divisor of `batch` <= requested whose working set fits VMEM.

    Per tile the pipeline holds 2 planes x 2 double-buffered blocks of
    [tile, sp_rows, block_size] FDL plus [tile, ears, block_size] outputs;
    the rotated HRIR planes (2 x ears x sp_rows x block_size) stay resident
    whole for every tile. Long IRs shrink the tile automatically; a shape
    whose resident HRIR alone exceeds the budget cannot run this kernel at
    any tile and raises rather than letting Mosaic fail opaquely."""
    resident_h = 2 * ears * sp_rows * block_size * itemsize
    if resident_h >= VMEM_BUDGET_BYTES:
        raise ValueError(
            f"packed Pallas kernel cannot fit {sp_rows} HRIR rows "
            f"({resident_h / 2**20:.1f} MiB resident) in VMEM at any batch "
            "tile — use the XLA conv_step path for this speakers/IR-length "
            "combination"
        )
    per_row = (4 * sp_rows + 4 * ears) * block_size * itemsize
    cap = max(1, (VMEM_BUDGET_BYTES - resident_h) // per_row)
    tile = min(requested, cap, batch)
    while batch % tile != 0:
        tile -= 1
    return max(tile, 1)


def conv_step_packed(params: PackedConvParams, state: PackedConvState,
                     x: jax.Array, batch_tile: int = 8,
                     interpret: bool = False):
    """One overlap-save block via the fused kernel.

    x: [B, S, T] float32 -> (state', y [B, E, T]). Drop-in semantics match
    ops.upols.conv_step (same math and half-window carry format, packed
    storage, exact coefficient count). The analysis contracts only the T
    new samples (half-window delay line — the recombination lives in the
    bank); `batch_tile` is a request, clamped so the per-tile VMEM
    scratch fits the budget (important for >=1 s impulse responses).
    """
    B, S, T = x.shape
    Q = params.partition_count
    batch_tile = auto_batch_tile(
        B, state.fdl_re.shape[1], T, state.fdl_re.dtype.itemsize, batch_tile,
        ears=params.h_re.shape[0],
    )

    planes = fftmm_rfft(x, params.wf)   # [B, S, T(packed), 2]
    x_re = planes[..., 0]
    x_im = planes[..., 1]

    fdl_re, fdl_im = _insert_slot(state, x_re, x_im, S, Q)
    y_re, y_im = _fdl_mac_call(
        params, fdl_re, fdl_im, state.write_pos, batch_tile, interpret
    )

    y = fftmm_irfft(
        jnp.stack([y_re, y_im], axis=-1), params.wi
    ).astype(x.dtype)

    new_state = PackedConvState(
        fdl_re=fdl_re,
        fdl_im=fdl_im,
        write_pos=(state.write_pos + 1) % Q,
    )
    return new_state, y
