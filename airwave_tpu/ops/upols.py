"""Batched Uniform Partitioned Overlap-Save convolution (JAX, TPU-first).

TPU-native re-design of /root/reference/Airwave/ConvolutionEngine.swift:68-407.
The reference runs one mono stream x one HRIR per engine object with vDSP;
here a single functional step convolves a whole batch of streams, all virtual
speakers, and both ears at once:

    state:  fdl [Kp, S, P2, 2, B] f32     frequency-domain delay line of
                                          HALF-window spectra u_t = W1 @ b_t
                                          (re/im planes, batch minor)
            write_pos int32               circular FDL write cursor
    params: G [S, E, 2*P2, K, 2] f32      half-window filter bank per ear
                                          (flip-doubled for slice rotation)

Key TPU decisions:
  - The delay line stores HALF-window analysis spectra. The overlap-save
    window [b_{t-1}, b_t] satisfies X_t = u_{t-1} + s ⊙ u_t with
    s_k = (-1)^k (the half-frame shift theorem), so the UPOLS sum
    sum_p H_p X_{t-p} collapses onto the u history against a precomputed
    bank G_q = H_{q-1} + s⊙H_q (one extra partition). The analysis matmul
    contracts T samples instead of 2T — HALF the DFT FLOPs, no
    overlap-block carry, no window concat on the hot path — while the MAC,
    synthesis, and every rotation/masking protocol are unchanged
    (measured: the analysis was the single largest term of the chain
    profile at 6-pass HIGHEST precision, BENCH_NOTES.md).
  - The FDL is written in place (one dynamic_update_slice per block); the
    *filter* spectra are rotated instead of the delay line. Rotating G is
    O(S*E*P*K) with no batch factor, so per-block HBM traffic is just the
    unavoidable FDL read for the multiply-accumulate. (The reference instead
    walks the FDL with a modulo cursor, ConvolutionEngine.swift:316-350.)
  - Partition counts are padded to a power of two (mirroring the reference's
    pow2 bucketing, ConvolutionEngine.swift:96) so preset hot-swaps reuse the
    compiled step; zero partitions contribute nothing.
  - vDSP's packed-real FFT scaling (2x forward each, 0.25/N output,
    ConvolutionEngine.swift:356-358) algebraically cancels to plain
    rfft -> sum(FDL*G) -> irfft, so no packing emulation is needed.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from airwave_tpu.ops import fftmm

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

# MAC lowering (see _mac_irfft): "dot" | "einsum". Measured on a v5e at
# B=8192: dot_general 4.14 ms/block chain vs einsum 5.13 ms — XLA lowers the
# einsum as a reduce fusion that re-reads the delay line per (ear, plane)
# output, while the explicit k-batched dot reads it once.
_MAC_IMPL = _os.environ.get("AIRWAVE_MAC_IMPL", "dot").lower()

# Paged-MAC lowering: block-diagonal bin grouping (see _paged_mac). Exact
# math either way. MEASURED AND REJECTED as the default: the 4x zero-block
# FLOP inflation at 6 HIGHEST passes outweighs the tile-utilization gain on
# every config tried (headline 3.63 vs 3.29 ms/block, config-5 5.85 vs
# 4.33 — BENCH_NOTES.md round-2 addendum); XLA already schedules the small
# k-batched dots densely. Kept behind the flag for re-measurement.
_PAGED_MAC_GROUPING = _os.environ.get(
    "AIRWAVE_PAGED_MAC_GROUPING", "0"
) != "0"

# Read-side page concat for the paged MAC (VERDICT r4 Weak #2): ONE
# k-batched dot over concatenate(pages, slot axis) against the full
# [P2, M]-windowed filter tensor, instead of one dot per page + a sum
# fusion — targeting the ~0.66 ms/block of Ykm term adds/layout in
# PROFILE_r4_headline.txt. The rejected "shift concat" (1.7 ms/block,
# BENCH_NOTES) was the WRITE side (concatenating to form the new line);
# this is the unmeasured READ side: the pages stay separate carry
# tensors (rotation stays free renaming) and only the MAC's operand view
# is a concat, which XLA may fuse into the dot read. Exact math, page
# sum merely reassociated into the dot's own reduction. MEASURED AND
# REJECTED on-chip (r5 queue, same-session A/B): XLA materializes the
# concatenated operand instead of fusing it — headline 4.796 vs 4.008
# ms/block at B=16384 (−16%), 2.363 vs 2.072 at B=8192, config-5 4.016
# vs 3.925. Kept for re-measurement on future toolchains (grouping
# precedent); incompatible knobs (grouping, acc-chunk) take precedence.
_PAGED_MAC_CONCAT = _os.environ.get(
    "AIRWAVE_PAGED_MAC_CONCAT", "0"
) != "0"

# Accumulation chunking for the paged MAC. Without it XLA schedules every
# page's dot before the summing fusion, keeping all n_pages Ykm terms
# (545 MB each at the production shapes) alive at once — at 13 pages
# (config-5) that is ~7 GB of temporaries, pushing peak memory past HBM
# and triggering rematerialization of the analysis DFT. A barrier every
# AIRWAVE_PAGED_ACC_CHUNK pages threads the accumulator into the next
# page's dot operand, bounding live terms to the chunk size. MEASURED AND
# REJECTED as the default: temp memory drops 12 -> 5 GB and remat shrinks,
# but config-5 runs 2% SLOWER (chunk 2/4/6 = 19.7/19.8/19.8k vs 20.2k
# unchunked) — XLA's remat choice costs less than the barrier's scheduling
# constraint. 0 (default) disables; kept for memory-tight shapes, where
# OOM beats speed.
_PAGED_ACC_CHUNK = int(_os.environ.get("AIRWAVE_PAGED_ACC_CHUNK", "0"))

# NOTE on a removed variant: a Pallas kernel accumulating the per-page
# dots in VMEM (one Ykm write instead of n_pages terms + a sum fusion —
# targeting config-5's ~1.27 ms/block of summed-term traffic) was built,
# parity-tested in interpret mode, and compiled for v5e with temp memory
# down from 12 GB to 2.1 GB; on REAL hardware its execution faulted
# (FailedPrecondition, then a session wedge) on two isolated attempts
# while the XLA path ran fine in between. Removed rather than shipped as
# a flag-trap; see BENCH_NOTES.md round-2 addendum and git history
# (kernels/mac_paged.py) for the design if a future toolchain wants to
# retry it.

# Paged delay-line logical layout. "kcsmb" carries pages as [Kp, C, S, M, B]
# — the analysis dot's NATURAL output order when the frames operand is
# arranged [S, M, B, 2T] — so the new page needs no layout copy before
# becoming a MAC operand (the profile shows a ~0.22 ms/block copy of the
# analysis output in the default order). Measured on-chip before switching
# the default; identical math either way (the filter tensor is permuted to
# match).
_PAGED_LAYOUT = _os.environ.get("AIRWAVE_PAGED_LAYOUT", "kscmb").lower()
if _PAGED_LAYOUT not in ("kscmb", "kcsmb"):
    # Must be loud: for stereo (S=2) the two layouts have IDENTICAL array
    # shapes, so a typo'd value silently treated as the default would
    # contract the (re,im) plane axis against the speaker axis of a
    # mismatched carry — garbage audio with no error anywhere downstream.
    raise ValueError(
        f"AIRWAVE_PAGED_LAYOUT={_PAGED_LAYOUT!r}: expected kscmb or kcsmb"
    )

# AIRWAVE_MAC_PRECISION overrides the MAC contraction's precision alone.
# Measured: HIGH here (DFTs kept at HIGHEST) gives 1.3e-5 chain rel RMS —
# just over the 1e-5 contract, because the quantization lands on the
# delayed signal spectra themselves — so the default stays HIGHEST.
_MAC_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    "": None,
}[_os.environ.get("AIRWAVE_MAC_PRECISION", "").lower()] or PRECISION




class ConvParams(NamedTuple):
    # Half-window filter bank (see _half_window_bank), partition-flipped and
    # doubled along the partition axis so the per-block rotation is a single
    # dynamic slice: Gflip2[..., j, :, :] with j in [start, start+P2) yields
    # G[(write_pos - j) % P2].
    #
    # STORAGE IS FLOAT PLANES with a trailing (re, im) axis. Complex64 is
    # avoided end-to-end in carried/transferred buffers: on this TPU backend
    # a complex dynamic_update_slice rewrites the whole buffer (~20x the
    # in-place cost) and tunneled transports cannot transfer complex64 at
    # all; float-plane storage makes the slot write in-place and keeps the
    # MAC on the fast path (see docs/architecture.md "Precision policy").
    Gflip2: jax.Array  # [S, E, 2*P2, K, 2] float32
    # Direct MXU DFT weights (ops/fftmm): HALF-window analysis (the first T
    # rows of the 2T transform — the shift-theorem recombination lives in
    # Gflip2) and synthesis of the second half only (overlap-save discard).
    # MEASURED CHOICE: the two-stage Cooley-Tukey variant (fftmm.rfft_mm2)
    # has ~5x fewer FLOPs but its 32-64-length contractions under-utilize
    # the 128x128 MXU — 8.8 ms/block vs 5.1 ms direct on a v5e at B=8192 —
    # so the full-contraction direct form wins and is used here.
    wf: jax.Array      # [T, K, 2] float32
    wi: jax.Array      # [K, 2, T] float32

    @property
    def num_speakers(self) -> int:
        return self.Gflip2.shape[-5]

    @property
    def num_ears(self) -> int:
        return self.Gflip2.shape[-4]

    @property
    def partition_count(self) -> int:
        return self.Gflip2.shape[-3] // 2

    @property
    def num_bins(self) -> int:
        return self.Gflip2.shape[-2]


class ConvState(NamedTuple):
    # FDL stored bin-major / batch-MINOR: [Kp, S, P2, 2, B], Kp = K padded
    # to a multiple of 8 (padded_bin_count). Slots hold HALF-window analysis
    # spectra u (module docstring) — the raw previous block never needs
    # carrying, so the delay line IS the whole convolution state. The MAC is
    # a k-batched contraction over (speaker, partition, plane); with the
    # batch on the minor axis those ~36 contraction rows sit on sublanes and
    # the batch fills the 128-lane axis, so the exact-f32 VPU kernel
    # (kernels/mac_kmajor) tiles it natively with no lane padding waste.
    fdl: jax.Array        # [Kp, S, P2, 2, B] float32 (re/im planes at -2)
    write_pos: jax.Array  # [] int32


def _half_window_bank(H: np.ndarray) -> np.ndarray:
    """Fold the overlap-save window recombination into the filter bank.

    The delay line stores HALF-window analysis spectra u_t = W1 @ b_t (W1 =
    the first T rows of the 2T-point DFT). Because the 2T window
    [b_{t-1}, b_t] is two copies of the half transform shifted by T samples,
    the shift theorem gives X_t = u_{t-1} + s ⊙ u_t with s_k = (-1)^k, and
    the UPOLS sum over full-window spectra collapses onto the u history:

        sum_{p=0}^{P-1} H_p X_{t-p} = sum_{q=0}^{P} G_q u_{t-q},
        G_0 = s⊙H_0,   G_q = H_{q-1} + s⊙H_q,   G_P = H_{P-1}.

    One extra partition (and its slot of delay-line traffic) buys HALF the
    analysis-DFT FLOPs — the recombination is precomputed here, in f64, at
    zero per-block cost. H: [S, E, P, K] complex -> [S, E, P+1, K]."""
    K = H.shape[-1]
    s = ((-1.0) ** np.arange(K))[None, None, None, :]
    z = np.zeros_like(H[:, :, :1])
    return np.concatenate([z, H], axis=2) + s * np.concatenate([H, z], axis=2)


def make_conv_params(hrir: np.ndarray, block_size: int,
                     pad_to_pow2: bool = True,
                     lookahead: int = 1,
                     partitions: int | None = None) -> ConvParams:
    """Build ConvParams from time-domain HRIRs [S, E, L].

    The stored bank is the HALF-WINDOW form (see _half_window_bank): a
    P-partition HRIR yields P+1 filter coefficients, so `partition_count`
    reads one higher than ceil(L / block_size).

    pad_to_pow2=True keeps compiled-step shapes stable across preset swaps
    (the reference's bucketing rationale); False uses the exact coefficient
    count — less FDL traffic, at the cost of a re-jit when a preset
    changes partition count.

    lookahead=M reserves M-1 zero partitions at the tail so conv_step_paged
    can render M blocks per delay-line read: the slots holding blocks that
    are "future" relative to output m then land on zero filter weights (see
    conv_step_paged).

    partitions=N forces the stored partition count to exactly N (zero tail
    partitions pad the difference) — useful to keep compiled-step shapes
    identical across renderers (e.g. hot swaps without a re-jit). N must
    cover the HRIR's half-window bank (plus the lookahead tail) and stay
    divisible by the lookahead. (A grouped StreamPool does NOT need this:
    each profile group carries its own delay line and may have its own
    partition count.)"""
    hrir = np.asarray(hrir, np.float32)
    length = hrir.shape[-1]
    real_p = max(1, math.ceil(length / block_size))
    lead = hrir.shape[:-1]
    padded = np.zeros(lead + (real_p * block_size,), np.float64)
    padded[..., :length] = hrir
    parts = padded.reshape(lead + (real_p, block_size))
    parts = np.concatenate([parts, np.zeros_like(parts)], axis=-1)
    H = np.fft.rfft(parts, axis=-1)            # [S, E, P, K] complex128
    G = _half_window_bank(H)                   # [S, E, P+1, K]
    base = G.shape[2]
    need = base
    # pow2 bucketing buckets the REAL partition count, then adds the
    # half-window bank's +1 coefficient (and the lookahead tail): a
    # 4-partition HRIR buckets to 4+1 = 5 slots, not pow2(5) = 8. Bucket
    # membership is decided by pow2(P) alone, so shape stability across
    # preset swaps is identical — without doubling the delay line and MAC
    # at exact-power-of-two boundary shapes.
    if lookahead > 1:
        # conv_step_paged needs (a) >= M-1 zero tail partitions and (b) a
        # partition count divisible by M (whole pages).
        if pad_to_pow2:
            need = (1 << (real_p - 1).bit_length()) + 1
        need += lookahead - 1
        need += (-need) % lookahead
    elif pad_to_pow2:
        need = (1 << (real_p - 1).bit_length()) + 1
    if partitions is not None:
        partitions = int(partitions)
        if partitions < need:
            raise ValueError(
                f"partitions={partitions} cannot hold this HRIR: needs "
                f">= {need} (length {length} at block {block_size}, "
                f"lookahead {lookahead}; half-window bank = partitions + 1)"
            )
        if lookahead > 1 and partitions % lookahead:
            raise ValueError(
                f"partitions={partitions} is not divisible by "
                f"lookahead={lookahead}"
            )
        need = partitions
    if need > base:
        # Extra zero partitions at the tail convolve nothing; they only
        # standardize the delay-line shape across renderers.
        G = np.concatenate(
            [G, np.zeros(G.shape[:2] + (need - base,) + G.shape[3:],
                         G.dtype)],
            axis=2,
        )
    Gflip = G[:, :, ::-1, :]
    Gflip2 = np.concatenate([Gflip, Gflip], axis=2)  # [S, E, 2*P2, K]
    planes = np.stack([Gflip2.real, Gflip2.imag], axis=-1).astype(np.float32)
    n = 2 * block_size
    return ConvParams(
        Gflip2=jnp.asarray(planes),
        wf=fftmm.rfft_weights_half(n),
        wi=fftmm.irfft_weights(n, block_size, block_size),
    )


def padded_bin_count(block_size: int) -> int:
    """FDL bin rows: K = block+1 padded up to a multiple of 8 so bin blocks
    can tile Mosaic's 8-sublane rule (K itself is always odd). Pad rows hold
    zeros and zero filter weights — they contribute nothing."""
    k = block_size + 1
    return k + (-k) % 8


def make_conv_state(batch: int, num_speakers: int, partition_count: int,
                    block_size: int) -> ConvState:
    return ConvState(
        fdl=jnp.zeros((padded_bin_count(block_size), num_speakers,
                       partition_count, 2, batch), jnp.float32),
        write_pos=jnp.zeros((), jnp.int32),
    )


def conv_step(params: ConvParams, state: ConvState, x: jax.Array,
              active_mask: jax.Array | None = None):
    """One overlap-save block: x [B, S, T] float32 -> (state', y [B, E, T]).

    y[b, e] = sum_s sum_p conv(x_s, H[s, e, p]) — per-speaker HRIR convolution
    with the ear downmix fused in (the reference's processAndAccumulate loop,
    RealtimeAudioProcessor.swift:145-163). The slot written is the HALF-window
    spectrum u of the new block alone (module docstring): the analysis matmul
    contracts T samples, and the previous block's contribution comes from the
    FDL via the G bank — no overlap carry exists.

    `active_mask` [B] bool (optional, for the serving pool's shared-cursor
    ring): an inactive lane's slot content is preserved exactly (the current
    slot is read back — [Kp,S,1,2,B], 1/P2 of the line — and `where`d into
    the write), while the shared cursor still advances. The lane's stored
    spectra are then rotated relative to the new cursor; the pool repairs
    that with conv_roll_lanes before the lane next steps. An inactive lane's
    OUTPUT row is garbage (foreign x against its own history) and must not
    be delivered. With active_mask=None this is byte-identical to the
    bake/live path (no extra HLO).

    (A profile-grouped StreamPool runs this step once per group on the
    group's own lane state — see runtime/stream_pool._pool_round_grouped;
    there is deliberately no shared-delay-line grouped lowering: all
    three measured one-array formulations paid full-tensor relayouts,
    BENCH_NOTES round-3 late.)
    """
    B, S, T = x.shape
    P2 = state.fdl.shape[2]

    u = fftmm.rfft_mm(x, params.wf).astype(state.fdl.dtype)  # [B, S, K, 2]
    X_km = _to_slot(u, state.fdl.shape[0])  # [Kp, S, 1, 2, B]

    zero = jnp.zeros((), jnp.int32)
    w = state.write_pos.astype(jnp.int32)
    if active_mask is not None:
        m = active_mask.astype(bool)
        current = jax.lax.dynamic_slice(
            state.fdl, (zero, zero, w, zero, zero),
            X_km.shape,
        )
        X_km = jnp.where(m[None, None, None, None, :], X_km, current)
    fdl = jax.lax.dynamic_update_slice(
        state.fdl, X_km, (zero, zero, w, zero, zero),
    )

    # Rotate filter spectra so slot j multiplies the block from (w - j)
    # blocks ago: Grev[j] = G[(w - j) % P2] = Gflip2[(P2 - 1 - w) + j].
    start = (P2 - 1) - state.write_pos
    g_rev = jax.lax.dynamic_slice_in_dim(params.Gflip2, start, P2, axis=2)

    y = _mac_irfft(fdl, g_rev, params.wi).astype(x.dtype)

    new_state = ConvState(
        fdl=fdl,
        write_pos=(state.write_pos + 1) % P2,
    )
    return new_state, y


def migrate_full_window_fdl(fdl_old: np.ndarray, overlap: np.ndarray,
                            write_pos: int,
                            debt: np.ndarray | None = None) -> np.ndarray:
    """Convert a FULL-window delay line (the pre-half-window carry: slots
    hold 2T-window spectra X_t, plus the carried previous block
    `overlap`) into the half-window line (slots hold u_t) — host-side
    numpy, f64 recursion.

    The shift theorem that motivates the half-window bank also makes the
    old carry exactly convertible: X_t = u_{t-1} + s ⊙ u_t with
    s_k = (-1)^k, so from u_t = DFT_2T([b_t, 0]) (analysis of `overlap`,
    the last block) every earlier u unwinds by backward recursion
    u_{t-j-1} = X_{t-j} - s ⊙ u_{t-j}. P full-window slots + the overlap
    yield exactly the P+1 half-window slots the new carry needs. The
    recursion runs in float64; a resumed stream continues within f64
    rounding of the uninterrupted render (not bit-identical — the old
    carry never contained the device-f32 u bits).

    fdl_old: [Kp, S, P, 2, B] (pad bin rows beyond K = T+1 are zero),
    overlap: [B, S, T], write_pos: the old cursor (slot (w-1-j) mod P
    holds X_{t-j}); debt: optional [B] per-lane missed-cursor counts,
    repaid here (the returned line is debt-free — conv_roll_lanes
    semantics applied per lane before the recursion).

    Returns the new [Kp, S, P+1, 2, B] line under the SAME cursor value
    (valid: w < P < P+1): slot (w-1-j) mod (P+1) holds u_{t-j}."""
    kp, S, P, _, B = fdl_old.shape
    T = overlap.shape[-1]
    K = T + 1
    assert overlap.shape == (B, S, T), (overlap.shape, (B, S, T))
    w = int(write_pos)

    # Peak host memory matters here (production resume can carry a
    # multi-GB line on a small host): the line stays f32 throughout —
    # only the recursion's working set (u and one slot's X at a time)
    # is f64. Identical values to an all-f64 pipeline: every stored
    # slot is the same f64 u downcast once.
    fdl = np.asarray(fdl_old, np.float32)
    if debt is not None:
        d = np.asarray(debt, np.int64) % P
        lanes = np.nonzero(d)[0]
        if lanes.size:
            fdl = fdl.copy()  # don't mutate the caller's snapshot
            for b in lanes:
                # conv_roll_lanes: new slot p takes old slot (p-d) mod P.
                src = (np.arange(P) - d[b]) % P
                fdl[:, :, :, :, b] = np.take(
                    fdl[:, :, :, :, b], src, axis=2)

    # u_t from the carried last block: DFT_2T([b_t, 0]), bins 0..T.
    padded = np.zeros((B, S, 2 * T), np.float64)
    padded[..., :T] = np.asarray(overlap, np.float64)
    u = np.fft.rfft(padded, axis=-1)               # [B, S, K] complex128
    u = np.transpose(u, (2, 1, 0))                 # [K, S, B]
    s = ((-1.0) ** np.arange(K))[:, None, None]

    new = np.zeros((kp, S, P + 1, 2, B), np.float32)
    for j in range(P + 1):
        slot = (w - 1 - j) % (P + 1)
        new[:K, :, slot, 0, :] = u.real
        new[:K, :, slot, 1, :] = u.imag
        if j < P:
            old_slot = (w - 1 - j) % P
            X = (fdl[:K, :, old_slot, 0, :].astype(np.float64)
                 + 1j * fdl[:K, :, old_slot, 1, :].astype(np.float64))
            u = X - s * u                          # u_{t-j-1}
    return new


def conv_roll_lanes(state: ConvState, lane_idx: jax.Array,
                    shift: jax.Array) -> ConvState:
    """Re-align paused lanes to the shared ring cursor.

    A lane that sat out `d` shared-cursor advances (its slot preserved by
    conv_step's active_mask) holds spectra rotated by d relative to the
    cursor; rolling the lane's slot axis FORWARD by d mod P2 restores exact
    alignment — for ANY pause length, with no data loss (a full cursor lap
    is the identity). The pool batches all rejoining lanes into one call
    (bucketed k for compile stability; duplicate pad indices are benign
    because their rolled values are identical).

    lane_idx: [k] int32 lanes to fix; shift: [k] int32 (mod P2 applied
    here). Touches k * line/B of HBM — cheap and rare vs. the full-line
    rewrite the rolled shift-register step paid every block.
    """
    P2 = state.fdl.shape[2]
    sh = shift.astype(jnp.int32) % P2
    lanes = jnp.moveaxis(state.fdl[..., lane_idx], -1, 0)  # [k,Kp,S,P2,C]
    # new slot p takes old slot (p - shift) mod P2
    src = (jnp.arange(P2, dtype=jnp.int32)[None, :] - sh[:, None]) % P2
    rolled = jnp.take_along_axis(
        lanes, src[:, None, None, :, None], axis=3
    )
    fdl = state.fdl.at[..., lane_idx].set(
        jnp.moveaxis(rolled, 0, -1), mode="drop"
    )
    return ConvState(fdl=fdl, write_pos=state.write_pos)


def conv_roll_lanes_paged(state: "PagedConvState", lane_idx: jax.Array,
                          shift: jax.Array) -> "PagedConvState":
    """Re-align paused lanes of a PAGED delay line (the multi-block serving
    tier's analog of conv_roll_lanes).

    An idle lane's masked step (conv_step_paged_raw active_mask) recycles
    its oldest page into the new page 0, so after d idle rounds its page i
    holds what page (i - d) mod n held at pause time. Restoring the
    canonical order takes new[i] = cur[(i + d) mod n] — exact for any pause
    length (a full cycle is the identity). Alignment is page-granular
    because pauses are whole rounds (M blocks).

    lane_idx: [k] int32 lanes to fix (pad entries >= B drop); shift: [k]
    int32 idle-round counts (mod n_pages applied here). Touches only the
    k lanes' columns of each page."""
    n = len(state.pages)
    sh = shift.astype(jnp.int32) % n
    # Gather the k lanes' columns across pages: [n, ..., k] (small).
    lanes = jnp.stack([pg[..., lane_idx] for pg in state.pages], axis=0)
    src = (jnp.arange(n, dtype=jnp.int32)[:, None] + sh[None, :]) % n
    idx = src.reshape((n,) + (1,) * (lanes.ndim - 2) + (sh.shape[0],))
    rolled = jnp.take_along_axis(lanes, idx, axis=0)
    pages = tuple(
        pg.at[..., lane_idx].set(rolled[i], mode="drop")
        for i, pg in enumerate(state.pages)
    )
    return PagedConvState(pages=pages)


def conv_reset_paged(state: "PagedConvState",
                     stream_mask: jax.Array | None = None) -> "PagedConvState":
    """Zero paged conv history; with a [B] bool mask, only masked lanes
    (per-stream reset in a shared batch — a zeroed lane is rotation-
    invariant, so it rejoins the shared page rotation with no alignment
    work)."""
    if stream_mask is None:
        return PagedConvState(
            pages=tuple(jnp.zeros_like(pg) for pg in state.pages),
        )
    m = stream_mask.astype(bool)
    return PagedConvState(
        pages=tuple(
            jnp.where(m[None, None, None, None, :], 0, pg)
            for pg in state.pages
        ),
    )


class PagedConvState(NamedTuple):
    """Delay line as P2/M pages of M slots each (pages[0] newest). Rotation
    is tuple renaming — ZERO data movement when the surrounding scan is
    unrolled by the page count — and the 'write' is just the analysis DFT's
    own output tensor becoming page 0. This removes the delay-line
    rewrite/update traffic entirely (both the windowed dynamic-update-slice
    and the shift concat measured 1-5 ms/step on a 1 GB line). Slots hold
    half-window spectra (module docstring), so there is no overlap carry —
    the pages ARE the whole convolution state."""

    pages: tuple  # each [Kp, S, C, M, B] float32, newest first


def make_conv_state_paged(batch: int, num_speakers: int, partition_count: int,
                          block_size: int, lookahead: int) -> PagedConvState:
    assert partition_count % lookahead == 0, (partition_count, lookahead)
    n_pages = partition_count // lookahead
    if _PAGED_LAYOUT == "kcsmb":
        shape = (padded_bin_count(block_size), 2, num_speakers, lookahead,
                 batch)
    else:
        shape = (padded_bin_count(block_size), num_speakers, 2, lookahead,
                 batch)
    return PagedConvState(
        # Distinct buffers per page — donation would reject one buffer
        # appearing in two carry slots.
        pages=tuple(jnp.zeros(shape, jnp.float32) for _ in range(n_pages)),
    )


def _group_factor(kp: int, rows: int, cols: int, tile: int = 128) -> int:
    """Pick the k-grouping g for the paged MAC's block-diagonal lowering.

    The per-bin contraction is [rows x cols] (e.g. 32x32 for the stereo
    chain) — a tiny tile that leaves the 128x128 MXU mostly idle. Grouping g
    adjacent bins into one dense [g*rows x g*cols] block-diagonal matmul
    multiplies nominal FLOPs by g (the off-diagonal blocks are zeros) but
    multiplies tile utilization by g^2, a net g-fold win while the grouped
    tile still fits one MXU tile. g is capped by that fit and must divide
    the padded bin count so the grouped reshape stays free."""
    def gain(g: int) -> float:
        return g / (math.ceil(g * rows / tile) * math.ceil(g * cols / tile))

    # Baseline is the TRUE g=1 gain (which is below 1.0 whenever R or O
    # already exceeds one tile), not a hardcoded 1.0 — otherwise larger
    # speaker banks would reject groupings that beat ungrouped.
    best, best_gain = 1, gain(1)
    g = 1
    while kp % (g * 2) == 0 and g < tile:
        g *= 2
        if gain(g) > best_gain:
            best, best_gain = g, gain(g)
    return best


def conv_step_paged(params: ConvParams, state: PagedConvState, x: jax.Array,
                    acc_chunk: int | None = None,
                    active_mask: jax.Array | None = None):
    """M-block lookahead step on the paged delay line:
    x [B, S, M, T] -> (state', y [B, M, E, T]).

    Composition of conv_step_paged_raw (analysis + MAC) and paged_project
    (synthesis). Callers that post-process the time-domain output with
    another matmul (e.g. the EQ's Toeplitz FIR) should use the raw/project
    pair and fold their matrix into the synthesis weights instead —
    paged_project(params, Ykm, post=...) — which costs nothing extra.

    Page a, in-page slot j holds block t+M-1-j-a*M, so output m's
    coefficient against it is Hz[m+j+a*M] with Hz = natural-order H behind
    M-1 zero partitions — every rotation is a static slice. The MAC is one
    k-batched dot per page, summed; per-block FLOPs match conv_step while
    the line is read once per M blocks and never rewritten.

    Run inside lax.scan with unroll = len(state.pages) so the page rotation
    stays pure renaming (an un-unrolled scan would copy every page at each
    iteration boundary)."""
    new_state, Ykm = conv_step_paged_raw(params, state, x, acc_chunk,
                                         active_mask)
    y = paged_project(params, Ykm).astype(x.dtype)
    return new_state, y


def conv_step_paged_raw(params: ConvParams, state: PagedConvState,
                        x: jax.Array, acc_chunk: int | None = None,
                        active_mask: jax.Array | None = None):
    """Analysis + MAC of the M-block lookahead step, stopping before the
    synthesis transform: x [B, S, M, T] -> (state', Ykm).

    Ykm is the frequency-domain mix in the grouped MAC layout (see
    _paged_mac); feed it to paged_project to synthesize time-domain output
    (optionally with a folded post-matrix).

    `active_mask` [B] bool (optional, for the serving pool's multi-block
    tier): an inactive lane's history is preserved EXACTLY by recycling —
    its column of the outgoing oldest page is `where`d into the new page 0
    (so the rotation is cyclic for that lane: nothing is lost, its pages
    are merely rotated one position per round). After d idle rounds the
    lane's pages sit rotated by d; the pool repairs that with
    conv_roll_lanes_paged before the lane next steps (a full cycle is the
    identity, so ANY pause length is exact). An inactive lane's output row
    is garbage and must not be delivered. With active_mask=None this path
    is byte-identical to the bake chain."""
    B, S, M, T = x.shape
    Kp = state.pages[0].shape[0]
    K = params.wf.shape[1]
    n_pages = len(state.pages)
    P2 = n_pages * M

    wf_padded = jnp.pad(params.wf, ((0, 0), (0, Kp - K), (0, 0)))
    # Half-window analysis: slot j of the new page is u of block M-1-j
    # (newest first) — the matmul contracts T samples per slot and there is
    # no window concat or overlap carry at all (module docstring).
    if _PAGED_LAYOUT == "kcsmb":
        # Blocks arranged [S, M, B, T] make [Kp, C, S, M, B] the analysis
        # dot's natural output order — the new page is born in the MAC's
        # operand layout, no copy (see _PAGED_LAYOUT).
        xnf = jnp.transpose(x[:, :, ::-1], (1, 2, 0, 3))  # [S, M, B, T]
        new_page = jnp.einsum("smbt,tkc->kcsmb", xnf, wf_padded,
                              preferred_element_type=jnp.float32,
                              precision=fftmm.DFT_PRECISION)
    else:
        xnf = x[:, :, ::-1]  # [B, S, M, T], newest first
        new_page = jnp.einsum("bsmt,tkc->kscmb", xnf, wf_padded,
                              preferred_element_type=jnp.float32,
                              precision=fftmm.DFT_PRECISION)
    if active_mask is not None:
        m_act = active_mask.astype(bool)
        # Recycle the outgoing oldest page for idle lanes (batch is the
        # minor axis of every page layout), making their rotation cyclic.
        new_page = jnp.where(m_act[None, None, None, None, :], new_page,
                             state.pages[-1])
    pages = (new_page,) + tuple(state.pages[:-1])

    # Gz: natural-order G behind M-1 zero partitions (params-derived — the
    # whole block hoists out of a scan).
    h_nat = params.Gflip2[:, :, :P2][:, :, ::-1]
    hre, him = h_nat[..., 0], h_nat[..., 1]
    h2 = jnp.stack(
        [jnp.stack([hre, him], axis=-1), jnp.stack([-him, hre], axis=-1)],
        axis=-2,
    )  # [S, E, P2, K, C, Q]
    h2 = jnp.pad(h2, ((0, 0), (0, 0), (M - 1, 0), (0, Kp - K), (0, 0), (0, 0)))
    if _PAGED_LAYOUT == "kcsmb":
        hz = jnp.transpose(h2, (3, 4, 0, 2, 1, 5))  # [Kp, C, S, P2+M-1, E, Q]
    else:
        hz = jnp.transpose(h2, (3, 0, 4, 2, 1, 5))  # [Kp, S, C, P2+M-1, E, Q]

    Ykm = _paged_mac(params, pages, hz, M, acc_chunk)
    return PagedConvState(pages=pages), Ykm


def _paged_mac(params: ConvParams, pages, hz: jax.Array, M: int,
               acc_chunk: int | None = None) -> jax.Array:
    """Multiply-accumulate every page against its rotated filter window.

    Default lowering: one k-batched dot per page (the per-bin contraction
    is [R x O], R = S*C*M rows, O = M*E*Q columns). The optional grouped
    lowering (AIRWAVE_PAGED_MAC_GROUPING=1) packs g adjacent bins into one
    dense block-diagonal [g*R x g*O] matmul — exact math, zero blocks — but
    measured SLOWER on-chip at every config (the g-fold nominal-FLOP
    inflation at 6 HIGHEST passes beats the tile-utilization gain; see
    BENCH_NOTES.md round-2 addendum), so it stays opt-in for
    re-measurement. Returns Ykm in the grouped layout
    [Kp/g, B, g, M, E, Q] (g=1 by default); paged_project consumes it via
    a reshaped weight matrix so no transpose ever materializes."""
    Kp = pages[0].shape[0]
    S, C, _, B = pages[0].shape[1:]
    E = params.num_ears
    R = S * C * M
    O = M * E * 2
    g = _group_factor(Kp, R, O) if _PAGED_MAC_GROUPING else 1
    eye = jnp.eye(g, dtype=hz.dtype) if g > 1 else None
    # acc_chunk parameter (the memory planner's knob) overrides the env
    # flag; None defers to AIRWAVE_PAGED_ACC_CHUNK (default 0 = off).
    chunk = _PAGED_ACC_CHUNK if acc_chunk is None else int(acc_chunk)
    if _PAGED_MAC_CONCAT and g == 1 and not chunk:
        # Read-side concat lowering (see _PAGED_MAC_CONCAT): all P2 slots
        # in one dot; the page sum is reassociated into the contraction.
        P2 = len(pages) * M
        allpages = jnp.concatenate(pages, axis=3)  # [Kp, ., ., P2, B]
        # G_full[..., jg, m] = hz[..., m + jg]: page a in-page slot j is
        # global slot jg = a*M + j, matching the concat order.
        G_full = jnp.stack(
            [hz[:, :, :, m : m + P2] for m in range(M)], axis=4
        )  # [Kp, S, C, P2, M, E, Q] (or kcsmb's axis naming)
        Ykm = jax.lax.dot_general(
            allpages, G_full,
            dimension_numbers=(((1, 2, 3), (1, 2, 3)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_MAC_PRECISION,
        )  # [Kp, B, M, E, Q]
        return Ykm.reshape(Kp, B, 1, M, E, 2)
    Ykm = None
    for a, page in enumerate(pages):
        if chunk and a and a % chunk == 0:
            # Chunk boundary: make this page's dot depend on the running
            # sum so the scheduler cannot hoist every dot ahead of the
            # adds (which would keep all n_pages terms alive — see
            # _PAGED_ACC_CHUNK). The page data itself is carry-resident,
            # so the barrier adds no traffic.
            page, Ykm = jax.lax.optimization_barrier((page, Ykm))
        G_a = jnp.stack(
            [hz[:, :, :, (m + a * M) : (m + a * M) + M] for m in range(M)],
            axis=4,
        )  # [Kp, S, C, M(j), M(m), E, Q]
        if g > 1:
            pg = page.reshape(Kp // g, g * R, B)
            G4 = G_a.reshape(Kp // g, g, R, O)
            # Block-diagonal: row (i*R + r), col (i*O + c) <- G4[t, i, r, c].
            Gblk = jnp.einsum("tirc,ij->tirjc", G4, eye).reshape(
                Kp // g, g * R, g * O
            )
            term = jax.lax.dot_general(
                pg, Gblk,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_MAC_PRECISION,
            )  # [Kp/g, B, g*O]
        else:
            # NOTE: the operand-swapped orientation dot(G_a, page) ->
            # [Kp, M, E, Q, B] was measured and rejected (headline 29.1k
            # vs 30.2k, config-5 17.1k vs 20.2k) — the post-dot layout
            # copies the profiler shows on this orientation are XLA's
            # cheapest option, not an oversight.
            term = jax.lax.dot_general(
                page, G_a,
                dimension_numbers=(((1, 2, 3), (1, 2, 3)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_MAC_PRECISION,
            )  # [Kp, B, M, E, Q]
        Ykm = term if Ykm is None else Ykm + term
    return Ykm.reshape(Kp // g, B, g, M, E, 2)


def paged_project(params: ConvParams, Ykm: jax.Array,
                  post: jax.Array | None = None) -> jax.Array:
    """Second-half inverse DFT of the grouped-layout MAC output:
    Ykm -> y [B, M, E, X].

    With post=None this is the plain synthesis (X = T). A `post` matrix
    [T, X] is folded INTO the synthesis weights (one [K,Q,T]x[T,X]
    contraction, params-derived, hoisted out of any surrounding scan), so
    `irfft-then-matmul` chains collapse to a single MXU pass over Ykm —
    the time-domain intermediate never exists. Used by the bake chain to
    absorb the EQ's Toeplitz FIR and its state-drive map (models/binaural
    chain_step_multi_fn).

    The weights are zero-padded to the padded bin count and reshaped to the
    MAC's [Kp/g, g, ...] bin grouping, so the grouped Ykm is consumed in
    place (pad bins hold zeros on both sides and contribute nothing)."""
    K = params.wi.shape[0]
    w = params.wi
    if post is not None:
        w = jnp.einsum("kqt,tx->kqx", w, post,
                       preferred_element_type=jnp.float32,
                       precision=fftmm.DFT_PRECISION)
    Kpg, B, g, _, E, Q = Ykm.shape
    w_p = jnp.pad(w, ((0, Kpg * g - K), (0, 0), (0, 0)))
    return jnp.einsum(
        "kbgmeq,kgqx->bmex", Ykm, w_p.reshape(Kpg, g, Q, w.shape[-1]),
        preferred_element_type=jnp.float32,
        precision=fftmm.DFT_PRECISION,
    )


def _to_slot(X_planes: jax.Array, k_padded: int) -> jax.Array:
    """Analysis spectra [B, S, K, 2] -> one FDL slot [Kp, S, 1, 2, B]."""
    X_km = jnp.transpose(X_planes, (2, 1, 3, 0))  # [K, S, 2, B]
    pad = k_padded - X_km.shape[0]
    if pad:
        X_km = jnp.pad(X_km, ((0, pad), (0, 0), (0, 0), (0, 0)))
    return X_km[:, :, None, :, :]


def _mac_irfft(fdl: jax.Array, h: jax.Array, wi: jax.Array):
    """Real-plane complex multiply-accumulate + second-half inverse DFT.

    fdl [Kp,S,P,C,B] x h [S,E,P,K,2] -> y [B,E,T]. The 2x2 complex-product
    structure is folded into the contraction so each FDL plane is read
    exactly once from HBM; the inverse transform is an MXU matmul
    synthesizing only the kept half (ops/fftmm). The delay line stores the
    batch minor (lane axis) so the Pallas kernel tiles it natively.

    NOTE: a `posts` variant folding the EQ's matrices into the synthesis
    (the bake path's paged_project, single-block form) was measured and
    REJECTED here — the dual projection outputs re-constrain XLA's layout
    assignment, the FDL slot write stops lowering in place, and both the
    live chain and the pool step run ~1.6-2x slower (BENCH_NOTES.md
    round-2 addendum). The fold is multi-block-only.
    """
    # MAC formulation notes (all measured on a v5e at B=8192, whole chain):
    #   - exact-f32 VPU Pallas kernel (kernels/mac_kmajor) on this
    #     batch-minor layout: no bf16 pass splitting, full lane utilization;
    #   - k-batched dot_general: the MXU route; f32 costs a 6-pass bf16
    #     decomposition at Precision.HIGHEST (~0.8 ms/block of pure pass
    #     overhead);
    #   - jnp.einsum of the same contraction: XLA chose a reduce fusion
    #     re-reading the FDL per (ear, plane) output — worst of the three.
    K = wi.shape[0]
    Kp = fdl.shape[0]
    hre, him = h[..., 0], h[..., 1]
    # h2[s,e,p,k,c,q]: (re,im out) = [[hre, him], [-him, hre]] @ (fre, fim)
    h2 = jnp.stack(
        [jnp.stack([hre, him], axis=-1), jnp.stack([-him, hre], axis=-1)],
        axis=-2,
    )  # [S,E,P,K,2(c),2(q)]
    h2 = jnp.pad(h2, ((0, 0), (0, 0), (0, 0), (0, Kp - K), (0, 0), (0, 0)))
    if _MAC_IMPL == "pallas":
        from airwave_tpu.kernels import mac_kmajor as _mk

        B = fdl.shape[-1]
        R = fdl.shape[1] * fdl.shape[2] * fdl.shape[3]
        hof = jnp.transpose(h2, (3, 1, 5, 0, 2, 4))  # [Kp,E,Q,S,P,C]
        Yok = _mk.mac_kmajor(
            fdl.reshape(Kp, R, B), hof.reshape(Kp, 4, R),
            interpret=jax.default_backend() != "tpu",
        ).reshape(2, 2, Kp, B)
        return jnp.einsum("eqkb,kqt->bet", Yok[:, :, :K], wi,
                          preferred_element_type=jnp.float32,
                          precision=fftmm.DFT_PRECISION)
    h2t = jnp.transpose(h2, (3, 0, 2, 4, 1, 5))  # [Kp,S,P,C,E,Q]
    if _MAC_IMPL == "dot":
        Ykm = jax.lax.dot_general(
            fdl, h2t,
            dimension_numbers=(((1, 2, 3), (1, 2, 3)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_MAC_PRECISION,
        )  # [Kp,B,E,Q]
        return jnp.einsum("kbeq,kqt->bet", Ykm[:K], wi,
                          preferred_element_type=jnp.float32,
                          precision=fftmm.DFT_PRECISION)
    Y = jnp.einsum("kspcb,kspceq->bekq", fdl, h2t,
                   preferred_element_type=jnp.float32,
                   precision=PRECISION)
    return fftmm.irfft_mm(Y[:, :, :K], wi)


def pad_conv_params(params: ConvParams, partitions: int) -> ConvParams:
    """Zero-pad a bank's partition count to `partitions` (tail zeros).

    The padded bank is mathematically identical — zero tail partitions
    convolve nothing — but matches a LARGER delay-line shape, so a
    shorter-HRIR preset can hot-swap onto an existing carry without
    reallocating (and, with xfade_conv_params, without resetting) it.
    Reconstructs the natural-order bank from the stored flip-doubled
    planes, pads, and re-derives the rotation layout. Padding preserves
    any lookahead zero tail (zeros extend zeros), but the caller owns the
    divisibility check for paged lookahead (partitions % M)."""
    P2 = params.partition_count
    partitions = int(partitions)
    if partitions == P2:
        return params
    if partitions < P2:
        raise ValueError(
            f"pad_conv_params cannot shrink: bank has {P2} partitions, "
            f"asked for {partitions}"
        )
    g_nat = params.Gflip2[:, :, :P2][:, :, ::-1]  # [S, E, P2, K, 2]
    pad = partitions - P2
    g_nat = jnp.pad(g_nat, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    g_flip = g_nat[:, :, ::-1]
    return ConvParams(
        Gflip2=jnp.concatenate([g_flip, g_flip], axis=2),
        wf=params.wf,
        wi=params.wi,
    )


def xfade_conv_params(old: ConvParams, new: ConvParams) -> ConvParams:
    """Dual-bank params for a glitch-free crossfaded HRIR hot-swap.

    The delay line stores BANK-INDEPENDENT input spectra (u_t = W1 @ b_t —
    the analysis weights depend only on the block size), so a same-shape
    bank swap can keep the full input history exactly; the only thing a
    20 ms crossfade needs is both banks' outputs for the fade window. This
    stacks the two banks along the EAR axis (E -> 2E; ears [0, E) are OLD,
    [E, 2E) are NEW), so ANY existing step variant (conv_step,
    conv_step_rolled, conv_step_paged) runs unchanged, reads the delay
    line ONCE, and emits y2 [..., 2E, T]; xfade_blend then mixes the
    halves per sample. Cost: double MAC output columns for the one or two
    fade rounds — the line read (the dominant term) is not doubled.

    (The reference CANNOT do this: its engines couple input history to the
    filter and rebuild per activation, HRIRManager.swift:406-415 — every
    swap truncates the reverb tail. Here the ideal time-varying filter is
    nearly free.)"""
    if old.Gflip2.shape != new.Gflip2.shape:
        raise ValueError(
            f"crossfade banks must share [S, E, partitions, K]: "
            f"{old.Gflip2.shape} vs {new.Gflip2.shape} "
            f"(pad_conv_params can grow the smaller one)"
        )
    return ConvParams(
        Gflip2=jnp.concatenate([old.Gflip2, new.Gflip2], axis=1),
        wf=new.wf,
        wi=new.wi,
    )


def lerp_bank(old: ConvParams, new: ConvParams, t: float) -> ConvParams:
    """Pointwise blend of two same-shape banks: (1-t)*old + t*new.

    Convolution is linear in the bank, so rendering with the lerped bank
    equals blending the two banks' outputs at ratio t for the same input
    history. This is the frozen mid-point of an interrupted crossfade:
    when a second hot-swap lands while an old->new fade is still
    rendering, the NEW fade must start from the blend the listener
    currently hears — lerp(old, new, r at the boundary) — not from the
    pure new bank, or the output filter steps by (1-r)*(new-old) at the
    block boundary (an audible click). See BinauralEngine.set_renderer."""
    if old.Gflip2.shape != new.Gflip2.shape:
        raise ValueError(
            f"lerp banks must share [S, E, partitions, K]: "
            f"{old.Gflip2.shape} vs {new.Gflip2.shape}"
        )
    t = float(t)
    return ConvParams(
        Gflip2=(1.0 - t) * old.Gflip2 + t * new.Gflip2,
        wf=new.wf,
        wi=new.wi,
    )


def xfade_ramp(fade: int, total: int) -> np.ndarray:
    """Linear blend weights for one crossfade window: [total] f32 rising
    to 1.0 over the first `fade` samples (the EQ ramp's convention:
    w[t] = (t+1)/fade, eq_block.eq_step), then holding 1.0."""
    fade = max(1, int(fade))
    r = (np.arange(total, dtype=np.float32) + 1.0) / float(fade)
    return np.minimum(r, 1.0)


def xfade_blend(y2: jax.Array, ramp: jax.Array,
                lane_mask: jax.Array | None = None) -> jax.Array:
    """Mix a dual-bank step's output halves: y2 [B, 2E, T] (or
    [B, M, 2E, T]) -> [B, E, T] (or [B, M, E, T]).

    y = y_old * (1 - r) + y_new * r with r the per-sample ramp —
    `ramp` is [T] for the single-block step or [M*T] spanning the whole
    round for the paged step. `lane_mask` [B] bool selects which lanes
    blend; unmasked lanes take the pure NEW half (lanes that already
    crossfaded, or attached fresh after the swap)."""
    E = y2.shape[-2] // 2
    y_old, y_new = y2[..., :E, :], y2[..., E:, :]
    r = ramp.astype(y2.dtype)
    if y2.ndim == 4:
        r = r.reshape(1, y2.shape[1], 1, y2.shape[-1])
    else:
        r = r.reshape(1, 1, y2.shape[-1])
    y = y_old * (1.0 - r) + y_new * r
    if lane_mask is not None:
        m = lane_mask.astype(bool).reshape(
            (y2.shape[0],) + (1,) * (y2.ndim - 1)
        )
        y = jnp.where(m, y, y_new)
    return y


def conv_step_rolled(params: ConvParams, state: ConvState, x: jax.Array,
                     active_mask: jax.Array | None = None):
    """Shift-register variant: slot 0 is always the newest block, so streams
    can advance independently (`active_mask` [B] bool gates who steps).

    Used by the serving StreamPool where streams ingest ragged chunks at
    their own pace — an inactive stream's carry must stay EXACTLY put (the
    reference's adapter only runs DSP when a full block accumulated,
    RealtimeAudioProcessor.swift:112-115). Costs a full delay-line rewrite
    per block (vs one slot for conv_step); use conv_step for lockstep bake
    workloads.

    The shared write_pos stays 0; params are interchangeable between the two
    variants.
    """
    B, S, T = x.shape
    P2 = state.fdl.shape[2]

    u = fftmm.rfft_mm(x, params.wf).astype(state.fdl.dtype)
    X_km = _to_slot(u, state.fdl.shape[0])

    rolled = jnp.concatenate(
        [X_km, state.fdl[:, :, :-1]], axis=2
    )
    # Slot j holds block t-j, so coefficient j multiplies slot j directly:
    # un-flip the stored Gflip2 back to natural partition order.
    g_natural = params.Gflip2[:, :, :P2][:, :, ::-1]
    if active_mask is not None:
        m = active_mask.astype(bool)
        fdl = jnp.where(m[None, None, None, None, :], rolled, state.fdl)
    else:
        fdl = rolled

    y = _mac_irfft(fdl, g_natural, params.wi).astype(x.dtype)

    return ConvState(fdl=fdl,
                     write_pos=jnp.zeros_like(state.write_pos)), y


def conv_reset(state: ConvState, stream_mask: jax.Array | None = None) -> ConvState:
    """Zero conv history (ref ConvolutionEngine.reset, :397-407).

    With a [B] bool mask, only masked streams are cleared (per-stream preset
    swap / reset in a shared batch).
    """
    if stream_mask is None:
        return ConvState(
            fdl=jnp.zeros_like(state.fdl),
            write_pos=jnp.zeros_like(state.write_pos),
        )
    m = stream_mask.astype(bool)
    return ConvState(
        fdl=jnp.where(m[None, None, None, None, :], 0, state.fdl),
        write_pos=state.write_pos,
    )
