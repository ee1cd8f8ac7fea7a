"""Spatial renderer preparation: HRIR WAV -> device convolution params.

Replicates the activation math of /root/reference/Airwave/HRIRManager.swift:347-448:
choose a channel map from the HRIR channel count (7 -> hesuvi7, else
hesuvi14, :355-360), resolve (left-ear, right-ear) HRIR channels per virtual
speaker of the input layout, resample each HRIR to the output rate
(:389-399), and build the convolution engines — here a single batched
ConvParams [S, 2, P2, K] instead of 2 ConvolutionEngine objects per speaker.

All of this runs on the host control path (the reference does it on a
background QoS queue); the published artifact is an immutable RendererState
whose device arrays the render step consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.io.wav import WAVData
from airwave_tpu.ops import resample, upols
from airwave_tpu.utils.errors import AirwaveError


class RendererPreparationError(AirwaveError):
    pass


@dataclasses.dataclass(frozen=True)
class RendererState:
    """Immutable published renderer (ref HRIRManager.swift:123-131).

    `speakers` holds the RESOLVED virtual speakers in input-channel order;
    a layout channel with no HRIR mapping is skipped at preparation (the
    reference's `continue` in HRIRManager.swift:370-372 — e.g. the 7.1.4
    height channels against the height-less hesuvi14 map), so
    `input_indices` records which of the layout's `input_channels` feed
    the render. For fully-mapped layouts the two views coincide."""

    conv_params: upols.ConvParams
    speakers: tuple          # resolved virtual speakers, input-channel order
    sample_rate: float
    block_size: int
    generation: int = 0
    input_channels: int = 0      # layout channel count (0 = num_speakers)
    input_indices: tuple = ()    # layout-channel index per resolved speaker
    # M-block lookahead the conv params were built for (M-1 zero tail
    # partitions, partition count divisible by M — see
    # upols.make_conv_params). 1 = the zero-added-latency live shape;
    # M > 1 feeds the paged throughput paths (models/bake,
    # StreamPool(blocks_per_step=M)).
    lookahead: int = 1

    @property
    def num_speakers(self) -> int:
        return len(self.speakers)

    @property
    def partition_count(self) -> int:
        return self.conv_params.partition_count

    @property
    def layout_channels(self) -> int:
        return self.input_channels or self.num_speakers

    def select_input(self, chunk):
        """Map a [layout_channels, n] chunk onto the resolved speakers
        ([num_speakers, n]); already-resolved chunks pass through."""
        if (chunk.shape[0] == self.layout_channels
                and chunk.shape[0] != self.num_speakers):
            return chunk[list(self.input_indices)]
        return chunk


def build_hrir_time_domain(
    wav: WAVData,
    input_layout: cm.InputLayout,
    output_sample_rate: float,
    channel_map: Optional[cm.HRIRChannelMap] = None,
    resampler=resample.resample_linear,
    with_speakers: bool = False,
):
    """Resolve + resample HRIRs into [S, 2, L] float32 (speaker, ear, taps).

    A layout channel the map cannot resolve is SKIPPED, matching the
    reference's activation loop (HRIRManager.swift:370-372) — this is how
    a 7.1.4 input renders through the height-less hesuvi14 map: the four
    top channels drop out and the eight mapped speakers render.
    Preparation fails only when NO speaker resolves (ref :420
    `guard !newRenderers.isEmpty`). With with_speakers=True returns
    (bank, resolved_speakers, layout_indices)."""
    if channel_map is None:
        channel_map = cm.select_channel_map(wav.channel_count, input_layout.channels)

    rows = []
    speakers = []
    layout_indices = []
    for pos, speaker in enumerate(input_layout.channels):
        indices = channel_map.indices(speaker)
        if indices is None:
            continue  # unmapped (e.g. height channel): skipped, not fatal
        left_idx, right_idx = indices
        if not (0 <= left_idx < wav.channel_count and 0 <= right_idx < wav.channel_count):
            raise RendererPreparationError(
                f"HRIR channel indices {indices} out of range for "
                f"{wav.channel_count}-channel file"
            )
        left = resampler(wav.audio[left_idx], wav.sample_rate, output_sample_rate)
        right = resampler(wav.audio[right_idx], wav.sample_rate, output_sample_rate)
        rows.append(np.stack([left, right]))
        speakers.append(speaker)
        layout_indices.append(pos)
    if not rows:
        raise RendererPreparationError(
            f"No HRIR mapping found for any speaker of layout "
            f"{input_layout.name!r}"
        )
    bank = np.stack(rows).astype(np.float32)
    if with_speakers:
        return bank, tuple(speakers), tuple(layout_indices)
    return bank


def prepare_renderer(
    wav: WAVData,
    input_layout: cm.InputLayout,
    output_sample_rate: float,
    block_size: int = 512,
    channel_map: Optional[cm.HRIRChannelMap] = None,
    generation: int = 0,
    resampler=resample.resample_linear,
    partition_bucketing: str = "exact",
    lookahead: int = 1,
    partitions: Optional[int] = None,
) -> RendererState:
    """partition_bucketing: "exact" (default) uses the HRIR's true partition
    count — with the shared-cursor ring step the FDL read dominates the
    serving cost, and the pow2 padding's extra slots are pure traffic
    (measured on-chip at B=8192: pool round 4.43 ms/block exact-9 vs 5.46
    pow2-16). "pow2" restores the reference's bucket-for-compile-reuse
    policy (ConvolutionEngine.swift:96) for workloads that hot-swap presets
    of many different lengths faster than the persistent jit cache warms.

    lookahead=M builds conv params for the M-block paged paths (M-1 zero
    tail partitions; adds up to M-block latency — throughput tiers only).

    partitions=N forces the delay-line partition count (zero-padded tail) —
    use it to align renderers of different HRIR lengths onto ONE shared
    shape for a grouped multi-profile StreamPool (upols.make_conv_params)."""
    hrir_td, speakers, layout_indices = build_hrir_time_domain(
        wav, input_layout, output_sample_rate, channel_map, resampler,
        with_speakers=True,
    )
    params = upols.make_conv_params(
        hrir_td, block_size, pad_to_pow2=(partition_bucketing == "pow2"),
        lookahead=lookahead, partitions=partitions,
    )
    return RendererState(
        conv_params=params,
        speakers=speakers,
        sample_rate=float(output_sample_rate),
        block_size=block_size,
        generation=generation,
        input_channels=len(input_layout.channels),
        input_indices=layout_indices,
        lookahead=int(lookahead),
    )
