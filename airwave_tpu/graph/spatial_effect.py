"""Stream-level spatial effect: conv engine + frame adapter + hot swap.

The live-graph analog of the reference's HRIRManager render path
(/root/reference/Airwave/HRIRManager.swift:518-559 + RealtimeAudioProcessor):
a published immutable RendererState drives a fixed-block conv engine behind a
frame adapter; swapping presets publishes a new state and restarts the DSP
history (the reference builds fresh engines per activation,
HRIRManager.swift:406-415). EQ is *not* fused here — the live graph applies
it after the adapter at callback granularity, matching the reference's
ordering (AudioEffectGraph.swift:195-220). The fused conv+EQ step in
models/binaural.py is the batched throughput path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig
from airwave_tpu.graph.frame_adapter import FrameAdapter
from airwave_tpu.graph.renderer import RendererState
from airwave_tpu.models.binaural import BinauralEngine


class SpatialEffect:
    def __init__(
        self,
        batch: int,
        sample_rate: float,
        block_size: int = 512,
        config: AirwaveConfig = DEFAULT_CONFIG,
    ) -> None:
        self.batch = batch
        self.sample_rate = float(sample_rate)
        self.block_size = block_size
        self.config = config
        self.engine = BinauralEngine(batch, sample_rate, block_size, config=config)
        self.adapter: Optional[FrameAdapter] = None

    @property
    def is_ready(self) -> bool:
        return self.engine.spatial_ready

    def set_renderer(self, renderer: Optional[RendererState],
                     crossfade: bool = True) -> None:
        """Swap the published renderer. A crossfaded same-shape swap
        (see BinauralEngine.set_renderer) keeps the frame adapter's
        buffered samples too — the stream is continuous end to end; a
        resetting swap drops them with the history (the reference's
        fresh-pipeline semantics)."""
        crossfaded = self.engine.set_renderer(renderer, crossfade=crossfade)
        if renderer is None:
            self.adapter = None
            return
        if (
            self.adapter is None
            or self.adapter.in_channels != renderer.num_speakers
        ):
            self.adapter = FrameAdapter(
                self.engine.process_block,
                self.batch,
                in_channels=renderer.num_speakers,
                out_channels=2,
                block_size=self.block_size,
                max_frames_per_callback=self.config.max_frames_per_callback,
            )
        elif not crossfaded:
            self.adapter.reset()

    def reset(self) -> None:
        self.engine.reset()
        if self.adapter is not None:
            self.adapter.reset()

    def process(self, x: np.ndarray) -> np.ndarray:
        """x [B, C, n] -> [B, 2, n]; mono input duplicated across speakers
        when the renderer expects stereo (ref RealtimeAudioProcessor.swift:95-107).
        Full layout-channel input (e.g. 12-ch 7.1.4 against a height-less
        map that resolved 8 speakers) selects the mapped rows — unmapped
        channels drop, the reference's activation semantics."""
        assert self.adapter is not None, "spatial effect not ready"
        speakers = self.adapter.in_channels
        C = x.shape[1]
        if C < speakers:
            if C != 1:
                raise ValueError(
                    f"input has {C} channels; renderer expects {speakers}"
                )
            x = np.repeat(x, speakers, axis=1)
        elif C > speakers:
            renderer = self.engine.renderer
            if renderer is not None and C == renderer.layout_channels:
                x = x[:, list(renderer.input_indices)]
            else:
                raise ValueError(
                    f"input has {C} channels; renderer expects {speakers}"
                )
        return self.adapter.process(x)
