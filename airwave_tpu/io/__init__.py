"""File-format layer: WAV I/O and EqualizerAPO preset parsing."""

from airwave_tpu.io import apo, wav

__all__ = ["apo", "wav"]
