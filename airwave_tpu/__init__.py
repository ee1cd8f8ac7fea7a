"""airwave_tpu — TPU-native spatial-audio rendering framework.

Batch-first re-design of sallliisa/Airwave's capabilities for JAX/XLA/Pallas:
HRIR binaural spatialization (partitioned overlap-save convolution),
EqualizerAPO parametric EQ (block state-space biquad cascades with crossfaded
hot swap), the full runtime/asset/serving stack, and the offline HRIR
toolchain. See README.md and docs/parity.md.
"""

__version__ = "0.1.0"

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig

__all__ = [
    "AirwaveConfig",
    "DEFAULT_CONFIG",
    "__version__",
]
