"""Pure JAX compute ops (device hot path) + host-side filter design."""

from airwave_tpu.ops import biquad_design, biquad_scan, eq_block, resample, upols

__all__ = ["biquad_design", "biquad_scan", "eq_block", "resample", "upols"]
