"""Model layer: the flagship binaural chain and the offline bake API."""

from airwave_tpu.models import bake, binaural

__all__ = ["bake", "binaural"]
