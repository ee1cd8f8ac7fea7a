"""Double-buffered host->device feed for live streaming.

SURVEY.md §7 names live-mode host throughput as a hard part: 10k live streams
move ~1.9 GB/s each way, so transfers must overlap compute. JAX dispatch is
already asynchronous; this feeder adds the missing piece — *input staging*:
while the device renders block N, block N+1's host buffer is already being
transferred (jax.device_put returns immediately), so the step never waits on
PCIe/host memory.

Usage:
    feeder = DeviceFeeder(step_fn, state)
    feeder.prime(first_block)
    out = feeder.step(next_block)   # returns block N's output, stages N+1
    ...
    last = feeder.flush()
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np


class DeviceFeeder:
    def __init__(self, step_fn: Callable, state: Any,
                 device=None) -> None:
        """step_fn(state, x_device) -> (state', y_device)."""
        self.step_fn = step_fn
        self.state = state
        self.device = device
        self._staged = None
        self.steps = 0

    def _put(self, x: np.ndarray):
        if self.device is not None:
            return jax.device_put(x, self.device)
        return jax.device_put(x)

    def prime(self, x: np.ndarray) -> None:
        """Stage the first block (starts its transfer immediately)."""
        assert self._staged is None, "already primed"
        self._staged = self._put(x)

    def step(self, next_x: Optional[np.ndarray]):
        """Render the staged block; stage `next_x` while it runs.

        Returns the rendered output as a device array (fetch with
        np.asarray when needed — keeping it on device preserves pipelining).
        """
        assert self._staged is not None, "prime() first"
        current = self._staged
        # Stage the next transfer BEFORE dispatching compute so the copy and
        # the step overlap.
        self._staged = self._put(next_x) if next_x is not None else None
        self.state, y = self.step_fn(self.state, current)
        self.steps += 1
        return y

    def flush(self):
        """Render the final staged block (if any)."""
        if self._staged is None:
            return None
        return self.step(None)
