"""Device-array construction helpers.

Some tunneled PJRT transports cannot transfer complex64 buffers host<->device
(UNIMPLEMENTED at transfer time, discovered on this environment's TPU
tunnel). Complex arrays must therefore be BUILT on device from float planes,
and complex state must be CREATED on device. These helpers centralize that:
float32 uploads + a jitted combine/zeros. Pure-device complex math and
passing device-resident complex arrays between jits are unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=())
def _combine(re: jax.Array, im: jax.Array) -> jax.Array:
    return jax.lax.complex(re, im)


def device_complex(array: np.ndarray) -> jax.Array:
    """Upload a host complex array as float planes; combine on device."""
    array = np.asarray(array)
    re = jnp.asarray(np.ascontiguousarray(array.real), jnp.float32)
    im = jnp.asarray(np.ascontiguousarray(array.imag), jnp.float32)
    return _combine(re, im)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _zeros(shape, dtype) -> jax.Array:
    return jnp.zeros(shape, dtype)


def complex_zeros(shape, dtype=jnp.complex64) -> jax.Array:
    """Create a complex zeros array ON DEVICE (no host transfer).

    One cached jit per (shape, dtype) — a fresh jit wrapper per call would
    recompile every time (seconds per call on this environment's 1-core
    compile path)."""
    return _zeros(tuple(shape), np.dtype(dtype))
