"""Parameter initializers matching the reference's `init_weights`
(`src/utils.py:95-102`): Linear weights ~ N(0, 0.02), biases 0;
BatchNorm scale ~ N(1, 0.02), bias 0."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_kernel(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * 0.02


def bn_scale(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)
