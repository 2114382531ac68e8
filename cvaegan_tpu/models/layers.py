"""Shared Flax building blocks.

The reference builds every network from the same ingredients
(`src/models/cvae_gan_models.py`): Linear(+optional spectral norm),
BatchNorm1d, LeakyReLU(0.2), Dropout(0.3), and the hidden-size rule
h1=max(256,d), h2=max(128,d//2), h3=max(64,d//4) (discriminators and
classifiers pin h3=64). Here those become Flax modules with explicit
mutable state:

  * BatchNorm running stats live in the `batch_stats` collection.
  * Spectral-norm power-iteration vectors live in the `spectral`
    collection and are updated inside the jitted train step — the
    TPU-native equivalent of torch's forward-hook buffer update.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvaegan_tpu.core import config as config_lib
from cvaegan_tpu.core import initializers as init


_DTYPE_OVERRIDE = None


def compute_dtype() -> jnp.dtype:
    """The active matmul/activation dtype (`settings.gan.compute_dtype`).

    Consulted at TRACE time by every dense layer below, so one flag flips
    the whole model zoo to bf16 compute with f32 parameters/optimizer
    (see the policy note on `core.config.GanConfig.compute_dtype`).
    Under the default "float32" the casts below are no-ops and the
    compiled programs are bitwise-identical to the pre-policy ones.
    """
    if _DTYPE_OVERRIDE is not None:
        return _DTYPE_OVERRIDE
    return jnp.dtype(config_lib.settings.gan.compute_dtype)


class dtype_override:
    """Pin `compute_dtype()` inside a `with` block, regardless of the
    global policy. Used by the downstream evaluation classifier to stay
    f32 while the generative models under study run bf16 — the
    measurement instrument's precision must not move with the thing it
    measures. Wrap the region where the jitted program is TRACED (the
    first call), not just where it executes."""

    def __init__(self, dtype):
        self.dtype = jnp.dtype(dtype)

    def __enter__(self):
        global _DTYPE_OVERRIDE
        self._old = _DTYPE_OVERRIDE
        _DTYPE_OVERRIDE = self.dtype
        return self

    def __exit__(self, *exc):
        global _DTYPE_OVERRIDE
        _DTYPE_OVERRIDE = self._old
        return False


def hidden_sizes(total_input_dim: int, pin_h3: bool = False) -> Sequence[int]:
    """Reference hidden-size rule (`src/models/cvae_gan_models.py:16-18`,
    `:173-175` for the pinned variant)."""
    h1 = max(256, total_input_dim)
    h2 = max(128, total_input_dim // 2)
    h3 = 64 if pin_h3 else max(64, total_input_dim // 4)
    return (h1, h2, h3)


def _l2_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v) + eps)


class SpectralDense(nn.Module):
    """Dense layer with spectral normalization via one power-iteration step
    per training forward (parity with torch's `spectral_norm` wrapper used
    at `src/models/cvae_gan_models.py:178-189`).

    The u/v singular-vector estimates are `spectral`-collection variables;
    pass `mutable=['spectral']` and `update_stats=True` during training.
    Gradients flow through the kernel in sigma but not through u/v.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel = self.param("kernel", init.dense_kernel, (in_dim, self.features))

        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (self.features,))
            ),
        )
        v_var = self.variable(
            "spectral",
            "v",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (in_dim,))
            ),
        )

        if update_stats and not self.is_initializing():
            # One power-iteration step on the current kernel (no gradient).
            k_sg = jax.lax.stop_gradient(kernel)
            v_new = _l2_normalize(k_sg @ u_var.value)        # input space
            u_new = _l2_normalize(k_sg.T @ v_new)            # output space
            u_var.value = u_new
            v_var.value = v_new
            u, v = u_new, v_new
        else:
            u = jax.lax.stop_gradient(u_var.value)
            v = jax.lax.stop_gradient(v_var.value)

        # Power iteration and sigma stay f32 regardless of the compute
        # policy (singular-value estimates degrade fast in bf16); only
        # the normalized matmul runs at compute dtype.
        sigma = jnp.einsum("i,io,o->", v, kernel, u)
        dt = compute_dtype()
        y = x.astype(dt) @ (kernel / sigma).astype(dt)
        if self.use_bias:
            bias = self.param("bias", init.zeros, (self.features,))
            y = y + bias.astype(dt)
        return y


class Dense(nn.Module):
    """Plain dense layer with the reference's N(0, 0.02)/zeros init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", init.dense_kernel, (x.shape[-1], self.features))
        dt = compute_dtype()
        y = x.astype(dt) @ kernel.astype(dt)
        if self.use_bias:
            y = y + self.param("bias", init.zeros, (self.features,)).astype(dt)
        return y


class BatchNorm(nn.Module):
    """BatchNorm1d parity: momentum 0.1 (torch) == flax momentum 0.9,
    eps 1e-5, scale ~ N(1, 0.02), bias 0 (`src/utils.py:99-101`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # Statistics (and the running batch_stats collection) are always
        # f32 — bf16 mean/variance estimates are the classic mixed-
        # precision instability; the output drops back to compute dtype.
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=init.bn_scale,
            bias_init=init.zeros,
        )(x.astype(jnp.float32))
        return y.astype(compute_dtype())


class MLPTrunk(nn.Module):
    """The reference's 3x [Linear -> BatchNorm -> LeakyReLU(0.2)] stack
    (`src/models/cvae_gan_models.py:20-33`)."""

    hidden: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for h in self.hidden:
            x = Dense(h)(x)
            x = BatchNorm()(x, train=train)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Integer labels -> float one-hot (`F.one_hot(...).float()` parity)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
