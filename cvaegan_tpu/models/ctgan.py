"""CTGAN model family — residual MLP blocks with per-sample column masks
(`src/models/ctgan_models.py`).

Both generator and critic receive an extra one-hot "column mask" appended
to their inputs (random column per row in training, round-robin in eval,
`src/models/ctgan_models.py:90-97,182-189`); the mask is an explicit
argument here so the jitted train step controls its randomness.
`ModeSpecificNormalization` (per-mode affine, `:284-300`) is provided for
parity; like the reference's unused `column_embedding`, it is not wired
into the training path (divergence note: we do not materialise the
reference's dead `column_embedding` parameters).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvaegan_tpu.core import initializers as init
from cvaegan_tpu.models.layers import (
    BatchNorm, Dense, SpectralDense, hidden_sizes, one_hot,
)


def random_column_mask(key: jax.Array, batch: int, num_columns: int) -> jnp.ndarray:
    """Training-mode mask: one random column per row (`:91-93`)."""
    cols = jax.random.randint(key, (batch,), 0, num_columns)
    return jax.nn.one_hot(cols, num_columns, dtype=jnp.float32)


def round_robin_column_mask(batch: int, num_columns: int) -> jnp.ndarray:
    """Eval-mode mask: row i highlights column i % num_columns (`:94-95`)."""
    cols = jnp.arange(batch) % num_columns
    return jax.nn.one_hot(cols, num_columns, dtype=jnp.float32)


class ResidualBlock(nn.Module):
    """[Linear -> BN -> ReLU -> Linear -> BN] + shortcut
    (`src/models/ctgan_models.py:8-36`)."""

    features: int
    spectral: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        DenseCls = SpectralDense if self.spectral else Dense

        def dense(v, f):
            layer = DenseCls(f)
            return layer(v, update_stats=train) if self.spectral else layer(v)

        h = dense(x, self.features)
        h = BatchNorm()(h, train=train)
        h = nn.relu(h)
        h = dense(h, self.features)
        h = BatchNorm()(h, train=train)
        if x.shape[-1] != self.features:
            x = dense(x, self.features)
        return h + x


class CTGANGenerator(nn.Module):
    """concat(z, onehot(y), column_mask) -> projection -> 2 residual
    blocks -> Tanh output (`src/models/ctgan_models.py:40-123`)."""

    output_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, z, labels, column_mask, train: bool = True) -> jnp.ndarray:
        x = jnp.concatenate(
            [z, one_hot(labels, self.num_classes), column_mask], axis=-1
        )
        h1, h2, h3 = hidden_sizes(x.shape[-1])
        x = Dense(h1)(x)
        x = BatchNorm()(x, train=train)
        x = nn.relu(x)
        x = ResidualBlock(h2)(x, train=train)
        x = nn.relu(x)
        x = ResidualBlock(h3)(x, train=train)
        x = nn.relu(x)
        return nn.tanh(Dense(self.output_dim)(x))


class CTGANDiscriminator(nn.Module):
    """Spectral-norm residual critic over concat(x, onehot, column_mask)
    with Dropout(0.1) (`src/models/ctgan_models.py:127-212`)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, labels, column_mask, train: bool = True) -> jnp.ndarray:
        cond = (one_hot(labels, self.num_classes) if labels is not None
                else jnp.zeros((x.shape[0], self.num_classes), x.dtype))
        h = jnp.concatenate([x, cond, column_mask], axis=-1)
        h1, h2, h3 = hidden_sizes(h.shape[-1])
        h = SpectralDense(h1)(h, update_stats=train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        h = ResidualBlock(h2, spectral=True)(h, train=train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        h = ResidualBlock(h3, spectral=True)(h, train=train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        return SpectralDense(1)(h, update_stats=train)


class CTGANClassifier(nn.Module):
    """Linear+BN+ReLU+Dropout(0.3) x2 -> Linear+ReLU -> logits
    (`src/models/ctgan_models.py:241-281`)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True) -> jnp.ndarray:
        h1, h2, h3 = hidden_sizes(x.shape[-1], pin_h3=True)
        h = Dense(h1)(x)
        h = BatchNorm()(h, train=train)
        h = nn.relu(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = Dense(h2)(h)
        h = BatchNorm()(h, train=train)
        h = nn.relu(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = Dense(h3)(h)
        h = nn.relu(h)
        return Dense(self.num_classes)(h)


class ModeSpecificNormalization(nn.Module):
    """Per-mode affine y = gamma[mode] * x + beta[mode]
    (`src/models/ctgan_models.py:284-300`)."""

    num_features: int
    num_modes: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, modes: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", lambda k, s: jnp.ones(s),
                           (self.num_modes, self.num_features))
        beta = self.param("beta", init.zeros,
                          (self.num_modes, self.num_features))
        return gamma[modes] * x + beta[modes]
