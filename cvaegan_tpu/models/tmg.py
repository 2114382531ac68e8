"""TMG-GAN model family (`src/models/tmg_gan_models.py`).

The CD network is a shared spectral-norm trunk with two heads: a critic
score and SOFTMAX class probabilities (`:9-47`). Note the reference feeds
those softmax probabilities straight into `cross_entropy` (which applies
log-softmax again, `src/tmg_gan.py:75-79`) — we reproduce that observable
behaviour exactly by returning the probabilities and letting the trainer
apply the standard CE to them.

The per-class generator (`:50-94`, z -> [Linear+BN+LeakyReLU] x3 ->
Linear + Tanh, hidden exposed) is instantiated once here; the trainer
vmaps it over a STACKED parameter bank — the TPU-native replacement for
the reference's python list of `label_num` generator modules
(`src/tmg_gan.py:16-20`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvaegan_tpu.models.layers import (
    Dense, MLPTrunk, SpectralDense, hidden_sizes,
)


class TMGCD(nn.Module):
    """Shared trunk + (critic score, softmax class probs, hidden)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        h1, h2, h3 = hidden_sizes(x.shape[-1], pin_h3=True)
        h = SpectralDense(h1)(x, update_stats=train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = SpectralDense(h2)(h, update_stats=train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = SpectralDense(h3)(h, update_stats=train)
        h = nn.leaky_relu(h, negative_slope=0.2)
        hidden = h
        score = SpectralDense(1)(h, update_stats=train)
        probs = nn.softmax(Dense(self.num_classes)(h), axis=-1)
        return score, probs, hidden


class TMGGenerator(nn.Module):
    """Per-class generator; hidden sizes derive from feature_num, output
    is Tanh (`src/models/tmg_gan_models.py:50-94`)."""

    feature_num: int

    @nn.compact
    def __call__(self, z, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = MLPTrunk(hidden_sizes(self.feature_num))(z, train=train)
        hidden = h
        x = nn.tanh(Dense(self.feature_num)(h))
        return x, hidden
