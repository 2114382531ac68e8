"""SNGAN model family — spectral normalization on EVERY Linear, including
the generator and the companion classifier (`src/models/sngan_models.py`).

Generator: [SN-Linear -> BatchNorm -> ReLU] x3 + SN-Linear -> Sigmoid
(`src/models/sngan_models.py:21-40`). Discriminator: SN-Linears with
LeakyReLU(0.2), no dropout (`:91-116`). Classifier: SN-Linears with ReLU
(`:158-180`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvaegan_tpu.models.layers import BatchNorm, SpectralDense, hidden_sizes, one_hot


class SNGANGenerator(nn.Module):
    output_dim: int
    num_classes: int
    #: reference parity puts spectral norm on the generator too
    #: (`src/models/sngan_models.py:21-40`); `spectral=False` is the
    #: sweep knob for the hinge-loss hyperparameter study (SN on G is a
    #: known capacity limiter).
    spectral: bool = True

    @nn.compact
    def __call__(self, z, labels=None, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from cvaegan_tpu.models.layers import Dense

        def dense(v, f):
            if self.spectral:
                return SpectralDense(f)(v, update_stats=train)
            return Dense(f)(v)

        if self.num_classes > 0:
            z = jnp.concatenate([z, one_hot(labels, self.num_classes)], axis=-1)
        h = z
        for f in hidden_sizes(z.shape[-1]):
            h = dense(h, f)
            h = BatchNorm()(h, train=train)
            h = nn.relu(h)
        hidden = h
        x = dense(h, self.output_dim)
        return nn.sigmoid(x), hidden


class SNGANDiscriminator(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, labels=None, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.num_classes > 0:
            cond = (one_hot(labels, self.num_classes) if labels is not None
                    else jnp.zeros((x.shape[0], self.num_classes), x.dtype))
            x = jnp.concatenate([x, cond], axis=-1)
        h = x
        for f in hidden_sizes(x.shape[-1], pin_h3=True):
            h = SpectralDense(f)(h, update_stats=train)
            h = nn.leaky_relu(h, negative_slope=0.2)
        hidden = h
        score = SpectralDense(1)(h, update_stats=train)
        return score, hidden


class SNGANClassifier(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True) -> jnp.ndarray:
        h = x
        for f in hidden_sizes(x.shape[-1], pin_h3=True):
            h = SpectralDense(f)(h, update_stats=train)
            h = nn.relu(h)
        return SpectralDense(self.num_classes)(h, update_stats=train)
