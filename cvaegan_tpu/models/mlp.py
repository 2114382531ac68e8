"""The MLP model family shared by the VAE/GAN zoo.

One parametric implementation covers the per-algorithm model files of the
reference (`src/models/{cvae_gan,cvae,vae,vae_gan,gan,cgan,sngan}_models.py`),
which differ only in conditioning (num_classes>0 vs 0), spectral
normalization placement, and output activation. Behavioural pointers are
given per class.

All modules take integer labels and one-hot them internally; unconditional
variants pass `labels=None`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvaegan_tpu.models.layers import (
    Dense,
    MLPTrunk,
    SpectralDense,
    hidden_sizes,
    one_hot,
)


class GaussianEncoder(nn.Module):
    """VAE encoder: trunk + (mu, log_var) heads
    (`src/models/cvae_gan_models.py:7-73`). Conditional when
    num_classes > 0 (input is concat(x, onehot(y)))."""

    num_classes: int
    latent_dim: int = 128
    input_dim: int = 0  # informational; trunk infers from input

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.num_classes > 0:
            assert labels is not None
            x = jnp.concatenate([x, one_hot(labels, self.num_classes)], axis=-1)
        h = MLPTrunk(hidden_sizes(x.shape[-1]))(x, train=train)
        mu = Dense(self.latent_dim, use_bias=True)(h)
        log_var = Dense(self.latent_dim, use_bias=True)(h)
        return mu, log_var


def reparameterize(key, mu: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(0.5 log_var) (`src/models/cvae_gan_models.py:69-72`)."""
    import jax

    std = jnp.exp(0.5 * log_var)
    eps = jax.random.normal(key, std.shape, std.dtype)
    return mu + eps * std


class Generator(nn.Module):
    """Generator/decoder: trunk + output head
    (`src/models/cvae_gan_models.py:76-162`). `hidden` (the trunk output,
    the reference's `hidden_status`) is returned alongside the sample.

    out_activation: 'sigmoid' for most models, 'tanh' for TMG-GAN
    (`src/models/tmg_gan_models.py:74-77`), None for raw output.
    spectral=True gives the SNGAN variant with spectral norm on every
    Linear (`src/models/sngan_models.py:21-40`).
    """

    output_dim: int
    num_classes: int = 0
    out_activation: Optional[str] = "sigmoid"
    spectral: bool = False

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.num_classes > 0:
            assert labels is not None
            z = jnp.concatenate([z, one_hot(labels, self.num_classes)], axis=-1)
        hs = hidden_sizes(z.shape[-1])
        h = z
        if self.spectral:
            for f in hs:
                h = SpectralDense(f)(h, update_stats=train)
                h = nn.leaky_relu(h, negative_slope=0.2)
            hidden = h
            x = SpectralDense(self.output_dim)(h, update_stats=train)
        else:
            h = MLPTrunk(hs)(h, train=train)
            hidden = h
            x = Dense(self.output_dim)(h)
        if self.out_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.out_activation == "tanh":
            x = nn.tanh(x)
        return x, hidden


class Discriminator(nn.Module):
    """Critic: 4 (spectral) Linears with LeakyReLU + Dropout(0.3)
    (`src/models/cvae_gan_models.py:165-248`). Conditional via one-hot
    concat; when `labels is None` and num_classes > 0 a zero condition
    vector is concatenated (reference `:221-223`). Returns (score, hidden)."""

    num_classes: int = 0
    spectral: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.num_classes > 0:
            if labels is None:
                cond = jnp.zeros((x.shape[0], self.num_classes), x.dtype)
            else:
                cond = one_hot(labels, self.num_classes)
            x = jnp.concatenate([x, cond], axis=-1)
        h1, h2, h3 = hidden_sizes(x.shape[-1], pin_h3=True)
        DenseCls = SpectralDense if self.spectral else Dense

        def dense(f, v):
            layer = DenseCls(f)
            return layer(v, update_stats=train) if self.spectral else layer(v)

        h = dense(h1, x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = dense(h2, h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = dense(h3, h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        hidden = h
        score = dense(1, h)
        return score, hidden


class Classifier(nn.Module):
    """Companion / downstream classifier
    (`src/models/cvae_gan_models.py:251-292`): Linear+ReLU+Dropout,
    Linear+LayerNorm+ReLU+Dropout, Linear+ReLU, Linear->logits."""

    num_classes: int
    spectral: bool = False  # SNGAN variant uses spectral norm

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h1, h2, h3 = hidden_sizes(x.shape[-1], pin_h3=True)
        DenseCls = SpectralDense if self.spectral else Dense

        def dense(f, v):
            layer = DenseCls(f)
            return layer(v, update_stats=train) if self.spectral else layer(v)

        h = dense(h1, x)
        h = nn.relu(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = dense(h2, h)
        # LayerNorm statistics in f32 under the bf16 compute policy (same
        # rule as layers.BatchNorm); no-op casts under the f32 default.
        from cvaegan_tpu.models.layers import compute_dtype
        h = nn.LayerNorm(epsilon=1e-5)(h.astype(jnp.float32))
        h = h.astype(compute_dtype())
        h = nn.relu(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = dense(h3, h)
        h = nn.relu(h)
        return dense(self.num_classes, h)
