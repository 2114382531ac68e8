"""RAIN-GAN model family — pre-LN residual self-attention blocks
(`src/models/rain_gan_models.py`).

The reference feeds every network a singleton sequence (inputs
`unsqueeze(1)`'d, seq_len=1, `:139,222,300,349`); the blocks here are
written seq-length-generic (inputs [batch, seq, dim]) so blockwise/
sequence-parallel execution is a natural extension, and each forward
returns the last block's attention probabilities for the entropy
regulariser and the `visualize_attention` API.

Note on the entropy loss: with seq_len=1 the attention softmax is over a
single key, so attn_probs == 1 and the entropy term is identically zero —
this is faithful to the reference's behaviour, where the same degeneracy
holds.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvaegan_tpu.models.layers import Dense, SpectralDense, one_hot


class MultiHeadSelfAttention(nn.Module):
    """4-head self-attention returning (output, attn_stats)
    (`src/models/rain_gan_models.py:55-89`).

    For sequences of at least `kernel_min_seq` on TPU (or when
    `use_kernel=True` is forced), the contraction dispatches to the
    blockwise Pallas flash-attention kernel
    (`cvaegan_tpu.kernels.block_attention`) — O(seq) memory, no
    materialised probability matrix. In that regime `attn_stats` is an
    `AttentionRowEntropy` carrying exact per-row entropies `[b, h, s]`
    computed inside the kernel, so `losses.attention_entropy` and entropy
    diagnostics stay exact; callers needing dense probability maps
    (`visualize_attention`) run at short seq lengths where the XLA path
    returns them.
    """

    embed_dim: int
    num_heads: int = 4
    kernel_min_seq: int = 128
    #: None = auto (TPU backend + seq >= kernel_min_seq); True/False forces.
    use_kernel: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        import jax

        b, s, _ = x.shape
        h, hd = self.num_heads, self.embed_dim // self.num_heads

        def split_heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q = split_heads(Dense(self.embed_dim)(x))
        k = split_heads(Dense(self.embed_dim)(x))
        v = split_heads(Dense(self.embed_dim)(x))

        on_tpu = jax.default_backend() == "tpu"
        use_kernel = (
            s >= self.kernel_min_seq and s % 128 == 0 and on_tpu
        ) if self.use_kernel is None else self.use_kernel
        if use_kernel:
            from cvaegan_tpu.core.losses import AttentionRowEntropy
            from cvaegan_tpu.kernels.block_attention import (
                block_attention_with_entropy,
            )

            out, ent = block_attention_with_entropy(
                q.reshape(b * h, s, hd), k.reshape(b * h, s, hd),
                v.reshape(b * h, s, hd), interpret=not on_tpu,
            )
            out = out.reshape(b, h, s, hd)
            probs = AttentionRowEntropy(ent.reshape(b, h, s))
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
            probs = nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.embed_dim)
        out = Dense(self.embed_dim)(out)
        return out, probs


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attention + 2-layer feed-forward + shortcut
    (`src/models/rain_gan_models.py:8-52`)."""

    output_dim: int
    num_heads: int = 4
    spectral: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        input_dim = x.shape[-1]
        DenseCls = SpectralDense if self.spectral else Dense

        def dense(v, f):
            layer = DenseCls(f)
            return layer(v, update_stats=train) if self.spectral else layer(v)

        x_norm = nn.LayerNorm(epsilon=1e-5)(x)
        attn_out, probs = MultiHeadSelfAttention(input_dim, self.num_heads)(x_norm)
        x = x + attn_out

        x_norm = nn.LayerNorm(epsilon=1e-5)(x)
        ff = dense(x_norm, self.output_dim)
        ff = nn.leaky_relu(ff, negative_slope=0.2)
        ff = dense(ff, self.output_dim)

        shortcut = x if input_dim == self.output_dim else dense(x, self.output_dim)
        return shortcut + ff, probs


class RAINEncoder(nn.Module):
    """Projection -> 2 attention blocks -> (mu, log_var)
    (`src/models/rain_gan_models.py:93-163`)."""

    num_classes: int
    latent_dim: int = 128

    @nn.compact
    def __call__(self, x, labels, train: bool = True):
        x = jnp.concatenate([x, one_hot(labels, self.num_classes)], axis=-1)
        x = x[:, None, :]  # singleton sequence
        x = Dense(256)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(256)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(128)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = x[:, 0, :]
        return (Dense(self.latent_dim)(x), Dense(self.latent_dim)(x)), probs


class RAINGenerator(nn.Module):
    """Projection -> 3 attention blocks -> Sigmoid output. Takes an
    explicit z so the reconstruction path truly uses z_enc — the
    documented fix of the reference bug where `generate_conditional_
    samples` redraws a fresh prior z internally and the recon loss never
    sees the encoder output (`src/rain_gan.py:194-201`,
    `src/models/rain_gan_models.py:215-224`)."""

    output_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, z, labels, train: bool = True):
        x = jnp.concatenate([z, one_hot(labels, self.num_classes)], axis=-1)
        x = x[:, None, :]
        x = Dense(256)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(256)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(128)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(64)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = x[:, 0, :]
        return nn.sigmoid(Dense(self.output_dim)(x)), probs


class RAINDiscriminator(nn.Module):
    """Spectral-norm attention critic (`src/models/rain_gan_models.py:
    240-313`)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, labels=None, train: bool = True):
        cond = (one_hot(labels, self.num_classes) if labels is not None
                else jnp.zeros((x.shape[0], self.num_classes), x.dtype))
        x = jnp.concatenate([x, cond], axis=-1)
        x = x[:, None, :]
        x = SpectralDense(256)(x, update_stats=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(256, spectral=True)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x, probs = ResidualAttentionBlock(128, spectral=True)(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = x[:, 0, :]
        return SpectralDense(1)(x, update_stats=train), probs


class RAINClassifier(nn.Module):
    """Attention classifier with ReLU activations
    (`src/models/rain_gan_models.py:316-372`)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x[:, None, :]
        x = Dense(256)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.relu(x)
        x, probs = ResidualAttentionBlock(256)(x, train=train)
        x = nn.relu(x)
        x, probs = ResidualAttentionBlock(128)(x, train=train)
        x = nn.relu(x)
        x = x[:, 0, :]
        return Dense(self.num_classes)(x), probs
