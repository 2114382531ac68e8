"""QG-SMOTE model family (`src/models/qg_smote_models.py`).

The quantile encoder maps each (x, y) to `latent_dim x num_quantiles`
latent quantile values; latent sampling interpolates between adjacent
quantiles at a random alpha — the SMOTE analogy (`:68-83`). A separate
QuantileRegressor predicts feature-space quantiles trained with the
pinball loss (`src/qg_smote.py:272-294`). Generator/discriminator/
classifier reuse the shared MLP family (identical architectures,
`src/models/qg_smote_models.py:87-324`).
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from cvaegan_tpu.models.layers import Dense, MLPTrunk, hidden_sizes, one_hot


class QuantileEncoder(nn.Module):
    """Trunk + fc head reshaped to [batch, latent_dim, num_quantiles]
    (`src/models/qg_smote_models.py:8-66`)."""

    num_classes: int
    latent_dim: int = 128
    num_quantiles: int = 3

    @nn.compact
    def __call__(self, x, labels, train: bool = True) -> jnp.ndarray:
        x = jnp.concatenate([x, one_hot(labels, self.num_classes)], axis=-1)
        h = MLPTrunk(hidden_sizes(x.shape[-1]))(x, train=train)
        q = Dense(self.latent_dim * self.num_quantiles)(h)
        return q.reshape(-1, self.latent_dim, self.num_quantiles)


def sample_from_quantiles(key: jax.Array, quantiles: jnp.ndarray) -> jnp.ndarray:
    """Random alpha-interpolation between adjacent latent quantiles
    (`src/models/qg_smote_models.py:68-83`).

    quantiles: [batch, latent_dim, num_quantiles] -> z [batch, latent_dim].
    """
    b, d, nq = quantiles.shape
    alpha = jax.random.uniform(key, (b, 1))
    idx_float = alpha * (nq - 1)
    idx_lower = jnp.floor(idx_float).astype(jnp.int32)
    idx_upper = jnp.ceil(idx_float).astype(jnp.int32)
    w_upper = idx_float - idx_lower
    w_lower = 1.0 - w_upper
    z_lower = jnp.take_along_axis(quantiles, idx_lower[:, :, None], axis=2)[..., 0]
    z_upper = jnp.take_along_axis(quantiles, idx_upper[:, :, None], axis=2)[..., 0]
    return w_lower * z_lower + w_upper * z_upper


class QuantileRegressor(nn.Module):
    """Feature-space quantile prediction head
    (`src/models/qg_smote_models.py:235-283` QuantileRegressorModel):
    Linear+ReLU+Dropout, Linear+ReLU, Linear -> [batch, features,
    num_quantiles]."""

    in_features: int
    num_classes: int
    num_quantiles: int = 3

    @nn.compact
    def __call__(self, x, labels, train: bool = True) -> jnp.ndarray:
        xc = jnp.concatenate([x, one_hot(labels, self.num_classes)], axis=-1)
        h1, h2, _ = hidden_sizes(xc.shape[-1])
        h = Dense(h1)(xc)
        h = nn.relu(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = Dense(h2)(h)
        h = nn.relu(h)
        out = Dense(self.in_features * self.num_quantiles)(h)
        return out.reshape(-1, self.in_features, self.num_quantiles)
