"""Unit tests for model building blocks: spectral norm power iteration
(cross-checked against torch's spectral_norm as an oracle), hidden-size
rule, BatchNorm running-stats parity, reparameterization."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvaegan_tpu.models import mlp
from cvaegan_tpu.models.layers import SpectralDense, hidden_sizes


def test_hidden_size_rule():
    # Reference rule (`src/models/cvae_gan_models.py:16-18`).
    assert hidden_sizes(35) == (256, 128, 64)
    assert hidden_sizes(600) == (600, 300, 150)
    assert hidden_sizes(600, pin_h3=True) == (600, 300, 64)


def test_spectral_dense_normalizes_to_unit_sigma():
    """After enough power iterations the effective weight has top singular
    value ~1, matching torch.nn.utils.parametrizations.spectral_norm."""
    layer = SpectralDense(16, use_bias=False)
    x = jnp.ones((4, 8))
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    params, spectral = variables["params"], variables["spectral"]

    # Run several training forwards to converge u/v.
    for _ in range(30):
        _, upd = layer.apply(
            {"params": params, "spectral": spectral}, x,
            update_stats=True, mutable=["spectral"],
        )
        spectral = upd["spectral"]

    kernel = np.asarray(params["kernel"])
    u = np.asarray(spectral["u"])
    v = np.asarray(spectral["v"])
    sigma = float(v @ kernel @ u)
    true_sigma = np.linalg.svd(kernel, compute_uv=False)[0]
    assert np.isclose(sigma, true_sigma, rtol=1e-3)

    # Effective weight passed to the matmul has unit spectral norm.
    w_eff = kernel / sigma
    assert np.isclose(np.linalg.svd(w_eff, compute_uv=False)[0], 1.0, rtol=1e-3)


def test_spectral_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from torch.nn.utils.parametrizations import spectral_norm

    rng = np.random.default_rng(0)
    w = rng.normal(scale=0.5, size=(12, 20)).astype(np.float32)  # [out, in]

    lin = torch.nn.Linear(20, 12, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(w))
    lin = spectral_norm(lin)
    lin.train()
    x_t = torch.randn(4, 20)
    for _ in range(50):
        lin(x_t)  # power iterations
    with torch.no_grad():
        w_torch = lin.weight.detach().numpy()

    # Our layer with the same kernel (transposed to [in, out]).
    layer = SpectralDense(12, use_bias=False)
    x = jnp.zeros((4, 20))
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    params = {"kernel": jnp.asarray(w.T)}
    spectral = variables["spectral"]
    for _ in range(50):
        _, upd = layer.apply(
            {"params": params, "spectral": spectral}, x,
            update_stats=True, mutable=["spectral"],
        )
        spectral = upd["spectral"]
    kernel = np.asarray(params["kernel"])
    sigma = float(np.asarray(spectral["v"]) @ kernel @ np.asarray(spectral["u"]))
    np.testing.assert_allclose(kernel / sigma, w_torch.T, rtol=1e-3, atol=1e-5)


def test_reparameterize_statistics():
    key = jax.random.PRNGKey(0)
    mu = jnp.full((20000, 2), 3.0)
    log_var = jnp.full((20000, 2), np.log(4.0))
    z = mlp.reparameterize(key, mu, log_var)
    assert np.isclose(float(z.mean()), 3.0, atol=0.05)
    assert np.isclose(float(z.std()), 2.0, atol=0.05)


def test_generator_output_range_and_hidden():
    gen = mlp.Generator(output_dim=10, num_classes=3)
    z = jnp.zeros((4, 16))
    y = jnp.asarray([0, 1, 2, 0], jnp.int32)
    variables = gen.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, z, y, train=False)
    (x, hidden), _ = gen.apply(variables, z, y, train=True,
                               mutable=["batch_stats"])
    assert x.shape == (4, 10)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0  # sigmoid
    assert hidden.shape[0] == 4


def test_encoder_conditional_shapes():
    enc = mlp.GaussianEncoder(num_classes=5, latent_dim=32)
    x = jnp.zeros((6, 30))
    y = jnp.zeros((6,), jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, y, train=False)
    mu, log_var = enc.apply(variables, x, y, train=False)
    assert mu.shape == (6, 32) and log_var.shape == (6, 32)


def test_discriminator_unconditional_condition_is_zero_vector():
    """labels=None with num_classes>0 concatenates zeros (reference
    `src/models/cvae_gan_models.py:221-223`) — score must be finite and
    shaped [batch, 1]."""
    dis = mlp.Discriminator(num_classes=4)
    x = jnp.ones((3, 10))
    variables = dis.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x, None,
                         train=False)
    score, hidden = dis.apply(variables, x, None, train=False)
    assert score.shape == (3, 1)
    assert np.isfinite(np.asarray(score)).all()


def test_batchnorm_running_stats_update():
    """Train-mode forwards must update running stats even without grads
    (torch `.train()` + no_grad parity)."""
    gen = mlp.Generator(output_dim=5, num_classes=0)
    z = jax.random.normal(jax.random.PRNGKey(0), (64, 8)) * 10.0
    variables = gen.init({"params": jax.random.PRNGKey(1)}, z, train=False)
    stats0 = jax.tree.leaves(variables["batch_stats"])
    _, upd = gen.apply(variables, z, train=True, mutable=["batch_stats"])
    stats1 = jax.tree.leaves(upd["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(stats0, stats1)
    )
    assert changed
