"""Numeric unit tests for loss primitives, cross-checked against
independent torch/numpy formulations (torch-cpu is available in the
image; we use it only as a test oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvaegan_tpu.core import losses
from cvaegan_tpu.core.schedules import progressive_lambda


def test_mse_matches_numpy():
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=(16, 7)), rng.normal(size=(16, 7))
    got = float(losses.mse(jnp.asarray(a), jnp.asarray(b)))
    assert np.isclose(got, np.mean((a - b) ** 2), rtol=1e-5)


def test_kl_matches_closed_form():
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(8, 4)).astype(np.float32)
    log_var = rng.normal(size=(8, 4)).astype(np.float32)
    got = float(losses.kl_standard_normal(jnp.asarray(mu), jnp.asarray(log_var)))
    want = (-0.5 * np.sum(1 + log_var - mu**2 - np.exp(log_var))) / 8
    assert np.isclose(got, want, rtol=1e-5)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(32, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(32,))
    got = float(losses.cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(labels, jnp.int32)))
    want = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels)))
    assert np.isclose(got, want, rtol=1e-5)


def test_weighted_cross_entropy_ignores_padding():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(8, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(8,)).astype(np.int32)
    w = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    got = float(losses.weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))
    want = float(losses.cross_entropy(jnp.asarray(logits[:4]),
                                      jnp.asarray(labels[:4])))
    assert np.isclose(got, want, rtol=1e-5)


def test_hinge_loss():
    d_real = jnp.asarray([2.0, 0.5])
    d_fake = jnp.asarray([-2.0, 0.5])
    # relu(1-2)+relu(1-0.5) = 0+0.5 -> mean 0.25; relu(1-2)+relu(1+0.5) -> 0, 1.5 -> mean .75
    got = float(losses.hinge_d_loss(d_real, d_fake))
    assert np.isclose(got, 0.25 + 0.75)


def test_pinball_loss_asymmetry():
    # Under-prediction penalised by q, over-prediction by (1-q).
    q = jnp.asarray([0.25])
    target = jnp.asarray([[1.0]])
    under = jnp.asarray([[[0.0]]])   # diff = +1 -> q * 1 = 0.25
    over = jnp.asarray([[[2.0]]])    # diff = -1 -> (q-1)*(-1) = 0.75
    assert np.isclose(float(losses.pinball(under, target, q)), 0.25)
    assert np.isclose(float(losses.pinball(over, target, q)), 0.75)


def test_attention_entropy_uniform_is_max():
    uniform = jnp.full((2, 4, 8), 1.0 / 8)
    peaked = jnp.asarray(np.eye(8)[None].repeat(2, 0).astype(np.float32))
    assert float(losses.attention_entropy(uniform)) > float(
        losses.attention_entropy(peaked))
    assert np.isclose(float(losses.attention_entropy(uniform)),
                      np.log(8), rtol=1e-4)


def test_gradient_penalty_on_linear_critic():
    # D(x) = w.x with |w| = 3 -> gradient norm is 3 everywhere -> GP = 4.
    w = np.zeros((6,), np.float32)
    w[0] = 3.0

    def d_apply(x):
        return x @ jnp.asarray(w)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 6))
    gp = float(losses.gradient_penalty(d_apply, x, x + 1.0, key))
    assert np.isclose(gp, 4.0, rtol=1e-4)


def test_progressive_schedule():
    assert float(progressive_lambda(0, 0.5)) == 0.0
    assert float(progressive_lambda(199, 0.5)) == 0.0
    assert np.isclose(float(progressive_lambda(350, 0.5)), 0.25)
    assert np.isclose(float(progressive_lambda(500, 0.5)), 0.5)
    assert np.isclose(float(progressive_lambda(700, 0.5)), 0.5)


def test_mmd_zero_for_identical():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(50, 6)).astype(np.float32)
    assert abs(float(losses.mmd_rbf(jnp.asarray(x), jnp.asarray(x)))) < 1e-5
    y = rng.normal(loc=5.0, size=(50, 6)).astype(np.float32)
    # Distant distributions: cross-kernel ~0, so MMD^2 ~ mean within-set
    # kernel mass — strictly positive and well above the identical case.
    assert float(losses.mmd_rbf(jnp.asarray(x), jnp.asarray(y))) > 0.05
