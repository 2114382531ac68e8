"""Cross-framework numerics parity: our Flax modules vs hand-built torch
twins with identical weights must produce identical eval-mode outputs.

This is the strongest architecture-parity evidence available without
importing reference code: the torch twin is constructed here from the
architecture facts documented in PARITY.md (Linear/BatchNorm1d/
LeakyReLU(0.2) trunk + Sigmoid head, LayerNorm classifier), weights are
copied from our initialised Flax params, and eval-mode forwards are
compared bit-for-bit (fp32 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cvaegan_tpu.core.state import adam, apply_eval, init_net  # noqa: E402
from cvaegan_tpu.models import mlp  # noqa: E402


def _copy_linear(t_linear, flax_dense):
    with torch.no_grad():
        t_linear.weight.copy_(torch.tensor(np.asarray(flax_dense["kernel"]).T))
        t_linear.bias.copy_(torch.tensor(np.asarray(flax_dense["bias"])))


def _copy_bn(t_bn, flax_bn, flax_stats):
    with torch.no_grad():
        t_bn.weight.copy_(torch.tensor(np.asarray(flax_bn["scale"])))
        t_bn.bias.copy_(torch.tensor(np.asarray(flax_bn["bias"])))
        t_bn.running_mean.copy_(torch.tensor(np.asarray(flax_stats["mean"])))
        t_bn.running_var.copy_(torch.tensor(np.asarray(flax_stats["var"])))


def test_generator_forward_matches_torch_twin():
    feature_num, label_num, z_size = 30, 5, 128
    gen = mlp.Generator(output_dim=feature_num, num_classes=label_num)
    st = init_net(gen, jax.random.PRNGKey(0), adam(1e-3),
                  jnp.zeros((2, z_size)), jnp.zeros((2,), jnp.int32))
    # Perturb BN running stats so the eval path is non-trivial.
    zs = jax.random.normal(jax.random.PRNGKey(1), (64, z_size)) * 2.0
    ys = jnp.asarray(np.arange(64) % label_num, jnp.int32)
    _, mut = gen.apply({"params": st.params, **st.mutables}, zs, ys,
                       train=True, mutable=["batch_stats"])
    st = st.replace(mutables=dict(mut))

    # torch twin: 3x [Linear -> BN -> LeakyReLU(0.2)] -> Linear -> Sigmoid
    dims = [z_size + label_num, 256, 128, 64]
    layers = []
    for i in range(3):
        layers += [torch.nn.Linear(dims[i], dims[i + 1]),
                   torch.nn.BatchNorm1d(dims[i + 1]),
                   torch.nn.LeakyReLU(0.2)]
    twin_trunk = torch.nn.Sequential(*layers)
    twin_head = torch.nn.Sequential(torch.nn.Linear(64, feature_num),
                                    torch.nn.Sigmoid())

    trunk_p = st.params["MLPTrunk_0"]
    trunk_s = st.mutables["batch_stats"]["MLPTrunk_0"]
    for i in range(3):
        _copy_linear(twin_trunk[3 * i], trunk_p[f"Dense_{i}"])
        _copy_bn(twin_trunk[3 * i + 1],
                 trunk_p[f"BatchNorm_{i}"]["BatchNorm_0"],
                 trunk_s[f"BatchNorm_{i}"]["BatchNorm_0"])
    _copy_linear(twin_head[0], st.params["Dense_0"])
    twin_trunk.eval()
    twin_head.eval()

    z = jax.random.normal(jax.random.PRNGKey(2), (32, z_size))
    y = jnp.asarray(np.arange(32) % label_num, jnp.int32)
    ours, _ = apply_eval(gen, st, z, y)

    z_t = torch.tensor(np.asarray(z))
    onehot = torch.nn.functional.one_hot(
        torch.tensor(np.asarray(y), dtype=torch.long), label_num).float()
    with torch.no_grad():
        theirs = twin_head(twin_trunk(torch.cat([z_t, onehot], dim=1)))

    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_classifier_forward_matches_torch_twin():
    feature_num, label_num = 30, 5
    clf = mlp.Classifier(num_classes=label_num)
    st = init_net(clf, jax.random.PRNGKey(3), adam(1e-3),
                  jnp.zeros((2, feature_num)))

    twin = torch.nn.Sequential(
        torch.nn.Linear(feature_num, 256), torch.nn.ReLU(),
        torch.nn.Dropout(0.3),
        torch.nn.Linear(256, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Dropout(0.3),
        torch.nn.Linear(128, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, label_num),
    )
    p = st.params
    _copy_linear(twin[0], p["Dense_0"])
    _copy_linear(twin[3], p["Dense_1"])
    with torch.no_grad():
        twin[4].weight.copy_(torch.tensor(np.asarray(p["LayerNorm_0"]["scale"])))
        twin[4].bias.copy_(torch.tensor(np.asarray(p["LayerNorm_0"]["bias"])))
    _copy_linear(twin[7], p["Dense_2"])
    _copy_linear(twin[9], p["Dense_3"])
    twin.eval()

    x = jax.random.uniform(jax.random.PRNGKey(4), (16, feature_num))
    ours = apply_eval(clf, st, x)
    with torch.no_grad():
        theirs = twin(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)
