"""Multi-chip sharding tests on the virtual 8-device CPU mesh: mesh
construction, tensor-parallel sharding specs, and a full data+tensor
parallel fused epoch that must match the single-device epoch numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cvaegan_tpu.parallel import mesh as mesh_lib


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh(4, 2)
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.make_mesh(64, 2)


def test_shard_net_state_specs():
    m = mesh_lib.make_mesh(4, 2)
    state = {
        "kernel": jnp.zeros((30, 256)),   # out dim divisible -> model-sharded
        "odd_kernel": jnp.zeros((30, 31)),  # not divisible -> replicated
        "scale": jnp.zeros((128,)),
        "count": jnp.zeros(()),
    }
    shardings = mesh_lib.shard_net_state(state, m)
    assert shardings["kernel"].spec == P(None, "model")
    assert shardings["odd_kernel"].spec == P()
    assert shardings["scale"].spec == P("model")
    assert shardings["count"].spec == P()


def test_shard_leading_noop_without_mesh():
    x = jnp.ones((8, 4))
    assert mesh_lib.shard_leading(x) is x


@pytest.mark.parametrize("model_name", [
    "CVAEGAN", "TMGGAN", "CTGAN", "RAIN_GAN", "QG_SMOTE", "SNGAN",
    "CGAN", "CVAE", "VAEGAN", "GAN", "VAE",
])
def test_sharded_epoch_matches_single_device(model_name, blob_dataset,
                                             fast_settings):
    """The same fused epoch on a 4x2 DPxTP mesh must produce the same
    losses as the unsharded run (identical math, different layout) —
    for EVERY trainer family (VERDICT r2 item 2): the 4-net alternating
    CVAE-GAN step, TMG-GAN's vmapped generator bank + cross-generator
    diversity step, CTGAN's per-example gradient penalty, RAIN-GAN's
    attention + entropy losses, QG-SMOTE's 5-net pinball step, SNGAN
    hinge, the CGAN/CVAE conditional steps, and the unconditional
    VAE / GAN / VAE-GAN family."""
    import cvaegan_tpu

    cls = getattr(cvaegan_tpu, model_name)
    fast_settings.gan.batch_size = 32  # divides the 4-way data axis

    def one_epoch(use_mesh):
        m = cls()
        m._prepare(blob_dataset)
        state, data = m.state, m._data
        key = jax.random.PRNGKey(7)
        if use_mesh:
            mesh = mesh_lib.make_mesh(4, 2)
            shardings = mesh_lib.shard_net_state(state, mesh)
            state = jax.tree.map(jax.device_put, state, shardings)
            data = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), data)
            with mesh_lib.use_mesh(mesh):
                _, losses = jax.jit(
                    lambda s, d, k: m._epoch_body(s, d, jnp.int32(0), k)
                )(state, data, key)
        else:
            _, losses = jax.jit(
                lambda s, d, k: m._epoch_body(s, d, jnp.int32(0), k)
            )(state, data, key)
        return jax.device_get(losses)

    single = one_epoch(False)
    sharded = one_epoch(True)
    # Sharded reductions reorder fp32 sums; after 65 sequential optimizer
    # updates the drift compounds, so compare with matching slack.
    for k in single:
        np.testing.assert_allclose(single[k], sharded[k], rtol=5e-2, atol=5e-3)


def test_graft_entry_dryrun():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 30)
    ge.dryrun_multichip(8)  # cycles CVAE-GAN, TMG-GAN, CTGAN


def test_global_mesh_and_distributed_helpers():
    from cvaegan_tpu.parallel import distributed

    assert not distributed.is_multi_host()
    mesh = distributed.global_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="does not divide"):
        distributed.global_mesh(n_model=3)


def test_balanced_batch_sampler_distribution():
    from cvaegan_tpu.data.sampler import ClassIndex, sample_balanced_batch

    labels = np.asarray([0] * 100 + [1] * 5 + [2] * 2)
    samples = jnp.asarray(labels, jnp.float32)[:, None] * 1.0
    idx = ClassIndex.build(labels, 3)
    x, y = sample_balanced_batch(jax.random.PRNGKey(0), idx, samples, 3000)
    y = np.asarray(y)
    # labels are uniform over classes regardless of class frequency
    frac = np.bincount(y, minlength=3) / 3000
    assert (np.abs(frac - 1 / 3) < 0.05).all()
    # each row actually belongs to its label's class
    np.testing.assert_array_equal(np.asarray(x)[:, 0].astype(int), y)
