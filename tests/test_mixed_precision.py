"""Mixed-precision compute policy (`settings.gan.compute_dtype`).

Contract under "bfloat16": every dense matmul and inter-layer activation
runs bf16, while parameters, Adam state, normalization statistics, and
loss reductions stay f32 (master-weights recipe — see the policy note on
`core.config.GanConfig.compute_dtype`). Under the default "float32" the
policy casts are no-ops. The TPU throughput/quality measurement lives in
`experiments/bank_scaling.py --dtype bfloat16` + BASELINE.md; these tests
pin the semantics the measurement relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvaegan_tpu
from cvaegan_tpu.core import config as config_lib


@pytest.fixture()
def bf16_policy(fast_settings):
    fast_settings.gan.compute_dtype = "bfloat16"
    yield fast_settings
    fast_settings.gan.compute_dtype = "float32"


def _leaf_dtypes(tree):
    return {jnp.dtype(x.dtype) for x in jax.tree.leaves(tree)
            if hasattr(x, "dtype")}


def test_dense_dtype_follows_policy(fast_settings):
    from cvaegan_tpu.models.layers import Dense

    x = jnp.ones((4, 8), jnp.float32)
    layer = Dense(16)
    params = layer.init(jax.random.PRNGKey(0), x)
    assert layer.apply(params, x).dtype == jnp.float32

    fast_settings.gan.compute_dtype = "bfloat16"
    try:
        # params were created f32 and STAY f32; only compute drops to bf16
        assert _leaf_dtypes(params) == {jnp.dtype(jnp.float32)}
        assert layer.apply(params, x).dtype == jnp.bfloat16
    finally:
        fast_settings.gan.compute_dtype = "float32"


def test_bf16_fit_keeps_f32_state_and_finite_losses(bf16_policy,
                                                    blob_dataset):
    m = cvaegan_tpu.CVAEGAN()
    m.verbose = False
    m.fit(blob_dataset)
    # Master weights: every param / Adam / batch-stats leaf is still f32
    # (spectral u/v too); nothing in the train state may silently be bf16.
    assert _leaf_dtypes(m.state) <= {jnp.dtype(jnp.float32), jnp.dtype(jnp.int32), jnp.dtype(jnp.uint32)}
    for k, vals in m.loss_history.items():
        assert np.isfinite(vals).all(), f"non-finite {k} under bf16"


def test_bf16_epoch0_losses_match_f32_scale(fast_settings, blob_dataset):
    """bf16 is reduced precision, not different math: epoch-0 losses on
    the blob fixture must land within a few percent of the f32 run's."""
    def epoch0(dtype):
        fast_settings.gan.compute_dtype = dtype
        try:
            m = cvaegan_tpu.CVAEGAN()
            m.verbose = False
            m.fit(blob_dataset)
            return {k: v[0] for k, v in m.loss_history.items()}
        finally:
            fast_settings.gan.compute_dtype = "float32"

    ref = epoch0("float32")
    got = epoch0("bfloat16")
    for k in ref:
        assert abs(got[k] - ref[k]) <= max(0.05, 0.08 * abs(ref[k])), (
            f"epoch-0 {k}: bf16 {got[k]:.4f} vs f32 {ref[k]:.4f}")


def test_bf16_generation_api_returns_f32(bf16_policy, blob_dataset):
    m = cvaegan_tpu.CVAEGAN()
    m.verbose = False
    m.fit(blob_dataset)
    out = m.generate_samples(0, 16)
    assert out.dtype == np.float32 and out.shape == (16, blob_dataset.feature_num)
    assert np.isfinite(out).all()
    q = m.generate_qualified_samples(0, 8, confidence_threshold=0.0)
    assert q.dtype == np.float32
    assert np.isfinite(q).all()


def test_bf16_seed_bank(bf16_policy, blob_dataset):
    """The measurement regime: a vmapped bank under the bf16 policy."""
    from cvaegan_tpu.algorithms.seed_bank import SeedBank

    bank = SeedBank(cvaegan_tpu.CVAEGAN, seeds=range(2))
    for t in bank.trainers:
        t.verbose = False
    bank.fit(blob_dataset)
    for t in bank.trainers:
        assert _leaf_dtypes(t.state) <= {jnp.dtype(jnp.float32), jnp.dtype(jnp.int32), jnp.dtype(jnp.uint32)}
        for k, vals in t.loss_history.items():
            assert np.isfinite(vals).all()


def test_downstream_classifier_pinned_f32(bf16_policy, blob_dataset):
    """The evaluation instrument must not move with the policy: under
    bf16 the downstream Classifier still trains/evaluates f32
    (models.layers.dtype_override in eval/classifier.py)."""
    from cvaegan_tpu import Classifier

    clf = Classifier("bf16_pin_test")
    clf.fit(blob_dataset)
    logits = clf.predict(blob_dataset.te_samples[:32], use_prob=True)
    assert logits.dtype == np.float32
    assert _leaf_dtypes(clf.params) == {jnp.dtype(jnp.float32)}
    clf.test(blob_dataset)
    assert clf.metrics["F1"] > 0.9  # blobs are separable — f32 training


@pytest.mark.parametrize("model_name", [
    "CVAE", "VAEGAN", "GAN", "CGAN", "SNGAN", "CTGAN", "TMGGAN",
    "QG_SMOTE", "RAIN_GAN",
])
def test_bf16_zoo_smoke(bf16_policy, blob_dataset, model_name):
    """Every family trains finite under the policy (the layer blocks are
    shared, but inline loss math differs per algorithm)."""
    cls = getattr(cvaegan_tpu, model_name)
    m = cls()
    m.verbose = False
    m.fit(blob_dataset)
    for k, vals in m.loss_history.items():
        assert np.isfinite(vals).all(), f"{model_name} non-finite {k}"


def test_policy_flip_retraces_cached_programs(fast_settings, blob_dataset):
    """ADVICE r4: the policy is read at trace time, so trainer-held jit
    caches must be NAMESPACED by policy — flipping
    `settings.gan.compute_dtype` mid-process on a live trainer re-traces
    instead of silently reusing old-precision executables."""
    from cvaegan_tpu.models.layers import compute_dtype, dtype_override

    m = cvaegan_tpu.CVAEGAN()
    m.verbose = False
    m.fit(blob_dataset)  # traced under f32
    f32_runner = m._chunk_runner()
    m.generate_samples(0, 8)
    assert set(m._gen_caches) == {"float32"}

    fast_settings.gan.compute_dtype = "bfloat16"
    try:
        assert str(compute_dtype()) == "bfloat16"
        # generation: new namespace, fresh closure; old one retained
        m.generate_samples(0, 8)
        assert set(m._gen_caches) == {"float32", "bfloat16"}
        assert (m._gen_caches["float32"]["gen"]
                is not m._gen_caches["bfloat16"]["gen"])
        # fit runner: re-traced under the new policy
        assert m._chunk_runner() is not f32_runner
        # flip back: the f32 closures are reused as-is
        fast_settings.gan.compute_dtype = "float32"
        assert m._gen_cache["gen"] is m._gen_caches["float32"]["gen"]
        # dtype_override wins over the global setting for cache routing
        with dtype_override("bfloat16"):
            assert m._gen_cache is m._gen_caches["bfloat16"]
    finally:
        fast_settings.gan.compute_dtype = "float32"

    # state-changing paths drop EVERY namespace
    m.fit(blob_dataset)
    assert set(m._gen_caches) <= {"float32"}  # only fit's own traces
