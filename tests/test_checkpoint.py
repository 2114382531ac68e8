"""Checkpoint/resume tests: save mid-training, restore into a fresh
trainer, verify bit-identical generation and that fit() resumes."""

import numpy as np
import pytest


def test_checkpoint_roundtrip(blob_dataset, fast_settings, tmp_path):
    import jax

    from cvaegan_tpu import CVAEGAN
    from cvaegan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    m = CVAEGAN()
    m.fit(blob_dataset)
    ck = save_checkpoint(m, tmp_path / "ck")

    m2 = CVAEGAN()
    restore_checkpoint(m2, ck, blob_dataset)

    # Bit-identical parameters...
    for net in m.state:
        a = jax.tree.leaves(m.state[net].params)
        b = jax.tree.leaves(m2.state[net].params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ...identical RNG counter -> identical generation stream.
    s1 = m.generate_samples(0, 8)
    s2 = m2.generate_samples(0, 8)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    # ...and the restored trainer keeps training.
    m2.fit(blob_dataset)
    assert len(m2.loss_history["recon_loss"]) == 4


def test_checkpoint_shape_mismatch(blob_dataset, fast_settings, tmp_path):
    from cvaegan_tpu import VAE
    from cvaegan_tpu.data.tabular import TabularDataset
    from cvaegan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    m = VAE()
    m.fit(blob_dataset)
    ck = save_checkpoint(m, tmp_path / "ck")
    other = TabularDataset.synthetic_blobs(n_features=7, seed=0)
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_checkpoint(VAE(), ck, other)


def test_throughput_counter():
    import time

    from cvaegan_tpu.utils.profiling import Throughput

    t = Throughput(steps_per_epoch=65, batch_size=128)
    t.start()
    time.sleep(0.05)
    rep = t.report(epochs=10)
    assert rep["steps"] == 650
    assert rep["steps_per_sec"] > 0
    assert rep["samples_per_sec"] > 0


def test_nan_debug_raises():
    import jax
    import jax.numpy as jnp

    from cvaegan_tpu.utils.profiling import nan_debug

    with nan_debug():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


def test_auto_checkpoint_during_fit(blob_dataset, fast_settings, tmp_path):
    from cvaegan_tpu import VAE
    from cvaegan_tpu.utils.checkpoint import restore_checkpoint

    m = VAE()
    m.epoch_chunk = 1  # checkpoint after every epoch chunk
    m.checkpoint_dir = tmp_path / "auto"
    m.fit(blob_dataset)
    assert (tmp_path / "auto" / "meta.json").exists()

    m2 = VAE()
    restore_checkpoint(m2, tmp_path / "auto", blob_dataset)
    assert len(m2.loss_history["recon_loss"]) == 2
    s = m2.generate_samples(4)
    assert s.shape == (4, 30)


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    from cvaegan_tpu.utils.profiling import trace

    with trace(str(tmp_path / "tr")):
        jax.jit(lambda x: x * 2)(jnp.ones((128, 128))).block_until_ready()
    files = list((tmp_path / "tr").rglob("*"))
    assert files, "profiler trace produced no files"


def test_tmg_checkpoint_roundtrip(blob_dataset, fast_settings, tmp_path):
    """The stacked generator bank (vmapped params + per-slice opt state)
    must checkpoint/restore bit-identically."""
    from cvaegan_tpu import TMGGAN
    from cvaegan_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    t = TMGGAN()
    t.fit(blob_dataset)
    save_checkpoint(t, tmp_path / "tmg")
    t2 = TMGGAN()
    restore_checkpoint(t2, tmp_path / "tmg", blob_dataset)
    a = t.generate_samples(1, 4)
    b = t2.generate_samples(1, 4)
    np.testing.assert_array_equal(a, b)
