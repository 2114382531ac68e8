"""Data pipeline tests: CSV ingestion semantics, fixtures, transforms,
and the on-device class-conditional sampler."""

import numpy as np
import jax
import jax.numpy as jnp

from cvaegan_tpu.data.sampler import ClassIndex, sample_class_batch, sample_random_batch
from cvaegan_tpu.data.tabular import TabularDataset, load_csv, minmax_scale


def test_load_csv_coercion(tmp_path):
    # Reference semantics (`src/datasets/__init__.py:11-17`): headerless,
    # non-numeric -> NaN -> 0.
    p = tmp_path / "x.csv"
    p.write_text("1.5,abc,3\n,2,x\n")
    arr = load_csv(p)
    np.testing.assert_allclose(arr, [[1.5, 0, 3], [0, 2, 0]])
    assert arr.dtype == np.float32


def test_from_csv_dir_onehot_argmax(tmp_path):
    (tmp_path / "x_train.csv").write_text("1,2\n3,4\n5,6\n")
    (tmp_path / "y_train.csv").write_text("1,0\n0,1\n0,1\n")
    (tmp_path / "x_test.csv").write_text("7,8\n")
    (tmp_path / "y_test.csv").write_text("1,0\n")
    ds = TabularDataset.from_csv_dir(tmp_path)
    assert ds.tr_labels.tolist() == [0, 1, 1]
    assert ds.te_labels.tolist() == [0]
    assert ds.feature_num == 2 and ds.label_num == 2


def test_blobs_fixture_shapes(blob_dataset):
    ds = blob_dataset
    assert ds.tr_samples.shape == (900, 30)
    assert ds.te_samples.shape == (100, 30)
    assert ds.label_num == 5
    assert ds.tr_samples.min() >= 0.0 and ds.tr_samples.max() <= 1.0


def test_imbalanced_fixture_weights(imbalanced_dataset):
    counts = imbalanced_dataset.class_counts()
    assert counts[0] > counts[-1]  # class 0 is the majority


def test_minmax_constant_column():
    x = np.asarray([[1.0, 5.0], [1.0, 10.0]], np.float32)
    out = minmax_scale(x)
    np.testing.assert_allclose(out[:, 0], 0.0)
    np.testing.assert_allclose(out[:, 1], [0.0, 1.0])


def test_renormalized_preserves_split(blob_dataset):
    ds2 = blob_dataset.renormalized()
    assert ds2.tr_samples.shape == blob_dataset.tr_samples.shape
    assert ds2.tr_samples.min() >= 0.0 and ds2.tr_samples.max() <= 1.0


def test_binary_and_append(blob_dataset):
    b = blob_dataset.to_binary()
    assert set(np.unique(b.tr_labels)) <= {0, 1}
    aug = blob_dataset.append(np.zeros((7, 30), np.float32), np.ones(7, np.int32))
    assert len(aug.tr_samples) == len(blob_dataset.tr_samples) + 7
    # append is pure: original untouched
    assert len(blob_dataset.tr_samples) == 900


def test_class_index_sampling():
    labels = np.asarray([0, 0, 1, 2, 2, 2, 2])
    samples = jnp.arange(7, dtype=jnp.float32)[:, None] * 10.0
    idx = ClassIndex.build(labels, 3)
    assert idx.counts.tolist() == [2, 1, 4]
    key = jax.random.PRNGKey(0)
    batch = sample_class_batch(key, idx, samples, jnp.int32(2), 64)
    vals = set(np.asarray(batch)[:, 0].tolist())
    assert vals <= {30.0, 40.0, 50.0, 60.0}  # only class-2 rows
    batch0 = sample_class_batch(key, idx, samples, jnp.int32(1), 8)
    assert set(np.asarray(batch0)[:, 0].tolist()) == {20.0}


def test_class_index_traced_class_id():
    """One compiled sampler must serve every class (class_id traced)."""
    labels = np.asarray([0, 1, 1])
    samples = jnp.asarray([[0.0], [1.0], [2.0]])
    idx = ClassIndex.build(labels, 2)

    @jax.jit
    def draw(key, cid):
        return sample_class_batch(key, idx, samples, cid, 16)

    a = np.asarray(draw(jax.random.PRNGKey(1), jnp.int32(0)))
    b = np.asarray(draw(jax.random.PRNGKey(1), jnp.int32(1)))
    assert set(a[:, 0]) == {0.0}
    assert set(b[:, 0]) <= {1.0, 2.0}


def test_random_batch():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(10, dtype=jnp.float32)[:, None]
    y = jnp.arange(10, dtype=jnp.int32)
    bx, by = sample_random_batch(key, x, y, 32)
    assert bx.shape == (32, 1) and by.shape == (32,)
    np.testing.assert_allclose(np.asarray(bx)[:, 0], np.asarray(by))


def test_native_csv_matches_pandas(tmp_path):
    """The C++ parser must agree cell-for-cell with the pandas loader on
    garbage-laden input (including literal nan/inf and trailing junk)."""
    import pytest

    from cvaegan_tpu.data import native_csv

    if not native_csv.available():
        pytest.skip("no native toolchain")
    p = tmp_path / "x.csv"
    p.write_text("1.5,abc,3\n,2,x\n-4.25e2,nan,7\n1e,inf,12abc\n0.5, 2 ,\r\n")
    import pandas as pd

    a = native_csv.load_csv_native(p)
    df = pd.read_csv(p, header=None, low_memory=False)
    for col in df.columns:
        df[col] = pd.to_numeric(df[col], errors="coerce")
    b = np.asarray(df.fillna(0).values, np.float32)
    np.testing.assert_array_equal(a, b)
