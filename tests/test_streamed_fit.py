"""Out-of-core (beyond-memory) training: `fit_streamed` windows a CSV
corpus through the device with persistent state and one compiled
program across equal-shape windows."""

import numpy as np
import pytest


def _write_corpus(tmp_path, rows=600, features=8, classes=3, seed=0):
    """Interleaved class layout so every window holds every class."""
    tmp_path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    y = np.arange(rows) % classes
    x = rng.normal(loc=y[:, None] * 0.5, scale=0.2,
                   size=(rows, features)).astype(np.float32)
    x = (x - x.min()) / (x.max() - x.min() + 1e-9)
    x_csv, y_csv = tmp_path / "x.csv", tmp_path / "y.csv"
    np.savetxt(x_csv, x, delimiter=",", fmt="%.6g")
    onehot = np.eye(classes, dtype=np.float32)[y]
    np.savetxt(y_csv, onehot, delimiter=",", fmt="%d")
    return x_csv, y_csv


def test_fit_streamed_multiwindow(tmp_path, fast_settings):
    from cvaegan_tpu import CVAEGAN

    x_csv, y_csv = _write_corpus(tmp_path)
    m = CVAEGAN(seed=0, balanced_mode=True)
    m.verbose = False
    windows = m.fit_streamed(x_csv, y_csv, window_rows=256,
                             epochs_per_window=2)
    assert windows == 3  # 256 + 256 + ragged 88
    # state persisted across windows: history spans all windows
    for k in m.loss_keys:
        assert len(m.loss_history[k]) == windows * 2
        assert np.isfinite(m.loss_history[k]).all()
    # the trained model serves the normal generation APIs
    out = m.generate_samples(1, 16)
    assert out.shape == (16, 8)


def test_fit_streamed_integer_labels(tmp_path, fast_settings):
    from cvaegan_tpu import CGAN

    x_csv, y_csv = _write_corpus(tmp_path, rows=300, classes=3)
    # rewrite y as a single integer column
    y = np.loadtxt(y_csv, delimiter=",").argmax(axis=1)
    np.savetxt(y_csv, y[:, None], delimiter=",", fmt="%d")
    m = CGAN(seed=0)
    m.verbose = False
    assert m.fit_streamed(x_csv, y_csv, window_rows=150,
                          epochs_per_window=1) == 2
    assert m.label_num == 3


@pytest.mark.parametrize("balanced", [False, True])
def test_fit_streamed_missing_class_windows(tmp_path, balanced,
                                            fast_settings):
    """Time-ordered corpora legitimately have windows without rare
    classes (VERDICT r2 item 6): every 100-row window of this
    class-sorted corpus holds exactly ONE of the 3 classes; training
    must complete with absent-class rounds skipped, in both modes."""
    from cvaegan_tpu import CVAEGAN

    x_csv = tmp_path / "x.csv"
    y_csv = tmp_path / "y.csv"
    y = np.repeat([0, 1, 2], 100)
    x = np.random.default_rng(0).random((300, 4)).astype(np.float32)
    np.savetxt(x_csv, x, delimiter=",", fmt="%.6g")
    np.savetxt(y_csv, np.eye(3)[y], delimiter=",", fmt="%d")
    m = CVAEGAN(seed=0, balanced_mode=balanced)
    m.verbose = False
    windows = m.fit_streamed(x_csv, y_csv, window_rows=100,
                             epochs_per_window=2)
    assert windows == 3
    for k in m.loss_keys:
        assert np.isfinite(m.loss_history[k]).all()
    assert m.generate_samples(2, 8).shape == (8, 4)


def test_guard_masks_absent_class_round(fast_settings):
    """The per-class guard must make an absent class's round an exact
    state no-op (strict mode): run one guarded round for a class with
    zero rows and verify every state leaf is bitwise unchanged."""
    import jax
    import jax.numpy as jnp

    from cvaegan_tpu import CVAEGAN
    from cvaegan_tpu.data.sampler import ClassIndex
    from cvaegan_tpu.data.tabular import TabularDataset

    ds = TabularDataset.synthetic_blobs(n_samples=120, n_features=6,
                                        centers=3, seed=0)
    fast_settings.gan.batch_size = 16
    m = CVAEGAN(seed=0, settings=fast_settings)
    m._prepare(ds)
    # rebuild the index as if class 1 had no rows in this window
    labels = np.asarray(ds.tr_labels).copy()
    labels[labels == 1] = 0
    data = {**m._data, "index": ClassIndex.build(labels, m.label_num)}

    def one_round(state, class_id):
        def class_body(carry, cid):
            s, key = carry
            key, kd = jax.random.split(key)
            s, loss = m._d_step(s, data, cid, kd)
            return (s, key), {"d": loss}

        guarded = m._guard_class_round(class_body, data)
        (state, _), _ = guarded((state, jax.random.PRNGKey(3)), class_id)
        return state

    fn = jax.jit(one_round)
    absent = jax.device_get(fn(m.state, jnp.int32(1)))
    for a, b in zip(jax.tree.leaves(absent),
                    jax.tree.leaves(jax.device_get(m.state))):
        np.testing.assert_array_equal(a, b)
    # sanity: a PRESENT class's round does change the state
    present = jax.device_get(fn(m.state, jnp.int32(0)))
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(present), jax.tree.leaves(m.state)))
    assert changed


def test_present_labels_remap():
    """Uniform label draws remap to present classes only — and are the
    bitwise identity when every class is present."""
    import jax

    from cvaegan_tpu.data.sampler import ClassIndex, present_labels

    key = jax.random.PRNGKey(0)
    n = 6000
    all_present = ClassIndex.build(np.arange(400) % 4, 4)
    raw = jax.random.randint(key, (n,), 0, 4)
    np.testing.assert_array_equal(
        present_labels(key, (n,), all_present), raw)
    # classes 1 and 3 absent (divisible present count)
    sparse = ClassIndex.build(np.asarray([0, 0, 2, 2, 2]), 4)
    got = np.asarray(present_labels(key, (n,), sparse))
    assert set(got) == {0, 2}
    frac = np.bincount(got, minlength=4) / len(got)
    assert abs(frac[0] - 0.5) < 0.03 and abs(frac[2] - 0.5) < 0.03
    # 3 of 4 classes present: a `% n_present` fold of a [0, 4) draw would
    # give the first present class 1/2 and the others 1/4 each (modulo
    # bias, ADVICE r3); the dynamic-maxval draw must be uniform at 1/3.
    three = ClassIndex.build(np.asarray([0, 0, 1, 1, 3, 3]), 4)
    got3 = np.asarray(present_labels(key, (n,), three))
    assert set(got3) == {0, 1, 3}
    frac3 = np.bincount(got3, minlength=4) / len(got3)
    for c in (0, 1, 3):
        assert abs(frac3[c] - 1 / 3) < 0.03, frac3


def test_fit_streamed_feature_mismatch_raises(tmp_path, fast_settings):
    from cvaegan_tpu import CVAEGAN

    x_csv, y_csv = _write_corpus(tmp_path, rows=200, features=6)
    m = CVAEGAN(seed=0)
    m.verbose = False
    m.fit_streamed(x_csv, y_csv, window_rows=200, epochs_per_window=1)
    x2, y2 = _write_corpus(tmp_path / "other", rows=200, features=5)
    with pytest.raises(ValueError, match="features"):
        m.fit_streamed(x2, y2, window_rows=200, epochs_per_window=1)


def test_fit_streamed_xy_length_mismatch_raises(tmp_path, fast_settings):
    """A y file shorter than x by a whole window must error, not silently
    truncate the corpus (zip would drop the tail)."""
    from cvaegan_tpu import CVAEGAN

    x_csv, y_csv = _write_corpus(tmp_path, rows=300, classes=3)
    y = np.loadtxt(y_csv, delimiter=",")
    np.savetxt(y_csv, y[:150], delimiter=",", fmt="%d")  # drop window 2
    m = CVAEGAN(seed=0)
    m.verbose = False
    with pytest.raises(ValueError, match="misaligned"):
        m.fit_streamed(x_csv, y_csv, window_rows=150, epochs_per_window=1)


def test_fit_streamed_late_class_id_raises(tmp_path, fast_settings):
    """Integer-label corpora where a class id appears only after the
    first window must fail loudly (label_num was inferred too small)."""
    from cvaegan_tpu import CGAN

    tmp_path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    # window 0: classes 0-2; window 1: classes 0-3 (3 is new)
    y = np.concatenate([np.arange(150) % 3, np.arange(150) % 4])
    x = rng.random((300, 5)).astype(np.float32)
    x_csv, y_csv = tmp_path / "x.csv", tmp_path / "y.csv"
    np.savetxt(x_csv, x, delimiter=",", fmt="%.6g")
    np.savetxt(y_csv, y[:, None], delimiter=",", fmt="%d")
    m = CGAN(seed=0)
    m.verbose = False
    with pytest.raises(ValueError, match="outside the model"):
        m.fit_streamed(x_csv, y_csv, window_rows=150, epochs_per_window=1)


def test_fit_streamed_unconditional_family(tmp_path, fast_settings):
    """The uniform-sampling (GAN) family trains through windows too."""
    from cvaegan_tpu import GAN

    x_csv, y_csv = _write_corpus(tmp_path, rows=300, classes=3)
    m = GAN(seed=0)
    m.verbose = False
    assert m.fit_streamed(x_csv, y_csv, window_rows=128,
                          epochs_per_window=1) == 3
    # unconditional API: generate_samples(num)
    assert m.generate_samples(8).shape == (8, 8)
