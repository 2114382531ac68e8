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


def test_fit_streamed_missing_class_raises(tmp_path, fast_settings):
    from cvaegan_tpu import CVAEGAN

    x_csv = tmp_path / "x.csv"
    y_csv = tmp_path / "y.csv"
    # class-sorted corpus: the first 100-row window only holds class 0
    y = np.repeat([0, 1, 2], 100)
    x = np.random.default_rng(0).random((300, 4)).astype(np.float32)
    np.savetxt(x_csv, x, delimiter=",", fmt="%.6g")
    np.savetxt(y_csv, np.eye(3)[y], delimiter=",", fmt="%d")
    m = CVAEGAN(seed=0)
    m.verbose = False
    with pytest.raises(ValueError, match="missing classes"):
        m.fit_streamed(x_csv, y_csv, window_rows=100, epochs_per_window=1)


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
