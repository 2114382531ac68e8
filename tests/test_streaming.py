"""Streaming-ingestion subsystem: native chunk reader parity, one-pass
statistics, device feed, and streaming inference."""

import numpy as np
import pytest


def _write_csv(path, array):
    with open(path, "w") as f:
        for row in array:
            f.write(",".join(f"{v:.6g}" for v in row) + "\n")


@pytest.fixture()
def csv_file(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1000, 7)).astype(np.float32)
    p = tmp_path / "x.csv"
    _write_csv(p, data)
    return p, data


def test_chunks_concatenate_to_whole_file(csv_file):
    from cvaegan_tpu.data.streaming import StreamingCSV

    path, data = csv_file
    chunks = list(StreamingCSV(path, chunk_rows=128))
    assert len(chunks) == 8  # 7 full + ragged 104-row tail
    assert [len(c) for c in chunks[:-1]] == [128] * 7
    got = np.concatenate(chunks, axis=0)
    np.testing.assert_allclose(got, data, rtol=1e-5, atol=1e-6)


def test_streaming_matches_whole_file_loader(csv_file):
    """Same cell semantics as data.tabular.load_csv (native or pandas)."""
    from cvaegan_tpu.data.streaming import StreamingCSV
    from cvaegan_tpu.data.tabular import load_csv

    path, _ = csv_file
    got = np.concatenate(list(StreamingCSV(path, chunk_rows=100)), axis=0)
    np.testing.assert_allclose(got, load_csv(path), rtol=1e-6, atol=1e-7)


def test_garbage_cells_coerce_to_zero(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("1.5,abc,3\nnan,2.5,\n7,8,9")  # no trailing newline
    from cvaegan_tpu.data.streaming import StreamingCSV

    got = np.concatenate(list(StreamingCSV(p, chunk_rows=2)), axis=0)
    np.testing.assert_allclose(
        got, [[1.5, 0, 3], [0, 2.5, 0], [7, 8, 9]])


def test_chunk_exactly_divides_rows(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(6, 2)
    p = tmp_path / "even.csv"
    _write_csv(p, data)
    from cvaegan_tpu.data.streaming import StreamingCSV

    chunks = list(StreamingCSV(p, chunk_rows=3))
    assert [len(c) for c in chunks] == [3, 3]
    np.testing.assert_allclose(np.concatenate(chunks), data)


def test_early_close_releases_stream(csv_file):
    from cvaegan_tpu.data.streaming import StreamingCSV

    path, _ = csv_file
    with StreamingCSV(path, chunk_rows=64) as stream:
        it = iter(stream)
        next(it)  # consume one chunk, then abandon mid-stream
    # closing twice is a no-op
    stream.close()


def test_stream_minmax_matches_numpy(csv_file):
    from cvaegan_tpu.data.streaming import stream_minmax

    path, data = csv_file
    lo, hi = stream_minmax(path, chunk_rows=77)
    np.testing.assert_allclose(lo, data.min(axis=0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hi, data.max(axis=0), rtol=1e-5, atol=1e-6)


def test_load_csv_streamed_device_array(csv_file):
    import jax.numpy as jnp

    from cvaegan_tpu.data.streaming import load_csv_streamed

    path, data = csv_file
    arr = load_csv_streamed(path, chunk_rows=300)
    assert isinstance(arr, jnp.ndarray)
    np.testing.assert_allclose(np.asarray(arr), data, rtol=1e-5, atol=1e-6)


def test_prefetch_to_device_preserves_order(csv_file):
    from cvaegan_tpu.data.streaming import StreamingCSV, prefetch_to_device

    path, data = csv_file
    chunks = list(prefetch_to_device(StreamingCSV(path, chunk_rows=256),
                                     size=2))
    got = np.concatenate([np.asarray(c) for c in chunks], axis=0)
    np.testing.assert_allclose(got, data, rtol=1e-5, atol=1e-6)


def test_predict_stream_matches_predict(blob_dataset, fast_settings):
    from cvaegan_tpu import Classifier

    clf = Classifier("stream")
    clf.fit(blob_dataset)
    x = np.asarray(blob_dataset.te_samples, np.float32)
    whole = clf.predict(x, use_prob=True)
    chunked = clf.predict_stream(
        (x[i:i + 32] for i in range(0, len(x), 32)), use_prob=True)
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-6)


def test_test_streamed_matches_in_memory(blob_dataset, fast_settings,
                                         tmp_path):
    """Streaming evaluation over a CSV pair reproduces test()/
    binary_test() metrics exactly."""
    from cvaegan_tpu import Classifier

    clf = Classifier("teststream")
    clf.fit(blob_dataset)
    clf.test(blob_dataset)
    want = dict(clf.metrics)
    x = np.asarray(blob_dataset.te_samples, np.float32)
    y = np.asarray(blob_dataset.te_labels)
    _write_csv(tmp_path / "xt.csv", x)
    np.savetxt(tmp_path / "yt.csv", y[:, None], delimiter=",", fmt="%d")
    clf.test_streamed(tmp_path / "xt.csv", tmp_path / "yt.csv",
                      chunk_rows=32)
    assert clf.metrics == pytest.approx(want)
    clf.binary_test(blob_dataset)
    want_bin = dict(clf.metrics)
    clf.test_streamed(tmp_path / "xt.csv", tmp_path / "yt.csv",
                      chunk_rows=32, binary=True)
    assert clf.metrics == pytest.approx(want_bin)


def test_classifier_fit_streamed(blob_dataset, fast_settings, tmp_path):
    """Out-of-core downstream training: windows share one compiled
    program (ragged tail zero-weight-padded), state persists, and the
    result separates the blob classes."""
    from cvaegan_tpu import Classifier

    x = np.asarray(blob_dataset.tr_samples, np.float32)
    y = np.asarray(blob_dataset.tr_labels)
    _write_csv(tmp_path / "x.csv", x)
    np.savetxt(tmp_path / "y.csv", y[:, None], delimiter=",", fmt="%d")
    clf = Classifier("oocclf")
    windows = clf.fit_streamed(tmp_path / "x.csv", tmp_path / "y.csv",
                               window_rows=400, epochs_per_window=4)
    assert windows == 3  # 400 + 400 + ragged 100
    clf.test(blob_dataset)
    assert clf.metrics["F1"] > 0.95  # blobs are separable
    # the shape-keyed runner compiled ONCE for all three windows
    assert len(clf._fit_fn_cache) == 1


def test_classifier_fit_streamed_mismatch_raises(tmp_path, fast_settings):
    from cvaegan_tpu import Classifier

    x = np.random.default_rng(0).random((100, 4)).astype(np.float32)
    _write_csv(tmp_path / "x.csv", x)
    np.savetxt(tmp_path / "y.csv", np.zeros((50, 1)), delimiter=",",
               fmt="%d")
    with pytest.raises(ValueError, match="misaligned"):
        Classifier("oocbad").fit_streamed(tmp_path / "x.csv",
                                          tmp_path / "y.csv",
                                          window_rows=50,
                                          epochs_per_window=1)


def test_streaming_pandas_fallback_parity(csv_file, monkeypatch):
    """The pandas chunk fallback must match the native reader."""
    from cvaegan_tpu.data import streaming

    path, data = csv_file
    native = np.concatenate(list(streaming.StreamingCSV(path, 100)), axis=0)
    monkeypatch.setattr(streaming, "_get_lib", lambda: None)
    fallback = np.concatenate(list(streaming.StreamingCSV(path, 100)), axis=0)
    np.testing.assert_allclose(fallback, native, rtol=1e-6, atol=1e-7)


def test_ragged_rows_parity_both_backends(tmp_path, monkeypatch):
    """Long rows truncate to the first line's schema, short rows
    zero-pad — identically on native and pandas backends."""
    from cvaegan_tpu.data import streaming

    p = tmp_path / "ragged.csv"
    p.write_text("1,2\n3,4,5\n6\n")
    expect = [[1, 2], [3, 4], [6, 0]]
    native = np.concatenate(list(streaming.StreamingCSV(p, 2)), axis=0)
    np.testing.assert_allclose(native, expect)
    monkeypatch.setattr(streaming, "_get_lib", lambda: None)
    fallback = np.concatenate(list(streaming.StreamingCSV(p, 2)), axis=0)
    np.testing.assert_allclose(fallback, expect)


def test_blank_leading_line_skipped(tmp_path):
    from cvaegan_tpu.data.streaming import StreamingCSV

    p = tmp_path / "lead.csv"
    p.write_text("\n1,2,3\n4,5,6\n")
    got = np.concatenate(list(StreamingCSV(p, 10)), axis=0)
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])


def test_empty_csv_raises_value_error(tmp_path):
    from cvaegan_tpu.data.streaming import StreamingCSV

    p = tmp_path / "empty.csv"
    p.write_text("")
    with pytest.raises(ValueError, match="empty csv"):
        list(StreamingCSV(p, 10))
    with pytest.raises(FileNotFoundError):
        list(StreamingCSV(tmp_path / "nope.csv", 10))


def test_two_iterators_are_independent(csv_file):
    """Each iter() owns its native stream: interleaving two iterators of
    one StreamingCSV must not cross-close or corrupt either."""
    from cvaegan_tpu.data.streaming import StreamingCSV

    path, data = csv_file
    s = StreamingCSV(path, chunk_rows=256)
    it1, it2 = iter(s), iter(s)
    a1, b1 = next(it1), next(it2)
    np.testing.assert_allclose(a1, b1)
    rest1 = [a1] + list(it1)
    rest2 = [b1] + list(it2)
    np.testing.assert_allclose(np.concatenate(rest1), data, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.concatenate(rest2), data, rtol=1e-5,
                               atol=1e-6)
