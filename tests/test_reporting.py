"""Reporting-surface tests: loss plots, ROC jpgs, metric printing,
logger switches — the reference's observability outputs (SURVEY.md §5)."""

import numpy as np
import pytest


def test_plot_loss_history_writes_files(blob_dataset, fast_settings, tmp_path):
    from cvaegan_tpu import VAE
    from cvaegan_tpu.core.config import Paths

    fast_settings.paths = Paths(root=tmp_path)
    m = VAE()
    m.fit(blob_dataset)
    m.plot_loss_history()
    outs = list((tmp_path / "gan_outs").glob("vae_*.jpg"))
    assert len(outs) == 2  # per-loss grid + combined


def test_roc_curves_written(blob_dataset, fast_settings, tmp_path):
    from cvaegan_tpu import Classifier
    from cvaegan_tpu.core.config import Paths

    fast_settings.paths = Paths(root=tmp_path)
    clf = Classifier("roc")
    clf.fit(blob_dataset)
    out = clf.plot_roc_curve(blob_dataset, is_binary=False)
    assert out.exists()
    out2 = clf.plot_roc_curve(blob_dataset, is_binary=True)
    assert out2.exists() and out != out2


def test_print_metrics_runs(blob_dataset, fast_settings, capsys):
    from cvaegan_tpu import Classifier

    clf = Classifier("pm")
    clf.fit(blob_dataset)
    clf.test(blob_dataset)
    clf.print_metrics(3)
    out = capsys.readouterr().out
    assert "Overall metrics" in out and "macro avg" in out


def test_logger_switches(tmp_path, fast_settings):
    from cvaegan_tpu.core.config import Paths
    from cvaegan_tpu.utils.logger import Logger

    import cvaegan_tpu.core.config as config_lib

    config_lib.settings.paths = Paths(root=tmp_path)
    log = Logger("switchtest")
    log.info("hello")
    log.turn_off()
    log.info("silenced")
    log.turn_on()
    log.info("back")
    text = (tmp_path / "logs" / "switchtest.log").read_text()
    assert "hello" in text and "back" in text and "silenced" not in text


def test_missing_dataset_error_is_helpful():
    from cvaegan_tpu.pipelines.balance import load_dataset

    with pytest.raises(FileNotFoundError, match="prepare_can_dataset"):
        load_dataset("NOPE_DOES_NOT_EXIST")


def test_predict_chunking_matches_single_dispatch(blob_dataset, fast_settings):
    """Chunked large-batch inference (padded fixed-shape dispatches) must
    produce exactly the same logits as one dispatch."""
    import numpy as np

    from cvaegan_tpu import Classifier

    clf = Classifier("chunktest")
    clf.fit(blob_dataset)
    x = np.asarray(blob_dataset.tr_samples, np.float32)  # 900 rows
    whole = clf.predict(x, use_prob=True)
    old = Classifier.PREDICT_CHUNK
    try:
        clf.PREDICT_CHUNK = 256  # force 4 chunks incl. a padded tail
        chunked = clf.predict(x, use_prob=True)
    finally:
        clf.PREDICT_CHUNK = old
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-6)


def test_fit_chunking_matches_single_dispatch(blob_dataset, fast_settings):
    """Epoch-chunked fit (bounded-duration dispatches, the CAN-scale
    watchdog fix) must produce exactly the same trained weights as one
    monolithic scan: epoch keys are pre-split once and sliced."""
    import numpy as np

    from cvaegan_tpu import Classifier

    fast_settings.classifier.epochs = 4
    x = np.asarray(blob_dataset.te_samples, np.float32)
    old = Classifier.FIT_STEPS_PER_DISPATCH
    try:
        Classifier.FIT_STEPS_PER_DISPATCH = 10 ** 9  # one dispatch
        whole = Classifier("fitwhole")
        whole.fit(blob_dataset)
        Classifier.FIT_STEPS_PER_DISPATCH = 15  # 1 epoch (15 batches) each
        chunked = Classifier("fitchunk")
        chunked.fit(blob_dataset)
    finally:
        Classifier.FIT_STEPS_PER_DISPATCH = old
    np.testing.assert_allclose(
        chunked.predict(x, use_prob=True), whole.predict(x, use_prob=True),
        rtol=1e-6, atol=1e-6)
