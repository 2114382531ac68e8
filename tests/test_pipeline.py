"""Pipeline-level tests: the class-rebalancing script template, pickle
artifact, and CLI plumbing (reference scripts' behavior, SURVEY.md §2.3)."""

import pickle

import numpy as np


def test_balance_pipeline_cvae_gan(blob_dataset, fast_settings, tmp_path):
    from cvaegan_tpu import CVAEGAN
    from cvaegan_tpu.pipelines.balance import run_balance_pipeline

    result = run_balance_pipeline(
        CVAEGAN, "CVAE_GAN", blob_dataset, out_dir=tmp_path,
        generation_mode="qualified", plot=False,
    )
    assert set(result["multiclass_metrics"]) == {"Precision", "Recall", "F1"}
    assert set(result["binary_metrics"]) == {"Precision", "Recall", "F1"}
    assert result["pickle_path"].exists()
    with open(result["pickle_path"], "rb") as f:
        tr_x, tr_y, te_x, te_y = pickle.load(f)
    assert tr_x.shape[1] == 30
    assert len(tr_x) == len(tr_y)
    assert len(te_x) == 100


def test_balance_pipeline_warm_start_knob(blob_dataset, fast_settings,
                                          tmp_path):
    """warm_start=False trains a FRESH downstream classifier instead of
    reusing the model's companion (the measured fix for the SNGAN floor,
    BASELINE.md round-2 note); default stays reference parity."""
    from cvaegan_tpu import CVAEGAN
    from cvaegan_tpu.pipelines.balance import run_balance_pipeline

    result = run_balance_pipeline(
        CVAEGAN, "CVAE_GAN", blob_dataset, out_dir=tmp_path, plot=False,
        warm_start=False,
    )
    assert set(result["multiclass_metrics"]) == {"Precision", "Recall", "F1"}
    clf_params = result["classifier"].params
    model_params = result["model"].state["classifier"].params
    import jax

    # fresh classifier: structure may match, values must differ from the
    # companion (they were trained on different objectives/data)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max())
        if a.shape == b.shape else 1.0, clf_params, model_params))
    assert max(diffs) > 1e-4


def test_balance_pipeline_vae_gan_unconditional(blob_dataset, fast_settings,
                                                tmp_path):
    from cvaegan_tpu import VAEGAN
    from cvaegan_tpu.pipelines.balance import run_balance_pipeline

    result = run_balance_pipeline(
        VAEGAN, "VAE_GAN", blob_dataset, out_dir=tmp_path,
        generation_mode="unconditional", plot=False,
    )
    aug = result["augmented"]
    # VAE-GAN doubles the train set with random labels
    assert len(aug.tr_samples) == 2 * len(blob_dataset.tr_samples)


def test_load_dataset_fixtures():
    from cvaegan_tpu.pipelines.balance import load_dataset

    ds = load_dataset("blobs", seed=0)
    assert ds.feature_num == 30
    ds2 = load_dataset("imbalanced", seed=0)
    assert ds2.label_num == 5


def test_cli_parsing():
    from cvaegan_tpu.pipelines.balance import make_cli

    args = make_cli("x").parse_args(
        ["--dataset", "blobs", "--epochs", "7", "--seed", "3", "--test-mode"])
    assert args.epochs == 7 and args.seed == 3 and args.test_mode


def test_streamed_pipeline_end_to_end(fast_settings, tmp_path):
    """One command reproduces the out-of-core path (VERDICT r2 item 7):
    minmax stream -> trainer fit_streamed -> warm-started
    Classifier.fit_streamed -> test_streamed, on a tiny csv-dir corpus."""
    from cvaegan_tpu import CVAEGAN
    from cvaegan_tpu.pipelines.balance import run_streamed_pipeline

    rng = np.random.default_rng(0)
    n, f, classes = 360, 6, 3
    y = np.arange(n) % classes
    x = rng.normal(loc=y[:, None], scale=0.3, size=(n, f)).astype(np.float32)
    np.savetxt(tmp_path / "x_train.csv", x, delimiter=",", fmt="%.6g")
    np.savetxt(tmp_path / "y_train.csv", np.eye(classes)[y], delimiter=",",
               fmt="%d")
    np.savetxt(tmp_path / "x_test.csv", x[:90], delimiter=",", fmt="%.6g")
    np.savetxt(tmp_path / "y_test.csv", np.eye(classes)[y[:90]],
               delimiter=",", fmt="%d")

    result = run_streamed_pipeline(
        CVAEGAN, "CVAE_GAN", tmp_path, window_rows=128,
        gan_epochs_per_window=2, clf_epochs_per_window=2,
        balanced_mode=True)
    assert result["gan_windows"] == 3  # 128 + 128 + ragged 104
    assert result["clf_windows"] == 3
    assert set(result["multiclass_metrics"]) == {"Precision", "Recall", "F1"}
    assert result["binary_metrics"]["F1"] > 0.3  # well-separated classes


def test_cli_streamed_flags():
    from cvaegan_tpu.pipelines.balance import make_cli

    args = make_cli("x").parse_args(
        ["--streamed", "--window-rows", "256", "--epochs-per-window", "5"])
    assert args.streamed and args.window_rows == 256
    assert args.epochs_per_window == 5 and args.clf_epochs_per_window == 25
    assert not make_cli("x").parse_args([]).streamed
