"""The class-rebalancing training pipeline shared by all train scripts.

Reference behaviour (`scripts/train_cvae_gan.py`, one shared template
across the 11 train_* scripts — verified by diff, SURVEY.md §2.3):
  1) seed; 2) concat train+test, minmax-scale, re-split; 3) re-seed,
  construct the model, fit; 4) plot losses; 5) per class generate
  `max_count - count` qualified samples and append to the train split;
  6) pickle the augmented arrays to `data_<model>.pkl`; 7) reuse the
  model's companion classifier as the downstream model and re-fit on the
  augmented data; 8) multiclass `test` + `binary_test` + ROC jpgs;
  9) wall-clock report; 10) per-class generated-sample mean/std stats.

Deviations mirrored from the reference scripts:
  * VAE-GAN (unconditional, no classifier) doubles the train set with
    RANDOM labels (`scripts/train_vae_gan.py:59-79`),
  * GAN/VAE filter their unconditional output per label via the aux
    classifier (same `generate_qualified_samples(label, n)` call),
  * TMG-GAN's filter takes no threshold argument.
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path
from typing import Optional

import numpy as np

from cvaegan_tpu.core import config as config_lib
from cvaegan_tpu.data.tabular import TabularDataset
from cvaegan_tpu.eval.classifier import Classifier


def load_dataset(name: str, seed: int = 0) -> TabularDataset:
    """Resolve a dataset spec: 'blobs', 'imbalanced', a named dataset
    directory under data/datasets, or an explicit path."""
    if name == "blobs":
        return TabularDataset.synthetic_blobs(seed=seed)
    if name == "imbalanced":
        return TabularDataset.imbalanced_classification(seed=seed)
    p = Path(name)
    if not p.exists():
        p = config_lib.settings.paths.datasets / name
    if not (p / "x_train.csv").exists():
        # The reference degrades to empty tensors with a hint about a prep
        # script it never shipped (`src/datasets/__init__.py:36-44`); we
        # fail fast and point at the tool that exists.
        raise FileNotFoundError(
            f"dataset {name!r}: {p}/x_train.csv not found. Prepare it with "
            "`python scripts/prepare_can_dataset.py --classes "
            "normal=<raw.csv> ...` (or use --dataset blobs / imbalanced)"
        )
    return TabularDataset.from_csv_dir(p)


def run_balance_pipeline(
    algorithm_cls,
    display_name: str,
    dataset: TabularDataset,
    out_dir: Optional[Path] = None,
    generation_mode: str = "qualified",
    settings: Optional[config_lib.Settings] = None,
    seed: Optional[int] = None,
    plot: bool = True,
    confidence_threshold: Optional[float] = None,
    balanced_mode: bool = False,
    warm_start: bool = True,
    model=None,
    ema_filter: bool = False,
):
    """Run the full script pipeline; returns a result dict with the
    trained model, classifier, and metrics.

    `model`: a pre-fitted trainer (e.g. one `SeedBank.fit` replica) —
    the pipeline then skips construction + `fit` and runs generation /
    augmentation / downstream evaluation against it. The caller must
    have fitted it on `dataset.renormalized()` (what this pipeline
    would train on)."""
    settings = settings or config_lib.settings
    seed = settings.seed if seed is None else seed
    out_dir = Path(out_dir) if out_dir else Path.cwd()
    out_dir.mkdir(parents=True, exist_ok=True)
    t_start = time.time()

    ds = dataset.renormalized()
    label_num = ds.label_num
    print(f"train set: {ds.tr_samples.shape}, classes: {label_num}, "
          f"counts: {ds.class_counts().tolist()}")

    if model is None:
        try:
            model = algorithm_cls(seed=seed, settings=settings,
                                  balanced_mode=balanced_mode,
                                  ema_filter=ema_filter)
        except (TypeError, ValueError):
            if balanced_mode or ema_filter:
                raise
            model = algorithm_cls(seed=seed, settings=settings)
        print(f"training {display_name} ...")
        model.fit(ds)
    if plot:
        model.plot_loss_history()

    # ---- class-rebalancing generation -------------------------------
    counts = ds.class_counts()
    aug = ds
    if generation_mode == "unconditional":
        # VAE-GAN: double the dataset with random labels.
        num = len(ds.tr_samples)
        generated = model.generate_samples(num)
        rng = np.random.default_rng(seed)
        labels = rng.integers(0, label_num, size=len(generated))
        aug = aug.append(generated, labels)
        print(f"generated {len(generated)} unconditional samples "
              f"(random labels)")
    else:
        max_count = int(counts.max())
        needs = {c: max_count - int(counts[c]) for c in range(label_num)}
        # Largest need first: generate_qualified_samples compiles ONE
        # while_loop program per capacity bucket and reuses it for any
        # smaller request, so descending order means a single compile
        # serves every class (VERDICT r3 item 3).
        for c in sorted(needs, key=needs.get, reverse=True):
            need = needs[c]
            if need <= 0:
                continue
            if generation_mode == "tmg":
                generated = model.generate_qualified_samples(c, need)
            else:
                generated = model.generate_qualified_samples(
                    c, need, confidence_threshold=confidence_threshold)
            if len(generated):
                aug = aug.append(generated,
                                 np.full(len(generated), c, np.int32))
            print(f"class {c}: needed {need}, generated {len(generated)}")

    print(f"augmented train set: {aug.tr_samples.shape}, "
          f"counts: {aug.class_counts().tolist()}")

    # ---- artifact: pickled augmented arrays -------------------------
    pkl_path = out_dir / f"data_{display_name.lower()}.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(
            (aug.tr_samples, aug.tr_labels, aug.te_samples, aug.te_labels), f
        )
    print(f"augmented dataset pickled to {pkl_path}")

    # ---- downstream classifier --------------------------------------
    clf = Classifier(display_name, seed=seed, settings=settings)
    if warm_start and getattr(model, "modules", {}).get("classifier") is not None:
        # Reference warm-start idiom (`scripts/train_cvae_gan.py:143-146`).
        # warm_start=False is the documented escape hatch for models whose
        # companion classifier architecture hurts downstream capacity
        # (measured: SNGAN's spectral-normed classifier scores BELOW the
        # fresh-classifier baseline).
        clf.warm_start_from(model)
    clf.fit(aug)

    clf.test(aug)
    print(clf.confusion_matrix)
    clf.print_metrics(4)
    multiclass_metrics = dict(clf.metrics)
    if plot:
        clf.plot_roc_curve(aug, is_binary=False)

    print("binary test ...")
    clf.binary_test(aug)
    print(clf.confusion_matrix)
    clf.print_metrics(4)
    binary_metrics = dict(clf.metrics)
    if plot:
        clf.plot_roc_curve(aug, is_binary=True)

    total = time.time() - t_start
    hours, rem = divmod(total, 3600)
    minutes, seconds = divmod(rem, 60)
    print(f"\ntotal time: {int(hours)}h {int(minutes)}m {seconds:.2f}s")

    # ---- per-class generated-sample statistics ----------------------
    gen_stats = {}
    if generation_mode != "unconditional":
        for c in range(label_num):
            if getattr(model, "conditional_sampling", True):
                g = model.generate_samples(c, 5)
            else:
                g = model.generate_samples(5)
            if len(g):
                gen_stats[c] = (float(np.mean(g)), float(np.std(g)))
                print(f"class {c} generated stats - mean: {gen_stats[c][0]:.6f}, "
                      f"std: {gen_stats[c][1]:.6f}")

    return {
        "model": model,
        "classifier": clf,
        "augmented": aug,
        "multiclass_metrics": multiclass_metrics,
        "binary_metrics": binary_metrics,
        "pickle_path": pkl_path,
        "gen_stats": gen_stats,
        "seconds": total,
    }


def run_streamed_pipeline(
    algorithm_cls,
    display_name: str,
    data_dir,
    window_rows: int = 1_000_000,
    gan_epochs_per_window: int = 125,
    clf_epochs_per_window: int = 25,
    settings: Optional[config_lib.Settings] = None,
    seed: Optional[int] = None,
    balanced_mode: bool = True,
    warm_start: bool = True,
):
    """Out-of-core flagship pipeline: every stage streams the corpus in
    O(window) host memory (the path proven at 4M/40M frames by
    `experiments/ooc_pipeline_4m.py`, BASELINE.md):

      1. one-pass global minmax statistics (`data.streaming.stream_minmax`)
      2. trainer `fit_streamed` over x/y_train.csv (fixed-size device
         windows, persistent state, one compiled program)
      3. warm-started downstream `Classifier.fit_streamed`
      4. `test_streamed` multiclass + binary over x/y_test.csv

    `data_dir` holds x_train/y_train/x_test/y_test.csv (the reference's
    CSV layout, `src/datasets/__init__.py:19-35`; build one with
    `scripts/prepare_can_dataset.py`). The in-memory pipeline's
    balance-generation/pickle stages are skipped — at beyond-memory
    scale the deliverable is the trained generator + streamed
    evaluation. Returns a dict of stage timings and metrics."""
    import time as _time

    from cvaegan_tpu.data.streaming import stream_minmax

    settings = settings or config_lib.settings
    seed = settings.seed if seed is None else seed
    root = Path(data_dir)
    for f in ("x_train.csv", "y_train.csv", "x_test.csv", "y_test.csv"):
        if not (root / f).exists():
            raise FileNotFoundError(
                f"streamed pipeline: {root / f} not found — need the "
                "x/y_{train,test}.csv corpus layout "
                "(scripts/prepare_can_dataset.py builds one)")

    rec = {"mode": "out-of-core", "window_rows": window_rows}
    t_all = _time.time()

    lo, hi = stream_minmax(root / "x_train.csv")
    scale = hi - lo
    scale[scale == 0] = 1.0
    rec["minmax_seconds"] = round(_time.time() - t_all, 1)

    def tf(chunk):
        return (chunk - lo) / scale

    try:
        model = algorithm_cls(seed=seed, settings=settings,
                              balanced_mode=balanced_mode)
    except (TypeError, ValueError):
        if balanced_mode:
            raise
        model = algorithm_cls(seed=seed, settings=settings)
    print(f"streamed training {display_name} "
          f"(window {window_rows} rows x {gan_epochs_per_window} epochs)...")
    t0 = _time.time()
    rec["gan_windows"] = model.fit_streamed(
        root / "x_train.csv", root / "y_train.csv",
        window_rows=window_rows, epochs_per_window=gan_epochs_per_window)
    rec["gan_fit_seconds"] = round(_time.time() - t0, 1)

    clf = Classifier(display_name, seed=seed, settings=settings)
    if warm_start and getattr(model, "modules", {}).get("classifier") is not None:
        clf.warm_start_from(model)
    t0 = _time.time()
    rec["clf_windows"] = clf.fit_streamed(
        root / "x_train.csv", root / "y_train.csv",
        window_rows=window_rows, epochs_per_window=clf_epochs_per_window,
        transform=tf)
    rec["clf_fit_seconds"] = round(_time.time() - t0, 1)

    t0 = _time.time()
    clf.test_streamed(root / "x_test.csv", root / "y_test.csv", transform=tf)
    print(clf.confusion_matrix)
    clf.print_metrics(4)
    multiclass_metrics = dict(clf.metrics)
    clf.test_streamed(root / "x_test.csv", root / "y_test.csv", transform=tf,
                      binary=True)
    print(clf.confusion_matrix)
    clf.print_metrics(4)
    binary_metrics = dict(clf.metrics)
    rec["test_seconds"] = round(_time.time() - t0, 1)
    rec["total_seconds"] = round(_time.time() - t_all, 1)
    print(f"\nstreamed pipeline total: {rec['total_seconds']}s")

    return {
        "model": model,
        "classifier": clf,
        "multiclass_metrics": multiclass_metrics,
        "binary_metrics": binary_metrics,
        **rec,
    }


def make_cli(description: str):
    """Shared argparse CLI for the train scripts — the reference has no
    flag system at all (dataset chosen by an in-file constant,
    `scripts/train_cvae_gan.py:14`); this is the promised upgrade."""
    import argparse

    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", default="blobs",
                   help="blobs | imbalanced | CAN_HCRL_OTIDS | path to a "
                        "csv dir with x/y_{train,test}.csv")
    p.add_argument("--epochs", type=int, default=None,
                   help="override GAN epochs (default 500)")
    p.add_argument("--clf-epochs", type=int, default=None,
                   help="override classifier epochs (default 100)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default=".")
    p.add_argument("--test-mode", action="store_true",
                   help="1-epoch smoke mode (reference turn_on_test_mode)")
    p.add_argument("--confidence-threshold", type=float, default=None,
                   help="qualified-sample filter threshold (default: the "
                        "model config's value, 0.5)")
    p.add_argument("--balanced-mode", action="store_true",
                   help="class-balanced mixed training rounds (beyond-"
                        "parity fast mode, conditional models only)")
    p.add_argument("--no-warm-start", action="store_true",
                   help="train a FRESH downstream classifier instead of "
                        "warm-starting from the GAN's companion (the "
                        "documented SNGAN fix, BASELINE.md)")
    p.add_argument("--ema-filter", action="store_true",
                   help="filter qualified samples with an EMA of the "
                        "companion classifier (threshold/patience "
                        "unchanged; measured NOT to fix strict-yield "
                        "instability — use --balanced-mode for that, "
                        "see BASELINE.md)")
    p.add_argument("--streamed", action="store_true",
                   help="out-of-core pipeline: stream the corpus through "
                        "fixed-size device windows (O(window) host "
                        "memory; --dataset must be a csv dir). Proven at "
                        "4M/40M frames — see BASELINE.md. Not combinable "
                        "with --ema-filter/--confidence-threshold/"
                        "--out-dir (the streamed pipeline warns and "
                        "ignores them)")
    p.add_argument("--window-rows", type=int, default=1_000_000,
                   help="rows per streamed device window")
    p.add_argument("--epochs-per-window", type=int, default=125,
                   help="trainer epochs per streamed window")
    p.add_argument("--clf-epochs-per-window", type=int, default=25,
                   help="downstream classifier epochs per streamed window")
    return p


def apply_cli_settings(args) -> None:
    """Apply CLI overrides to the global settings (no dataset load)."""
    # compile cache: the package root already configured the per-user
    # default (respecting CVAEGAN_TPU_CACHE_DIR / prior user setting);
    # nothing to set here (ADVICE r4: don't re-pin a world-shared path).
    settings = config_lib.settings
    settings.seed = args.seed
    if args.test_mode:
        config_lib.turn_on_test_mode()
    if args.epochs is not None:
        settings.gan.epochs = args.epochs
    if args.clf_epochs is not None:
        settings.classifier.epochs = args.clf_epochs


def apply_cli(args) -> TabularDataset:
    """Apply CLI overrides to the global settings and load the dataset."""
    apply_cli_settings(args)
    return load_dataset(args.dataset, seed=args.seed)


def run_from_cli(algorithm_cls, display_name: str, args,
                 generation_mode: str = "qualified"):
    """Dispatch a train script's parsed CLI to the in-memory balance
    pipeline or (--streamed) the out-of-core pipeline."""
    apply_cli_settings(args)
    if args.streamed:
        import warnings

        ignored = []
        if args.ema_filter:
            ignored.append("--ema-filter")
        if args.confidence_threshold is not None:
            ignored.append("--confidence-threshold")
        if args.out_dir not in (".", None):
            ignored.append("--out-dir")
        if generation_mode != "qualified":
            ignored.append(f"generation_mode={generation_mode!r}")
        if ignored:
            warnings.warn(
                "--streamed uses the out-of-core pipeline, which does not "
                "support: " + ", ".join(ignored) + " (ignored)",
                stacklevel=2)
        path = Path(args.dataset)
        if not path.exists():
            path = config_lib.settings.paths.datasets / args.dataset
        return run_streamed_pipeline(
            algorithm_cls, display_name, path,
            window_rows=args.window_rows,
            gan_epochs_per_window=args.epochs_per_window,
            clf_epochs_per_window=args.clf_epochs_per_window,
            seed=args.seed,
            balanced_mode=args.balanced_mode,
            warm_start=not args.no_warm_start,
        )
    dataset = load_dataset(args.dataset, seed=args.seed)
    return run_balance_pipeline(
        algorithm_cls, display_name, dataset,
        out_dir=args.out_dir,
        confidence_threshold=args.confidence_threshold,
        balanced_mode=args.balanced_mode,
        warm_start=not args.no_warm_start,
        generation_mode=generation_mode,
        ema_filter=args.ema_filter,
    )
