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
):
    """Run the full script pipeline; returns a result dict with the
    trained model, classifier, and metrics."""
    settings = settings or config_lib.settings
    seed = settings.seed if seed is None else seed
    out_dir = Path(out_dir) if out_dir else Path.cwd()
    out_dir.mkdir(parents=True, exist_ok=True)
    t_start = time.time()

    ds = dataset.renormalized()
    label_num = ds.label_num
    print(f"train set: {ds.tr_samples.shape}, classes: {label_num}, "
          f"counts: {ds.class_counts().tolist()}")

    try:
        model = algorithm_cls(seed=seed, settings=settings,
                              balanced_mode=balanced_mode)
    except (TypeError, ValueError):
        if balanced_mode:
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
        for c in range(label_num):
            need = max_count - int(counts[c])
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
    return p


def apply_cli(args) -> TabularDataset:
    """Apply CLI overrides to the global settings and load the dataset."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    settings = config_lib.settings
    settings.seed = args.seed
    if args.test_mode:
        config_lib.turn_on_test_mode()
    if args.epochs is not None:
        settings.gan.epochs = args.epochs
    if args.clf_epochs is not None:
        settings.classifier.epochs = args.clf_epochs
    return load_dataset(args.dataset, seed=args.seed)
