"""Visual smoke tests — t-SNE scatters of real vs generated samples.

Parity with the reference's eyeball-oracle tests (`tests/test_cvae_gan.py:
15-48` and 5 siblings): train on the blob fixture, generate per-class
samples labelled `class + 0.1` so they hue adjacently, t-SNE-embed, and
save a seaborn scatter to `tests/Visualization_results/<model>.jpg`.

Like the reference these are manual/visual checks; they run only when
CVAEGAN_VISUAL=1 (or via `python tests/test_visual.py`). A short epoch
budget keeps them smoke-speed; raise CVAEGAN_VISUAL_EPOCHS for
publication-quality scatters.
"""

import os
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

VISUAL = os.environ.get("CVAEGAN_VISUAL") == "1"
EPOCHS = int(os.environ.get("CVAEGAN_VISUAL_EPOCHS", "30"))
OUT_DIR = pathlib.Path(__file__).parent / "Visualization_results"

# The six models the reference ships visual tests for.
MODELS = ["cvae_gan", "ctgan", "sngan", "tmg_gan", "rain_gan", "qg_smote"]


def _make_artifact(model_name: str, epochs: int = None,
                   out_dir: pathlib.Path = None,
                   max_per_class: int = None) -> pathlib.Path:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns
    from sklearn.manifold import TSNE

    import cvaegan_tpu
    from cvaegan_tpu.core import config as config_lib
    from cvaegan_tpu.data.tabular import TabularDataset

    cls = {
        "cvae_gan": cvaegan_tpu.CVAEGAN,
        "ctgan": cvaegan_tpu.CTGAN,
        "sngan": cvaegan_tpu.SNGAN,
        "tmg_gan": cvaegan_tpu.TMGGAN,
        "rain_gan": cvaegan_tpu.RAIN_GAN,
        "qg_smote": cvaegan_tpu.QG_SMOTE,
    }[model_name]

    epochs = EPOCHS if epochs is None else epochs
    out_dir = OUT_DIR if out_dir is None else out_dir
    old_epochs = config_lib.settings.gan.epochs
    config_lib.settings.gan.epochs = epochs
    try:
        ds = TabularDataset.synthetic_blobs(seed=0)
        m = cls()
        m.verbose = False
        m.fit(ds)
        if max_per_class is None:
            real_x, real_y = ds.tr_samples, ds.tr_labels
        else:  # CI smoke mode: cap points so t-SNE stays fast
            keep = np.concatenate([
                np.flatnonzero(ds.tr_labels == c)[:max_per_class]
                for c in range(ds.label_num)])
            real_x, real_y = ds.tr_samples[keep], ds.tr_labels[keep]
        xs, hues = [real_x], [real_y.astype(float)]
        for c in range(ds.label_num):
            n = int((real_y == c).sum())
            g = m.generate_samples(c, n)
            xs.append(g)
            hues.append(np.full(len(g), c + 0.1))
        n_points = sum(len(x) for x in xs)
        embedded = TSNE(n_components=2,
                        perplexity=min(30.0, (n_points - 1) / 3)).fit_transform(
            np.concatenate(xs, axis=0).astype(np.float64))
        out_dir.mkdir(exist_ok=True, parents=True)
        plt.figure(figsize=(10, 8))
        sns.scatterplot(x=embedded[:, 0], y=embedded[:, 1],
                        hue=np.concatenate(hues), palette="deep", s=12)
        out = out_dir / f"{model_name}.jpg"
        plt.savefig(out)
        plt.close()
        return out
    finally:
        config_lib.settings.gan.epochs = old_epochs


@pytest.mark.skipif(not VISUAL, reason="visual artifacts: set CVAEGAN_VISUAL=1")
@pytest.mark.parametrize("model_name", MODELS)
def test_visual_artifact(model_name):
    out = _make_artifact(model_name)
    assert out.exists() and out.stat().st_size > 10_000


@pytest.mark.parametrize("model_name", MODELS)
def test_visual_smoke(model_name, tmp_path):
    """Always-on 2-epoch regression signal for the visual pipeline
    (VERDICT r1 Weak #7): every model's fit -> generate -> t-SNE -> jpg
    path must produce a non-empty artifact. Renders into a temp dir so
    the committed publication jpgs are never overwritten."""
    out = _make_artifact(model_name, epochs=2, out_dir=tmp_path,
                         max_per_class=25)
    assert out.exists() and out.stat().st_size > 10_000


if __name__ == "__main__":
    for name in MODELS:
        print(f"rendering {name} ...")
        print("  ->", _make_artifact(name))
