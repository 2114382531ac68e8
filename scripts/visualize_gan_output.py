#!/usr/bin/env python
"""Visualize generated vs real samples with a t-SNE scatter.

The reference's `scripts/visualize_gan_output.py` was an image-grid
viewer incompatible with its own tabular data (vestigial, SURVEY.md
§2.3); this replacement renders the visualization its tests actually use
(`tests/test_cvae_gan.py:15-48`): train a model briefly, embed real +
generated samples with t-SNE, and save a scatter jpg.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from cvaegan_tpu import CVAEGAN
from cvaegan_tpu.core import config as config_lib
from cvaegan_tpu.pipelines.balance import apply_cli, make_cli


def main():
    args = make_cli(__doc__).parse_args()
    dataset = apply_cli(args)
    model = CVAEGAN(seed=args.seed)
    model.fit(dataset)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns
    from sklearn.manifold import TSNE

    xs, hues = [dataset.tr_samples], [dataset.tr_labels.astype(float)]
    for c in range(dataset.label_num):
        g = model.generate_samples(c, (dataset.tr_labels == c).sum())
        xs.append(g)
        hues.append(np.full(len(g), c + 0.1))
    embedded = TSNE(n_components=2).fit_transform(
        np.concatenate(xs, axis=0))
    plt.figure(figsize=(10, 8))
    sns.scatterplot(x=embedded[:, 0], y=embedded[:, 1],
                    hue=np.concatenate(hues), palette="deep", s=12)
    out = config_lib.settings.paths.gan_outs / "cvae_gan_tsne.jpg"
    plt.savefig(out)
    plt.close()
    print(f"t-SNE scatter saved to {out}")


if __name__ == "__main__":
    main()
