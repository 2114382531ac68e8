"""Export per-seed imbalanced fixtures as raw arrays so BOTH frameworks
(this repo and the torch reference) train on bit-identical data.

Mirrors `cvaegan_tpu.data.tabular.TabularDataset.imbalanced_classification`
(the reference's intended imbalance fixture, commented out at
`/root/reference/src/utils.py:57-65`) without importing jax, so it can run
while a TPU process holds the device tunnel.

Usage: python experiments/make_fixtures.py [--seeds 0 1 2 3 4] [--out DIR]
"""

import argparse
import pathlib

import numpy as np
from sklearn.datasets import make_classification
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import minmax_scale


def make_fixture(seed: int):
    samples, labels = make_classification(
        n_samples=1000,
        n_features=30,
        n_informative=28,
        n_redundant=0,
        n_classes=5,
        n_clusters_per_class=2,
        weights=[0.5, 0.3, 0.1, 0.05, 0.05],
        random_state=seed,
    )
    samples = minmax_scale(samples.astype(np.float32))
    tr_x, te_x, tr_y, te_y = train_test_split(
        samples, labels, test_size=0.1, random_state=seed, stratify=labels)
    return (tr_x.astype(np.float32), tr_y.astype(np.int64),
            te_x.astype(np.float32), te_y.astype(np.int64))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--out", default=str(pathlib.Path(__file__).parent
                                        / "fixtures"))
    args = p.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for s in args.seeds:
        tr_x, tr_y, te_x, te_y = make_fixture(s)
        path = out / f"imb_s{s}.npz"
        np.savez(path, tr_x=tr_x, tr_y=tr_y, te_x=te_x, te_y=te_y)
        counts = np.bincount(tr_y, minlength=5).tolist()
        print(f"{path}: train {tr_x.shape}, counts {counts}")


if __name__ == "__main__":
    main()
