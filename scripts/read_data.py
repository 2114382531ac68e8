#!/usr/bin/env python
"""Inspect a pickled augmented dataset produced by the train scripts
(reference `scripts/read_data.py:4-8`)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse
import pickle
from collections import Counter


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", nargs="?", default="data_cvae_gan.pkl")
    args = p.parse_args()
    with open(args.path, "rb") as f:
        tr_x, tr_y, te_x, te_y = pickle.load(f)
    print(f"train: {tr_x.shape}, test: {te_x.shape}")
    print("train label set:", sorted(set(tr_y.tolist())))
    print("train label counts:", Counter(tr_y.tolist()))


if __name__ == "__main__":
    main()
