#!/usr/bin/env python
"""Prepare a CAN intrusion-detection dataset into the framework's
x/y_{train,test}.csv layout.

The reference's loader error message tells users to run a
`sample_can_hcrl_otids.py` script that is NOT present in its repo
(`src/datasets/__init__.py:39-40`) — this is that missing tool. It
converts raw CAN-log CSVs in the public HCRL format (Car-Hacking /
OTIDS: `timestamp, can_id(hex), dlc, d0..d7(hex), label`) into:

    <out>/x_train.csv  headerless float features
    <out>/y_train.csv  headerless one-hot labels
    <out>/x_test.csv
    <out>/y_test.csv

Features per frame: CAN ID (int from hex, scaled), DLC, and the 8 data
bytes (missing bytes -> 0). Labels: one class per input file (pass
`--classes normal=Normal_run.csv dos=DoS_attack.csv ...`) or a label
column index with `--label-col`. Per-class subsampling caps keep the
dataset tractable (`--per-class-cap`).

With --synthetic, writes a self-contained synthetic CAN-like dataset
(for smoke-testing the pipeline without the real corpus).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def parse_hex(series):
    import pandas as pd

    def one(v):
        try:
            return int(str(v).strip(), 16)
        except (ValueError, TypeError):
            return 0

    return series.map(one).astype(np.int64)


def load_class_file(path, max_rows=None):
    """Raw HCRL CSV -> [n, 10] float features (id, dlc, d0..d7)."""
    import pandas as pd

    df = pd.read_csv(path, header=None, low_memory=False)
    if max_rows:
        df = df.iloc[:max_rows]
    can_id = parse_hex(df.iloc[:, 1]).astype(np.float32)
    dlc = pd.to_numeric(df.iloc[:, 2], errors="coerce").fillna(0).astype(np.float32)
    bytes_ = []
    for col in range(3, 11):
        if col < df.shape[1]:
            bytes_.append(parse_hex(df.iloc[:, col]).astype(np.float32))
        else:
            bytes_.append(np.zeros(len(df), np.float32))
    return np.stack([can_id, dlc, *bytes_], axis=1)


def synthetic_can(n_per_class=2000, n_classes=5, seed=0):
    """CAN-like synthetic frames: each class drives distinct ID ranges
    and byte patterns (DoS floods a low ID, fuzzing randomises, etc.)."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for c in range(n_classes):
        ids = rng.integers(0x100 * (c + 1), 0x100 * (c + 1) + 0x80,
                           n_per_class).astype(np.float32)
        dlc = np.full(n_per_class, 8.0, np.float32)
        data = rng.integers(0, 256, (n_per_class, 8)).astype(np.float32)
        data[:, c % 8] = c * 40.0  # class-correlated byte
        xs.append(np.concatenate([ids[:, None], dlc[:, None], data], axis=1))
        ys.append(np.full(n_per_class, c, np.int64))
    return np.concatenate(xs), np.concatenate(ys)


def write_split(out_dir, x, y, n_classes, test_size, seed):
    from sklearn.model_selection import train_test_split

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    onehot = np.eye(n_classes, dtype=np.float32)[y]
    tr_x, te_x, tr_y, te_y = train_test_split(
        x, onehot, test_size=test_size, random_state=seed, stratify=y)
    np.savetxt(out_dir / "x_train.csv", tr_x, delimiter=",", fmt="%.6g")
    np.savetxt(out_dir / "y_train.csv", tr_y, delimiter=",", fmt="%d")
    np.savetxt(out_dir / "x_test.csv", te_x, delimiter=",", fmt="%.6g")
    np.savetxt(out_dir / "y_test.csv", te_y, delimiter=",", fmt="%d")
    print(f"wrote {out_dir}: train {tr_x.shape}, test {te_x.shape}, "
          f"classes {n_classes}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None,
                   help="output dir (default data/datasets/CAN_HCRL_OTIDS)")
    p.add_argument("--classes", nargs="*", default=[],
                   metavar="NAME=FILE",
                   help="class-name=raw-csv pairs, label order = argument order")
    p.add_argument("--per-class-cap", type=int, default=50000)
    p.add_argument("--test-size", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="write a synthetic CAN-like dataset instead")
    args = p.parse_args()

    from cvaegan_tpu.core.config import settings

    out = args.out or (settings.paths.datasets / "CAN_HCRL_OTIDS")

    if args.synthetic:
        x, y = synthetic_can(seed=args.seed)
        write_split(out, x, y, int(y.max()) + 1, args.test_size, args.seed)
        return
    if not args.classes:
        p.error("provide --classes name=file pairs or --synthetic")
    xs, ys = [], []
    for label, spec in enumerate(args.classes):
        name, _, path = spec.partition("=")
        feats = load_class_file(path or name, max_rows=args.per_class_cap)
        xs.append(feats)
        ys.append(np.full(len(feats), label, np.int64))
        print(f"class {label} ({name}): {len(feats)} frames")
    write_split(out, np.concatenate(xs), np.concatenate(ys),
                len(args.classes), args.test_size, args.seed)


if __name__ == "__main__":
    main()
