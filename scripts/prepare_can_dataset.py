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
    """Generic CAN-like synthetic frames (the original smoke generator;
    kept for --synthetic-generic): each class drives distinct ID ranges
    and byte patterns."""
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


# ---------------------------------------------------------------------------
# Schema-faithful Car-Hacking stand-in
# ---------------------------------------------------------------------------
# Published figures from the HCRL Car-Hacking dataset description
# (Seo/Song/Kim 2018, the corpus the reference's loader names,
# `/root/reference/src/datasets/__init__.py:9`): per-capture frame totals,
# injected-frame counts, injected IDs, and injection intervals. The real
# captures are unobtainable in this offline environment; this generator
# reproduces the published SCHEMA (timestamp-ordered 11-bit CAN ID + DLC +
# 8 data bytes), the published CLASS PROPORTIONS, and the published
# TIME-CLUSTERED burst structure (attacks injected in 3-5 s bursts into
# otherwise-normal periodic bus traffic) so scale/streaming experiments
# exercise the same data shape the reference was built around.
CAR_HACKING_PUBLISHED = {
    # capture: (total frames, injected frames)
    "dos": {"total": 3_665_771, "injected": 587_521,
            "inject_id": 0x000, "interval_ms": 0.3},
    "fuzzy": {"total": 3_838_860, "injected": 491_847,
              "inject_id": None, "interval_ms": 0.5},   # random ID
    "gear": {"total": 4_443_142, "injected": 597_252,
             "inject_id": 0x43F, "interval_ms": 1.0},
    "rpm": {"total": 4_621_702, "injected": 654_897,
            "inject_id": 0x316, "interval_ms": 1.0},
    "attack_free_total": 988_987,
}
# Class order used throughout the framework's CAN pipelines.
CAR_HACKING_CLASSES = ("normal", "dos", "fuzzy", "gear", "rpm")


def car_hacking_proportions():
    """Published per-class frame proportions over the merged corpus."""
    pub = CAR_HACKING_PUBLISHED
    total = sum(pub[k]["total"] for k in ("dos", "fuzzy", "gear", "rpm"))
    total += pub["attack_free_total"]
    props = {k: pub[k]["injected"] / total
             for k in ("dos", "fuzzy", "gear", "rpm")}
    props["normal"] = 1.0 - sum(props.values())
    return props  # normal 0.8672, dos 0.0335, fuzzy 0.0280, gear 0.0340, rpm 0.0373


def synthetic_car_hacking(n_frames=100_000, seed=0, bus_rate_hz=2000.0):
    """Schema/proportion-faithful Car-Hacking stand-in.

    Returns (x [n,10] float32, y [n] int64, meta dict). x rows are
    TIME-ORDERED frames (can_id, dlc, d0..d7) exactly as
    `load_class_file` extracts from the real captures; y is the per-frame
    class (0=normal, then the CAR_HACKING_CLASSES order).

    Faithful structure:
      * normal traffic: 26 periodic IDs (the real normal capture carries
        ~26 unique arbitration IDs) with per-ID cycle times, mostly-static
        payloads, a rolling counter byte and one noisy signal byte;
      * attack bursts of 3-5 s injected into the normal stream at the
        published per-attack injection interval (DoS 0.3 ms floods ID
        0x000/zero payload; fuzzy 0.5 ms random ID+payload; gear/RPM
        spoofs 1 ms at fixed IDs 0x43F/0x316 with plausible payloads) —
        normal periodic traffic CONTINUES through each burst;
      * burst counts sized so final class proportions match the published
        corpus-wide proportions (meta reports the achieved mix).
    """
    rng = np.random.default_rng(seed)
    props = car_hacking_proportions()
    dt_normal = 1.0 / bus_rate_hz

    # Normal bus model: 26 periodic IDs, plausible 11-bit values.
    n_ids = 26
    id_pool = np.sort(rng.choice(np.arange(0x080, 0x700), n_ids,
                                 replace=False)).astype(np.int64)
    id_dlc = rng.choice([2, 4, 5, 6, 7, 8], n_ids,
                        p=[.05, .1, .1, .1, .15, .5])
    base_payload = rng.integers(0, 256, (n_ids, 8))
    counter_byte = rng.integers(0, 8, n_ids)    # rolling-counter position
    signal_byte = rng.integers(0, 8, n_ids)     # noisy-signal position
    # relative frequency of each periodic ID (some IDs are much chattier)
    id_weight = rng.dirichlet(np.ones(n_ids) * 2.0)

    def normal_frames(n):
        idx = rng.choice(n_ids, n, p=id_weight)
        counters = rng.integers(0, 256, n)  # free-running per-frame
        data = base_payload[idx].copy()
        data[np.arange(n), counter_byte[idx]] = counters % 256
        data[np.arange(n), signal_byte[idx]] = np.clip(
            rng.normal(128, 25, n), 0, 255).astype(np.int64)
        dlc = id_dlc[idx]
        mask = np.arange(8)[None, :] < dlc[:, None]
        data = np.where(mask, data, 0)
        return np.column_stack([id_pool[idx], dlc, data])

    def attack_frames(kind, n):
        spec = CAR_HACKING_PUBLISHED[kind]
        if kind == "dos":
            ids = np.zeros(n, np.int64)
            data = np.zeros((n, 8), np.int64)
        elif kind == "fuzzy":
            ids = rng.integers(0, 0x800, n)
            data = rng.integers(0, 256, (n, 8))
        elif kind == "gear":
            ids = np.full(n, spec["inject_id"], np.int64)
            data = np.tile(rng.integers(0, 256, 8), (n, 1))
            data[:, 3] = rng.integers(0, 6, n) * 32  # spoofed gear value
        else:  # rpm
            ids = np.full(n, spec["inject_id"], np.int64)
            data = np.tile(rng.integers(0, 256, 8), (n, 1))
            rpmv = rng.integers(0x3000, 0x4000, n)   # spoofed high RPM
            data[:, 2] = rpmv >> 8
            data[:, 3] = rpmv & 0xFF
        return np.column_stack([ids, np.full(n, 8, np.int64), data])

    # Burst plan: per attack, enough 3-5 s bursts at its injection rate
    # to reach the published proportion of n_frames.
    segments = []  # (kind, n_attack_frames) or ("normal", n)
    for ci, kind in enumerate(("dos", "fuzzy", "gear", "rpm")):
        need = int(round(props[kind] * n_frames))
        rate = 1000.0 / CAR_HACKING_PUBLISHED[kind]["interval_ms"]
        bursts = []
        while need > 0:
            dur = rng.uniform(3.0, 5.0)
            k = min(need, int(dur * rate))
            bursts.append((kind, k))
            need -= k
        segments.extend(bursts)
    rng.shuffle(segments)

    # Interleave: during each burst, normal periodic traffic CONTINUES at
    # the bus rate alongside the injected frames. That background traffic
    # is part of the normal-frame budget, so the normal gaps between
    # bursts get what remains — total frame count and class proportions
    # come out exact (no tail trim that could swallow a burst).
    n_attack = sum(k for _, k in segments)
    bg_sizes = [
        int(k * CAR_HACKING_PUBLISHED[kind]["interval_ms"] / 1000.0
            / dt_normal)
        for kind, k in segments
    ]
    n_gaps_total = n_frames - n_attack - sum(bg_sizes)
    if n_gaps_total < len(segments) + 1:
        raise ValueError(
            f"n_frames={n_frames} too small for the burst plan "
            f"({n_attack} attack + {sum(bg_sizes)} in-burst background "
            "frames); use more frames")
    gap_sizes = rng.multinomial(
        n_gaps_total - len(segments) - 1,
        np.ones(len(segments) + 1) / (len(segments) + 1)) + 1

    xs, ys = [], []
    label_of = {k: i for i, k in enumerate(CAR_HACKING_CLASSES)}
    for i, (kind, k) in enumerate(segments):
        g = int(gap_sizes[i])
        xs.append(normal_frames(g))
        ys.append(np.zeros(g, np.int64))
        n_bg = bg_sizes[i]
        bx = np.concatenate([attack_frames(kind, k), normal_frames(n_bg)])
        by = np.concatenate([np.full(k, label_of[kind], np.int64),
                             np.zeros(n_bg, np.int64)])
        order = rng.permutation(len(bx))
        xs.append(bx[order])
        ys.append(by[order])
    g = int(gap_sizes[-1])
    xs.append(normal_frames(g))
    ys.append(np.zeros(g, np.int64))

    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys)
    achieved = {k: float((y == i).mean())
                for i, k in enumerate(CAR_HACKING_CLASSES)}
    meta = {
        "schema": ["can_id", "dlc"] + [f"d{i}" for i in range(8)],
        "classes": list(CAR_HACKING_CLASSES),
        "published_proportions": {k: round(v, 4)
                                  for k, v in props.items()},
        "achieved_proportions": {k: round(v, 4)
                                 for k, v in achieved.items()},
        "n_frames": int(len(y)),
        "n_bursts": len(segments),
        "burst_seconds": [3.0, 5.0],
        "seed": seed,
    }
    return x, y, meta


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
                   help="write the schema/proportion-faithful Car-Hacking "
                        "stand-in (time-ordered stream + split + data card)")
    p.add_argument("--synthetic-generic", action="store_true",
                   help="the original generic CAN-like smoke generator")
    p.add_argument("--frames", type=int, default=100_000,
                   help="total frames for --synthetic (default 100k)")
    p.add_argument("--no-stream-csv", action="store_true",
                   help="skip writing the time-ordered x/y_stream.csv pair")
    args = p.parse_args()

    from cvaegan_tpu.core.config import settings

    out = args.out or (settings.paths.datasets / "CAN_HCRL_OTIDS")

    if args.synthetic_generic:
        x, y = synthetic_can(seed=args.seed)
        write_split(out, x, y, int(y.max()) + 1, args.test_size, args.seed)
        return
    if args.synthetic:
        import json

        x, y, meta = synthetic_car_hacking(args.frames, seed=args.seed)
        out = pathlib.Path(out)
        out.mkdir(parents=True, exist_ok=True)
        if not args.no_stream_csv:
            # time-ordered stream for fit_streamed / burst experiments
            np.savetxt(out / "x_stream.csv", x, delimiter=",", fmt="%.6g")
            np.savetxt(out / "y_stream.csv",
                       np.eye(len(meta["classes"]), dtype=np.float32)[y],
                       delimiter=",", fmt="%d")
        write_split(out, x, y, len(meta["classes"]), args.test_size,
                    args.seed)
        pub = {k: CAR_HACKING_PUBLISHED[k]
               for k in ("dos", "fuzzy", "gear", "rpm")}
        card = [
            "# Data card — synthetic Car-Hacking stand-in",
            "",
            "Schema-faithful, offline stand-in for the HCRL Car-Hacking",
            "corpus (the dataset the reference's loader names; the real",
            "captures are not obtainable in this environment).",
            "",
            f"* Frames: {meta['n_frames']:,} (time-ordered; "
            f"{meta['n_bursts']} attack bursts of "
            f"{meta['burst_seconds'][0]:.0f}-"
            f"{meta['burst_seconds'][1]:.0f} s)",
            f"* Schema: {', '.join(meta['schema'])} (the layout "
            "`load_class_file` extracts from the real captures)",
            "* Classes and frame proportions (published = corpus-wide "
            "share from the published per-capture totals):",
            "",
            "| class | published | achieved |",
            "|---|---|---|",
        ]
        for k in meta["classes"]:
            card.append(f"| {k} | {meta['published_proportions'][k]:.4f} "
                        f"| {meta['achieved_proportions'][k]:.4f} |")
        card += [
            "",
            "Published injection parameters reproduced: " + "; ".join(
                f"{k}: every {v['interval_ms']} ms"
                + (f" at ID 0x{v['inject_id']:03X}"
                   if v["inject_id"] is not None else " (random ID)")
                for k, v in pub.items()),
            "",
            f"Generator: `scripts/prepare_can_dataset.py --synthetic "
            f"--frames {args.frames} --seed {args.seed}`",
        ]
        (out / "DATA_CARD.md").write_text("\n".join(card) + "\n")
        (out / "data_card.json").write_text(json.dumps(meta, indent=2))
        print(f"data card -> {out / 'DATA_CARD.md'}")
        print(json.dumps(meta["achieved_proportions"]))
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
