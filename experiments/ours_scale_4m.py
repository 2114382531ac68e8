"""Full-pipeline run at REAL Car-Hacking magnitude (4M frames).

The real Car-Hacking captures hold ~3.7-4.4M CAN frames per attack file
(`/root/reference/src/datasets/__init__.py:19-35` targets that corpus;
the raw captures are not obtainable in this offline image). This script
scales the synthetic CAN-format stand-in to 4,000,000 frames with a
realistic imbalance (normal-heavy, rare attacks), then measures every
pipeline stage on 1 TPU chip:

  1. corpus emit + native-C++ CSV ingestion (4M x 10 features)
  2. on-device class-index build
  3. CVAE-GAN fit, 500 epochs (balanced mode)
  4. qualified generation up to class balance (capped per class)
  5. downstream classifier (100 epochs over ~56k batches/epoch)
  6. macro-F1 / binary-F1 on the held-out split

The torch reference is NOT run at this scale: its measured 200k-frame
end-to-end is 1526.6 s with the downstream classifier stage alone at
1186 s for 160k train rows (experiments/ref_scale.py, BASELINE.md). The
classifier stage is linear in rows, so 3.6M train rows extrapolate to
~7.4 h for that stage alone — recorded as an extrapolation, not a
measurement.

Usage (serialize with other TPU processes):
  python experiments/ours_scale_4m.py [--frames 4000000] \
      [--out experiments/results/ours_scale_4m.json]
"""

import argparse
import json
import pathlib
import time

import numpy as np

HERE = pathlib.Path(__file__).parent


def emit_corpus(root: pathlib.Path, frames: int, seed: int = 0):
    """CAN-format corpus at Car-Hacking-like imbalance.

    Class mix (of `frames`): normal .75, DoS .10, fuzzy .075, gear .05,
    RPM .025 — the normal-dominant regime of the real captures.
    """
    import sys

    sys.path.insert(0, str(HERE.parent))
    from scripts.prepare_can_dataset import write_split

    rng = np.random.default_rng(seed)
    fractions = [0.75, 0.10, 0.075, 0.05, 0.025]
    xs, ys = [], []
    for c, frac in enumerate(fractions):
        n = int(frames * frac)
        ids = rng.integers(0x100 * (c + 1), 0x100 * (c + 1) + 0x80,
                           n).astype(np.float32)
        dlc = np.full(n, 8.0, np.float32)
        data = rng.integers(0, 256, (n, 8)).astype(np.float32)
        data[:, c % 8] = c * 40.0
        xs.append(np.concatenate([ids[:, None], dlc[:, None], data], axis=1))
        ys.append(np.full(n, c, np.int64))
    x, y = np.concatenate(xs), np.concatenate(ys)
    write_split(root, x, y, 5, test_size=0.1, seed=seed)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4_000_000)
    p.add_argument("--data", default="/tmp/can_4m")
    p.add_argument("--out", default=str(HERE / "results"
                                        / "ours_scale_4m.json"))
    p.add_argument("--gen-per-class", type=int, default=1000,
                   help="qualified samples requested per minority class")
    p.add_argument("--seed", type=int, default=0,
                   help="model/pipeline seed (corpus stays seed-0, like a "
                        "fixed real capture); with --append, one JSON line "
                        "is appended per run for multi-seed stats")
    p.add_argument("--append", action="store_true",
                   help="append a JSON line to --out instead of overwriting")
    p.add_argument("--faithful", action="store_true",
                   help="emit the schema-faithful Car-Hacking stand-in "
                        "(published proportions + burst structure, "
                        "scripts/prepare_can_dataset.synthetic_car_hacking) "
                        "instead of the generic imbalanced corpus")
    args = p.parse_args()

    import sys

    sys.path.insert(0, str(HERE.parent))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rec = {"framework": "cvaegan_tpu", "frames": args.frames,
           "seed": args.seed, "device": str(jax.devices()[0])}

    root = pathlib.Path(args.data)
    # corpus-type marker (ADVICE r4): the row-count guard below cannot
    # tell the faithful corpus from the generic one (their train-row
    # totals are ~identical), so emit a corpus.json tag at write time
    # and refuse to silently reuse a mismatched corpus.
    want_type = "car_hacking_faithful" if args.faithful else "generic"
    marker = root / "corpus.json"
    if not (root / "x_train.csv").exists():
        t0 = time.time()
        if args.faithful:
            from scripts.prepare_can_dataset import (
                synthetic_car_hacking, write_split)

            x, y, meta = synthetic_car_hacking(args.frames, seed=0)
            write_split(root, x, y, 5, test_size=0.1, seed=0)
            rec["class_proportions"] = meta["achieved_proportions"]
        else:
            emit_corpus(root, args.frames)
        marker.write_text(json.dumps(
            {"type": want_type, "frames": args.frames, "seed": 0}))
        rec["emit_seconds"] = round(time.time() - t0, 1)
        print("corpus emitted:", rec.get("emit_seconds"), "s", flush=True)
    else:
        have = (json.loads(marker.read_text()) if marker.exists()
                else {"type": "generic", "frames": None})  # pre-marker dirs
        if have["type"] != want_type:
            raise SystemExit(
                f"corpus in {root} is {have['type']!r} but this run "
                f"requested {want_type!r}; point --data at a fresh dir "
                "or delete the old CSVs")
    rec["corpus"] = want_type

    from cvaegan_tpu.core import config as config_lib
    from cvaegan_tpu.data.tabular import TabularDataset
    from cvaegan_tpu import CVAEGAN, Classifier

    config_lib.settings.seed = args.seed  # downstream classifier RNG

    t0 = time.time()
    ds = TabularDataset.from_csv_dir(root).renormalized()
    rec["load_seconds"] = round(time.time() - t0, 1)
    rec["train_rows"] = int(len(ds.tr_samples))
    expected = (int(args.frames * 0.9) if args.faithful
                else int(sum(int(args.frames * f) for f in
                             [0.75, 0.10, 0.075, 0.05, 0.025]) * 0.9))
    if abs(rec["train_rows"] - expected) > max(10, expected // 100):
        raise SystemExit(
            f"stale corpus in {root}: {rec['train_rows']} train rows but "
            f"--frames {args.frames} implies ~{expected}; point --data at "
            "a fresh dir or delete the old CSVs")
    print("loaded:", rec["train_rows"], "rows in", rec["load_seconds"], "s",
          flush=True)

    t0 = time.time()
    m = CVAEGAN(seed=args.seed, balanced_mode=True)
    m.fit(ds)
    rec["fit_seconds"] = round(time.time() - t0, 1)
    print("fit:", rec["fit_seconds"], "s", flush=True)

    t0 = time.time()
    counts = ds.class_counts()
    gen_x, gen_y, requested = [], [], 0
    for c in range(ds.label_num):
        if counts[c] >= max(counts):
            continue
        want = min(args.gen_per_class, int(max(counts) - counts[c]))
        requested += want
        g = m.generate_qualified_samples(c, want)
        if len(g):
            gen_x.append(np.asarray(g))
            gen_y.append(np.full(len(g), c, np.int64))
    got = int(sum(len(g) for g in gen_x))
    rec["gen_seconds"] = round(time.time() - t0, 1)
    rec["gen_yield"] = f"{got}/{requested}"
    print("generation:", rec["gen_yield"], "in", rec["gen_seconds"], "s",
          flush=True)

    aug = ds.append(np.concatenate(gen_x), np.concatenate(gen_y)) \
        if gen_x else ds

    clf = Classifier("scale4m")
    clf.warm_start_from(m)
    t0 = time.time()
    clf.fit(aug)
    rec["clf_fit_seconds"] = round(time.time() - t0, 1)
    t0 = time.time()
    clf.test(aug)
    rec["test_seconds"] = round(time.time() - t0, 1)
    rec["macro_f1"] = float(clf.metrics["F1"])
    clf.binary_test(aug)
    rec["binary_f1"] = float(clf.metrics["F1"])
    rec["total_seconds"] = round(
        sum(v for k, v in rec.items()
            if isinstance(v, (int, float)) and k.endswith("seconds")), 1)
    rec["reference_extrapolation"] = (
        "not measured at 4M: measured 1526.6s at 200k frames with the "
        "1186s classifier stage linear in rows -> ~7.4h at 3.6M train rows"
    )

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    if args.append:
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    else:
        out.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
