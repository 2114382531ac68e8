"""Multi-seed head-to-head on the SCHEMA-FAITHFUL Car-Hacking stand-in
(VERDICT r4 item 7: the n=30 zoo study runs on the blobs/imbalanced
fixtures; this makes the "parity on the Car-Hacking-shaped problem"
claim multi-seed instead of single-run).

Protocol (pre-committed before either arm ran; matched on BOTH sides,
mirroring the scale-validation protocol of `ref_scale.py` /
`ours_scale_4m.py` rather than the majority-top-up zoo protocol — at
86.7% normal share a full top-up would need ~300k synthetic rows and
turn the study into a generation-volume benchmark):

  * per-seed corpus: `synthetic_car_hacking(--frames, seed=s)` (100k
    frames default — the "matched small scale" regime), stratified
    90/10 split at random_state=s, saved as an npz fixture BOTH sides
    load bit-identically;
  * template normalization: concat(train,test) -> minmax -> shift
    non-negative -> re-split (the reference's train_cvae_gan.py:19-43);
  * flagship CVAE-GAN, 500 epochs (reference budget);
  * qualified generation capped at --gen-per-class (default 1000) per
    non-majority class, threshold 0.5, wall-clock capped per side;
  * downstream classifier warm-started from the companion classifier,
    100 epochs, multiclass + binary test.

Reference side = the torch code from /root/reference run out of
/tmp/refrun (same staging as ref_multiseed.py). Ours side = cvaegan_tpu
(CPU or TPU, whatever backend is up — recorded per row).

Usage:
  python experiments/faithful_multiseed.py --side ref  --seeds 0..9
  python experiments/faithful_multiseed.py --side ours --seeds 0..9 \
      [--balanced]   # adds the documented beyond-parity mode arm

Rows append to experiments/results/faithful_multiseed.jsonl (resumable;
errored rows retry).
"""

import argparse
import json
import pathlib
import sys
import time
import traceback

import numpy as np

HERE = pathlib.Path(__file__).parent
REPO = HERE.parent
if str(REPO) not in sys.path:  # run as `python experiments/<this>.py`
    sys.path.insert(0, str(REPO))
OUT_DEFAULT = HERE / "results" / "faithful_multiseed.jsonl"
FIXDIR_DEFAULT = pathlib.Path("/tmp/faithful_fixtures")


def make_fixture(path: pathlib.Path, frames: int, seed: int) -> None:
    """Generate + split one per-seed faithful corpus (idempotent)."""
    if path.exists():
        return
    sys.path.insert(0, str(REPO))
    from sklearn.model_selection import train_test_split

    from scripts.prepare_can_dataset import synthetic_car_hacking

    x, y, meta = synthetic_car_hacking(frames, seed=seed)
    tr_x, te_x, tr_y, te_y = train_test_split(
        x, y, test_size=0.1, random_state=seed, stratify=y)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, tr_x=tr_x.astype(np.float32), tr_y=tr_y.astype(np.int64),
             te_x=te_x.astype(np.float32), te_y=te_y.astype(np.int64))
    print(f"fixture {path}: train {tr_x.shape}, "
          f"counts {np.bincount(tr_y, minlength=5).tolist()}", flush=True)


# --------------------------------------------------------------- reference
def run_ref(seed: int, fixture: pathlib.Path, gen_per_class: int,
            gen_timeout: float) -> dict:
    import importlib

    import src  # noqa: F401  (staged /tmp/refrun copy)
    import torch
    from src import Classifier, datasets, utils

    t_all = time.time()
    d = np.load(fixture)
    datasets.tr_samples = torch.tensor(d["tr_x"], dtype=torch.float)
    datasets.tr_labels = torch.tensor(d["tr_y"]).long()
    datasets.te_samples = torch.tensor(d["te_x"], dtype=torch.float)
    datasets.te_labels = torch.tensor(d["te_y"]).long()
    utils.set_dataset_values()
    utils.set_random_state(seed)

    from sklearn.preprocessing import minmax_scale

    lens = (len(datasets.tr_samples), len(datasets.te_samples))
    samples = torch.cat([datasets.tr_samples, datasets.te_samples])
    samples = torch.from_numpy(minmax_scale(samples.numpy())).float()
    samples = samples - samples.min()
    datasets.tr_samples, datasets.te_samples = torch.split(samples, lens)
    utils.set_dataset_values()

    utils.set_random_state(seed)
    cls = getattr(importlib.import_module("src.cvae_gan"), "CVAEGAN")
    model = cls()
    t0 = time.time()
    model.fit(datasets.TrDataset())
    fit_s = time.time() - t0

    labels_np = datasets.tr_labels.numpy()
    counts = np.bincount(labels_np, minlength=datasets.label_num)
    majority = int(counts.argmax())
    t0 = time.time()
    deadline = t0 + gen_timeout
    generated = requested = 0
    gen_capped = False
    for c in range(datasets.label_num):
        if c == majority:
            continue
        if time.time() > deadline:  # the 10-at-a-time loop is not
            gen_capped = True       # interruptible mid-class
            break
        requested += gen_per_class
        gen = model.generate_qualified_samples(c, gen_per_class)
        if len(gen) > 0:
            datasets.tr_samples = torch.cat(
                [datasets.tr_samples, gen.float()])
            datasets.tr_labels = torch.cat(
                [datasets.tr_labels, torch.full([len(gen)], c)])
            generated += len(gen)
    gen_s = time.time() - t0

    utils.set_random_state(seed)
    clf = Classifier(f"faithful_ref_s{seed}")
    clf.model = model.classifier
    t0 = time.time()
    clf.fit(datasets.TrDataset())
    clf_s = time.time() - t0
    clf.test(datasets.TeDataset())
    multi = {k: float(v) for k, v in clf.metrics.items()}
    clf.binary_test(datasets.TeDataset())
    binary = {k: float(v) for k, v in clf.metrics.items()}
    return {
        "framework": "reference-torch-cpu", "model": "cvae_gan",
        "mode": "strict", "seed": seed,
        "macro_f1": multi["F1"], "multiclass": multi,
        "binary_f1": binary["F1"],
        "generated": generated, "requested": requested,
        **({"gen_capped": True} if gen_capped else {}),
        "fit_seconds": round(fit_s, 1), "gen_seconds": round(gen_s, 1),
        "clf_fit_seconds": round(clf_s, 1),
        "total_seconds": round(time.time() - t_all, 1),
    }


# -------------------------------------------------------------------- ours
def run_ours(seed: int, fixture: pathlib.Path, gen_per_class: int,
             balanced: bool) -> dict:
    import jax

    from cvaegan_tpu import CVAEGAN, Classifier
    from cvaegan_tpu.core import config as config_lib
    from cvaegan_tpu.data.tabular import TabularDataset

    t_all = time.time()
    d = np.load(fixture)
    ds = TabularDataset(d["tr_x"], d["tr_y"].astype(np.int32),
                        d["te_x"], d["te_y"].astype(np.int32),
                        name=f"faithful_s{seed}").renormalized()
    config_lib.settings.seed = seed

    m = CVAEGAN(seed=seed, balanced_mode=balanced)
    m.verbose = False
    t0 = time.time()
    m.fit(ds)
    fit_s = time.time() - t0

    counts = np.asarray(ds.class_counts())
    majority = int(counts.argmax())
    t0 = time.time()
    gen_x, gen_y, generated, requested = [], [], 0, 0
    for c in range(ds.label_num):
        if c == majority:
            continue
        requested += gen_per_class
        g = m.generate_qualified_samples(c, gen_per_class)
        if len(g):
            gen_x.append(np.asarray(g))
            gen_y.append(np.full(len(g), c, np.int32))
            generated += len(g)
    gen_s = time.time() - t0
    aug = (ds.append(np.concatenate(gen_x), np.concatenate(gen_y))
           if gen_x else ds)

    clf = Classifier(f"faithful_ours_s{seed}")
    clf.warm_start_from(m)
    t0 = time.time()
    clf.fit(aug)
    clf_s = time.time() - t0
    clf.test(aug)
    multi = {k: float(v) for k, v in clf.metrics.items()}
    clf.binary_test(aug)
    binary = {k: float(v) for k, v in clf.metrics.items()}
    return {
        "framework": "cvaegan_tpu", "model": "cvae_gan",
        "mode": "balanced" if balanced else "strict", "seed": seed,
        "device": str(jax.devices()[0]),
        "macro_f1": multi["F1"], "multiclass": multi,
        "binary_f1": binary["F1"],
        "generated": generated, "requested": requested,
        "fit_seconds": round(fit_s, 1), "gen_seconds": round(gen_s, 1),
        "clf_fit_seconds": round(clf_s, 1),
        "total_seconds": round(time.time() - t_all, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", required=True, choices=["ref", "ours"])
    p.add_argument("--seeds", type=int, nargs="+",
                   default=list(range(10)))
    p.add_argument("--frames", type=int, default=100_000)
    p.add_argument("--gen-per-class", type=int, default=1000)
    p.add_argument("--gen-timeout", type=float, default=1200.0)
    p.add_argument("--balanced", action="store_true",
                   help="ours side: the documented beyond-parity mode")
    p.add_argument("--fixtures", default=str(FIXDIR_DEFAULT))
    p.add_argument("--out", default=str(OUT_DEFAULT))
    p.add_argument("--test-mode", action="store_true",
                   help="1-epoch smoke both sides")
    args = p.parse_args()

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                r = json.loads(line)
                if "error" not in r:
                    done.add((r["framework"], r["mode"], r["seed"]))
            except (json.JSONDecodeError, KeyError):
                pass

    fixdir = pathlib.Path(args.fixtures)
    mode = ("balanced" if args.balanced else "strict")
    fw = "reference-torch-cpu" if args.side == "ref" else "cvaegan_tpu"

    if args.side == "ref":
        sys.path.insert(0, "/tmp/refrun")
        from experiments.ref_multiseed import setup_refrun

        setup_refrun()
        import torch

        torch.set_num_threads(1)
        if args.test_mode:
            from src import utils as _u

            _u.turn_on_test_mode()
    else:
        if args.test_mode:
            from cvaegan_tpu.core import config as config_lib

            config_lib.turn_on_test_mode()

    for seed in args.seeds:
        fixture = fixdir / f"faithful_{args.frames}_s{seed}.npz"
        make_fixture(fixture, args.frames, seed)
        if (fw, mode, seed) in done:
            print(f"skip {fw} {mode} s{seed} (done)", flush=True)
            continue
        print(f"=== {fw} {mode} seed {seed} ===", flush=True)
        try:
            if args.side == "ref":
                rec = run_ref(seed, fixture, args.gen_per_class,
                              args.gen_timeout)
            else:
                rec = run_ours(seed, fixture, args.gen_per_class,
                               args.balanced)
            rec["frames"] = args.frames
        except Exception as e:
            traceback.print_exc()
            rec = {"framework": fw, "model": "cvae_gan", "mode": mode,
                   "seed": seed, "frames": args.frames,
                   "error": f"{type(e).__name__}: {e}"}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
