"""Multi-seed head-to-head study — TORCH REFERENCE side (CPU only).

Runs the reference's full train_<model>.py pipeline behavior (normalize ->
fit -> class-rebalancing qualified generation -> warm-started downstream
classifier -> multiclass + binary test, replicating
`/root/reference/scripts/train_cvae_gan.py` and its per-model deviations)
on the shared per-seed fixtures from `experiments/make_fixtures.py`, and
appends one JSON line per (model, seed) to the output file.

The reference package is executed from a writable copy (default
/tmp/refrun, created from /root/reference if missing) because its config
mkdirs data/ at import time.

Usage:
  python experiments/ref_multiseed.py --out /tmp/ref_multiseed.jsonl \
      --seeds 0 1 2 3 4 [--models cvae_gan ctgan ...]

CPU-only (torch); safe to run concurrently with TPU-side work.
"""

import argparse
import importlib
import json
import pathlib
import shutil
import sys
import time
import traceback

import numpy as np

REF_SRC = "/root/reference"
REF_RUN = "/tmp/refrun"

# model name -> (module, class, companion-classifier attr or None, scheme)
MODELS = {
    "cvae_gan": ("src.cvae_gan", "CVAEGAN", "classifier", "qualified"),
    "cgan": ("src.cgan", "CGAN", "classifier", "qualified"),
    "gan": ("src.gan", "GAN", "classifier", "qualified"),
    "cvae": ("src.cvae", "CVAE", "classifier", "qualified"),
    "sngan": ("src.sngan", "SNGAN", "classifier", "qualified"),
    "ctgan": ("src.ctgan", "CTGAN", "classifier", "qualified"),
    "qg_smote": ("src.qg_smote", "QG_SMOTE", "classifier", "qualified"),
    "rain_gan": ("src.rain_gan", "RAIN_GAN", "classifier", "qualified"),
    # NOTE: the reference's train_tmg_gan.py warm-starts the downstream
    # classifier with `clf.model = tmg_gan.cd`, but the CD forward returns
    # a (score, probs, hidden) tuple, so Classifier.fit crashes with
    # "cross_entropy_loss(): argument 'input' must be Tensor, not tuple"
    # (verified). We use a fresh classifier instead so the model still
    # gets a head-to-head number; flagged as ref_script_bug in the record.
    "tmg_gan": ("src.tmg_gan", "TMGGAN", None, "tmg"),
    "vae_gan": ("src.vae_gan", "VAEGAN", None, "unconditional"),
    # "vae" excluded: unconstructible in the reference
    # (src/vae.py:24 references a model class that does not exist).
}


def setup_refrun():
    run = pathlib.Path(REF_RUN)
    if not (run / "src").exists():
        shutil.copytree(REF_SRC, run, dirs_exist_ok=True)
    (run / "context.py").write_text("")
    sys.path.insert(0, str(run))
    # If REF_RUN was on sys.path before the copy (callers insert it
    # early), Python cached a negative finder for the then-missing dir
    # and `import src` fails forever after. Drop the stale cache.
    importlib.invalidate_caches()


def load_fixture(path):
    import src
    import torch

    d = np.load(path)
    src.datasets.tr_samples = torch.tensor(d["tr_x"], dtype=torch.float)
    src.datasets.tr_labels = torch.tensor(d["tr_y"]).long()
    src.datasets.te_samples = torch.tensor(d["te_x"], dtype=torch.float)
    src.datasets.te_labels = torch.tensor(d["te_y"]).long()


def run_one(model_name, seed, fixture):
    import importlib

    import src
    import torch
    from src import Classifier, datasets, utils

    mod_name, cls_name, clf_attr, scheme = MODELS[model_name]
    cls = getattr(importlib.import_module(mod_name), cls_name)

    t0 = time.time()
    load_fixture(fixture)
    utils.set_dataset_values()
    utils.set_random_state(seed)

    # -- template normalization: concat, minmax, shift non-negative,
    #    re-split at the same boundary (train_cvae_gan.py:19-43)
    from sklearn.preprocessing import minmax_scale

    lens = (len(datasets.tr_samples), len(datasets.te_samples))
    samples = torch.cat([datasets.tr_samples, datasets.te_samples])
    samples = torch.from_numpy(minmax_scale(samples.numpy())).float()
    samples = samples - samples.min()
    datasets.tr_samples, datasets.te_samples = torch.split(samples, lens)
    utils.set_dataset_values()

    utils.set_random_state(seed)
    model = cls()
    model.fit(datasets.TrDataset())
    fit_s = time.time() - t0

    # -- class-rebalancing generation (train_cvae_gan.py:72-95)
    labels_np = datasets.tr_labels.numpy()
    counts = np.bincount(labels_np, minlength=datasets.label_num)
    generated_total = 0
    needed_total = 0
    if scheme == "unconditional":
        num = len(datasets.tr_samples)  # double the set, random labels
        gen = model.generate_samples(num)
        gen_labels = torch.randint(0, datasets.label_num, (len(gen),))
        datasets.tr_samples = torch.cat([datasets.tr_samples, gen])
        datasets.tr_labels = torch.cat([datasets.tr_labels, gen_labels])
        generated_total = len(gen)
        needed_total = num
    else:
        max_cnt = int(counts.max())
        for c in range(datasets.label_num):
            need = max_cnt - int(counts[c])
            if need <= 0:
                continue
            needed_total += need
            gen = model.generate_qualified_samples(c, need)
            if len(gen) > 0:
                datasets.tr_samples = torch.cat(
                    [datasets.tr_samples, gen.float()])
                datasets.tr_labels = torch.cat(
                    [datasets.tr_labels, torch.full([len(gen)], c)])
                generated_total += len(gen)

    # -- downstream classifier, warm-started from the model's companion
    #    (train_cvae_gan.py:143-146; tmg variant uses .cd)
    utils.set_random_state(seed)
    clf = Classifier(f"ref_{model_name}_s{seed}")
    if clf_attr is not None:
        clf.model = getattr(model, clf_attr)
    clf.fit(datasets.TrDataset())
    clf.test(datasets.TeDataset())
    multi = {k: float(v) for k, v in clf.metrics.items()}
    clf.binary_test(datasets.TeDataset())
    binary = {k: float(v) for k, v in clf.metrics.items()}
    return {
        "framework": "reference-torch-cpu",
        "model": model_name,
        "seed": seed,
        **({"ref_script_bug": "train_tmg_gan.py warm-start crashes; "
            "fresh downstream classifier used"}
           if model_name == "tmg_gan" else {}),
        "macro_f1": multi["F1"],
        "multiclass": multi,
        "binary_f1": binary["F1"],
        "generated": int(generated_total),
        "needed": int(needed_total),
        "fit_seconds": round(fit_s, 1),
        "total_seconds": round(time.time() - t0, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--models", nargs="+", default=list(MODELS))
    here = pathlib.Path(__file__).parent
    p.add_argument("--fixtures", default=str(here / "fixtures"))
    p.add_argument("--out", default=str(here / "results"
                                        / "ref_multiseed.jsonl"))
    p.add_argument("--threads", type=int, default=0,
                   help="torch CPU threads (0 = torch default)")
    p.add_argument("--test-mode", action="store_true",
                   help="1-epoch smoke (reference turn_on_test_mode)")
    args = p.parse_args()

    setup_refrun()
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    if args.test_mode:
        from src import utils as _u

        _u.turn_on_test_mode()

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():  # resume support; errored runs are NOT done — retry
        for line in out.read_text().splitlines():
            try:
                r = json.loads(line)
                if "error" not in r:
                    done.add((r["model"], r["seed"]))
            except (json.JSONDecodeError, KeyError):
                pass

    # Model-major order: if wall-clock runs out, the models listed first
    # have complete seed coverage (put the contested ones first).
    for model_name in args.models:
        for seed in args.seeds:
            fixture = pathlib.Path(args.fixtures) / f"imb_s{seed}.npz"
            if (model_name, seed) in done:
                print(f"skip {model_name} s{seed} (done)", flush=True)
                continue
            print(f"=== {model_name} seed {seed} ===", flush=True)
            try:
                rec = run_one(model_name, seed, fixture)
            except Exception as e:  # record the failure, keep going
                traceback.print_exc()
                rec = {"framework": "reference-torch-cpu",
                       "model": model_name, "seed": seed,
                       "error": f"{type(e).__name__}: {e}"}
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
