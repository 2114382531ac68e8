"""Multi-seed head-to-head study — cvaegan_tpu side (1 TPU chip).

Runs the full `pipelines/balance.py` pipeline per (model, seed, mode) on
the SAME per-seed fixtures as `experiments/ref_multiseed.py` (bit-identical
data both frameworks) and appends one JSON line per run.

Modes:
  strict   — reference-parity per-class round-robin training
  balanced — beyond-parity class-balanced mixed rounds (conditional
             models only; TMG-GAN intrinsically per-class, skipped)

Usage (serialize with any other TPU process — the axon tunnel wedges on
concurrent access):
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/ours_multiseed.py \
      --out /tmp/ours_multiseed.jsonl --seeds 0 1 2 3 4
"""

import argparse
import json
import pathlib
import sys
import time
import traceback

REPO = pathlib.Path(__file__).parent.parent
if str(REPO) not in sys.path:  # run as `python experiments/<this>.py`
    sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

# model name -> (class name, supports balanced_mode, generation_mode)
MODELS = {
    "cvae_gan": ("CVAEGAN", True, "qualified"),
    "cgan": ("CGAN", True, "qualified"),
    "gan": ("GAN", False, "qualified"),
    "cvae": ("CVAE", True, "qualified"),
    "sngan": ("SNGAN", True, "qualified"),
    "ctgan": ("CTGAN", True, "qualified"),
    "qg_smote": ("QG_SMOTE", True, "qualified"),
    "rain_gan": ("RAIN_GAN", True, "qualified"),
    "tmg_gan": ("TMGGAN", False, "tmg"),
    "vae_gan": ("VAEGAN", False, "unconditional"),
    "vae": ("VAE", False, "qualified"),  # ours works; reference's is broken
}


def load_fixture(path) -> "TabularDataset":
    from cvaegan_tpu.data.tabular import TabularDataset

    d = np.load(path)
    return TabularDataset(d["tr_x"], d["tr_y"].astype(np.int32),
                          d["te_x"], d["te_y"].astype(np.int32),
                          name=pathlib.Path(path).stem)


def run_one(model_name: str, seed: int, fixture, balanced: bool,
            threshold=None, warm_start: bool = True, model=None):
    import cvaegan_tpu
    from cvaegan_tpu.pipelines.balance import run_balance_pipeline

    cls_name, _, gen_mode = MODELS[model_name]
    cls = getattr(cvaegan_tpu, cls_name)
    ds = load_fixture(fixture)
    t0 = time.time()
    r = run_balance_pipeline(
        cls, cls_name, ds, out_dir="/tmp", plot=False, seed=seed,
        generation_mode=gen_mode, balanced_mode=balanced,
        confidence_threshold=threshold, warm_start=warm_start, model=model,
    )
    counts = np.bincount(np.asarray(ds.tr_labels))
    n_train = int(counts.sum())
    # conditional schemes top every class up to the majority count;
    # the unconditional (vae_gan) scheme adds 1x the train size
    needed = (int(counts.max() * len(counts) - counts.sum())
              if gen_mode != "unconditional" else n_train)
    generated = len(r["augmented"].tr_samples) - n_train
    mode = "balanced" if balanced else "strict"
    if not warm_start:
        mode += "+fresh_clf"
    return {
        "framework": "cvaegan_tpu",
        "model": model_name,
        "seed": seed,
        "mode": mode,
        **({"threshold": threshold} if threshold is not None else {}),
        "macro_f1": r["multiclass_metrics"]["F1"],
        "multiclass": {k: float(v) for k, v in r["multiclass_metrics"].items()},
        "binary_f1": r["binary_metrics"]["F1"],
        "generated": int(generated),
        "needed": needed,
        "total_seconds": round(time.time() - t0, 1),
    }


def run_bank(model_name: str, seeds, fixtures_dir, balanced: bool,
             out, done, mode_tag: str, threshold=None,
             warm_start: bool = True):
    """Vmapped seed-parallel fit (ONE XLA program trains all seeds,
    `cvaegan_tpu.SeedBank`), then the per-seed downstream pipeline
    (generation / augmentation / classifier / metrics) serially in the
    same process — compiles shared across seeds."""
    import cvaegan_tpu
    from cvaegan_tpu import SeedBank

    cls_name, _, gen_mode = MODELS[model_name]
    cls = getattr(cvaegan_tpu, cls_name)
    todo = [s for s in seeds
            if (model_name, s, mode_tag, threshold) not in done]
    if not todo:
        print(f"skip {model_name} {mode_tag} (all seeds done)", flush=True)
        return
    fixtures = [pathlib.Path(fixtures_dir) / f"imb_s{s}.npz" for s in todo]
    # the pipeline trains on dataset.renormalized(); fit the bank on
    # exactly that
    datasets = [load_fixture(f).renormalized() for f in fixtures]
    bank = SeedBank(cls, seeds=todo, balanced_mode=balanced)
    for t in bank.trainers:
        t.verbose = False
    print(f"=== bank fit {model_name} {mode_tag} x{len(todo)} seeds ===",
          flush=True)
    trainers = bank.fit(datasets)
    print(f"bank fit: {bank.fit_seconds:.1f}s, "
          f"{bank.steps_per_sec:.0f} aggregate steps/s", flush=True)
    for s, fixture, trainer in zip(todo, fixtures, trainers):
        try:
            rec = run_one(model_name, s, fixture, balanced, threshold,
                          warm_start=warm_start, model=trainer)
            # run_one derives mode from its own args and knows nothing of
            # the dtype tag — stamp the FULL tag or a +bf16 arm silently
            # pollutes the f32 rows (round-5 fix; the first bf16 CPU run
            # hit exactly this and was re-tagged in place).
            rec["mode"] = mode_tag
            rec["fit_mode"] = "bank"
            rec["bank_steps_per_sec"] = round(bank.steps_per_sec)
        except Exception as e:
            traceback.print_exc()
            rec = {"framework": "cvaegan_tpu", "model": model_name,
                   "seed": s, "mode": mode_tag,
                   "error": f"{type(e).__name__}: {e}"}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--models", nargs="+", default=list(MODELS))
    p.add_argument("--modes", nargs="+", default=["strict", "balanced"])
    here = pathlib.Path(__file__).parent
    p.add_argument("--fixtures", default=str(here / "fixtures"))
    p.add_argument("--out", default=str(here / "results"
                                        / "ours_multiseed.jsonl"))
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--no-warm-start", action="store_true",
                   help="fresh downstream classifier (the documented "
                        "SNGAN fix, BASELINE.md); tags mode +fresh_clf")
    p.add_argument("--bank", action="store_true",
                   help="vmapped seed-parallel fit per (model, mode) "
                        "(SeedBank): all seeds train in one XLA program")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute-dtype policy for the GAN fits (the bf16 "
                        "quality-parity arm of VERDICT r3 item 2); the "
                        "downstream classifier always evaluates f32. "
                        "Tags mode +bf16 so rows stay distinguishable.")
    args = p.parse_args()

    dtype_tag = ""
    if args.dtype != "float32":
        from cvaegan_tpu.core import config as config_lib

        config_lib.settings.gan.compute_dtype = args.dtype
        dtype_tag = "+bf16"

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():  # resume support; errored runs are NOT done — retry
        for line in out.read_text().splitlines():
            try:
                r = json.loads(line)
                if "error" not in r:
                    done.add((r["model"], r["seed"], r["mode"],
                              r.get("threshold")))
            except (json.JSONDecodeError, KeyError):
                pass

    if args.bank:
        for model_name in args.models:
            for mode in args.modes:
                balanced = mode == "balanced"
                if balanced and not MODELS[model_name][1]:
                    continue
                mode_tag = mode + ("+fresh_clf" if args.no_warm_start
                                   else "") + dtype_tag
                run_bank(model_name, args.seeds, args.fixtures, balanced,
                         out, done, mode_tag, args.threshold,
                         warm_start=not args.no_warm_start)
        return

    for seed in args.seeds:
        fixture = pathlib.Path(args.fixtures) / f"imb_s{seed}.npz"
        for model_name in args.models:
            for mode in args.modes:
                balanced = mode == "balanced"
                if balanced and not MODELS[model_name][1]:
                    continue
                mode_tag = mode + ("+fresh_clf" if args.no_warm_start
                                   else "") + dtype_tag
                key = (model_name, seed, mode_tag, args.threshold)
                if key in done:
                    print(f"skip {key} (done)", flush=True)
                    continue
                print(f"=== {model_name} seed {seed} {mode_tag} ===",
                      flush=True)
                try:
                    rec = run_one(model_name, seed, fixture, balanced,
                                  args.threshold,
                                  warm_start=not args.no_warm_start)
                    rec["mode"] = mode_tag  # include the dtype tag
                except Exception as e:
                    traceback.print_exc()
                    rec = {"framework": "cvaegan_tpu", "model": model_name,
                           "seed": seed, "mode": mode_tag,
                           "error": f"{type(e).__name__}: {e}"}
                with open(out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
