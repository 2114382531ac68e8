"""SNGAN hinge-loss hyperparameter sweep (VERDICT r1 item 7).

Round 1 measured SNGAN as the zoo floor on BOTH sides (ours 0.160,
reference 0.172 macro-F1) — the weakness is inherited from the design.
This sweep tries the cheap knobs on the imbalanced fixture:

  base        — reference parity (d_lr 2e-4, 5 D loops, SN on G)
  d_lr_1e-4   — halved critic learning rate
  d_loop_1    — 1:1 critic/generator loop ratio (instead of 5 D : 3 G)
  no_sn_g     — spectral norm OFF on the generator (hparams['spectral_g'])
  combo       — d_loop_1 + no_sn_g

Each variant runs the full balance pipeline on N seeds; JSONL output.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sngan_sweep.py \
      --out /tmp/sngan_sweep.jsonl --seeds 0 1 2
"""

import argparse
import json
import pathlib
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

VARIANTS = {
    "base": {},
    "d_lr_1e-4": {"d_lr": 1e-4},
    "d_loop_1": {"d_loop_num": 1},
    "no_sn_g": {"spectral_g": False},
    "combo": {"d_loop_num": 1, "spectral_g": False},
    # Round-2 finding: every GAN-side knob above leaves yield at 0 and
    # F1 ~0.14 — BELOW the 0.339 unaugmented baseline. Root cause is the
    # spectral-normed companion CLASSIFIER: its softmax never clears the
    # 0.5 cut (no generation) and warm-starting the downstream classifier
    # from it caps capacity. These two variants test that diagnosis:
    "fresh_clf": {"warm_start": False},
    "thresh_0.3": {"confidence_threshold": 0.3},
    "fresh+thresh": {"warm_start": False, "confidence_threshold": 0.3},
}


def load_fixture(path):
    from cvaegan_tpu.data.tabular import TabularDataset

    d = np.load(path)
    return TabularDataset(d["tr_x"], d["tr_y"].astype(np.int32),
                          d["te_x"], d["te_y"].astype(np.int32),
                          name=pathlib.Path(path).stem)


def run_variant(name, overrides, seed, fixture):
    from cvaegan_tpu import SNGAN
    from cvaegan_tpu.core import config as config_lib
    from cvaegan_tpu.pipelines.balance import run_balance_pipeline

    gan = config_lib.settings.gan
    old = {"d_lr": gan.d_lr, "d_loop_num": gan.d_loop_num}
    old_hp = dict(config_lib.MODEL_CONFIGS["sngan"])
    try:
        if "d_lr" in overrides:
            gan.d_lr = overrides["d_lr"]
        if "d_loop_num" in overrides:
            gan.d_loop_num = overrides["d_loop_num"]
        if "spectral_g" in overrides:
            config_lib.MODEL_CONFIGS["sngan"]["spectral_g"] = (
                overrides["spectral_g"])
        ds = load_fixture(fixture)
        t0 = time.time()
        r = run_balance_pipeline(
            SNGAN, "SNGAN", ds, out_dir="/tmp", plot=False, seed=seed,
            warm_start=overrides.get("warm_start", True),
            confidence_threshold=overrides.get("confidence_threshold"))
        return {
            "variant": name, "seed": seed, "overrides": overrides,
            "macro_f1": r["multiclass_metrics"]["F1"],
            "binary_f1": r["binary_metrics"]["F1"],
            "generated": int(len(r["augmented"].tr_samples) - 900),
            "total_seconds": round(time.time() - t0, 1),
        }
    finally:
        gan.d_lr = old["d_lr"]
        gan.d_loop_num = old["d_loop_num"]
        config_lib.MODEL_CONFIGS["sngan"] = old_hp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--variants", nargs="+", default=list(VARIANTS))
    p.add_argument("--fixtures", default="/tmp/fixtures")
    p.add_argument("--out", default="/tmp/sngan_sweep.jsonl")
    args = p.parse_args()

    out = pathlib.Path(args.out)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                r = json.loads(line)
                done.add((r["variant"], r["seed"]))
            except (json.JSONDecodeError, KeyError):
                pass

    for name in args.variants:
        for seed in args.seeds:
            if (name, seed) in done:
                continue
            fixture = pathlib.Path(args.fixtures) / f"imb_s{seed}.npz"
            print(f"=== sngan {name} seed {seed} ===", flush=True)
            try:
                rec = run_variant(name, VARIANTS[name], seed, fixture)
            except Exception as e:
                traceback.print_exc()
                rec = {"variant": name, "seed": seed,
                       "error": f"{type(e).__name__}: {e}"}
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
