"""Diagnose strict-mode qualified-yield instability (VERDICT r1 item 6).

Round 1 observed the same strict CVAE-GAN config yield between 20 and 766
qualified samples across runs. This script instruments the companion
classifier's confidence distribution on generated samples across seeds,
and evaluates two parity-preserving mitigations WITHOUT retraining:

  * threshold sensitivity — yield as a function of the confidence cut
  * temperature calibration — fit a scalar temperature on the (real)
    train split by NLL grid search, then apply the default 0.5 cut to the
    calibrated probabilities

Appends one JSON line per seed. Run on the TPU (serialize with other TPU
processes):
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/diagnose_yield.py \
      --out /tmp/yield_diag.jsonl --seeds 0 1 2 3 4
"""

import argparse
import json
import pathlib
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def load_fixture(path):
    from cvaegan_tpu.data.tabular import TabularDataset

    d = np.load(path)
    return TabularDataset(d["tr_x"], d["tr_y"].astype(np.int32),
                          d["te_x"], d["te_y"].astype(np.int32),
                          name=pathlib.Path(path).stem)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--fixtures", default="/tmp/fixtures")
    p.add_argument("--out", default="/tmp/yield_diag.jsonl")
    p.add_argument("--per-class", type=int, default=2000,
                   help="generated probe samples per class")
    p.add_argument("--model", default="CVAEGAN",
                   help="trainer class name (e.g. CVAEGAN, RAIN_GAN) — "
                        "any conditional model with a companion classifier")
    args = p.parse_args()

    import cvaegan_tpu

    model_cls = getattr(cvaegan_tpu, args.model)

    out = pathlib.Path(args.out)
    for seed in args.seeds:
        t0 = time.time()
        ds = load_fixture(
            pathlib.Path(args.fixtures) / f"imb_s{seed}.npz").renormalized()
        m = model_cls(seed=seed)
        m.verbose = False
        m.fit(ds)

        # one jitted probe: generate N per class, return classifier probs
        n = args.per_class
        L = m.label_num

        def probe(state, key):
            stats = {}
            for c in range(L):
                kz, kk = jax.random.split(jax.random.fold_in(key, c))
                labels = jnp.full((n,), c, jnp.int32)
                z = jax.random.normal(kz, (n, m.gan_cfg.z_size))
                x = m._generator_forward(state, z, labels, kk)
                logits = m._classifier_logits(state, x)
                stats[c] = logits
            return stats

        logits_by_class = jax.device_get(
            jax.jit(probe)(m.state, jax.random.PRNGKey(seed)))

        # real-data logits for temperature calibration (train split)
        def real_logits(state, x):
            return m._classifier_logits(state, x)

        rl = jax.device_get(jax.jit(real_logits)(
            m.state, jnp.asarray(ds.tr_samples)))
        ry = ds.tr_labels

        def softmax(z, T=1.0):
            z = z / T
            z = z - z.max(-1, keepdims=True)
            e = np.exp(z)
            return e / e.sum(-1, keepdims=True)

        # NLL grid search for temperature on real train data
        temps = np.linspace(0.25, 4.0, 31)
        nlls = [
            -np.log(softmax(rl, T)[np.arange(len(ry)), ry] + 1e-12).mean()
            for T in temps
        ]
        T_star = float(temps[int(np.argmin(nlls))])

        rec = {"model": args.model, "seed": seed, "T_star": T_star,
               "fit_seconds": round(time.time() - t0, 1), "classes": {}}
        for c, logits in logits_by_class.items():
            p1 = softmax(logits, 1.0)
            pT = softmax(logits, T_star)
            maxp, pred = p1.max(-1), p1.argmax(-1)
            maxpT, predT = pT.max(-1), pT.argmax(-1)
            rec["classes"][int(c)] = {
                "correct_frac": float((pred == c).mean()),
                "maxp_deciles": np.percentile(
                    maxp, [10, 25, 50, 75, 90]).round(3).tolist(),
                "yield_frac": {
                    str(t): float(((maxp > t) & (pred == c)).mean())
                    for t in (0.3, 0.5, 0.7, 0.9)
                },
                "yield_frac_calibrated_0.5":
                    float(((maxpT > 0.5) & (predT == c)).mean()),
            }
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
