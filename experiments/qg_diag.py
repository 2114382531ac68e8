"""QG-SMOTE deficit diagnosis (VERDICT r2 item 4).

Round-2 multi-seed numbers: ours strict 0.573±0.086 vs reference
0.598±0.068 (ns), and balanced_mode made it WORSE (0.530±0.053) — the
only model where the fast mode hurts.

Hypothesis under test: QG-SMOTE is the only model whose GENERATION path
(quantile-interpolated latents -> generator, `generate_samples(
method='quantile')`) is trained by the reconstruction objective alone —
every other conditional model generates from the prior path that the
adversarial+CE objectives train. Balanced mode runs ONE mixed round per
epoch instead of label_num class rounds, so the recon path gets 1/label_num
the optimizer steps; the quantile->x map is undertrained, not wrong.

Arms (SeedBank-vmapped, all seeds in one XLA program per arm):
  strict          — reference-parity per-class round-robin (500 epochs)
  balanced        — the fast mode as shipped (500 epochs)
  balanced_eq     — balanced with label_num x epochs (2500): equal total
                    optimizer steps to strict. If the hypothesis holds,
                    F1 recovers to >= strict and final recon_loss drops
                    to the strict level.

Per arm we record downstream macro-F1 (full balance pipeline per seed)
plus the final-100-epoch mean recon_loss of every replica.

Usage (TPU; serialize with other TPU processes):
  python experiments/qg_diag.py --seeds 0 1 2 3 4 5 6 7 8 9 \
      [--out experiments/results/qg_diag.jsonl]
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

HERE = pathlib.Path(__file__).parent


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=list(range(10)))
    p.add_argument("--fixtures", default=str(HERE / "fixtures"))
    p.add_argument("--out", default=str(HERE / "results" / "qg_diag.jsonl"))
    p.add_argument("--arms", nargs="+",
                   default=["strict", "balanced", "balanced_eq"])
    args = p.parse_args()

    import sys

    sys.path.insert(0, str(HERE.parent))
    sys.path.insert(0, str(HERE))
    from ours_multiseed import load_fixture, run_one

    from cvaegan_tpu import QG_SMOTE, SeedBank
    from cvaegan_tpu.core import config as config_lib

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    for arm in args.arms:
        balanced = arm != "strict"
        epochs = 500
        if arm == "balanced_eq":
            epochs = 500 * 5  # label_num x — equal total optimizer steps
        config_lib.settings.gan.epochs = epochs

        fixtures = [pathlib.Path(args.fixtures) / f"imb_s{s}.npz"
                    for s in args.seeds]
        datasets = [load_fixture(f).renormalized() for f in fixtures]
        bank = SeedBank(QG_SMOTE, seeds=args.seeds, balanced_mode=balanced)
        for t in bank.trainers:
            t.verbose = False
        print(f"=== qg_diag arm {arm}: bank fit x{len(args.seeds)} seeds, "
              f"{epochs} epochs ===", flush=True)
        t0 = time.time()
        trainers = bank.fit(datasets)
        print(f"bank fit {time.time() - t0:.1f}s "
              f"({bank.steps_per_sec:.0f} steps/s aggregate)", flush=True)

        for s, fixture, trainer in zip(args.seeds, fixtures, trainers):
            recon_tail = float(np.mean(trainer.loss_history["recon_loss"][-100:]))
            try:
                rec = run_one("qg_smote", s, fixture, balanced, model=trainer)
                rec["mode"] = arm
                rec["recon_tail"] = round(recon_tail, 5)
                rec["epochs"] = epochs
            except Exception as e:
                traceback.print_exc()
                rec = {"model": "qg_smote", "seed": s, "mode": arm,
                       "error": f"{type(e).__name__}: {e}"}
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)

    # summary
    rows = [json.loads(l) for l in out.read_text().splitlines()
            if "error" not in json.loads(l)]
    for arm in args.arms:
        f1 = [r["macro_f1"] for r in rows if r["mode"] == arm]
        rt = [r["recon_tail"] for r in rows if r["mode"] == arm]
        if f1:
            print(f"{arm}: F1 {np.mean(f1):.3f}±{np.std(f1):.3f} (n={len(f1)}), "
                  f"recon_tail {np.mean(rt):.4f}")


if __name__ == "__main__":
    main()
