"""Benchmark: CVAE-GAN training-step throughput on one TPU chip.

Protocol (matches the reference's implicit envelope, BASELINE.md):
blob fixture (1000x30, 5 classes), batch 128, z 128, per-class
(5 D + 5 C + 3 G) = 65 optimizer steps per epoch. We time steady-state
fused-epoch execution (compile excluded) and report steps/sec.

Baseline: the torch reference measured on this machine's CPU at
130.25 steps/sec (10-epoch steady state, `scripts/` protocol —
see BASELINE.md). vs_baseline = ours / 130.25.

Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_CPU_STEPS_PER_SEC = 130.25  # torch reference, same fixture/machine


def main() -> None:
    from cvaegan_tpu.core import config as config_lib
    from cvaegan_tpu.data.tabular import TabularDataset
    from cvaegan_tpu.algorithms.cvae_gan import CVAEGAN

    # The reference's own training budget is 500 epochs
    # (`src/config/gan_config.py:1`); we time exactly that workload,
    # end-to-end (dispatch + device sync included), after one warmup run
    # of the same shape to exclude compilation.
    warmup_epochs = 500
    bench_epochs = 500

    ds = TabularDataset.synthetic_blobs(seed=0)
    label_num = ds.label_num
    cfg = config_lib.settings.gan
    steps_per_epoch = label_num * (
        cfg.d_loop_num + cfg.c_loop_num + cfg.g_loop_num
    )

    config_lib.settings.gan.epochs = warmup_epochs
    m = CVAEGAN()
    m.verbose = False
    m.fit(ds)

    config_lib.settings.gan.epochs = bench_epochs
    t0 = time.perf_counter()
    m.fit(ds)
    elapsed = time.perf_counter() - t0

    steps = bench_epochs * steps_per_epoch
    value = steps / elapsed
    print(json.dumps({
        "metric": "cvae_gan_train_steps_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "steps/sec",
        "vs_baseline": round(value / REF_CPU_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # axon tunnel occasionally drops; retry once
        import sys
        import time as _time

        print(f"bench attempt failed ({type(e).__name__}); retrying in 120s",
              file=sys.stderr)
        _time.sleep(120)
        main()
