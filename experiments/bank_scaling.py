"""SeedBank replica-scaling curve on one v5e chip.

Measures steady-state aggregate optimizer-step throughput (and implied
MFU, analytic FLOPs as in `mfu_note.py`) for K-replica vmapped CVAE-GAN
banks, K in {1, 8, 16, 32, 64} — validating the roofline note's claim
that replica batching, not bigger kernels, is how this workload scales
until HBM becomes the wall.

Usage (TPU, serialize): python experiments/bank_scaling.py [--dtype bfloat16]

--dtype bfloat16 re-measures the curve under the mixed-precision compute
policy (`settings.gan.compute_dtype`: bf16 matmuls/activations, f32
params/Adam/stats — VERDICT r3 item 2's direct test of whether halving
matmul-operand precision moves the HBM/latency-bound SeedBank plateau).
MFU under bf16 is reported against the same 197-TFLOP/s bf16 peak the
f32 table uses (the v5e MXU's native accumulate path), so rows are
comparable.
"""

import argparse
import json
import pathlib
import sys
import time

HERE = pathlib.Path(__file__).parent
sys.path.insert(0, str(HERE.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mfu_note import V5E_PEAK_TFLOPS, analytic_epoch_cost  # noqa: E402


def bank_rate(k: int):
    from cvaegan_tpu import SeedBank
    from cvaegan_tpu.core import config as cl
    from cvaegan_tpu.data.tabular import TabularDataset
    import cvaegan_tpu.algorithms.seed_bank as sb

    ds = TabularDataset.synthetic_blobs(seed=0)
    cl.settings.gan.epochs = 500
    bank = SeedBank(__import__("cvaegan_tpu").CVAEGAN, seeds=range(k))
    for t in bank.trainers:
        t.verbose = False
        t._prepare(ds)
    template = bank.trainers[0]
    stacked = sb._stack([t.state for t in bank.trainers])
    data = sb._stack([t._data for t in bank.trainers])

    def bank_program(state, key, n):
        def body(carry, i):
            s, kk = carry
            ks = jax.random.split(kk, k + 1)
            kk, subs = ks[0], ks[1:]
            s = jax.vmap(
                lambda ss, dd, sk: template._epoch_body(ss, dd, i, sk)[0]
            )(s, data, subs)
            return (s, kk), ()

        (state, _), _ = jax.lax.scan(body, (state, key), jnp.arange(n))
        return state

    fn = jax.jit(bank_program, static_argnames=("n",))
    n_short, n_long = 20, 120
    jax.device_get(fn(stacked, jax.random.PRNGKey(0), n=n_short))
    jax.device_get(fn(stacked, jax.random.PRNGKey(0), n=n_long))
    rate = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(stacked, jax.random.PRNGKey(1), n=n_short))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(fn(stacked, jax.random.PRNGKey(1), n=n_long))
        tl = time.perf_counter() - t0
        if tl > ts:
            rate = (n_long - n_short) / (tl - ts)
            break
    if rate is None:
        rate = n_long / tl

    flops, _ = analytic_epoch_cost(template.state, cl.settings.gan.batch_size)
    steps_per_epoch = template.label_num * (
        cl.settings.gan.d_loop_num + cl.settings.gan.c_loop_num
        + cl.settings.gan.g_loop_num)
    agg_steps = rate * k * steps_per_epoch
    achieved = rate * k * flops
    return {
        "k": k,
        "bank_epochs_per_sec": round(rate, 2),
        "aggregate_steps_per_sec": round(agg_steps),
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_pct": round(100 * achieved / (V5E_PEAK_TFLOPS * 1e12), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--ks", type=int, nargs="*", default=[1, 8, 16, 32, 64])
    args = ap.parse_args()

    from cvaegan_tpu.core import config as cl
    cl.settings.gan.compute_dtype = args.dtype

    out = []
    for k in args.ks:
        rec = bank_rate(k)
        rec["compute_dtype"] = args.dtype
        out.append(rec)
        print(json.dumps(rec), flush=True)
    suffix = "" if args.dtype == "float32" else "_bf16"
    path = HERE / "results" / f"bank_scaling{suffix}.json"
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
