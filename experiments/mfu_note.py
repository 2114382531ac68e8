"""MFU / roofline accounting for the fused CVAE-GAN epoch (VERDICT r2
item 8).

Reports, for the flagship strict-mode fused epoch on the blob fixture
(batch 128, z 128, 5 classes x 13 optimizer steps):
  * XLA's own FLOP count for the compiled program
    (`compiled.cost_analysis()['flops']`) and bytes accessed,
  * measured steady-state epochs/sec (two-point timing over one jitted
    scan, dispatch overhead cancelled),
  * achieved TFLOP/s and % of v5e peak (197 TFLOP/s bf16 — jax fp32
    matmuls on TPU run DEFAULT precision: bf16 multiplies, fp32
    accumulate),
  * the same for the 16-replica SeedBank program (the designed way to
    spend the idle MXU),
  * arithmetic intensity (FLOPs/byte) -> whether the step is compute- or
    HBM-bound on the ~819 GB/s v5e.

Usage (TPU, serialize): python experiments/mfu_note.py
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

V5E_PEAK_TFLOPS = 197.0   # bf16 MXU peak per chip
V5E_HBM_GBPS = 819.0

HERE = pathlib.Path(__file__).parent


def measure(tag, run_fn, n_short=20, n_long=220, flops_per_unit=None,
            bytes_per_unit=None):
    """Two-point steady-state rate of `run_fn(n)` units; returns dict."""
    jax.device_get(run_fn(n_short))
    jax.device_get(run_fn(n_long))
    rate = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run_fn(n_short))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(run_fn(n_long))
        t_l = time.perf_counter() - t0
        if t_l > t_s:
            rate = (n_long - n_short) / (t_l - t_s)
            break
    if rate is None:
        rate = n_long / t_l
    rec = {"tag": tag, "units_per_sec": round(rate, 2)}
    if flops_per_unit:
        achieved = rate * flops_per_unit
        rec["gflops_per_unit"] = round(flops_per_unit / 1e9, 3)
        rec["achieved_tflops"] = round(achieved / 1e12, 4)
        rec["mfu_pct"] = round(100 * achieved / (V5E_PEAK_TFLOPS * 1e12), 3)
    if bytes_per_unit:
        bw = rate * bytes_per_unit
        rec["gbytes_per_unit"] = round(bytes_per_unit / 1e9, 4)
        rec["achieved_gbps"] = round(bw / 1e9, 1)
        rec["hbm_pct"] = round(100 * bw / (V5E_HBM_GBPS * 1e9), 1)
    if flops_per_unit and bytes_per_unit:
        rec["arith_intensity"] = round(flops_per_unit / bytes_per_unit, 2)
    return rec


def main():
    argparse.ArgumentParser().parse_args()
    import sys

    sys.path.insert(0, str(HERE.parent))
    from cvaegan_tpu import CVAEGAN, SeedBank
    from cvaegan_tpu.core import config as cl
    from cvaegan_tpu.data.tabular import TabularDataset

    ds = TabularDataset.synthetic_blobs(seed=0)
    cl.settings.gan.epochs = 500
    out = []

    # ---- single-model fused epoch --------------------------------------
    m = CVAEGAN()
    m.verbose = False
    m._prepare(ds)

    def epochs_program(state, key, n):
        def body(carry, i):
            s, k = carry
            k, sub = jax.random.split(k)
            s, _ = m._epoch_body(s, m._data, i, sub)
            return (s, k), ()

        (state, _), _ = jax.lax.scan(body, (state, key), jnp.arange(n))
        return state

    fn_nd = jax.jit(epochs_program, static_argnames=("n",))  # non-donating
    cost = fn_nd.lower(m.state, jax.random.PRNGKey(0),
                       n=100).compile().cost_analysis()
    per_epoch_flops = float(cost.get("flops", 0.0)) / 100
    per_epoch_bytes = float(cost.get("bytes accessed", 0.0)) / 100

    state = m.state

    def run_units(n):
        return fn_nd(state, jax.random.PRNGKey(1), n=n)

    out.append(measure("cvae_gan_strict_epoch", run_units,
                       flops_per_unit=per_epoch_flops,
                       bytes_per_unit=per_epoch_bytes))

    # ---- 16-replica seed bank ------------------------------------------
    bank = SeedBank(CVAEGAN, seeds=range(16))
    for t in bank.trainers:
        t.verbose = False
    bank.fit(ds)           # builds + trains once (compile)
    template = bank.trainers[0]
    import cvaegan_tpu.algorithms.seed_bank as sb

    stacked = sb._stack([t.state for t in bank.trainers])
    data = sb._stack([t._data for t in bank.trainers])

    def bank_program(state, key, n):
        def body(carry, i):
            s, k = carry
            ks = jax.random.split(k, 17)
            k, subs = ks[0], ks[1:]
            s = jax.vmap(
                lambda ss, dd, kk: template._epoch_body(ss, dd, i, kk)[0]
            )(s, data, subs)
            return (s, k), ()

        (state, _), _ = jax.lax.scan(body, (state, key), jnp.arange(n))
        return state

    bfn = jax.jit(bank_program, static_argnames=("n",))
    bcost = bfn.lower(stacked, jax.random.PRNGKey(0),
                      n=100).compile().cost_analysis()
    bflops = float(bcost.get("flops", 0.0)) / 100
    bbytes = float(bcost.get("bytes accessed", 0.0)) / 100

    def run_bank(n):
        return bfn(stacked, jax.random.PRNGKey(1), n=n)

    out.append(measure("seed_bank_16x_epoch", run_bank,
                       flops_per_unit=bflops, bytes_per_unit=bbytes))

    for rec in out:
        print(json.dumps(rec), flush=True)
    path = HERE / "results" / "mfu_note.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
