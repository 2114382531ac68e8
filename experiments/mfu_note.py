"""MFU / roofline accounting for the fused CVAE-GAN epoch (VERDICT r2
item 8).

FLOP accounting is ANALYTIC, derived from the live parameter pytrees
(matmul kernels only: 2*B*in*out per forward) times the exact strict-mode
step schedule — XLA's `compiled.cost_analysis()` cannot be used here:
it counts each `lax.scan` body ONCE, not times the trip count, and the
fused epoch is nested scans (epochs -> classes -> d/c/g loops), so it
under-reports by ~1000x (measured: 4.3 MFLOP/"epoch" on both the CPU
and axon-TPU backends vs ~8.5 GFLOP analytic).

Schedule coefficients (per epoch = 5 classes x (5 d + 5 c + 3 g steps),
backward ~= 2x the traversed forward, `algorithms/cvae_gan.py:83-228`):
  d_step: G fwd (no grad) + D fwd on real&fake + D bwd  = G + 6D
  c_step: G fwd (no grad) + C fwd on 2B concat + C bwd  = G + 6C
  g_step: [E + 2G + D + C] fwd + bwd through all        = 3E + 6G + 3D + 3C
  per epoch: 45*E_f + 140*G_f + 195*D_f + 195*C_f       (~8.5 GFLOP here)

HBM traffic is reported as a documented LOWER BOUND: optimizer updates
move weights + Adam m/v (read+write each = 6 floats/param) plus gradient
write/read (2), i.e. ~32 B/param/update, activations and loss-side
traffic excluded.

Reports measured steady-state epochs/sec (two-point timing, dispatch
overhead cancelled), achieved TFLOP/s, % of v5e peak (197 TFLOP/s bf16),
and the same for the 16-replica SeedBank program — the designed way to
spend the idle MXU.

Usage (TPU, serialize): python experiments/mfu_note.py
"""

import argparse
import json
import pathlib
import sys
import time

V5E_PEAK_TFLOPS = 197.0   # bf16 MXU peak per chip
V5E_HBM_GBPS = 819.0

HERE = pathlib.Path(__file__).parent

# forward-pass multiplicity per net per epoch (derivation in module doc)
SCHEDULE = {"encoder": 45, "generator": 140,
            "discriminator": 195, "classifier": 195}
# optimizer-touched updates per net per epoch: each of the 5 classes
# updates D 5x, C 5x, and (E,G) 3x
UPDATES = {"encoder": 15, "generator": 15,
           "discriminator": 25, "classifier": 25}


def _kernel_elems(params) -> int:
    """Total matmul-kernel elements (bias/BN vectors excluded)."""
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf.ndim == 2:
            total += int(leaf.size)
    return total


def analytic_epoch_cost(state, batch: int):
    """(flops, hbm_bytes_lower_bound) for ONE strict fused epoch."""
    import jax

    flops = 0.0
    traffic = 0.0
    for net, mult in SCHEDULE.items():
        k = _kernel_elems(state[net].params)
        fwd = 2.0 * batch * k
        flops += mult * fwd
        n_params = sum(int(l.size)
                       for l in jax.tree.leaves(state[net].params))
        traffic += UPDATES[net] * 32.0 * n_params
    return flops, traffic


def build_programs():
    """The two jitted programs (single fused epoch, 16x bank epoch) plus
    concrete example args."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(HERE.parent))
    from cvaegan_tpu import CVAEGAN, SeedBank
    from cvaegan_tpu.core import config as cl
    from cvaegan_tpu.data.tabular import TabularDataset
    import cvaegan_tpu.algorithms.seed_bank as sb

    ds = TabularDataset.synthetic_blobs(seed=0)
    cl.settings.gan.epochs = 500

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

    bank = SeedBank(CVAEGAN, seeds=range(16))
    for t in bank.trainers:
        t.verbose = False
        t._prepare(ds)
    template = bank.trainers[0]
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

    batch = cl.settings.gan.batch_size
    return (epochs_program, m.state), (bank_program, stacked), batch


def measure(tag, run_fn, n_short=20, n_long=220, flops_per_unit=None,
            bytes_per_unit=None):
    """Two-point steady-state rate of `run_fn(n)` units; returns dict."""
    import jax

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
        rec["hbm_gbytes_per_unit_lb"] = round(bytes_per_unit / 1e9, 4)
        rec["achieved_gbps_lb"] = round(bw / 1e9, 1)
        rec["hbm_pct_lb"] = round(100 * bw / (V5E_HBM_GBPS * 1e9), 1)
    return rec


def main():
    argparse.ArgumentParser().parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    (single_fn, single_state), (bank_fn, bank_stacked), batch = \
        build_programs()
    flops, traffic = analytic_epoch_cost(single_state, batch)

    fn_nd = jax.jit(single_fn, static_argnames=("n",))  # non-donating

    def run_units(n):
        return fn_nd(single_state, jax.random.PRNGKey(1), n=n)

    out = [measure("cvae_gan_strict_epoch", run_units,
                   flops_per_unit=flops, bytes_per_unit=traffic)]

    bfn = jax.jit(bank_fn, static_argnames=("n",))

    def run_bank(n):
        return bfn(bank_stacked, jax.random.PRNGKey(1), n=n)

    out.append(measure("seed_bank_16x_epoch", run_bank,
                       flops_per_unit=16 * flops,
                       bytes_per_unit=16 * traffic))

    for rec in out:
        print(json.dumps(rec), flush=True)
    path = HERE / "results" / "mfu_note.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
