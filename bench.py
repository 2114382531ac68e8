"""Benchmark: CVAE-GAN training-step + generation throughput on one TPU chip.

Protocol (matches the reference's implicit envelope, BASELINE.md):
blob fixture (1000x30, 5 classes), batch 128, z 128, per-class
(5 D + 5 C + 3 G) = 65 optimizer steps per epoch. We time steady-state
fused-epoch execution (compile excluded) and report steps/sec as the
primary metric; the same JSON line also carries:
  * gen_samples_per_sec        — XLA generator path, device rate
  * gen_samples_per_sec_fused  — Pallas fused-MLP kernel path, device rate
  * qualified_yield            — generate_qualified_samples survivors at
                                 the default 0.5 threshold (x/250)
Device rate = two-point timing (a long and a short scan of generation
batches inside ONE jitted call each); the difference cancels the ~1s
per-dispatch host/tunnel overhead that would otherwise dominate.

Baselines: torch reference measured on this machine's CPU at 130.25
train steps/sec and ~225k generated samples/sec (BASELINE.md).
vs_baseline = ours / reference for the primary metric.

Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_CPU_STEPS_PER_SEC = 130.25   # torch reference, same fixture/machine
REF_CPU_GEN_PER_SEC = 225_000.0  # torch generate_samples, same machine

GEN_BATCH = 8192


def _gen_rate(m, fused: bool):
    """Steady-state generator throughput -> (samples/sec, mode).

    mode is "two-point" (device rate, dispatch overhead cancelled) or
    "fallback" (single-point rate including ~1s dispatch overhead, used
    when host jitter inverted the two-point delta 3x) — recorded in the
    JSON line so degraded numbers are identifiable in the bench history.
    """
    from cvaegan_tpu.kernels import fused_mlp as fused_k

    labels = jnp.zeros((GEN_BATCH,), jnp.int32)
    onehot = jax.nn.one_hot(labels, m.label_num)
    z_size = m.gan_cfg.z_size

    def run(state, key, n):
        def body(acc, k):
            z = jax.random.normal(k, (GEN_BATCH, z_size))
            if fused:
                x = fused_k.fast_generator_forward(state["generator"], z,
                                                   onehot)
            else:
                x = m._generator_forward(state, z, labels, None)
            return acc + jnp.mean(x), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jax.random.split(key, n))
        return acc

    fn = jax.jit(run, static_argnames=("n",))
    key = jax.random.PRNGKey(0)
    n_short, n_long = 50, 550
    jax.device_get(fn(m.state, key, n=n_short))  # compile warmups
    jax.device_get(fn(m.state, key, n=n_long))
    for _ in range(3):  # host jitter can invert the two-point delta; retry
        t0 = time.perf_counter()
        jax.device_get(fn(m.state, key, n=n_short))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(fn(m.state, key, n=n_long))
        t_long = time.perf_counter() - t0
        if t_long > t_short:
            return (n_long - n_short) * GEN_BATCH / (t_long - t_short), \
                "two-point"
    # conservative fallback: single-point rate incl. dispatch overhead
    return n_long * GEN_BATCH / t_long, "fallback"


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

    # ---- generation throughput + qualified yield (VERDICT r1 item 5) ----
    gen_xla, gen_mode = _gen_rate(m, fused=False)
    gen_fused, gen_fused_mode = _gen_rate(m, fused=True)
    gen_rate_mode = (gen_mode if gen_mode == gen_fused_mode
                     else f"{gen_mode}/{gen_fused_mode}")
    yield_n = sum(
        len(m.generate_qualified_samples(c, 50)) for c in range(ds.label_num)
    )
    # Strict mode (reference parity) has documented seed-to-seed yield
    # variance (BASELINE.md); balanced mode is the robust scheme — report
    # both so the single JSON line carries the stable number too.
    m_bal = CVAEGAN(balanced_mode=True)
    m_bal.verbose = False
    m_bal.fit(ds)
    yield_bal = sum(
        len(m_bal.generate_qualified_samples(c, 50))
        for c in range(ds.label_num)
    )

    # ---- seed-parallel bank: aggregate steps/sec (VERDICT r2 item 1) ----
    # 16 replicas of the full 500-epoch strict fit vmapped into one XLA
    # program; first fit compiles, the re-fit on the same bank object
    # reuses the jitted runner (steady state, same warmup pattern as the
    # primary metric).
    from cvaegan_tpu.algorithms.seed_bank import SeedBank

    bank = SeedBank(CVAEGAN, seeds=range(16))
    for t in bank.trainers:
        t.verbose = False
    bank.fit(ds)
    bank.fit(ds)
    bank_rate = bank.steps_per_sec

    print(json.dumps({
        "metric": "cvae_gan_train_steps_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "steps/sec",
        "vs_baseline": round(value / REF_CPU_STEPS_PER_SEC, 2),
        "gen_samples_per_sec": round(gen_xla),
        "gen_samples_per_sec_fused": round(gen_fused),
        "gen_vs_baseline": round(max(gen_xla, gen_fused)
                                 / REF_CPU_GEN_PER_SEC, 2),
        "gen_rate_mode": gen_rate_mode,
        "qualified_yield": f"{yield_n}/250",
        "qualified_yield_balanced": f"{yield_bal}/250",
        "seed_bank_16x_steps_per_sec": round(bank_rate, 2),
        "seed_bank_vs_baseline": round(bank_rate / REF_CPU_STEPS_PER_SEC, 2),
    }))


def _await_axon_tunnel(max_wait: float = 600.0) -> None:
    """If this host reaches the TPU through the axon TCP relay, wait for
    the relay to accept connections before initialising jax.

    The relay process occasionally dies (observed round 3: device init
    then BLOCKS inside the axon client instead of raising, so the
    existing retry-on-exception path never fires). Probing the relay
    port and giving it a healing window turns that hang into a normal
    run when the host restores the relay; if the port never opens we
    proceed anyway (identical worst case, plus a diagnosable stderr
    line) — never a false failure on non-relay setups.
    """
    import os
    import socket
    import sys

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return  # real local devices / CPU runs: no relay to probe
    deadline = time.time() + max_wait
    while time.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=5):
                return
        except OSError:
            print("bench: axon relay port 8082 not accepting; waiting...",
                  file=sys.stderr)
            time.sleep(15)
    print("bench: axon relay still unreachable after "
          f"{max_wait:.0f}s; attempting device init anyway", file=sys.stderr)


if __name__ == "__main__":
    _await_axon_tunnel()
    try:
        main()
    except Exception as e:  # axon tunnel occasionally drops; retry once
        import sys
        import time as _time

        print(f"bench attempt failed ({type(e).__name__}); retrying in 120s",
              file=sys.stderr)
        _time.sleep(120)
        main()
