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
  * seed_bank_16x_steps_per_sec — aggregate rate of 16 vmapped full fits
Device rate = two-point timing (a long and a short scan of generation
batches inside ONE jitted call each); the difference cancels the ~1s
per-dispatch host/tunnel overhead that would otherwise dominate.

Baselines: torch reference measured on this machine's CPU at 130.25
train steps/sec and ~225k generated samples/sec (BASELINE.md).
vs_baseline = ours / reference for the primary metric.

Prints exactly ONE JSON line — on EVERY path. Hang hardening (round-3
incident: the axon TPU relay died and device init BLOCKS inside the
axon client instead of raising, so the round artifact was rc=124 with
no JSON): the measurement runs in a worker subprocess under a hard
deadline; the parent process never imports jax, catches SIGTERM/SIGINT
(the driver's `timeout` sends TERM first), and emits a JSON line with
an "error" field if the worker hangs, crashes, or the driver times us
out — `parsed` can never be null again.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REF_CPU_STEPS_PER_SEC = 130.25   # torch reference, same fixture/machine
REF_CPU_GEN_PER_SEC = 225_000.0  # torch generate_samples, same machine

GEN_BATCH = 8192

# Parent-side budgets (seconds). The relay probe is short — if the relay
# is down it either comes back quickly after a host restore or not at
# all; burning 600s probing (round 3) only ate the driver's timeout.
# Env overrides exist for testing the supervisor paths quickly.
RELAY_PROBE_BUDGET = float(os.environ.get("BENCH_RELAY_PROBE", 180.0))
WORKER_DEADLINE = float(os.environ.get("BENCH_WORKER_DEADLINE", 1500.0))
RETRY_SLEEP = float(os.environ.get("BENCH_RETRY_SLEEP", 60.0))
GLOBAL_BUDGET = float(os.environ.get("BENCH_GLOBAL_BUDGET", 2850.0))


# --------------------------------------------------------------------------
# Worker: the actual measurement (runs in a subprocess; may import jax).
# --------------------------------------------------------------------------

def _gen_rate(m, fused: bool):
    """Steady-state generator throughput -> (samples/sec, mode).

    mode is "two-point" (device rate, dispatch overhead cancelled) or
    "fallback" (single-point rate including ~1s dispatch overhead, used
    when host jitter inverted the two-point delta 3x) — recorded in the
    JSON line so degraded numbers are identifiable in the bench history.
    """
    import jax
    import jax.numpy as jnp

    from cvaegan_tpu.kernels import fused_mlp as fused_k

    labels = jnp.zeros((GEN_BATCH,), jnp.int32)
    onehot = jax.nn.one_hot(labels, m.label_num)
    z_size = m.gan_cfg.z_size
    interpret = jax.default_backend() != "tpu"  # Pallas CPU needs interpret

    def run(state, key, n):
        def body(acc, k):
            z = jax.random.normal(k, (GEN_BATCH, z_size))
            if fused:
                x = fused_k.fast_generator_forward(state["generator"], z,
                                                   onehot,
                                                   interpret=interpret)
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


def worker_main() -> None:
    import jax

    # Test-only escape hatch: the axon sitecustomize pins the platform
    # via jax.config at interpreter start, so JAX_PLATFORMS=cpu in the
    # env does NOT stick — only a config update after import does.
    forced = os.environ.get("BENCH_FORCE_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    # program; first fit compiles, the second fit on the same bank object
    # CONTINUES training (SeedBank.fit keeps trained state, documented)
    # and reuses the jitted runner — steady state, same warmup pattern as
    # the primary metric; the timed work per fit is identical.
    # Skipped on the relay-down CPU fallback: 16 full CPU fits would blow
    # the worker deadline (the flag on the JSON line explains the 0).
    bank_rate = 0.0
    if not os.environ.get("BENCH_RELAY_DOWN"):
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
        "device": jax.devices()[0].platform,
        **({"relay_down": True,
            "error": "axon TPU relay unreachable; this is a CPU-fallback "
                     "measurement, not the TPU number"}
           if os.environ.get("BENCH_RELAY_DOWN") else {}),
    }), flush=True)


# --------------------------------------------------------------------------
# Parent: deadline supervisor. Never imports jax; always prints one JSON.
# --------------------------------------------------------------------------

def _error_line(msg: str) -> str:
    return json.dumps({
        "metric": "cvae_gan_train_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "steps/sec",
        "vs_baseline": 0.0,
        "error": msg,
    })


def _await_axon_tunnel(max_wait: float) -> bool:
    """If this host reaches the TPU through the axon TCP relay, wait
    (briefly) for the relay to accept connections before starting the
    worker. Returns True if the relay answered (or none is needed).

    The relay process occasionally dies (round 3: device init then
    BLOCKS inside the axon client instead of raising). The worker's
    hard deadline is the real protection; this probe just avoids
    paying a worker spawn + kill cycle when the relay is briefly down.
    """
    import socket

    forced = os.environ.get("BENCH_FORCE_PLATFORM", "")
    if forced and "axon" not in forced:
        return True  # platform forced away from axon (tests)
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return True  # real local devices / CPU runs: no relay to probe
    deadline = time.time() + max_wait
    while time.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=5):
                return True
        except OSError:
            print("bench: axon relay port 8082 not accepting; waiting...",
                  file=sys.stderr, flush=True)
            time.sleep(10)
    print(f"bench: axon relay still unreachable after {max_wait:.0f}s; "
          "starting worker anyway (hard deadline applies)",
          file=sys.stderr, flush=True)
    return False


class _Supervisor:
    def __init__(self) -> None:
        self.t0 = time.time()
        self.child: subprocess.Popen | None = None
        self.done = False

    def emit_and_exit(self, msg: str) -> None:
        if not self.done:
            self.done = True
            print(_error_line(msg), flush=True)
        self.kill_child()
        os._exit(0)

    def kill_child(self) -> None:
        c = self.child
        if c is not None and c.poll() is None:
            try:
                os.killpg(c.pid, signal.SIGKILL)
            except OSError:
                pass

    def remaining(self) -> float:
        return GLOBAL_BUDGET - (time.time() - self.t0)

    def run_worker(self, deadline: float) -> tuple[int | None, str]:
        """Run one worker attempt; return (returncode, last json line)."""
        self.child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE, stderr=None, text=True,
            start_new_session=True,
        )
        try:
            out, _ = self.child.communicate(timeout=deadline)
        except subprocess.TimeoutExpired:
            self.kill_child()
            try:
                self.child.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass
            return None, ""
        last_json = ""
        for line in (out or "").splitlines():
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                last_json = line
        return self.child.returncode, last_json


def parent_main() -> None:
    sup = _Supervisor()

    def on_signal(signum, frame):  # driver timeout sends TERM before KILL
        sup.emit_and_exit(f"killed by signal {signum} after "
                          f"{time.time() - sup.t0:.0f}s (driver timeout?)")

    for s in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        signal.signal(s, on_signal)

    relay_ok = _await_axon_tunnel(min(RELAY_PROBE_BUDGET,
                                      sup.remaining() - 60))
    if not relay_ok and not os.environ.get("BENCH_FORCE_PLATFORM"):
        # The TPU is unreachable (relay dead — round-3 incident). A
        # device-init attempt would burn the whole deadline blocking in
        # the axon client, so fall back to a REAL measurement on CPU,
        # explicitly flagged: the JSON line carries `relay_down` and
        # `device: cpu` so the number is attributable and the round
        # artifact is never an error-only line when the host TPU
        # plumbing is the thing that broke.
        os.environ["BENCH_FORCE_PLATFORM"] = "cpu"
        os.environ["BENCH_RELAY_DOWN"] = "1"
        print("bench: axon relay down — measuring on CPU fallback "
              "(flagged in the JSON line)", file=sys.stderr, flush=True)

    attempt = 0
    last_msg = "global budget exhausted before any worker attempt"
    while sup.remaining() > 120 and attempt < 2:
        attempt += 1
        deadline = min(WORKER_DEADLINE, sup.remaining() - 30)
        rc, line = sup.run_worker(deadline)
        if rc == 0 and line:
            print(line, flush=True)
            sup.done = True
            return
        if rc is None:
            last_msg = (f"worker hung past {deadline:.0f}s deadline "
                        f"(attempt {attempt}; axon relay down?)")
        else:
            last_msg = f"worker exited rc={rc} (attempt {attempt})"
            if line:  # worker printed its own error JSON — keep its message
                try:
                    last_msg += ": " + json.loads(line).get("error", "")
                except (ValueError, AttributeError):
                    pass
        print(f"bench: {last_msg}", file=sys.stderr, flush=True)
        if sup.remaining() > deadline / 2 + RETRY_SLEEP + 120 and attempt < 2:
            time.sleep(RETRY_SLEEP)  # axon tunnel occasionally heals
        else:
            break
    sup.emit_and_exit(last_msg)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        try:
            worker_main()
        except BaseException as e:  # noqa: BLE001 — must still emit JSON
            print(_error_line(f"{type(e).__name__}: {e}"), flush=True)
            raise SystemExit(1)
    else:
        parent_main()
