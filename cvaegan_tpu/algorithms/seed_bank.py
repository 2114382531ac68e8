"""Seed-parallel training: K independent replicas in ONE XLA program.

The reference answers "how stable is this under seeds?" by rerunning its
whole torch pipeline per seed (`scripts/train_cvae_gan.py` — ~minutes of
CPU each). On TPU the per-replica networks are tiny (3-layer 256-wide
MLPs, single-digit-percent MXU utilization), so the idle hardware can
train MANY replicas for the price of one: `SeedBank` stacks K per-seed
network/optimizer states into one pytree with a leading seed axis and
`jax.vmap`s the SAME fused epoch every trainer already compiles
(`base.GenerativeTrainer._epoch_body`) over that axis. One dispatch per
epoch chunk trains all K replicas; XLA turns the vmapped MLP matmuls
into batched matmuls that finally fill the MXU.

RNG parity is exact by construction: each replica is a real trainer
instance whose key stream (`PRNGKey(seed)` -> `fold_in` counter) is
consumed in the same order as a serial `fit` — build at counter 1, fit
key at counter 2, the same per-chunk/per-epoch `jax.random.split`
cascade inside the runner. Per-seed losses therefore match K serial
fits up to vmap-batching float reassociation (see
`tests/test_seed_bank.py`).

Typical use (the multi-seed study, `experiments/ours_multiseed.py`):

    bank = SeedBank(CVAEGAN, seeds=range(30), balanced_mode=True)
    trainers = bank.fit(datasets)          # one dataset or one per seed
    trainers[7].generate_qualified_samples(2, 100)   # full per-seed API

Epoch-cadenced host diagnostics (`_on_chunk_end` hooks: TMG-GAN scatter
snapshots, RAIN-GAN attention history) are SKIPPED in bank mode — they
are per-replica host work; serial `fit` remains the path for those.

The replica axis is embarrassingly data-parallel: pass `mesh=` (a
`parallel.mesh.make_mesh` ('data','model') mesh) and the stacked
state/data/keys are sharded over the mesh's 'data' axis — each device
trains `K / n_data` replicas with ZERO collectives (replicas never
communicate), so seed-parallel throughput scales linearly with chips.
Measured single-chip saturation is K≈16 (`experiments/bank_scaling.py`),
so a bank of 128 seeds on an 8-chip v5e slice runs at the same
wall-clock as 16 seeds on one chip.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cvaegan_tpu.core import config as config_lib
from cvaegan_tpu.data.sampler import ClassIndex


def _stack(trees: Sequence[Any]):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _row(tree: Any, k: int):
    return jax.tree.map(lambda x: x[k], tree)


class SeedBank:
    """Train K same-architecture replicas (one per seed) concurrently.

    Parameters mirror the trainer constructor; `cls` is any of the 11
    algorithm classes. After `fit`, `self.trainers[k]` is a fully
    trained, independently usable trainer for `seeds[k]` (generation,
    qualified filtering, reconstruction, checkpointing, warm-starting a
    downstream classifier — the whole per-trainer API).
    """

    def __init__(self, cls, seeds: Sequence[int],
                 settings: Optional[config_lib.Settings] = None,
                 balanced_mode: bool = False, ema_filter: bool = False,
                 mesh=None):
        if len(seeds) == 0:
            raise ValueError("SeedBank needs at least one seed")
        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            if len(seeds) % n_data:
                raise ValueError(
                    f"{len(seeds)} seeds do not divide the mesh's "
                    f"'data' axis ({n_data})")
        self.mesh = mesh
        self.seeds = list(seeds)
        self.settings = settings or config_lib.settings
        try:
            self.trainers = [cls(seed=s, settings=self.settings,
                                 balanced_mode=balanced_mode,
                                 ema_filter=ema_filter)
                             for s in self.seeds]
        except (TypeError, ValueError):
            if balanced_mode or ema_filter:
                raise
            self.trainers = [cls(seed=s, settings=self.settings)
                             for s in self.seeds]
        #: wall-clock seconds of the last jitted bank run (compile +
        #: execution of every chunk dispatch, host sync included).
        self.fit_seconds: float = 0.0
        #: aggregate optimizer steps/sec across all replicas in the last
        #: `fit` (the bench headline; 0 until fit runs).
        self.steps_per_sec: float = 0.0

    # ------------------------------------------------------------------ fit
    def fit(self, datasets) -> List[Any]:
        """Train all replicas; `datasets` is one dataset (shared by every
        replica) or a sequence of exactly `len(seeds)` datasets (the
        multi-seed-study protocol: per-seed fixtures). Returns
        `self.trainers`.

        Calling `fit` again on an already-fitted bank CONTINUES training
        from the trained replica states for another `settings.gan.epochs`
        (each trainer's `_prepare` keeps non-None state), mirroring the
        serial trainers' `fit` semantics. To restart from scratch,
        construct a fresh `SeedBank`. bench.py exploits the continuation:
        its second `bank.fit` reuses the compiled runner for a
        steady-state timing, at the cost of doubling the trained epochs."""
        t0 = time.time()
        if not isinstance(datasets, (list, tuple)):
            datasets = [datasets] * len(self.trainers)
        if len(datasets) != len(self.trainers):
            raise ValueError(
                f"{len(self.trainers)} seeds but {len(datasets)} datasets")

        # Serial per-seed prepare/build: bit-identical to each serial
        # fit's initialization (same key stream order), and trivially
        # cheap next to training.
        for t, ds in zip(self.trainers, datasets):
            t._prepare(ds)
        template = self.trainers[0]
        shapes = {tuple(t._data["samples"].shape) for t in self.trainers}
        if len(shapes) != 1:
            raise ValueError(
                f"replica train sets must share one shape, got {shapes}")
        if len({t.label_num for t in self.trainers}) != 1:
            raise ValueError("replica datasets must share label_num")

        # Per-seed class mixes give per-seed index-table widths; pad all
        # tables to the widest so the stacked pytree is rectangular
        # (conditional sampling only ever reads the first `counts[c]`
        # columns, so padding is invisible to the math).
        width = max(int(t._data["index"].table.shape[1])
                    for t in self.trainers)
        data = _stack([
            {**t._data,
             "index": ClassIndex.build(np.asarray(t._data["labels"]),
                                       t.label_num, pad_to=width)}
            for t in self.trainers
        ])
        state = _stack([t.state for t in self.trainers])
        keys = jnp.stack([t._next_key() for t in self.trainers])

        if self.mesh is not None:
            # Shard the replica (leading) axis over 'data'; replicas are
            # independent, so the partitioned program has no collectives.
            from jax.sharding import NamedSharding, PartitionSpec as P

            def shard_replica_axis(tree):
                def put(x):
                    spec = (P("data") if getattr(x, "ndim", 0) >= 1
                            else P())
                    return jax.device_put(
                        x, NamedSharding(self.mesh, spec))

                return jax.tree.map(put, tree)

            state = shard_replica_axis(state)
            data = shard_replica_axis(data)
            keys = shard_replica_axis(keys)

        epochs = template.gan_cfg.epochs
        chunk = max(1, min(template.epoch_chunk, epochs))
        run_chunk = self._chunk_runner(template)

        all_losses = {k: [] for k in template.loss_keys}
        e = 0
        while e < epochs:
            n = min(chunk, epochs - e)
            # per-seed `key, sub = split(key)` — the serial cascade,
            # vmapped over the seed axis
            ks = jax.vmap(jax.random.split)(keys)
            keys, subs = ks[:, 0], ks[:, 1]
            state, losses = run_chunk(state, subs, jnp.int32(e), data,
                                      n_epochs=n)
            losses = jax.device_get(losses)  # leaves [n, K]
            for k in template.loss_keys:
                all_losses[k].append(np.asarray(losses[k]))
            e += n

        # Unstack: hand each trainer its replica's final state + history.
        for i, t in enumerate(self.trainers):
            t.state = _row(state, i)
            t._clear_gen_caches()
            for k in t.loss_keys:
                t.loss_history[k].extend(
                    np.concatenate([c[:, i] for c in all_losses[k]]).tolist())

        self.fit_seconds = time.time() - t0
        steps = (epochs * template._class_rounds()
                 * (template.gan_cfg.d_loop_num + template.gan_cfg.c_loop_num
                    + template.gan_cfg.g_loop_num) * len(self.trainers))
        self.steps_per_sec = steps / max(self.fit_seconds, 1e-9)
        return self.trainers

    def _chunk_runner(self, template):
        # keyed on the compute-dtype policy (ADVICE r4): the vmapped
        # epoch body reads it at trace time, so a policy flip between
        # fit() calls must re-trace, not reuse the old-precision program.
        from cvaegan_tpu.models.layers import compute_dtype

        dt = str(compute_dtype())
        cached = getattr(self, "_run_chunk_fn", None)
        fn = cached[1] if cached is not None and cached[0] == dt else None
        if fn is None:
            @functools.partial(jax.jit, static_argnames=("n_epochs",),
                               donate_argnums=(0,))
            def run_chunk(state, keys, epoch0, data, n_epochs):
                def body(carry, i):
                    state, keys = carry
                    ks = jax.vmap(jax.random.split)(keys)
                    keys2, subs = ks[:, 0], ks[:, 1]

                    def one(s, d, k):
                        s, losses = template._epoch_body(s, d, epoch0 + i, k)
                        if "classifier_ema" in s:  # EMA filter slot
                            dec = template.ema_decay
                            s = {**s, "classifier_ema": jax.tree.map(
                                lambda e, p: dec * e + (1 - dec) * p,
                                s["classifier_ema"],
                                s["classifier"].params)}
                        return s, losses

                    state, losses = jax.vmap(one)(state, data, subs)
                    return (state, keys2), losses

                (state, _), losses = jax.lax.scan(
                    body, (state, keys), jnp.arange(n_epochs))
                # scan stacks epochs in front: leaves [n_epochs, K]
                return state, losses

            fn = run_chunk
            self._run_chunk_fn = (dt, fn)
        return fn
