"""Uniform trainer API shared by all 11 algorithms.

Reference API parity (`src/cvae_gan.py:59,339,347,380,263`):
  fit(dataset), generate_samples(label, num),
  generate_qualified_samples(label, num, threshold),
  reconstruct_samples(samples, labels), loss_history, plot_loss_history().

TPU-native execution model (NOT the reference's python-loop design):
  * `fit` compiles the entire per-class alternating-update epoch into one
    XLA program (`lax.scan` over classes, `lax.scan` over inner D/C/G
    loops) and scans it over epochs — the reference dispatches ~65 tiny
    optimizer steps per epoch from python (`src/cvae_gan.py:100-216`);
    we dispatch once per training run (per `epoch_chunk` epochs).
  * Class-conditional batches come from an on-device padded index table
    (see `cvaegan_tpu.data.sampler`).
  * `generate_qualified_samples` does batched on-device rejection
    sampling instead of the reference's <=10-at-a-time host round trip
    (`src/cvae_gan.py:347-378`), while preserving the observable
    semantics: confidence threshold, correct-class check, and a
    patience=20 give-up counter on empty candidate batches.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvaegan_tpu.core import config as config_lib
from cvaegan_tpu.data.sampler import ClassIndex
from cvaegan_tpu.data.tabular import TabularDataset


def _as_arrays(dataset) -> Tuple[np.ndarray, np.ndarray]:
    if isinstance(dataset, TabularDataset):
        return dataset.tr_samples, dataset.tr_labels
    if hasattr(dataset, "as_tuple"):  # compat.TrDataset / TeDataset
        x, y = dataset.as_tuple()
        return np.asarray(x, np.float32), np.asarray(y, np.int32)
    if isinstance(dataset, tuple) and len(dataset) == 2:
        return np.asarray(dataset[0], np.float32), np.asarray(dataset[1], np.int32)
    raise TypeError(
        "fit() expects a TabularDataset, a compat TrDataset/TeDataset, or "
        f"an (samples, labels) tuple, got {type(dataset)!r}"
    )


class GenerativeTrainer:
    """Base class. Subclasses set `name`, `config_key`, `loss_keys` and
    implement `_build` and `_epoch_body`."""

    name: str = "base"
    config_key: str = ""
    loss_keys: Tuple[str, ...] = ()
    #: epochs per device dispatch. Each dispatch costs ~1s of host/tunnel
    #: overhead (donated ~100-leaf state pytree), so the default runs the
    #: WHOLE reference training budget in one XLA call; algorithms with
    #: epoch-cadenced host diagnostics (TMG-GAN snapshots) use a smaller
    #: chunk. Progress is still printed every 50 epochs (the reference's
    #: cadence, `src/cvae_gan.py:225`) from the returned loss history.
    epoch_chunk: int = 500
    #: set False to silence per-chunk progress prints (bench mode).
    verbose: bool = True
    #: set to a directory path to auto-save an Orbax checkpoint after every
    #: epoch chunk (restartable training; the reference has no
    #: checkpointing at all, SURVEY.md §5).
    checkpoint_dir = None
    #: False for the unconditional family whose generate_samples(num)
    #: takes no label (VAE/GAN/VAE-GAN, reference `src/vae.py` etc.).
    conditional_sampling: bool = True

    def __init__(self, seed: Optional[int] = None,
                 settings: Optional[config_lib.Settings] = None,
                 balanced_mode: bool = False,
                 ema_filter: bool = False):
        self.settings = settings or config_lib.settings
        self.gan_cfg = self.settings.gan
        #: maintain an exponential moving average of the companion
        #: classifier's params during training and FILTER qualified
        #: samples with it; filter semantics (threshold, correct-class
        #: check, patience=20) and training math are unchanged. Measured
        #: result (BASELINE.md, experiments/yield_ema.py): does NOT fix
        #: strict-mode yield instability (CV 0.55 -> 0.51) — the
        #: instability lives in the generator's conditional outputs, not
        #: the classifier endpoint; `balanced_mode` is the effective fix.
        #: Kept as the recorded attempt + a calibration-style knob.
        self.ema_filter = ema_filter
        self.ema_decay = 0.99  # per-epoch; ~100-epoch averaging window
        #: beyond-parity fast mode for the conditional family: ONE
        #: class-balanced mixed D/C/G round per epoch instead of the
        #: reference's per-class round-robin — same losses, epoch cost
        #: independent of label_num, and (measured) far higher
        #: qualified-sample yield. Ignored by the unconditional family
        #: and TMG-GAN (whose per-class generator bank is intrinsic).
        self.balanced_mode = balanced_mode
        self.hparams = dict(config_lib.MODEL_CONFIGS.get(self.config_key, {}))
        seed = self.settings.seed if seed is None else seed
        self._root_key = jax.random.PRNGKey(seed)
        self._key_counter = 0

        self.feature_num: int = 0
        self.label_num: int = 0
        self.state: Optional[Dict[str, Any]] = None
        self.modules: Dict[str, Any] = {}
        self.txs: Dict[str, Any] = {}
        self._data: Optional[Dict[str, Any]] = None
        self.loss_history: Dict[str, list] = {k: [] for k in self.loss_keys}
        # jitted-closure caches, namespaced by compute-dtype policy —
        # see the `_gen_cache` property.
        self._gen_caches: Dict[str, Dict[Any, Any]] = {}

    @property
    def _gen_cache(self) -> Dict[Any, Any]:
        """Jitted generation/reconstruction closures for the ACTIVE
        compute-dtype policy.

        The policy (`settings.gan.compute_dtype` / `dtype_override`) is
        read at trace time, so a cached program silently pins whatever
        policy was active when it was traced. Namespacing the cache by
        policy (ADVICE r4) makes a mid-process flip re-trace instead of
        reusing stale-precision executables — for every trainer family,
        since subclasses share this property. NOTE: `.clear()` on this
        view empties only the active policy's namespace; sites that
        invalidate because `self.state` changed must use
        `_clear_gen_caches()` to drop every namespace.
        """
        return self._gen_caches.setdefault(self._policy_key(), {})

    def _clear_gen_caches(self) -> None:
        """Drop jitted closures for ALL dtype policies (state changed)."""
        self._gen_caches.clear()

    # ------------------------------------------------------------------ rng
    def _next_key(self) -> jax.Array:
        self._key_counter += 1
        return jax.random.fold_in(self._root_key, self._key_counter)

    # ------------------------------------------------------- subclass hooks
    def _sample_batch(self, key: jax.Array, data: Dict[str, Any], class_id):
        """(x_real, labels) for one conditional update: rows of the target
        class in strict parity mode, a class-balanced mixed batch in
        balanced_mode."""
        from cvaegan_tpu.data.sampler import (
            sample_balanced_batch, sample_class_batch,
        )
        from cvaegan_tpu.parallel.mesh import shard_leading

        cfg = self.gan_cfg
        if self.balanced_mode:
            return sample_balanced_batch(key, data["index"],
                                         data["samples"], cfg.batch_size)
        x = sample_class_batch(key, data["index"], data["samples"],
                               class_id, cfg.batch_size)
        y = shard_leading(jnp.full((cfg.batch_size,), class_id, jnp.int32))
        return x, y

    def _sample_labels(self, key: jax.Array, data: Dict[str, Any], class_id):
        """Label vector for updates that need no real batch (pure
        generator steps): the target class in strict mode, uniform mixed
        labels over the window's PRESENT classes in balanced_mode."""
        from cvaegan_tpu.data.sampler import present_labels
        from cvaegan_tpu.parallel.mesh import shard_leading

        cfg = self.gan_cfg
        if self.balanced_mode:
            return shard_leading(
                present_labels(key, (cfg.batch_size,), data["index"]))
        return shard_leading(jnp.full((cfg.batch_size,), class_id, jnp.int32))

    def _class_rounds(self) -> int:
        """Class-round scan length per epoch: 1 in balanced_mode, else
        one round per class (the reference's round-robin)."""
        return 1 if self.balanced_mode else self.label_num

    def _guard_class_round(self, class_body, data):
        """Wrap a per-class scan body so rounds for classes ABSENT from
        the current data window leave the state untouched (branch-free
        select — one compiled program regardless of the window's class
        mix). Matters only for `fit_streamed`: a time-ordered corpus
        window can legitimately hold zero rows of a rare class, and the
        reference itself skips absent classes (it iterates its per-label
        sample dict, `src/cvae_gan.py:102`). When every class is present
        the select picks the new state bitwise, so in-memory fits are
        unchanged. Balanced mode needs no guard (its single mixed round
        draws labels over PRESENT classes only, `sampler.present_labels`)."""
        if self.balanced_mode:
            return class_body

        def guarded(carry, class_id):
            state0 = carry[0]
            (state, key), losses = class_body(carry, class_id)
            present = data["index"].counts[class_id] > 0
            state = jax.tree.map(
                lambda n, o: jnp.where(present, n, o), state, state0)
            return (state, key), losses

        return guarded

    def _epoch_losses(self, per_class, data):
        """Per-epoch reported losses = the LAST PRESENT class round's
        (the reference records the last class's final G step,
        `src/cvae_gan.py:218-222`; absent-class rounds are masked no-ops
        whose loss values are meaningless). All-present reduces to the
        reference's `[-1]` pick."""
        if self.balanced_mode:
            return jax.tree.map(lambda x: x[-1], per_class)
        counts = data["index"].counts
        idx = (counts.shape[0] - 1) - jnp.argmax((counts > 0)[::-1])
        return jax.tree.map(lambda x: x[idx], per_class)

    def _build(self, key: jax.Array) -> Dict[str, Any]:
        """Create modules/optimizers and return the initial state dict."""
        raise NotImplementedError

    def _build_state(self, key: jax.Array) -> Dict[str, Any]:
        """`_build` + optional EMA-filter slot (params-only copy of the
        companion classifier, updated per epoch in the chunk runner)."""
        state = self._build(key)
        if self.ema_filter and "classifier" in state:
            state["classifier_ema"] = jax.tree.map(
                jnp.array, state["classifier"].params)
        return state

    def _filter_state(self, state):
        """State used by the qualified-sample FILTER: the EMA classifier
        when enabled, the live one otherwise. Works on traced and host
        pytrees alike."""
        if isinstance(state, dict) and "classifier_ema" in state:
            c = state["classifier"]
            return {**state, "classifier": c.replace(
                params=state["classifier_ema"])}
        return state

    def _epoch_body(
        self, state: Dict[str, Any], data: Dict[str, Any], epoch: jnp.ndarray,
        key: jax.Array,
    ) -> Tuple[Dict[str, Any], Dict[str, jnp.ndarray]]:
        """One full training epoch. Returns (new_state, scalar loss dict)."""
        raise NotImplementedError

    # ---------------------------------------------------------------- setup
    def _prepare(self, dataset) -> None:
        samples, labels = _as_arrays(dataset)
        self.feature_num = int(samples.shape[1])
        self.label_num = int(labels.max()) + 1 if labels.size else 0
        self._data = {
            "samples": jnp.asarray(samples),
            "labels": jnp.asarray(labels),
            "index": ClassIndex.build(labels, self.label_num),
        }
        if self.state is None:
            self.state = self._build_state(self._next_key())

    # ------------------------------------------------------------------ fit
    @staticmethod
    def _policy_key() -> str:
        """The active compute-dtype policy as a cache-key component.

        Per-instance jit caches are keyed on this (ADVICE r4): the policy
        is read at TRACE time, so a cached program silently pins the
        policy that was active when it was traced. Keying the caches on
        the policy makes a mid-process flip of
        `settings.gan.compute_dtype` (or a `dtype_override` block)
        re-trace instead of reusing stale-precision executables.
        """
        from cvaegan_tpu.models.layers import compute_dtype

        return str(compute_dtype())

    def _chunk_runner(self):
        """Jitted multi-epoch runner, cached on the trainer (keyed on the
        dtype policy) so repeated fit() calls reuse the trace/executable."""
        dt = self._policy_key()
        cached = getattr(self, "_run_chunk_fn", None)
        fn = cached[1] if cached is not None and cached[0] == dt else None
        if fn is None:
            @functools.partial(jax.jit, static_argnames=("n_epochs",),
                               donate_argnums=(0,))
            def run_chunk(state, key, epoch0, data, n_epochs):
                def body(carry, i):
                    state, key = carry
                    key, sub = jax.random.split(key)
                    state, losses = self._epoch_body(state, data,
                                                     epoch0 + i, sub)
                    if "classifier_ema" in state:  # static (dict key)
                        d = self.ema_decay
                        state = {**state, "classifier_ema": jax.tree.map(
                            lambda e, p: d * e + (1 - d) * p,
                            state["classifier_ema"],
                            state["classifier"].params)}
                    return (state, key), losses

                (state, key), losses = jax.lax.scan(
                    body, (state, key), jnp.arange(n_epochs)
                )
                return state, losses

            fn = run_chunk
            self._run_chunk_fn = (dt, fn)
        return fn

    def fit(self, dataset) -> None:
        self._prepare(dataset)
        self._fit_prepared(self.gan_cfg.epochs)

    def _fit_prepared(self, epochs: int) -> None:
        """Run the jitted epoch loop against the already-built
        `self._data`/`self.state` (shared by `fit` and `fit_streamed`)."""
        chunk = max(1, min(self.epoch_chunk, epochs))
        run_chunk = self._chunk_runner()
        state = self.state
        key = self._next_key()
        e = 0
        while e < epochs:
            n = min(chunk, epochs - e)
            key, sub = jax.random.split(key)
            state, losses = run_chunk(state, sub, jnp.int32(e), self._data, n_epochs=n)
            losses = jax.device_get(losses)
            for k in self.loss_keys:
                self.loss_history[k].extend(np.asarray(losses[k]).tolist())
            if self.verbose and self.loss_keys:
                for i in range(0, n, 50):
                    head = ", ".join(
                        f"{k}: {float(np.asarray(losses[k])[i]):.4f}"
                        for k in self.loss_keys
                    )
                    print(f"{self.name} epoch {e + i}/{epochs}, {head}")
            e += n
            if self.checkpoint_dir is not None:
                from cvaegan_tpu.utils.checkpoint import save_checkpoint

                self.state = state
                save_checkpoint(self, self.checkpoint_dir)
            if hasattr(self, "_on_chunk_end"):
                # Expose the freshly-trained state to generation APIs used
                # inside the hook (e.g. TMG-GAN scatter snapshots).
                self.state = state
                self._clear_gen_caches()
                self._on_chunk_end(e)
        self.state = state
        # Invalidate jitted generation closures captured over the old state.
        self._clear_gen_caches()

    def fit_streamed(
        self,
        x_csv,
        y_csv,
        window_rows: int = 1_000_000,
        epochs_per_window: int = 50,
        normalize: bool = True,
    ) -> int:
        """Out-of-core training for corpora beyond host/device memory.

        Streams the (x, y) CSV pair through fixed-size row windows
        (`data/streaming.StreamingCSV` — C++ background prefetch, O(window)
        host memory): each window is uploaded, trained for
        `epochs_per_window` with PERSISTENT network/optimizer state, then
        replaced by the next, so total optimizer work = windows ×
        epochs_per_window × the per-epoch schedule. Returns the number of
        windows consumed.

        Shape-stability: windows are padded to exactly `window_rows` rows
        (wrap-around repeats) and the class-index table to a fixed width,
        so every window — including a ragged final one — reuses ONE
        compiled program. Conditional sampling is exact under padding
        (the index table only addresses real rows); the unconditional
        family's uniform sampling double-weights wrapped rows in a
        partial final window (documented bias, vanishing for
        window_rows >> remainder).

        y may be one-hot (reference CSV format, width = label_num) or a
        single integer column (label_num inferred from the first window;
        prefer one-hot for corpora whose first window may miss classes).
        Windows may legitimately lack classes (time-ordered corpora with
        rare attack bursts): absent classes' rounds are branch-free
        masked no-ops and balanced-mode label draws remap to present
        classes, so one compiled program still serves every window.

        `normalize` (default): a first one-pass stream computes global
        per-column min/max and every window is minmax-scaled into [0, 1]
        — the streamed analog of `TabularDataset.renormalized()` that
        the in-memory pipelines apply (generators emit sigmoid/[0,1]
        outputs; unscaled raw features blow the reconstruction loss up).
        """
        from cvaegan_tpu.data.streaming import StreamingCSV, stream_minmax

        lo = scale = None
        if normalize:
            lo, hi = stream_minmax(x_csv, window_rows)
            scale = hi - lo
            scale[scale == 0] = 1.0

        import itertools

        n_windows = 0
        _END = object()  # zip() would silently drop the longer stream's tail
        for xw, yw in itertools.zip_longest(StreamingCSV(x_csv, window_rows),
                                            StreamingCSV(y_csv, window_rows),
                                            fillvalue=_END):
            if xw is _END or yw is _END or len(xw) != len(yw):
                nx = "exhausted" if xw is _END else len(xw)
                ny = "exhausted" if yw is _END else len(yw)
                raise ValueError(
                    f"x/y row mismatch at window {n_windows}: x {nx} rows "
                    f"vs y {ny} — the CSV pair is misaligned")
            if normalize:
                xw = (xw - lo) / scale
            labels = (yw.argmax(axis=1) if yw.shape[1] > 1
                      else yw[:, 0]).astype(np.int32)
            if self.state is None and n_windows == 0:
                self.feature_num = int(xw.shape[1])
                self.label_num = (int(yw.shape[1]) if yw.shape[1] > 1
                                  else int(labels.max()) + 1)
            if int(xw.shape[1]) != self.feature_num:
                raise ValueError(
                    f"window {n_windows}: {xw.shape[1]} features, "
                    f"model built for {self.feature_num}")
            if labels.size and (labels.min() < 0
                                or labels.max() >= self.label_num):
                raise ValueError(
                    f"window {n_windows} holds class id "
                    f"{int(labels.max())} outside the model's "
                    f"{self.label_num} classes (integer-label corpora "
                    "infer label_num from the FIRST window — use one-hot "
                    "y or ensure every class appears early)")
            counts = np.bincount(labels, minlength=self.label_num)
            if (counts == 0).any() and self.verbose:
                # Legitimate for time-ordered corpora with rare attack
                # bursts: the absent classes' rounds are masked no-ops
                # this window (`_guard_class_round`) and balanced-mode
                # label draws cover present classes only.
                missing = np.nonzero(counts == 0)[0].tolist()
                print(f"{self.name} window {n_windows}: classes {missing} "
                      "absent — their class rounds are skipped this window")
            # Index built from the UNPADDED labels: conditional sampling
            # only ever addresses real rows, exactly.
            index = ClassIndex.build(labels, self.label_num,
                                     pad_to=window_rows)
            n = len(xw)
            if n < window_rows:  # pad by wrap-around repetition
                reps = np.arange(window_rows - n) % n
                xw = np.concatenate([xw, xw[reps]])
                labels = np.concatenate([labels, labels[reps]])
            self._data = {
                "samples": jnp.asarray(xw),
                "labels": jnp.asarray(labels),
                "index": index,
            }
            if self.state is None:
                self.state = self._build_state(self._next_key())
            self._fit_prepared(epochs_per_window)
            n_windows += 1
        if n_windows == 0:
            raise ValueError(f"empty corpus: {x_csv}")
        return n_windows

    # ------------------------------------------------------------ generation
    def _generator_forward(self, state, z, labels, key):
        """Eval-mode generator forward -> samples [n, feature_num].
        Subclasses with non-standard generators override."""
        raise NotImplementedError

    def _classifier_logits(self, state, x):
        """Eval-mode companion-classifier logits, or None if the algorithm
        has no companion classifier (e.g. VAE-GAN)."""
        return None

    def generate_samples(self, target_label: int, num: int) -> np.ndarray:
        """Sample `num` rows of class `target_label` from the prior
        (reference `src/cvae_gan.py:339-345`)."""
        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("gen")
        if fn is None:
            def _gen(state, key, labels):
                kz, kg = jax.random.split(key)
                z = jax.random.normal(kz, (labels.shape[0], self.gan_cfg.z_size))
                return self._generator_forward(state, z, labels, kg)

            fn = jax.jit(_gen)
            self._gen_cache["gen"] = fn
        labels = jnp.full((num,), target_label, jnp.int32)
        out = fn(self.state, self._next_key(), labels)
        # f32 at the API boundary (generator outputs are bf16 under the
        # mixed-precision compute policy; numpy consumers expect f32).
        return np.asarray(out, np.float32)

    def generate_samples_fast(self, target_label: int, num: int) -> np.ndarray:
        """Prior sampling through the fused Pallas MLP kernel
        (`cvaegan_tpu.kernels.fused_mlp`): eval-mode BatchNorm folded into
        the matmuls, all four layers in one VMEM-resident kernel.

        Measured profitability (PARITY.md kernel-profitability note;
        round-5 recapture `experiments/results/bench_tpu_round5.json`):
        at device rate XLA's fused `generate_samples` is AHEAD (146.6M
        vs 113.5M samples/s; round 2 measured 149.9M vs 123.6M — same
        verdict) — XLA already emits a near-optimal fusion for this
        tiny-MLP chain, so this kernel is kept as the Pallas serving
        example and for shapes where hand-fusion may win, not as the
        default. (A round-1 "+24%" readout did not survive the
        corrected device-rate benchmark.)
        Only available for the standard MLP generator family; falls back
        with NotImplementedError otherwise."""
        assert self.state is not None, "call fit() first"
        from cvaegan_tpu.kernels import fused_mlp as fused

        try:
            fused.generator_fast_params(self.state["generator"])
        except (KeyError, TypeError) as e:
            raise NotImplementedError(
                f"{self.name}: generator is not the standard MLP stack "
                f"({e!r}); use generate_samples()"
            )
        fn = self._gen_cache.get("gen_fast")
        if fn is None:
            interpret = jax.default_backend() != "tpu"

            def _gen(state, key, labels):
                z = jax.random.normal(key, (labels.shape[0], self.gan_cfg.z_size))
                onehot = jax.nn.one_hot(labels, self.label_num)
                return fused.fast_generator_forward(
                    state["generator"], z, onehot, interpret=interpret)

            fn = jax.jit(_gen)
            self._gen_cache["gen_fast"] = fn
        labels = jnp.full((num,), target_label, jnp.int32)
        return np.asarray(fn(self.state, self._next_key(), labels),
                          np.float32)

    def generate_qualified_samples(
        self, target_label: int, num: int,
        confidence_threshold: Optional[float] = None,
    ) -> np.ndarray:
        """Classifier-filtered generation (reference
        `src/cvae_gan.py:347-378`): keep samples with
        max softmax prob > threshold AND argmax == target_label; give up
        once a cumulative budget of 20 zero-survivor candidate batches
        is spent (the reference never refunds patience on success —
        matched here, ADVICE r4). Known deviation: candidate batches are
        256-4096 rows (MXU-sized) instead of the reference's <=10, so
        one "empty batch" here is a much stronger no-yield signal."""
        assert self.state is not None, "call fit() first"
        if confidence_threshold is None:
            confidence_threshold = self.hparams.get("confidence_threshold", 0.5)
        if num <= 0:
            return np.empty((0, self.feature_num), np.float32)

        # Fully on-device rejection sampling: ONE dispatch runs the whole
        # generate->classify->filter->top-up loop as a lax.while_loop,
        # preserving the reference's observable semantics (threshold,
        # correct-class check, cumulative patience budget of 20 empty
        # candidate batches with no refund on success,
        # `src/cvae_gan.py:347-378`; deviation: larger candidate batches).
        #
        # Compile economics (VERDICT r3 item 3): the wanted count is a
        # TRACED scalar; only the buffer CAPACITY (a power-of-two bucket
        # >= num) is baked into the program, and any cached program whose
        # capacity covers `num` is reused. A balance pipeline's differing
        # per-class needs therefore share one compiled while_loop (the
        # pipeline requests the largest class first) instead of
        # compiling one program per distinct need.
        cached = sorted(key[1] for key in self._gen_cache
                        if isinstance(key, tuple) and key[0] == "qualified"
                        and key[1] >= num)
        if cached:
            cap = cached[0]
            fn = self._gen_cache[("qualified", cap)]
        else:
            cap = 256
            while cap < num:
                cap *= 2
            cand = min(4096, cap)
            z_size = self.gan_cfg.z_size
            feature_num = self.feature_num

            def _qualified(state, key, target, threshold, want):
                labels = jnp.full((cand,), target, jnp.int32)
                fstate = self._filter_state(state)

                def cond(carry):
                    key, buf, count, patience = carry
                    return (count < want) & (patience > 0)

                def body(carry):
                    key, buf, count, patience = carry
                    key, kz, kg = jax.random.split(key, 3)
                    z = jax.random.normal(kz, (cand, z_size))
                    x = self._generator_forward(state, z, labels, kg)
                    logits = self._classifier_logits(fstate, x)
                    probs = jax.nn.softmax(logits, axis=-1)
                    valid = (jnp.max(probs, -1) > threshold) & (
                        jnp.argmax(probs, -1) == labels)
                    # Scatter the valid rows into the next free buffer slots.
                    slot = count + jnp.cumsum(valid) - 1
                    ok = valid & (slot < want)
                    slot = jnp.where(ok, slot, cap)  # row `cap` is a sink
                    buf = buf.at[slot].set(
                        jnp.where(ok[:, None], x, buf[slot]))
                    n_new = jnp.sum(ok)
                    # cumulative budget — no refund on a successful batch
                    # (matches reference src/cvae_gan.py:350,376)
                    patience = jnp.where(jnp.sum(valid) == 0, patience - 1,
                                         patience)
                    return key, buf, count + n_new, patience

                buf0 = jnp.zeros((cap + 1, feature_num), jnp.float32)
                _, buf, count, _ = jax.lax.while_loop(
                    cond, body,
                    (key, buf0, jnp.int32(0), jnp.int32(20)))
                return buf[:cap], count

            fn = jax.jit(_qualified)
            self._gen_cache[("qualified", cap)] = fn

        buf, count = fn(self.state, self._next_key(),
                        jnp.int32(target_label),
                        jnp.float32(confidence_threshold),
                        jnp.int32(num))
        count = int(count)
        return np.asarray(buf)[:count]

    def get_feature_importance(self, net: str = "discriminator"):
        """Per-input-feature mean |W| of a network's first dense layer
        (reference `get_feature_importance`,
        `src/models/cvae_gan_models.py:231-247,285-292`). For conditional
        networks returns (data_importance, condition_importance); for the
        classifier a single vector."""
        from cvaegan_tpu.utils import introspection

        assert self.state is not None, "call fit() first"
        if net not in self.state:
            raise KeyError(f"{self.name} has no network {net!r}; "
                           f"available: {sorted(self.state)}")
        params = self.state[net].params
        if net == "classifier":
            return introspection.first_layer_importance(params)
        return introspection.split_importance(params, self.feature_num)

    def reconstruct_samples(self, samples, labels) -> np.ndarray:
        """Encode-then-decode round trip (reference
        `src/cvae_gan.py:380-397`). Only meaningful for VAE-family models;
        others raise."""
        raise NotImplementedError(f"{self.name} has no encoder")

    # ------------------------------------------------------------- plotting
    def plot_loss_history(self):
        """Per-loss curves + a combined plot saved under gan_outs
        (reference `src/cvae_gan.py:263-337`)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = [k for k in self.loss_keys if self.loss_history.get(k)]
        if not keys:
            return None
        n = len(keys)
        rows = (n + 1) // 2
        plt.figure(figsize=(12, 4 * rows))
        for i, k in enumerate(keys):
            plt.subplot(rows, 2, i + 1)
            plt.plot(self.loss_history[k])
            plt.xlabel("Epoch")
            plt.ylabel("Loss")
            plt.title(k)
        plt.tight_layout()
        out = self.settings.paths.gan_outs / f"{self.name}_loss_history.jpg"
        plt.savefig(out)
        plt.close()

        plt.figure(figsize=(12, 6))
        for k in keys:
            vals = self.loss_history[k]
            if k == "adv_loss":
                vals = [abs(v) for v in vals]
                plt.plot(vals, label=f"{k} (abs)")
            else:
                plt.plot(vals, label=k)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.title(f"{self.name} loss history")
        plt.legend()
        plt.grid(True, alpha=0.3)
        out2 = self.settings.paths.gan_outs / f"{self.name}_combined_loss.jpg"
        plt.savefig(out2)
        plt.close()
        print(f"loss curves saved to {out} and {out2}")
        return out
