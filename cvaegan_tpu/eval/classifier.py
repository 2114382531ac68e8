"""Downstream evaluation classifier.

Capability parity with reference `src/classifier.py:11-303`:
fit / predict / test / binary_test / print_metrics / plot_roc_curve, macro
P/R/F1 + per-class classification report + confusion matrix, one-vs-rest
ROC curves saved as jpg. Metrics come from sklearn on host; training is a
single jitted XLA program (scan over epochs x minibatches) instead of the
reference's 100-epoch python DataLoader loop (`src/classifier.py:33-43`).

The scripts' warm-start idiom `clf.model = gan.classifier`
(`scripts/train_cvae_gan.py:144-145`) becomes `clf.warm_start_from(gan)`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvaegan_tpu.core import config as config_lib
from cvaegan_tpu.core import losses
from cvaegan_tpu.data.tabular import TabularDataset
from cvaegan_tpu.models import mlp
from cvaegan_tpu.utils.logger import Logger


def _train_arrays(dataset):
    if isinstance(dataset, TabularDataset):
        return dataset.tr_samples, dataset.tr_labels
    if hasattr(dataset, "as_tuple"):  # compat.TrDataset / TeDataset
        x, y = dataset.as_tuple()
    else:
        x, y = dataset
    return np.asarray(x, np.float32), np.asarray(y, np.int32)


def _test_arrays(dataset):
    if isinstance(dataset, TabularDataset):
        return dataset.te_samples, dataset.te_labels
    if hasattr(dataset, "as_tuple"):
        x, y = dataset.as_tuple()
    else:
        x, y = dataset
    return np.asarray(x, np.float32), np.asarray(y, np.int32)


class Classifier:
    def __init__(self, name: str, seed: Optional[int] = None,
                 settings: Optional[config_lib.Settings] = None):
        self.settings = settings or config_lib.settings
        self.cfg = self.settings.classifier
        self.name = f"{name}_classifier"
        self.logger = Logger(name)
        seed = self.settings.seed if seed is None else seed
        self._key = jax.random.PRNGKey(seed + 1)
        self._key_counter = 0

        self.module: Optional[mlp.Classifier] = None
        self.params: Any = None
        #: mutable variable collections of adopted companion classifiers
        #: (spectral u/v for SNGAN, batch_stats for CTGAN).
        self.mutables: Dict[str, Any] = {}
        self.label_num: int = 0
        self.confusion_matrix: Optional[np.ndarray] = None
        self.metrics: Dict[str, float] = {"Precision": 0.0, "Recall": 0.0, "F1": 0.0}
        self.class_metrics = None

    def _next_key(self):
        self._key_counter += 1
        return jax.random.fold_in(self._key, self._key_counter)

    def _ensure_built(self, feature_num: int, label_num: int):
        if self.module is None:
            self.label_num = label_num
            self.module = mlp.Classifier(num_classes=label_num)
            variables = self.module.init(
                {"params": self._next_key(), "dropout": self._next_key()},
                jnp.zeros((2, feature_num)), train=False,
            )
            self.params = variables["params"]
            self.mutables = {k: v for k, v in variables.items()
                             if k != "params"}

    def warm_start_from(self, trainer) -> None:
        """Adopt a trainer's companion classifier (reference warm-start
        `clf.model = gan.classifier`, `scripts/train_cvae_gan.py:144-145`)."""
        self.module = trainer.modules["classifier"]
        self.params = trainer.state["classifier"].params
        self.mutables = dict(trainer.state["classifier"].mutables)
        self.label_num = trainer.label_num
        self._fit_fn_cache = {}

    # -------------------------------------------------------------- train
    #: max optimizer steps per jitted dispatch during fit; keeps any
    #: single XLA program under a few seconds of device time so the
    #: runtime watchdog never kills a long scan (reference-sized data
    #: still trains in ONE dispatch: 100 epochs x 15 batches << this).
    FIT_STEPS_PER_DISPATCH = 250_000

    def fit(self, dataset) -> None:
        x, y = _train_arrays(dataset)
        self._ensure_built(x.shape[1], int(y.max()) + 1)
        self.logger.info("Started training")
        opt_state = self._make_tx().init(self.params)
        self._fit_arrays(x, y, self.cfg.epochs, opt_state)
        self._logits_fn = None
        self.logger.info("Finished training")

    def _make_tx(self):
        return optax.adam(self.cfg.lr)

    def _train_runner(self, n: int, feature_num: int):
        """Jitted multi-epoch trainer taking the data as ARGUMENTS, cached
        per (rows, features) shape — windows of equal shape (the
        `fit_streamed` path) share one trace/compile."""
        cache = getattr(self, "_fit_fn_cache", None)
        if cache is None:
            cache = self._fit_fn_cache = {}
        bs = self.cfg.batch_size
        nb = -(-n // bs)  # ceil
        pad = nb * bs - n
        # the closure bakes in batch_size, lr and the module object, so
        # they must be part of the key — otherwise changing settings (or
        # warm-starting a different architecture) between same-shaped
        # fits would silently reuse a stale compiled trainer
        key = (n, feature_num, bs, self.cfg.lr, id(self.module))
        if key in cache:
            return cache[key], nb
        tx = self._make_tx()
        module = self.module

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train(params, mutables, opt_state, ekeys, x_dev, y_dev, w):
            def epoch(carry, ekey):
                params, mutables, opt_state = carry
                kperm, kdrop = jax.random.split(ekey)
                perm = jax.random.permutation(kperm, n)
                perm_p = (jnp.concatenate([perm, perm[:pad]]) if pad
                          else perm)
                xb = x_dev[perm_p].reshape(nb, bs, feature_num)
                yb = y_dev[perm_p].reshape(nb, bs)
                # per-row weights travel WITH their permuted rows;
                # batch-alignment padding rows get weight 0
                wb = jnp.concatenate(
                    [w[perm], jnp.zeros((pad,))]).reshape(nb, bs)

                def batch_step(carry, inp):
                    params, mutables, opt_state, i = carry
                    bx, by, bw = inp

                    def loss_fn(p):
                        # Companion classifiers adopted from SNGAN/CTGAN
                        # carry spectral/batch_stats collections; plain
                        # classifiers have none.
                        if mutables:
                            out, new_mut = module.apply(
                                {"params": p, **mutables}, bx, train=True,
                                rngs={"dropout": jax.random.fold_in(kdrop, i)},
                                mutable=list(mutables.keys()),
                            )
                            new_mut = dict(new_mut)
                        else:
                            out = module.apply(
                                {"params": p}, bx, train=True,
                                rngs={"dropout": jax.random.fold_in(kdrop, i)},
                            )
                            new_mut = mutables
                        # attention classifiers return (logits, attn_probs)
                        logits = out[0] if isinstance(out, tuple) else out
                        loss = losses.weighted_cross_entropy(logits, by, bw)
                        return loss, new_mut

                    (loss, new_mut), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, new_mut, opt_state, i + 1), loss

                (params, mutables, opt_state, _), losses_ = jax.lax.scan(
                    batch_step, (params, mutables, opt_state, 0), (xb, yb, wb)
                )
                return (params, mutables, opt_state), losses_[-1]

            (params, mutables, opt_state), _ = jax.lax.scan(
                epoch, (params, mutables, opt_state), ekeys
            )
            return params, mutables, opt_state

        cache[key] = train
        return train, nb

    def _fit_arrays(self, x, y, epochs: int, opt_state, weights=None):
        """Train over one in-memory array pair; returns the optimizer
        state so callers (`fit_streamed`) can continue across windows.

        Bounds the work per XLA dispatch: one program scanning all
        epochs is fine on the reference-sized sets, but at CAN-corpus
        magnitude (3.6M rows -> ~56k batches/epoch) a single program
        running for minutes gets the TPU worker killed mid-scan (the
        failure then surfaces at the NEXT blocking fetch, since axon
        dispatch is async). Epoch keys are pre-split once, so chunked
        and monolithic execution are bit-identical.
        """
        n, feature_num = x.shape
        train, nb = self._train_runner(n, feature_num)
        x_dev = jnp.asarray(x, jnp.float32)
        y_dev = jnp.asarray(y, jnp.int32)
        w = (jnp.ones((n,), jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))
        ekeys = jax.random.split(self._next_key(), epochs)
        chunk = max(1, min(epochs, self.FIT_STEPS_PER_DISPATCH // nb))
        params, mutables = self.params, self.mutables
        # Evaluation instrument precision pin: the downstream classifier
        # always trains f32 even when the generative models under study
        # run the bf16 compute policy (models.layers.dtype_override) —
        # the override covers the calls because jit traces on first call.
        from cvaegan_tpu.models.layers import dtype_override

        with dtype_override(jnp.float32):
            for start in range(0, epochs, chunk):
                params, mutables, opt_state = train(
                    params, mutables, opt_state, ekeys[start:start + chunk],
                    x_dev, y_dev, w)
        self.params, self.mutables = params, mutables
        return opt_state

    def fit_streamed(self, x_csv, y_csv, window_rows: int = 1_000_000,
                     epochs_per_window: int = 10, transform=None) -> int:
        """Out-of-core downstream training over a beyond-memory CSV pair:
        fixed-size windows stream through the device with persistent
        params/optimizer state (the evaluation counterpart of the
        trainers' `fit_streamed`). Windows are padded to `window_rows`
        with zero-WEIGHT rows, so every window — including the ragged
        tail — shares one compiled program. `transform(chunk)` applies
        training-time feature scaling per window; y one-hot or integer.
        Returns the number of windows consumed."""
        import itertools

        from cvaegan_tpu.data.streaming import StreamingCSV

        self.logger.info("Started streamed training")
        opt_state = None
        n_windows = 0
        _END = object()
        for xw, yw in itertools.zip_longest(StreamingCSV(x_csv, window_rows),
                                            StreamingCSV(y_csv, window_rows),
                                            fillvalue=_END):
            if xw is _END or yw is _END or len(xw) != len(yw):
                raise ValueError(
                    f"x/y row mismatch at window {n_windows} — "
                    "misaligned CSV pair")
            if transform is not None:
                xw = transform(xw)
            labels = (yw.argmax(axis=1) if yw.shape[1] > 1
                      else yw[:, 0]).astype(np.int32)
            if self.module is None and n_windows == 0:
                label_num = (int(yw.shape[1]) if yw.shape[1] > 1
                             else int(labels.max()) + 1)
                self._ensure_built(int(xw.shape[1]), label_num)
            if labels.size and (labels.min() < 0
                                or labels.max() >= self.label_num):
                raise ValueError(
                    f"window {n_windows} holds class id "
                    f"{int(labels.max())} outside the model's "
                    f"{self.label_num} classes")
            n = len(xw)
            weights = np.ones(window_rows, np.float32)
            if n < window_rows:
                # Pad by wrapping REAL rows (same scheme as the trainers'
                # fit_streamed): the duplicates carry loss weight 0, but —
                # unlike zero rows — they keep BatchNorm batch statistics
                # realistic for warm-started BN classifiers (CTGAN's),
                # where all-zero padding would skew the normalization of
                # the real rows in a mostly-padding final window.
                reps = np.arange(window_rows - n) % n
                xw = np.concatenate([xw, xw[reps]])
                labels = np.concatenate([labels, labels[reps]])
                weights[n:] = 0.0
            if opt_state is None:
                opt_state = self._make_tx().init(self.params)
            opt_state = self._fit_arrays(xw, labels, epochs_per_window,
                                         opt_state, weights=weights)
            n_windows += 1
        if n_windows == 0:
            raise ValueError(f"empty corpus: {x_csv}")
        self._logits_fn = None
        self.logger.info("Finished streamed training")
        return n_windows

    # ------------------------------------------------------------ predict
    #: rows per inference dispatch; large test sets (e.g. the 400k-row
    #: CAN-scale split) are chunked so one dispatch never carries
    #: hundreds of MB of activations over the device tunnel. Chunks are
    #: padded to CHUNK so every dispatch reuses one compiled shape.
    PREDICT_CHUNK = 65536

    def _logits(self, x: np.ndarray) -> np.ndarray:
        from cvaegan_tpu.models.layers import dtype_override

        fn = getattr(self, "_logits_fn", None)
        if fn is None:
            def _eval(p, m, v):
                out = self.module.apply({"params": p, **m}, v, train=False)
                return out[0] if isinstance(out, tuple) else out

            fn = jax.jit(_eval)
            self._logits_fn = fn
        n, chunk = len(x), self.PREDICT_CHUNK
        with dtype_override(jnp.float32):  # instrument stays f32 (see fit)
            if n <= chunk:
                return np.asarray(fn(self.params, self.mutables,
                                     jnp.asarray(x, jnp.float32)))
            outs = []
            for i in range(0, n, chunk):
                part = x[i:i + chunk]
                pad = chunk - len(part)
                if pad:
                    part = np.concatenate([part, part[-1:].repeat(pad, 0)])
                got = np.asarray(fn(self.params, self.mutables,
                                    jnp.asarray(part, jnp.float32)))
                outs.append(got[:chunk - pad] if pad else got)
            return np.concatenate(outs, axis=0)

    def predict(self, x, use_prob: bool = False) -> np.ndarray:
        logits = self._logits(np.asarray(x, np.float32))
        if use_prob:
            return logits
        return np.argmax(logits, axis=1)

    def predict_stream(self, chunks, use_prob: bool = False) -> np.ndarray:
        """Predict over an iterable of [rows, features] chunks (e.g.
        `data.streaming.StreamingCSV`) without ever holding the feature
        matrix in memory — only the predictions accumulate. Identical
        output to `predict(concatenate(chunks))`."""
        outs = [self.predict(chunk, use_prob=use_prob) for chunk in chunks]
        if not outs:
            raise ValueError("predict_stream: empty chunk iterable")
        return np.concatenate(outs, axis=0)

    def get_feature_importance(self):
        """Mean |W| of the first dense layer per input feature (reference
        `src/models/cvae_gan_models.py:285-292`)."""
        from cvaegan_tpu.utils.introspection import first_layer_importance

        assert self.params is not None, "call fit() first"
        return first_layer_importance(self.params)

    # --------------------------------------------------------------- test
    def _compute_metrics(self, real, pred, labels=None):
        from sklearn import metrics as skm

        self.confusion_matrix = skm.confusion_matrix(
            y_true=real, y_pred=pred, labels=labels
        )
        for key, fn in (("Precision", skm.precision_score),
                        ("Recall", skm.recall_score), ("F1", skm.f1_score)):
            self.metrics[key] = fn(y_true=real, y_pred=pred, average="macro",
                                   zero_division=0)
        self.class_metrics = skm.classification_report(
            y_true=real, y_pred=pred, labels=labels, output_dict=True,
            zero_division=0,
        )

    def test(self, dataset) -> None:
        """Multiclass macro P/R/F1 + per-class report
        (`src/classifier.py:56-106`)."""
        x, y = _test_arrays(dataset)
        pred = self.predict(x)
        self._compute_metrics(y, pred, labels=list(range(self.label_num)))

    def binary_test(self, dataset) -> None:
        """Same, with labels>0 squashed to 1 (`src/classifier.py:108-161`)."""
        x, y = _test_arrays(dataset)
        pred = (self.predict(x) > 0).astype(np.int32)
        real = (np.asarray(y) > 0).astype(np.int32)
        self._compute_metrics(real, pred)

    def test_streamed(self, x_csv, y_csv, chunk_rows: int = 262_144,
                      binary: bool = False, transform=None) -> None:
        """`test`/`binary_test` over a beyond-memory CSV pair: features
        stream through in O(chunk) host memory; only the integer
        predictions and labels accumulate. `transform(chunk)` applies
        the training-time feature scaling (e.g. the minmax closure from
        the corpus statistics) per chunk; y may be one-hot or a single
        integer column."""
        from cvaegan_tpu.data.streaming import StreamingCSV

        import itertools

        preds, reals = [], []
        _END = object()
        for i, (xw, yw) in enumerate(itertools.zip_longest(
                StreamingCSV(x_csv, chunk_rows),
                StreamingCSV(y_csv, chunk_rows), fillvalue=_END)):
            if xw is _END or yw is _END or len(xw) != len(yw):
                raise ValueError(
                    f"x/y row mismatch at chunk {i} — misaligned CSV pair")
            if transform is not None:
                xw = transform(xw)
            preds.append(self.predict(xw))
            reals.append((yw.argmax(axis=1) if yw.shape[1] > 1
                          else yw[:, 0]).astype(np.int32))
        if not preds:
            raise ValueError(f"empty corpus: {x_csv}")
        pred, real = np.concatenate(preds), np.concatenate(reals)
        if binary:
            self._compute_metrics((real > 0).astype(np.int32),
                                  (pred > 0).astype(np.int32))
        else:
            self._compute_metrics(real, pred,
                                  labels=list(range(self.label_num)))

    # ------------------------------------------------------------ reports
    def print_metrics(self, decimals: int = 4, print_class_metrics: bool = True):
        """Formatted metric dump (`src/classifier.py:163-208`)."""
        print("Overall metrics:")
        print({k: round(v, decimals) for k, v in self.metrics.items()})
        if print_class_metrics and self.class_metrics is not None:
            print("\nPer-class metrics:")
            for key, value in self.class_metrics.items():
                if key in ("accuracy", "macro avg", "weighted avg"):
                    continue
                try:
                    class_idx = int(key)
                except ValueError:
                    continue
                print(f"\nclass {class_idx}:")
                print(f"  Precision: {round(value['precision'], decimals)}")
                print(f"  Recall: {round(value['recall'], decimals)}")
                print(f"  F1-Score: {round(value['f1-score'], decimals)}")
                print(f"  Support: {value['support']}")
            for avg in ("macro avg", "weighted avg"):
                if avg in self.class_metrics:
                    v = self.class_metrics[avg]
                    print(f"\n{avg}:")
                    print(f"  Precision: {round(v['precision'], decimals)}")
                    print(f"  Recall: {round(v['recall'], decimals)}")
                    print(f"  F1-Score: {round(v['f1-score'], decimals)}")
                    print(f"  Support: {v['support']}")
            if "accuracy" in self.class_metrics:
                print(f"\nAccuracy: {round(self.class_metrics['accuracy'], decimals)}")

    def plot_roc_curve(self, dataset, is_binary: bool = False):
        """OvR multiclass or binary ROC/AUC jpg (`src/classifier.py:210-303`).
        Scores are raw logits, matching the reference."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn import metrics as skm

        x, y = _test_arrays(dataset)
        logits = self._logits(x)
        plt.figure(figsize=(10, 8))
        if not is_binary and logits.shape[1] > 2:
            from sklearn.preprocessing import label_binarize

            y_bin = label_binarize(y, classes=list(range(self.label_num)))
            colors = ["aqua", "darkorange", "cornflowerblue", "green", "red",
                      "purple"]
            for i in range(y_bin.shape[1]):
                color = colors[i % len(colors)]
                fpr, tpr, _ = skm.roc_curve(y_bin[:, i], logits[:, i])
                auc = skm.roc_auc_score(y_bin[:, i], logits[:, i])
                plt.plot(fpr, tpr, color=color, lw=2,
                         label=f"ROC curve of class {i} (area = {auc:0.2f})")
        else:
            score = logits[:, 1] if logits.shape[1] > 1 else logits[:, 0]
            y_test = np.where(np.asarray(y) > 0, 1, 0)
            fpr, tpr, _ = skm.roc_curve(y_test, score)
            auc = skm.roc_auc_score(y_test, score)
            plt.plot(fpr, tpr, color="darkorange", lw=2,
                     label=f"ROC curve (area = {auc:0.2f})")
        plt.plot([0, 1], [0, 1], color="navy", lw=2, linestyle="--")
        plt.xlim([0.0, 1.0])
        plt.ylim([0.0, 1.05])
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.title(f"{self.name} Receiver Operating Characteristic (ROC) Curve")
        plt.legend(loc="lower right")
        plt.grid(True, alpha=0.3)
        model_name = self.name.replace("_classifier", "")
        suffix = "binary" if is_binary else "multiclass"
        out = self.settings.paths.gan_outs / f"{model_name}_roc_curve_{suffix}.jpg"
        plt.savefig(out)
        plt.close()
        print(f"ROC curve saved to {out}")
        return out
