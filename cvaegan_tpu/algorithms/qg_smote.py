"""QG-SMOTE — quantile-GAN/SMOTE hybrid.

Capability parity with reference `src/qg_smote.py` + `src/models/
qg_smote_models.py`: per class per epoch, D x5 (Wasserstein sign loss on
quantile-sampled fakes), C x5 (CE real+fake), quantile-regressor x1
(pinball loss at levels [0.25, 0.5, 0.75], `src/qg_smote.py:272-294`),
E+G x3 on `lambda_recon*MSE(G(z_quantile)) + lambda_quantile*0 +
lambda_adv*(-E[D(G(z_prior))]) + progressive CE` — the quantile term is
explicitly zeroed in the reference's EG objective (`src/qg_smote.py:220`).
Latent sampling alpha-interpolates between adjacent encoder quantiles —
the SMOTE analogy (`src/models/qg_smote_models.py:68-83`).

Generation supports method='quantile' (requires real samples of the
class) and method='prior' (`src/qg_smote.py:392-426`);
`analyze_quantiles` reports per-class quantile statistics (`:462-479`).

Divergence (documented): the reference's epoch loss record appends the
EG-step's zeroed quantile loss (always 0.0); we record the quantile
REGRESSOR's actual pinball loss, which is the informative signal.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.schedules import progressive_lambda
from cvaegan_tpu.core.state import (
    NetState, adam, apply_eval, grad_update, grad_update_pair, init_net,
)
from cvaegan_tpu.models import mlp
from cvaegan_tpu.models.quantile import (
    QuantileEncoder, QuantileRegressor, sample_from_quantiles,
)
from cvaegan_tpu.parallel.mesh import shard_leading

# Plain tuple, NOT a jnp array: a module-level device array would
# initialize the XLA backend at `import cvaegan_tpu`, which breaks
# jax.distributed.initialize() (it must run before any backend init)
# and slows library import. Converted to an array inside the traced
# loss (a constant there anyway).
QUANTILE_LEVELS = (0.25, 0.5, 0.75)


class QG_SMOTE(GenerativeTrainer):
    name = "qg_smote"
    config_key = "qg_smote"
    loss_keys = ("recon_loss", "quantile_loss", "adv_loss", "class_loss")

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        nq = int(self.hparams.get("num_quantiles", 3))
        self.num_quantiles = nq
        self.modules = {
            "encoder": QuantileEncoder(num_classes=self.label_num,
                                       latent_dim=cfg.z_size,
                                       num_quantiles=nq),
            "generator": mlp.Generator(output_dim=self.feature_num,
                                       num_classes=self.label_num),
            "discriminator": mlp.Discriminator(num_classes=self.label_num,
                                               spectral=True),
            "regressor": QuantileRegressor(in_features=self.feature_num,
                                           num_classes=self.label_num,
                                           num_quantiles=nq),
            "classifier": mlp.Classifier(num_classes=self.label_num),
        }
        self.txs = {
            "encoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "discriminator": adam(cfg.d_lr, cfg.adam_b1, cfg.adam_b2),
            "regressor": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 5)
        x = jnp.zeros((2, self.feature_num))
        y = jnp.zeros((2,), jnp.int32)
        z = jnp.zeros((2, cfg.z_size))
        return {
            "encoder": init_net(self.modules["encoder"], ks[0],
                                self.txs["encoder"], x, y),
            "generator": init_net(self.modules["generator"], ks[1],
                                  self.txs["generator"], z, y),
            "discriminator": init_net(self.modules["discriminator"], ks[2],
                                      self.txs["discriminator"], x, y),
            "regressor": init_net(self.modules["regressor"], ks[3],
                                  self.txs["regressor"], x, y),
            "classifier": init_net(self.modules["classifier"], ks[4],
                                   self.txs["classifier"], x),
        }

    # ------------------------------------------------------------ helpers
    def _quantile_fake(self, state, x_real, y, key):
        """No-grad quantile-sampled generation in train mode (reference
        D/C steps, `src/qg_smote.py:125-135`). Commits E and G mutables."""
        enc, gen = self.modules["encoder"], self.modules["generator"]
        e, g = state["encoder"], state["generator"]
        quantiles, e_mut = enc.apply(
            {"params": e.params, **e.mutables}, x_real, y, train=True,
            mutable=list(e.mutables.keys()),
        )
        z_q = sample_from_quantiles(key, quantiles)
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z_q, y, train=True,
            mutable=list(g.mutables.keys()),
        )
        state = {**state,
                 "encoder": e.replace(mutables=dict(e_mut)),
                 "generator": g.replace(mutables=dict(g_mut))}
        return state, x_fake

    def _d_step(self, state, data, class_id, key):
        cfg = self.gan_cfg
        dis = self.modules["discriminator"]
        k_x, k_q, k_d = jax.random.split(key, 3)
        x_real, y = self._sample_batch(k_x, data, class_id)
        state, x_fake = self._quantile_fake(state, x_real, y, k_q)
        d = state["discriminator"]

        def loss_fn(dp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            yy = jnp.concatenate([y, y], axis=0)
            (scores, _), m = dis.apply(
                {"params": dp, **d.mutables}, both, yy, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            d_real, d_fake = jnp.split(scores, 2, axis=0)
            return losses.wasserstein_d_loss(d_real, d_fake), {"mutables": dict(m)}

        new_d, aux = grad_update(d, self.txs["discriminator"], loss_fn)
        return {**state, "discriminator": new_d}, aux["loss"]

    def _c_step(self, state, data, class_id, key):
        cfg = self.gan_cfg
        clf = self.modules["classifier"]
        k_x, k_q, k_c = jax.random.split(key, 3)
        x_real, y = self._sample_batch(k_x, data, class_id)
        state, x_fake = self._quantile_fake(state, x_real, y, k_q)
        c = state["classifier"]

        def loss_fn(cp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            logits = clf.apply({"params": cp}, both, train=True,
                               rngs={"dropout": k_c})
            rl, fl = jnp.split(logits, 2, axis=0)
            loss = losses.cross_entropy(rl, y) + losses.cross_entropy(fl, y)
            return loss, {"mutables": c.mutables}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _qr_step(self, state, data, class_id, key):
        """Quantile regressor pinball-loss step (`src/qg_smote.py:176-190`)."""
        cfg = self.gan_cfg
        reg = self.modules["regressor"]
        k_x, k_drop = jax.random.split(key)
        x_real, y = self._sample_batch(k_x, data, class_id)
        r = state["regressor"]

        def loss_fn(rp):
            pred = reg.apply({"params": rp}, x_real, y, train=True,
                             rngs={"dropout": k_drop})
            # pred: [b, features, nq]; pinball expects [b, nq, dims]
            loss = losses.pinball(pred.transpose(0, 2, 1), x_real,
                                  jnp.asarray(QUANTILE_LEVELS))
            return loss, {"mutables": r.mutables}

        new_r, aux = grad_update(r, self.txs["regressor"], loss_fn)
        return {**state, "regressor": new_r}, aux["loss"]

    def _g_step(self, state, data, class_id, epoch, key):
        """Joint E+G step (`src/qg_smote.py:192-249`): recon on quantile
        z, adversarial + CE on prior z, quantile term zeroed."""
        cfg = self.gan_cfg
        hp = self.hparams
        enc, gen = self.modules["encoder"], self.modules["generator"]
        dis, clf = self.modules["discriminator"], self.modules["classifier"]
        k_x, k_q, k_z, k_d, k_c = jax.random.split(key, 5)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z_prior = shard_leading(
            jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        e, g = state["encoder"], state["generator"]
        d, c = state["discriminator"], state["classifier"]

        def loss_fn(ep, gp):
            quantiles, e_mut = enc.apply(
                {"params": ep, **e.mutables}, x_real, y, train=True,
                mutable=["batch_stats"],
            )
            z_q = sample_from_quantiles(k_q, quantiles)
            (x_recon, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z_q, y, train=True,
                mutable=["batch_stats"],
            )
            (x_fake, _), g_mut = gen.apply(
                {"params": gp, **dict(g_mut)}, z_prior, y, train=True,
                mutable=["batch_stats"],
            )
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, y, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            logits = clf.apply({"params": c.params}, x_fake, train=True,
                               rngs={"dropout": k_c})
            recon = losses.mse(x_recon, x_real)
            adv = losses.wasserstein_g_loss(d_fake)
            ce = losses.cross_entropy(logits, y)
            lam_c = progressive_lambda(epoch, hp["lambda_class"], 200, 500)
            # lambda_quantile * 0 — faithful to `src/qg_smote.py:220`.
            total = (hp["lambda_recon"] * recon + hp["lambda_adv"] * adv
                     + lam_c * ce)
            return total, {"mutables_a": dict(e_mut), "mutables_b": dict(g_mut),
                           "d_mut": dict(d_mut),
                           "recon": recon, "adv": adv, "class": ce}

        new_e, new_g, aux = grad_update_pair(
            e, g, self.txs["encoder"], self.txs["generator"], loss_fn)
        state = {**state, "encoder": new_e, "generator": new_g,
                 "discriminator": d.replace(mutables=aux["d_mut"])}
        return state, {"recon_loss": aux["recon"], "adv_loss": aux["adv"],
                       "class_loss": aux["class"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg

        def class_body(carry, class_id):
            state, key = carry
            key, kd, kc, kq, kg = jax.random.split(key, 5)
            state, _ = jax.lax.scan(
                lambda s, k: self._d_step(s, data, class_id, k), state,
                jax.random.split(kd, cfg.d_loop_num))
            state, _ = jax.lax.scan(
                lambda s, k: self._c_step(s, data, class_id, k), state,
                jax.random.split(kc, cfg.c_loop_num))
            state, q_loss = self._qr_step(state, data, class_id, kq)
            state, g_losses = jax.lax.scan(
                lambda s, k: self._g_step(s, data, class_id, epoch, k), state,
                jax.random.split(kg, cfg.g_loop_num))
            out = {"quantile_loss": q_loss,
                   **jax.tree.map(lambda x: x[-1], g_losses)}
            return (state, key), out

        (state, _), per_class = jax.lax.scan(
            self._guard_class_round(class_body, data), (state, key),
            jnp.arange(self._class_rounds()))
        return state, self._epoch_losses(per_class, data)

    # --------------------------------------------------------- generation
    def _generator_forward(self, state, z, labels, key):
        x, _ = apply_eval(self.modules["generator"], state["generator"],
                          z, labels)
        return x

    def _classifier_logits(self, state, x):
        return apply_eval(self.modules["classifier"], state["classifier"], x)

    def _quantile_latents(self, target_label: int, num: int):
        """Encode real class samples into quantiles and SMOTE-sample z
        (`src/qg_smote.py:400-421`)."""
        fn = self._gen_cache.get("qlat")
        if fn is None:
            def _qlat(state, key, rows, labels):
                x = self._data["samples"][rows]
                quantiles = apply_eval(self.modules["encoder"],
                                       state["encoder"], x, labels)
                return sample_from_quantiles(key, quantiles)

            fn = jax.jit(_qlat)
            self._gen_cache["qlat"] = fn
        counts = np.asarray(jax.device_get(self._data["index"].counts))
        table = np.asarray(jax.device_get(self._data["index"].table))
        count = max(int(counts[target_label]), 1)
        rows = table[target_label, np.arange(num) % count]
        labels = jnp.full((num,), target_label, jnp.int32)
        return fn(self.state, self._next_key(), jnp.asarray(rows), labels)

    def generate_samples(self, target_label: int, num: int,
                         method: str = "quantile"):
        """method='quantile' interpolates encoder quantiles of real class
        samples; method='prior' draws z ~ N(0, I)
        (`src/qg_smote.py:392-426`)."""
        assert self.state is not None, "call fit() first"
        if method == "prior":
            return super().generate_samples(target_label, num)
        z = self._quantile_latents(target_label, num)
        labels = jnp.full((num,), target_label, jnp.int32)
        fn = self._gen_cache.get("gen_from_z")
        if fn is None:
            fn = jax.jit(lambda state, z, y:
                         self._generator_forward(state, z, y, None))
            self._gen_cache["gen_from_z"] = fn
        return np.asarray(fn(self.state, z, labels))

    def generate_qualified_samples(self, target_label: int, num: int,
                                   confidence_threshold=None,
                                   method: str = "quantile"):
        """Confidence filter over either generation method
        (`src/qg_smote.py:428-460`)."""
        if method == "prior":
            return super().generate_qualified_samples(
                target_label, num, confidence_threshold)
        assert self.state is not None, "call fit() first"
        if confidence_threshold is None:
            confidence_threshold = self.hparams.get("confidence_threshold", 0.5)
        collected, total, patience = [], 0, 20
        cand = max(256, min(4096, 2 * num))
        clf_fn = self._gen_cache.get("clf")
        if clf_fn is None:
            clf_fn = jax.jit(lambda state, x: self._classifier_logits(state, x))
            self._gen_cache["clf"] = clf_fn
        fstate = self._filter_state(self.state)
        while total < num and patience > 0:
            x = self.generate_samples(target_label, cand, method="quantile")
            logits = np.asarray(clf_fn(fstate, jnp.asarray(x)))
            e = np.exp(logits - logits.max(1, keepdims=True))
            probs = e / e.sum(1, keepdims=True)
            valid = (probs.max(1) > confidence_threshold) & (
                probs.argmax(1) == target_label)
            good = x[valid]
            if len(good) == 0:
                patience -= 1
                continue
            take = good[: num - total]
            collected.append(take)
            total += len(take)
        if not collected:
            return np.zeros((0, self.feature_num), np.float32)
        return np.concatenate(collected, axis=0)

    def analyze_quantiles(self, target_label: int, num_samples: int = 100):
        """Per-class latent-quantile statistics (`src/qg_smote.py:462-479`)."""
        assert self.state is not None, "call fit() first"
        counts = np.asarray(jax.device_get(self._data["index"].counts))
        table = np.asarray(jax.device_get(self._data["index"].table))
        n = min(num_samples, max(int(counts[target_label]), 1))
        rows = table[target_label, :n]
        x = self._data["samples"][jnp.asarray(rows)]
        labels = jnp.full((n,), target_label, jnp.int32)
        quantiles = np.asarray(apply_eval(
            self.modules["encoder"], self.state["encoder"], x, labels))
        return {
            "mean": quantiles.mean(axis=0),
            "std": quantiles.std(axis=0),
            "min": quantiles.min(axis=0),
            "max": quantiles.max(axis=0),
        }
