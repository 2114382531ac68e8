"""CTGAN — tabular WGAN-GP with residual blocks and column masks.

Capability parity with reference `src/ctgan.py` + `src/models/
ctgan_models.py`: per class per epoch, D x5 (fixed, the WGAN-GP standard,
`src/ctgan.py:93`) on `-E[D(x)] + E[D(G)] + GP` with the gradient penalty
computed at random interpolates (`src/models/ctgan_models.py:212-237`),
C x5 on CE(real)+CE(fake), G x1 on `lambda_adv*(-E[D(G)]) + progressive
CE` (`src/ctgan.py:144-174`). Loss history records d/g/gp/class losses
(`:175-179`). Extra generation-quality diagnostics (mean-diff, cov-diff,
RBF-MMD on <=100 samples) via `calculate_metrics` (`:338-376`).

TPU note: the gradient penalty is `jax.grad` of the critic at the
interpolates inside the jitted D-step — the sum-of-scores trick yields
exact per-example input gradients in one backward pass.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.schedules import progressive_lambda
from cvaegan_tpu.core.state import (
    NetState, adam, grad_update, init_net,
)
from cvaegan_tpu.models import ctgan as ctgan_models
from cvaegan_tpu.parallel.mesh import shard_leading


class CTGAN(GenerativeTrainer):
    name = "ctgan"
    config_key = "ctgan"
    loss_keys = ("d_loss", "g_loss", "gp_loss", "class_loss")
    d_loop_fixed = 5  # reference hard-codes 5 critic steps (`src/ctgan.py:93`)

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.num_columns = self.feature_num
        self.modules = {
            "generator": ctgan_models.CTGANGenerator(
                output_dim=self.feature_num, num_classes=self.label_num),
            "discriminator": ctgan_models.CTGANDiscriminator(
                num_classes=self.label_num),
            "classifier": ctgan_models.CTGANClassifier(
                num_classes=self.label_num),
        }
        self.txs = {
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "discriminator": adam(cfg.d_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 3)
        x = jnp.zeros((2, self.feature_num))
        y = jnp.zeros((2,), jnp.int32)
        z = jnp.zeros((2, cfg.z_size))
        mask = jnp.zeros((2, self.num_columns))
        return {
            "generator": init_net(self.modules["generator"], ks[0],
                                  self.txs["generator"], z, y, mask),
            "discriminator": init_net(self.modules["discriminator"], ks[1],
                                      self.txs["discriminator"], x, y, mask),
            "classifier": init_net(self.modules["classifier"], ks[2],
                                   self.txs["classifier"], x),
        }

    # ----------------------------------------------------------- helpers
    def _gen_fake(self, state, key, y, train_mask_key):
        """Train-mode no-grad generation with a random column mask
        (reference `generate_samples` called from fit, `src/ctgan.py:102`)."""
        cfg = self.gan_cfg
        gen = self.modules["generator"]
        g = state["generator"]
        z = shard_leading(jax.random.normal(key, (cfg.batch_size, cfg.z_size)))
        mask = ctgan_models.random_column_mask(
            train_mask_key, cfg.batch_size, self.num_columns)
        x_fake, g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, y, mask, train=True,
            mutable=list(g.mutables.keys()),
        )
        return {**state, "generator": g.replace(mutables=dict(g_mut))}, x_fake

    def _d_step(self, state, data, class_id, key):
        """WGAN-GP critic update (`src/ctgan.py:93-117`)."""
        cfg = self.gan_cfg
        hp = self.hparams
        dis = self.modules["discriminator"]
        k_x, k_z, k_m, k_d, k_a, k_gm, k_gd = jax.random.split(key, 7)
        x_real, y = self._sample_batch(k_x, data, class_id)
        state, x_fake = self._gen_fake(state, k_z, y, k_m)
        d = state["discriminator"]

        # Fresh column mask for the critic forward and another for the GP
        # forward (the reference samples a new mask inside
        # calculate_gradient_penalty, `src/models/ctgan_models.py:219`).
        mask = ctgan_models.random_column_mask(
            jax.random.fold_in(k_d, 1), 2 * cfg.batch_size, self.num_columns)
        gp_mask = ctgan_models.random_column_mask(
            k_gm, cfg.batch_size, self.num_columns)
        alpha = jax.random.uniform(k_a, (cfg.batch_size, 1))
        x_hat = alpha * x_real + (1.0 - alpha) * x_fake

        def loss_fn(dp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            yy = jnp.concatenate([y, y], axis=0)
            scores, m = dis.apply(
                {"params": dp, **d.mutables}, both, yy, mask, train=True,
                rngs={"dropout": k_d}, mutable=list(d.mutables.keys()),
            )
            d_real, d_fake = jnp.split(scores, 2, axis=0)
            w_loss = losses.wasserstein_d_loss(d_real, d_fake)

            def critic_sum(xh):
                s, _ = dis.apply(
                    {"params": dp, **d.mutables}, xh, y, gp_mask, train=True,
                    rngs={"dropout": k_gd}, mutable=list(d.mutables.keys()),
                )
                return jnp.sum(s)

            grads = jax.grad(critic_sum)(x_hat)
            norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=-1) + 1e-12)
            gp = jnp.mean(jnp.square(norms - 1.0)) * hp["lambda_gp"]
            return w_loss + gp, {"mutables": dict(m), "gp": gp}

        new_d, aux = grad_update(d, self.txs["discriminator"], loss_fn)
        return ({**state, "discriminator": new_d},
                {"d_loss": aux["loss"], "gp_loss": aux["gp"]})

    def _c_step(self, state, data, class_id, key):
        cfg = self.gan_cfg
        clf = self.modules["classifier"]
        k_x, k_z, k_m, k_c = jax.random.split(key, 4)
        x_real, y = self._sample_batch(k_x, data, class_id)
        state, x_fake = self._gen_fake(state, k_z, y, k_m)
        c = state["classifier"]

        def loss_fn(cp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            logits, m = clf.apply(
                {"params": cp, **c.mutables}, both, train=True,
                rngs={"dropout": k_c}, mutable=["batch_stats"],
            )
            rl, fl = jnp.split(logits, 2, axis=0)
            loss = losses.cross_entropy(rl, y) + losses.cross_entropy(fl, y)
            return loss, {"mutables": dict(m)}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, class_id, epoch, key):
        """Single generator step per class round (`src/ctgan.py:144-174`)."""
        cfg = self.gan_cfg
        hp = self.hparams
        gen = self.modules["generator"]
        dis, clf = self.modules["discriminator"], self.modules["classifier"]
        k_y, k_z, k_m, k_dm, k_d, k_c = jax.random.split(key, 6)
        y = self._sample_labels(k_y, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g_mask = ctgan_models.random_column_mask(
            k_m, cfg.batch_size, self.num_columns)
        d_mask = ctgan_models.random_column_mask(
            k_dm, cfg.batch_size, self.num_columns)
        g, d, c = state["generator"], state["discriminator"], state["classifier"]

        def loss_fn(gp):
            x_fake, g_mut = gen.apply(
                {"params": gp, **g.mutables}, z, y, g_mask, train=True,
                mutable=["batch_stats"],
            )
            d_fake, d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, y, d_mask,
                train=True, rngs={"dropout": k_d},
                mutable=list(d.mutables.keys()),
            )
            logits, c_mut = clf.apply(
                {"params": c.params, **c.mutables}, x_fake, train=True,
                rngs={"dropout": k_c}, mutable=["batch_stats"],
            )
            g_loss = losses.wasserstein_g_loss(d_fake)
            ce = losses.cross_entropy(logits, y)
            lam_c = progressive_lambda(epoch, hp["lambda_class"], 200, 500)
            total = hp["lambda_adv"] * g_loss + lam_c * ce
            return total, {"mutables": dict(g_mut), "d_mut": dict(d_mut),
                           "c_mut": dict(c_mut), "g": g_loss, "class": ce}

        new_g, aux = grad_update(g, self.txs["generator"], loss_fn)
        state = {
            **state,
            "generator": new_g,
            "discriminator": d.replace(mutables=aux["d_mut"]),
            "classifier": c.replace(mutables=aux["c_mut"]),
        }
        return state, {"g_loss": aux["g"], "class_loss": aux["class"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg

        def class_body(carry, class_id):
            state, key = carry
            key, kd, kc, kg = jax.random.split(key, 4)
            state, d_losses = jax.lax.scan(
                lambda s, k: self._d_step(s, data, class_id, k), state,
                jax.random.split(kd, self.d_loop_fixed))
            state, _ = jax.lax.scan(
                lambda s, k: self._c_step(s, data, class_id, k), state,
                jax.random.split(kc, cfg.c_loop_num))
            state, g_out = self._g_step(state, data, class_id, epoch, kg)
            out = {
                "d_loss": d_losses["d_loss"][-1],
                "gp_loss": d_losses["gp_loss"][-1],
                **g_out,
            }
            return (state, key), out

        (state, _), per_class = jax.lax.scan(
            self._guard_class_round(class_body, data), (state, key),
            jnp.arange(self._class_rounds()))
        return state, self._epoch_losses(per_class, data)

    # --------------------------------------------------------- generation
    def _generator_forward(self, state, z, labels, key):
        """Eval-mode generation uses the round-robin column mask
        (`src/models/ctgan_models.py:94-95`)."""
        gen = self.modules["generator"]
        g = state["generator"]
        mask = ctgan_models.round_robin_column_mask(z.shape[0], self.num_columns)
        return gen.apply({"params": g.params, **g.mutables}, z, labels, mask,
                         train=False)

    def _classifier_logits(self, state, x):
        clf = self.modules["classifier"]
        c = state["classifier"]
        return clf.apply({"params": c.params, **c.mutables}, x, train=False)

    def calculate_metrics(self, real_samples, fake_samples):
        """Generation-quality diagnostics (`src/ctgan.py:338-376`)."""
        real = jnp.asarray(real_samples, jnp.float32)
        fake = jnp.asarray(fake_samples, jnp.float32)
        return {
            "mean_difference": float(losses.mean_difference(real, fake)),
            "cov_difference": float(losses.cov_difference(real, fake)),
            "mmd_approx": float(losses.mmd_rbf(real, fake)),
        }
