"""CGAN — CVAE-GAN minus the VAE (no encoder).

Capability parity with reference `src/cgan.py` + `src/models/
cgan_models.py`: per class per epoch, D x5 (Wasserstein sign loss),
C x5 (CE real+fake), G x3 on `lambda_adv*(-E[D(G)]) +
progressive_lambda_class*CE(C(G))` (`src/cgan.py:83-178`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.schedules import progressive_lambda
from cvaegan_tpu.core.state import (
    NetState, adam, apply_eval, grad_update, init_net,
)
from cvaegan_tpu.models import mlp
from cvaegan_tpu.parallel.mesh import shard_leading


class CGAN(GenerativeTrainer):
    name = "cgan"
    config_key = "cgan"
    loss_keys = ("adv_loss", "class_loss")

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "generator": mlp.Generator(
                output_dim=self.feature_num, num_classes=self.label_num
            ),
            "discriminator": mlp.Discriminator(
                num_classes=self.label_num, spectral=True
            ),
            "classifier": mlp.Classifier(num_classes=self.label_num),
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
        return {
            "generator": init_net(self.modules["generator"], ks[0],
                                  self.txs["generator"], z, y),
            "discriminator": init_net(self.modules["discriminator"], ks[1],
                                      self.txs["discriminator"], x, y),
            "classifier": init_net(self.modules["classifier"], ks[2],
                                   self.txs["classifier"], x),
        }

    def _d_step(self, state, data, class_id, key):
        """Critic update (`src/cgan.py:86-111`)."""
        cfg = self.gan_cfg
        gen, dis = self.modules["generator"], self.modules["discriminator"]
        k_x, k_z, k_d = jax.random.split(key, 3)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g = state["generator"]
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, y, train=True,
            mutable=list(g.mutables.keys()),
        )
        state = {**state, "generator": g.replace(mutables=dict(g_mut))}
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
        """CE(real)+CE(fake) companion-classifier step
        (`src/cgan.py:113-139`)."""
        cfg = self.gan_cfg
        gen, clf = self.modules["generator"], self.modules["classifier"]
        k_x, k_z, k_c = jax.random.split(key, 3)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g = state["generator"]
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, y, train=True,
            mutable=list(g.mutables.keys()),
        )
        state = {**state, "generator": g.replace(mutables=dict(g_mut))}
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

    def _g_step(self, state, data, class_id, epoch, key):
        """Generator step: adversarial + progressive CE
        (`src/cgan.py:141-178`)."""
        cfg = self.gan_cfg
        hp = self.hparams
        gen, dis = self.modules["generator"], self.modules["discriminator"]
        clf = self.modules["classifier"]
        k_y, k_z, k_d, k_c = jax.random.split(key, 4)
        y = self._sample_labels(k_y, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g, d, c = state["generator"], state["discriminator"], state["classifier"]

        def loss_fn(gp):
            (x_fake, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z, y, train=True,
                mutable=["batch_stats"],
            )
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, y, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            logits = clf.apply({"params": c.params}, x_fake, train=True,
                               rngs={"dropout": k_c})
            adv = losses.wasserstein_g_loss(d_fake)
            ce = losses.cross_entropy(logits, y)
            lam_c = progressive_lambda(epoch, hp["lambda_class"], 200, 500)
            total = hp["lambda_adv"] * adv + lam_c * ce
            return total, {"mutables": dict(g_mut), "d_mut": dict(d_mut),
                           "adv": adv, "class": ce}

        new_g, aux = grad_update(g, self.txs["generator"], loss_fn)
        state = {
            **state,
            "generator": new_g,
            "discriminator": d.replace(mutables=aux["d_mut"]),
        }
        return state, {"adv_loss": aux["adv"], "class_loss": aux["class"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg

        def class_body(carry, class_id):
            state, key = carry
            key, kd, kc, kg = jax.random.split(key, 4)
            state, _ = jax.lax.scan(
                lambda s, k: self._d_step(s, data, class_id, k), state,
                jax.random.split(kd, cfg.d_loop_num))
            state, _ = jax.lax.scan(
                lambda s, k: self._c_step(s, data, class_id, k), state,
                jax.random.split(kc, cfg.c_loop_num))
            state, g_losses = jax.lax.scan(
                lambda s, k: self._g_step(s, data, class_id, epoch, k), state,
                jax.random.split(kg, cfg.g_loop_num))
            return (state, key), jax.tree.map(lambda x: x[-1], g_losses)

        (state, _), per_class = jax.lax.scan(
            self._guard_class_round(class_body, data), (state, key),
            jnp.arange(self._class_rounds()))
        return state, self._epoch_losses(per_class, data)

    def _generator_forward(self, state, z, labels, key):
        x, _ = apply_eval(self.modules["generator"], state["generator"],
                          z, labels)
        return x

    def _classifier_logits(self, state, x):
        return apply_eval(self.modules["classifier"], state["classifier"], x)
