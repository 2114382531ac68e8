"""SNGAN — conditional GAN with hinge loss and spectral norm everywhere.

Capability parity with reference `src/sngan.py` + `src/models/
sngan_models.py`: per class per epoch, D x5 with hinge loss
`E[relu(1-D(x))] + E[relu(1+D(G))]` (`src/sngan.py:100-110`), C x5 on
CE(real)+CE(fake), G x3 on hinge `-E[D(G)]` + progressive CE
(`:141-176`). Spectral norm is applied to the generator and companion
classifier as well (`src/models/sngan_models.py:21-40,158-180`).
Loss history records d_loss, g_loss and class_loss (`src/sngan.py:179-181`).

The reference also contains a dead WGAN-GP `calculate_gradient_penalty`
helper (`src/sngan.py:320-342`); the live equivalent lives in
`cvaegan_tpu.core.losses.gradient_penalty` (used by CTGAN).
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
from cvaegan_tpu.models import sngan as sngan_models
from cvaegan_tpu.parallel.mesh import shard_leading


class SNGAN(GenerativeTrainer):
    name = "sngan"
    config_key = "sngan"
    loss_keys = ("d_loss", "g_loss", "class_loss")

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "generator": sngan_models.SNGANGenerator(
                output_dim=self.feature_num, num_classes=self.label_num,
                spectral=bool(self.hparams.get("spectral_g", True))),
            "discriminator": sngan_models.SNGANDiscriminator(
                num_classes=self.label_num),
            "classifier": sngan_models.SNGANClassifier(
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
        return {
            "generator": init_net(self.modules["generator"], ks[0],
                                  self.txs["generator"], z, y),
            "discriminator": init_net(self.modules["discriminator"], ks[1],
                                      self.txs["discriminator"], x, y),
            "classifier": init_net(self.modules["classifier"], ks[2],
                                   self.txs["classifier"], x),
        }

    def _gen_fake(self, state, z, y):
        """Train-mode no-grad generator forward; commits BN/spectral stats."""
        gen = self.modules["generator"]
        g = state["generator"]
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, y, train=True,
            mutable=list(g.mutables.keys()),
        )
        return {**state, "generator": g.replace(mutables=dict(g_mut))}, x_fake

    def _d_step(self, state, data, class_id, key):
        """Hinge critic update (`src/sngan.py:100-113`)."""
        cfg = self.gan_cfg
        dis = self.modules["discriminator"]
        k_x, k_z = jax.random.split(key)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        state, x_fake = self._gen_fake(state, z, y)
        d = state["discriminator"]

        def loss_fn(dp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            yy = jnp.concatenate([y, y], axis=0)
            (scores, _), m = dis.apply(
                {"params": dp, **d.mutables}, both, yy, train=True,
                mutable=["spectral"],
            )
            d_real, d_fake = jnp.split(scores, 2, axis=0)
            return losses.hinge_d_loss(d_real, d_fake), {"mutables": dict(m)}

        new_d, aux = grad_update(d, self.txs["discriminator"], loss_fn)
        return {**state, "discriminator": new_d}, aux["loss"]

    def _c_step(self, state, data, class_id, key):
        cfg = self.gan_cfg
        clf = self.modules["classifier"]
        k_x, k_z = jax.random.split(key)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        state, x_fake = self._gen_fake(state, z, y)
        c = state["classifier"]

        def loss_fn(cp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            logits, m = clf.apply(
                {"params": cp, **c.mutables}, both, train=True,
                mutable=["spectral"],
            )
            rl, fl = jnp.split(logits, 2, axis=0)
            loss = losses.cross_entropy(rl, y) + losses.cross_entropy(fl, y)
            return loss, {"mutables": dict(m)}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, class_id, epoch, key):
        cfg = self.gan_cfg
        hp = self.hparams
        gen = self.modules["generator"]
        dis, clf = self.modules["discriminator"], self.modules["classifier"]
        k_y, k_z = jax.random.split(key)
        y = self._sample_labels(k_y, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g, d, c = state["generator"], state["discriminator"], state["classifier"]

        def loss_fn(gp):
            (x_fake, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z, y, train=True,
                mutable=["batch_stats", "spectral"],
            )
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, y, train=True,
                mutable=["spectral"],
            )
            logits, c_mut = clf.apply(
                {"params": c.params, **c.mutables}, x_fake, train=True,
                mutable=["spectral"],
            )
            g_loss = losses.wasserstein_g_loss(d_fake)  # hinge G = -E[D]
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
                jax.random.split(kd, cfg.d_loop_num))
            state, _ = jax.lax.scan(
                lambda s, k: self._c_step(s, data, class_id, k), state,
                jax.random.split(kc, cfg.c_loop_num))
            state, g_losses = jax.lax.scan(
                lambda s, k: self._g_step(s, data, class_id, epoch, k), state,
                jax.random.split(kg, cfg.g_loop_num))
            out = {"d_loss": d_losses[-1],
                   **jax.tree.map(lambda x: x[-1], g_losses)}
            return (state, key), out

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
