"""GAN — unconditional generator/critic + auxiliary classifier.

Capability parity with reference `src/gan.py` + `src/models/gan_models.py`:
per epoch, D x5 (Wasserstein sign loss), aux classifier x5 on REAL data
only, G x3 on `lambda_adv*(-E[D(G(z))])` (`src/gan.py:75-134`). The
generator is unconditional; `generate_qualified_samples(label, num)`
filters its output through the aux classifier despite the lack of
conditioning (`src/gan.py:235-266`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.state import (
    NetState, adam, apply_eval, grad_update, init_net,
)
from cvaegan_tpu.data.sampler import sample_random_batch
from cvaegan_tpu.models import mlp
from cvaegan_tpu.parallel.mesh import shard_leading


class GAN(GenerativeTrainer):
    name = "gan"
    config_key = "gan"
    conditional_sampling = False
    loss_keys = ("adv_loss",)

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "generator": mlp.Generator(output_dim=self.feature_num,
                                       num_classes=0),
            "discriminator": mlp.Discriminator(num_classes=0, spectral=True),
            "classifier": mlp.Classifier(num_classes=self.label_num),
        }
        self.txs = {
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "discriminator": adam(cfg.d_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 3)
        x = jnp.zeros((2, self.feature_num))
        z = jnp.zeros((2, cfg.z_size))
        return {
            "generator": init_net(self.modules["generator"], ks[0],
                                  self.txs["generator"], z),
            "discriminator": init_net(self.modules["discriminator"], ks[1],
                                      self.txs["discriminator"], x),
            "classifier": init_net(self.modules["classifier"], ks[2],
                                   self.txs["classifier"], x),
        }

    def _d_step(self, state, data, key):
        cfg = self.gan_cfg
        gen, dis = self.modules["generator"], self.modules["discriminator"]
        k_x, k_z, k_d = jax.random.split(key, 3)
        x_real, _ = sample_random_batch(k_x, data["samples"], data["labels"],
                                        cfg.batch_size)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g = state["generator"]
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, train=True,
            mutable=list(g.mutables.keys()),
        )
        state = {**state, "generator": g.replace(mutables=dict(g_mut))}
        d = state["discriminator"]

        def loss_fn(dp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            (scores, _), m = dis.apply(
                {"params": dp, **d.mutables}, both, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            d_real, d_fake = jnp.split(scores, 2, axis=0)
            return losses.wasserstein_d_loss(d_real, d_fake), {"mutables": dict(m)}

        new_d, aux = grad_update(d, self.txs["discriminator"], loss_fn)
        return {**state, "discriminator": new_d}, aux["loss"]

    def _c_step(self, state, data, key):
        """Aux classifier trained on real data only (`src/gan.py:102-114`)."""
        cfg = self.gan_cfg
        clf = self.modules["classifier"]
        k_x, k_c = jax.random.split(key)
        x, y = sample_random_batch(k_x, data["samples"], data["labels"],
                                   cfg.batch_size)
        c = state["classifier"]

        def loss_fn(cp):
            logits = clf.apply({"params": cp}, x, train=True,
                               rngs={"dropout": k_c})
            return losses.cross_entropy(logits, y), {"mutables": c.mutables}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, key):
        cfg = self.gan_cfg
        hp = self.hparams
        gen, dis = self.modules["generator"], self.modules["discriminator"]
        k_z, k_d = jax.random.split(key)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        g, d = state["generator"], state["discriminator"]

        def loss_fn(gp):
            (x_fake, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z, train=True,
                mutable=["batch_stats"],
            )
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            adv = losses.wasserstein_g_loss(d_fake)
            return hp["lambda_adv"] * adv, {"mutables": dict(g_mut),
                                            "d_mut": dict(d_mut), "adv": adv}

        new_g, aux = grad_update(g, self.txs["generator"], loss_fn)
        state = {**state, "generator": new_g,
                 "discriminator": d.replace(mutables=aux["d_mut"])}
        return state, {"adv_loss": aux["adv"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg
        kd, kc, kg = jax.random.split(key, 3)
        state, _ = jax.lax.scan(lambda s, k: self._d_step(s, data, k), state,
                                jax.random.split(kd, cfg.d_loop_num))
        state, _ = jax.lax.scan(lambda s, k: self._c_step(s, data, k), state,
                                jax.random.split(kc, cfg.c_loop_num))
        state, g_losses = jax.lax.scan(lambda s, k: self._g_step(s, data, k),
                                       state,
                                       jax.random.split(kg, cfg.g_loop_num))
        return state, jax.tree.map(lambda x: x[-1], g_losses)

    def _generator_forward(self, state, z, labels, key):
        del labels
        x, _ = apply_eval(self.modules["generator"], state["generator"], z)
        return x

    def _classifier_logits(self, state, x):
        return apply_eval(self.modules["classifier"], state["classifier"], x)

    def generate_samples(self, num: int):  # type: ignore[override]
        """Unconditional prior sampling (`src/gan.py:generate_samples`)."""
        import numpy as np

        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("gen")
        if fn is None:
            fn = jax.jit(lambda state, key, z:
                         self._generator_forward(state, z, None, key))
            self._gen_cache["gen"] = fn
        z = jax.random.normal(self._next_key(), (num, self.gan_cfg.z_size))
        return np.asarray(fn(self.state, self._next_key(), z))
