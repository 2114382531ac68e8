"""CVAE — CVAE-GAN minus the discriminator.

Capability parity with reference `src/cvae.py` + `src/models/
cvae_models.py`: per class per epoch, the companion classifier takes
`c_loop_num` CE(real)+CE(fake) steps and encoder+generator take
`g_loop_num` joint steps on `lambda_recon*MSE + lambda_kl*KL +
progressive_lambda_class*CE(C(x_recon))` — note the classification loss
uses the RECONSTRUCTION, not a prior sample (`src/cvae.py:137-154`).
Same progressive schedule as CVAE-GAN (`:141-147`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.schedules import progressive_lambda
from cvaegan_tpu.core.state import (
    NetState, adam, apply_eval, grad_update, grad_update_pair, init_net,
)
from cvaegan_tpu.models import mlp
from cvaegan_tpu.parallel.mesh import shard_leading


class CVAE(GenerativeTrainer):
    name = "cvae"
    config_key = "cvae"
    loss_keys = ("recon_loss", "kl_loss", "class_loss")

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "encoder": mlp.GaussianEncoder(
                num_classes=self.label_num, latent_dim=cfg.z_size
            ),
            "generator": mlp.Generator(
                output_dim=self.feature_num, num_classes=self.label_num
            ),
            "classifier": mlp.Classifier(num_classes=self.label_num),
        }
        self.txs = {
            "encoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 3)
        x = jnp.zeros((2, self.feature_num))
        y = jnp.zeros((2,), jnp.int32)
        z = jnp.zeros((2, cfg.z_size))
        return {
            "encoder": init_net(self.modules["encoder"], ks[0],
                                self.txs["encoder"], x, y),
            "generator": init_net(self.modules["generator"], ks[1],
                                  self.txs["generator"], z, y),
            "classifier": init_net(self.modules["classifier"], ks[2],
                                   self.txs["classifier"], x),
        }

    def _c_step(self, state, data, class_id, key):
        """CE(real)+CE(fake) companion-classifier step
        (`src/cvae.py:89-113`)."""
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
            real_logits, fake_logits = jnp.split(logits, 2, axis=0)
            loss = losses.cross_entropy(real_logits, y) + losses.cross_entropy(
                fake_logits, y)
            return loss, {"mutables": c.mutables}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, class_id, epoch, key):
        """Joint E+G step: MSE + KL + progressive CE on the reconstruction
        (`src/cvae.py:115-154`)."""
        cfg = self.gan_cfg
        hp = self.hparams
        enc, gen = self.modules["encoder"], self.modules["generator"]
        clf = self.modules["classifier"]
        k_x, k_eps, k_c = jax.random.split(key, 3)
        x_real, y = self._sample_batch(k_x, data, class_id)
        e, g, c = state["encoder"], state["generator"], state["classifier"]

        def loss_fn(ep, gp):
            (mu, log_var), e_mut = enc.apply(
                {"params": ep, **e.mutables}, x_real, y, train=True,
                mutable=["batch_stats"],
            )
            z_enc = mlp.reparameterize(k_eps, mu, log_var)
            (x_recon, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z_enc, y, train=True,
                mutable=["batch_stats"],
            )
            logits = clf.apply({"params": c.params}, x_recon, train=True,
                               rngs={"dropout": k_c})
            recon = losses.mse(x_recon, x_real)
            kl = losses.kl_standard_normal(mu, log_var)
            ce = losses.cross_entropy(logits, y)
            lam_c = progressive_lambda(epoch, hp["lambda_class"], 200, 500)
            total = (hp["lambda_recon"] * recon + hp["lambda_kl"] * kl
                     + lam_c * ce)
            return total, {"mutables_a": dict(e_mut), "mutables_b": dict(g_mut),
                           "recon": recon, "kl": kl, "class": ce}

        new_e, new_g, aux = grad_update_pair(
            e, g, self.txs["encoder"], self.txs["generator"], loss_fn)
        state = {**state, "encoder": new_e, "generator": new_g}
        return state, {"recon_loss": aux["recon"], "kl_loss": aux["kl"],
                       "class_loss": aux["class"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg

        def class_body(carry, class_id):
            state, key = carry
            key, kc, kg = jax.random.split(key, 3)
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

    def reconstruct_samples(self, samples, labels):
        """Conditional encode->decode (`src/cvae.py:302-320`)."""
        import numpy as np

        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("recon")
        if fn is None:
            def _recon(state, key, x, y):
                mu, log_var = apply_eval(self.modules["encoder"],
                                         state["encoder"], x, y)
                z = mlp.reparameterize(key, mu, log_var)
                out, _ = apply_eval(self.modules["generator"],
                                    state["generator"], z, y)
                return out

            fn = jax.jit(_recon)
            self._gen_cache["recon"] = fn
        return np.asarray(fn(self.state, self._next_key(),
                             jnp.asarray(samples, jnp.float32),
                             jnp.asarray(labels, jnp.int32)))
