"""CVAE-GAN — the flagship 4-network conditional VAE-GAN.

Capability parity with reference `src/cvae_gan.py` + `src/models/
cvae_gan_models.py`:
  * per-class round-robin training: D x5 (Wasserstein sign loss), C x5
    (CE on real + fake), E+G x3 (recon MSE + KL + adversarial + CE) per
    class per epoch (`src/cvae_gan.py:100-216`),
  * strict z_enc (recon/KL) vs z_prior (adv/class) separation (`:159-216`),
  * progressive lambda_class schedule: 0 for e<200, linear ramp 200->500
    (`:198-204`),
  * prior sampling, confidence-filtered sampling, reconstruction
    (`:339-397`).

TPU-native design: the full epoch (classes x (5 D + 5 C + 3 G) updates) is
a single XLA program — `lax.scan` over classes, `lax.scan` over the inner
update loops — scanned over epochs in `fit` (see base class).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.schedules import progressive_lambda
from cvaegan_tpu.core.state import (
    NetState,
    adam,
    apply_eval,
    grad_update,
    grad_update_pair,
    init_net,
)
from cvaegan_tpu.models import mlp
from cvaegan_tpu.parallel.mesh import shard_leading


class CVAEGAN(GenerativeTrainer):
    name = "cvae_gan"
    config_key = "cvae_gan"
    loss_keys = ("recon_loss", "kl_loss", "adv_loss", "class_loss")

    # ------------------------------------------------------------- build
    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "encoder": mlp.GaussianEncoder(
                num_classes=self.label_num, latent_dim=cfg.z_size
            ),
            "generator": mlp.Generator(
                output_dim=self.feature_num, num_classes=self.label_num
            ),
            "discriminator": mlp.Discriminator(
                num_classes=self.label_num, spectral=True
            ),
            "classifier": mlp.Classifier(num_classes=self.label_num),
        }
        self.txs = {
            "encoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "discriminator": adam(cfg.d_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 4)
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
            "classifier": init_net(self.modules["classifier"], ks[3],
                                   self.txs["classifier"], x),
        }

    # ------------------------------------------------------------- steps
    def _d_step(self, state, data, class_id, key):
        """Critic update: -E[D(x,y)] + E[D(G(z,y),y)]
        (reference `src/cvae_gan.py:104-128`)."""
        cfg = self.gan_cfg
        gen, dis = self.modules["generator"], self.modules["discriminator"]
        k_x, k_z, k_d1, k_d2 = jax.random.split(key, 4)

        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        # Generator runs in train mode under no-grad: BN running stats
        # still update (torch `.train()` + `no_grad`, `src/cvae_gan.py:110-113`).
        g = state["generator"]
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, y, train=True,
            mutable=list(g.mutables.keys()),
        )
        state = {**state, "generator": g.replace(mutables=dict(g_mut))}

        d = state["discriminator"]

        def loss_fn(dp):
            # One fused forward over concat(real, fake): per-element dropout
            # makes this distributionally identical to the reference's two
            # forwards, at half the kernel-chain latency. (Divergence: one
            # spectral power iteration per step instead of two.)
            both = jnp.concatenate([x_real, x_fake], axis=0)
            yy = jnp.concatenate([y, y], axis=0)
            (scores, _), m1 = dis.apply(
                {"params": dp, **d.mutables}, both, yy, train=True,
                rngs={"dropout": k_d1}, mutable=["spectral"],
            )
            d_real, d_fake = jnp.split(scores, 2, axis=0)
            return losses.wasserstein_d_loss(d_real, d_fake), {"mutables": dict(m1)}

        new_d, aux = grad_update(d, self.txs["discriminator"], loss_fn)
        return {**state, "discriminator": new_d}, aux["loss"]

    def _c_step(self, state, data, class_id, key):
        """Companion-classifier update: CE(real) + CE(fake)
        (reference `src/cvae_gan.py:131-157`)."""
        cfg = self.gan_cfg
        gen, clf = self.modules["generator"], self.modules["classifier"]
        k_x, k_z, k_c1, k_c2 = jax.random.split(key, 4)

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
            # Fused real+fake forward (see _d_step note).
            both = jnp.concatenate([x_real, x_fake], axis=0)
            logits = clf.apply({"params": cp}, both, train=True,
                               rngs={"dropout": k_c1})
            real_logits, fake_logits = jnp.split(logits, 2, axis=0)
            loss = losses.cross_entropy(real_logits, y) + losses.cross_entropy(
                fake_logits, y
            )
            return loss, {"mutables": c.mutables}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, class_id, epoch, key):
        """Joint encoder+generator update (reference `src/cvae_gan.py:
        159-216`): recon MSE + KL on z_enc; adversarial + CE on z_prior."""
        cfg = self.gan_cfg
        hp = self.hparams
        enc, gen = self.modules["encoder"], self.modules["generator"]
        dis, clf = self.modules["discriminator"], self.modules["classifier"]
        k_x, k_eps, k_z, k_d, k_c = jax.random.split(key, 5)

        x_real, y = self._sample_batch(k_x, data, class_id)
        z_prior = shard_leading(
            jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))

        e = state["encoder"]
        g = state["generator"]
        d = state["discriminator"]
        c = state["classifier"]

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
            (x_fake, _), g_mut = gen.apply(
                {"params": gp, **dict(g_mut)}, z_prior, y, train=True,
                mutable=["batch_stats"],
            )
            # D and C stay in train mode (dropout active, spectral u/v
            # updating) exactly as in the reference's `.train()` modules.
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, y, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            logits = clf.apply({"params": c.params}, x_fake, train=True,
                               rngs={"dropout": k_c})

            recon = losses.mse(x_recon, x_real)
            kl = losses.kl_standard_normal(mu, log_var)
            adv = losses.wasserstein_g_loss(d_fake)
            ce = losses.cross_entropy(logits, y)
            lam_c = progressive_lambda(epoch, hp["lambda_class"], 200, 500)
            total = (
                hp["lambda_recon"] * recon
                + hp["lambda_kl"] * kl
                + hp["lambda_adv"] * adv
                + lam_c * ce
            )
            aux = {
                "mutables_a": dict(e_mut),
                "mutables_b": dict(g_mut),
                "d_mut": dict(d_mut),
                "recon": recon, "kl": kl, "adv": adv, "class": ce,
            }
            return total, aux

        new_e, new_g, aux = grad_update_pair(
            e, g, self.txs["encoder"], self.txs["generator"], loss_fn
        )
        state = {
            **state,
            "encoder": new_e,
            "generator": new_g,
            "discriminator": d.replace(mutables=aux["d_mut"]),
        }
        loss_out = {
            "recon_loss": aux["recon"],
            "kl_loss": aux["kl"],
            "adv_loss": aux["adv"],
            "class_loss": aux["class"],
        }
        return state, loss_out

    # ------------------------------------------------------------- epoch
    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg

        def class_body(carry, class_id):
            state, key = carry
            key, kd, kc, kg = jax.random.split(key, 4)

            def d_body(s, k):
                return self._d_step(s, data, class_id, k)

            def c_body(s, k):
                return self._c_step(s, data, class_id, k)

            def g_body(s, k):
                return self._g_step(s, data, class_id, epoch, k)

            state, _ = jax.lax.scan(d_body, state,
                                    jax.random.split(kd, cfg.d_loop_num))
            state, _ = jax.lax.scan(c_body, state,
                                    jax.random.split(kc, cfg.c_loop_num))
            state, g_losses = jax.lax.scan(g_body, state,
                                           jax.random.split(kg, cfg.g_loop_num))
            last = jax.tree.map(lambda x: x[-1], g_losses)
            return (state, key), last

        (state, _), per_class = jax.lax.scan(
            self._guard_class_round(class_body, data), (state, key),
            jnp.arange(self._class_rounds())
        )
        # The reference records the losses of the last class's final G step
        # (`src/cvae_gan.py:218-222`); absent-class rounds (streamed
        # windows) are masked and skipped in the pick.
        return state, self._epoch_losses(per_class, data)

    # --------------------------------------------------------- generation
    def _generator_forward(self, state, z, labels, key):
        x, _ = apply_eval(self.modules["generator"], state["generator"], z, labels)
        return x

    def _classifier_logits(self, state, x):
        return apply_eval(self.modules["classifier"], state["classifier"], x)

    def reconstruct_samples(self, samples, labels):
        """Encode with reparameterisation, then decode (reference
        `src/cvae_gan.py:380-397`)."""
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
        x = jnp.asarray(samples, jnp.float32)
        y = jnp.asarray(labels, jnp.int32)
        return np.asarray(fn(self.state, self._next_key(), x, y))
