"""VAE-GAN — unconditional encoder/generator/critic hybrid.

Capability parity with reference `src/vae_gan.py` + `src/models/
vae_gan_models.py`: per epoch, D x5 (Wasserstein sign loss,
`src/vae_gan.py:77-100`) then E+G x3 on `1.0*MSE + 0.01*KL + 0.1*adv`
with strict z_enc/z_prior separation (`:103-141`). There is NO companion
classifier and hence NO qualified-sample filter — only `generate_samples`
and `reconstruct_samples` (`:241-262`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.state import (
    NetState, adam, apply_eval, grad_update, grad_update_pair, init_net,
)
from cvaegan_tpu.data.sampler import sample_random_batch
from cvaegan_tpu.models import mlp
from cvaegan_tpu.parallel.mesh import shard_leading


class VAEGAN(GenerativeTrainer):
    name = "vae_gan"
    config_key = "vae_gan"
    conditional_sampling = False
    loss_keys = ("recon_loss", "kl_loss", "adv_loss")

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "encoder": mlp.GaussianEncoder(num_classes=0, latent_dim=cfg.z_size),
            "generator": mlp.Generator(output_dim=self.feature_num,
                                       num_classes=0),
            "discriminator": mlp.Discriminator(num_classes=0, spectral=True),
        }
        self.txs = {
            "encoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "discriminator": adam(cfg.d_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 3)
        x = jnp.zeros((2, self.feature_num))
        z = jnp.zeros((2, cfg.z_size))
        return {
            "encoder": init_net(self.modules["encoder"], ks[0],
                                self.txs["encoder"], x),
            "generator": init_net(self.modules["generator"], ks[1],
                                  self.txs["generator"], z),
            "discriminator": init_net(self.modules["discriminator"], ks[2],
                                      self.txs["discriminator"], x),
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

    def _g_step(self, state, data, key):
        """Joint E+G step with z_enc (recon/KL) vs z_prior (adv) separation
        (`src/vae_gan.py:103-141`)."""
        cfg = self.gan_cfg
        hp = self.hparams
        enc, gen = self.modules["encoder"], self.modules["generator"]
        dis = self.modules["discriminator"]
        k_x, k_eps, k_z, k_d = jax.random.split(key, 4)
        x_real, _ = sample_random_batch(k_x, data["samples"], data["labels"],
                                        cfg.batch_size)
        z_prior = shard_leading(
            jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        e, g, d = state["encoder"], state["generator"], state["discriminator"]

        def loss_fn(ep, gp):
            (mu, log_var), e_mut = enc.apply(
                {"params": ep, **e.mutables}, x_real, train=True,
                mutable=["batch_stats"],
            )
            z_enc = mlp.reparameterize(k_eps, mu, log_var)
            (x_recon, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z_enc, train=True,
                mutable=["batch_stats"],
            )
            (x_fake, _), g_mut = gen.apply(
                {"params": gp, **dict(g_mut)}, z_prior, train=True,
                mutable=["batch_stats"],
            )
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            recon = losses.mse(x_recon, x_real)
            kl = losses.kl_standard_normal(mu, log_var)
            adv = losses.wasserstein_g_loss(d_fake)
            total = (hp["lambda_recon"] * recon + hp["lambda_kl"] * kl
                     + hp["lambda_adv"] * adv)
            return total, {"mutables_a": dict(e_mut), "mutables_b": dict(g_mut),
                           "d_mut": dict(d_mut),
                           "recon": recon, "kl": kl, "adv": adv}

        new_e, new_g, aux = grad_update_pair(
            e, g, self.txs["encoder"], self.txs["generator"], loss_fn)
        state = {**state, "encoder": new_e, "generator": new_g,
                 "discriminator": d.replace(mutables=aux["d_mut"])}
        return state, {"recon_loss": aux["recon"], "kl_loss": aux["kl"],
                       "adv_loss": aux["adv"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg
        kd, kg = jax.random.split(key)
        state, _ = jax.lax.scan(lambda s, k: self._d_step(s, data, k), state,
                                jax.random.split(kd, cfg.d_loop_num))
        state, g_losses = jax.lax.scan(lambda s, k: self._g_step(s, data, k),
                                       state,
                                       jax.random.split(kg, cfg.g_loop_num))
        return state, jax.tree.map(lambda x: x[-1], g_losses)

    def _generator_forward(self, state, z, labels, key):
        del labels
        x, _ = apply_eval(self.modules["generator"], state["generator"], z)
        return x

    def generate_samples(self, num: int):  # type: ignore[override]
        """Unconditional prior sampling (`src/vae_gan.py:241-244`)."""
        import numpy as np

        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("gen")
        if fn is None:
            fn = jax.jit(lambda state, key, z:
                         self._generator_forward(state, z, None, key))
            self._gen_cache["gen"] = fn
        z = jax.random.normal(self._next_key(), (num, self.gan_cfg.z_size))
        return np.asarray(fn(self.state, self._next_key(), z))

    def generate_qualified_samples(self, *args, **kwargs):
        raise NotImplementedError(
            "VAE-GAN has no companion classifier and therefore no "
            "qualified-sample filter (reference `src/vae_gan.py` defines "
            "only generate_samples/reconstruct_samples)"
        )

    def reconstruct_samples(self, samples):  # type: ignore[override]
        """Unconditional encode->decode (`src/vae_gan.py:246-262`)."""
        import numpy as np

        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("recon")
        if fn is None:
            def _recon(state, key, x):
                mu, log_var = apply_eval(self.modules["encoder"],
                                         state["encoder"], x)
                z = mlp.reparameterize(key, mu, log_var)
                out, _ = apply_eval(self.modules["generator"],
                                    state["generator"], z)
                return out

            fn = jax.jit(_recon)
            self._gen_cache["recon"] = fn
        return np.asarray(fn(self.state, self._next_key(),
                             jnp.asarray(samples, jnp.float32)))
