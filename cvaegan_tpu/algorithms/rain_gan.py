"""RAIN-GAN — Residual-Attention CVAE-GAN.

Capability parity with reference `src/rain_gan.py` + `src/models/
rain_gan_models.py`: the four networks are pre-LN residual self-attention
stacks; every loss carries an attention-entropy regulariser with
lambda_attention=0.01 (`src/rain_gan.py:137-140,168-171,216-237,269-289`);
per class per epoch D x5 (Wasserstein sign loss), C x5 (CE real+fake),
E+G x3 (recon + KL + adv + progressive CE + attention terms); attention-
weight history recorded every 50 epochs (`:291-316`) and plotted
(`:396-415`); `visualize_attention` exposes encoder/classifier attention
maps (`:482-502`).

Divergence (documented, per SURVEY.md §2): the reference's E+G step
produces BOTH x_recon and x_fake via `generate_conditional_samples`,
which internally draws a FRESH prior z — so its "reconstruction" loss
never sees z_enc and the encoder trains only through KL
(`src/rain_gan.py:194-201`, `src/models/rain_gan_models.py:215-224`).
We implement the reconstruction correctly with z_enc.

Note: with the reference's singleton sequences (seq_len=1) the attention
softmax is over one key, so the entropy terms are exactly zero; the
machinery is kept (and seq-generic) for parity and extension.
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
    NetState, adam, grad_update, grad_update_pair, init_net,
)
from cvaegan_tpu.models import mlp
from cvaegan_tpu.models.attention import (
    RAINClassifier, RAINDiscriminator, RAINEncoder, RAINGenerator,
)
from cvaegan_tpu.parallel.mesh import shard_leading


class RAIN_GAN(GenerativeTrainer):
    name = "rain_gan"
    config_key = "rain_gan"
    loss_keys = ("recon_loss", "kl_loss", "adv_loss", "class_loss",
                 "attention_loss")
    #: attention-history cadence — the reference records mean attention
    #: weights every 50 epochs (`src/rain_gan.py:291-316`, 10 points per
    #: 500-epoch run); chunking by 50 puts the host callback at exactly
    #: those boundaries (VERDICT r1 Weak #1).
    epoch_chunk: int = 50

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "encoder": RAINEncoder(num_classes=self.label_num,
                                   latent_dim=cfg.z_size),
            "generator": RAINGenerator(output_dim=self.feature_num,
                                       num_classes=self.label_num),
            "discriminator": RAINDiscriminator(num_classes=self.label_num),
            "classifier": RAINClassifier(num_classes=self.label_num),
        }
        self.txs = {
            "encoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "discriminator": adam(cfg.d_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        self.attention_history = {
            "encoder": [], "generator": [], "discriminator": [],
            "classifier": [],
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

    def _gen_fake(self, state, z, y):
        gen = self.modules["generator"]
        g = state["generator"]
        (x_fake, _), g_mut = gen.apply(
            {"params": g.params, **g.mutables}, z, y, train=True,
            mutable=list(g.mutables.keys()),
        )
        return {**state, "generator": g.replace(mutables=dict(g_mut))}, x_fake

    def _d_step(self, state, data, class_id, key):
        cfg = self.gan_cfg
        lam_att = self.hparams["lambda_attention"]
        dis = self.modules["discriminator"]
        k_x, k_z = jax.random.split(key)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        state, x_fake = self._gen_fake(state, z, y)
        d = state["discriminator"]

        def loss_fn(dp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            yy = jnp.concatenate([y, y], axis=0)
            (scores, attn), m = dis.apply(
                {"params": dp, **d.mutables}, both, yy, train=True,
                mutable=["spectral"],
            )
            d_real, d_fake = jnp.split(scores, 2, axis=0)
            loss = (losses.wasserstein_d_loss(d_real, d_fake)
                    + lam_att * losses.attention_entropy(attn))
            return loss, {"mutables": dict(m)}

        new_d, aux = grad_update(d, self.txs["discriminator"], loss_fn)
        return {**state, "discriminator": new_d}, aux["loss"]

    def _c_step(self, state, data, class_id, key):
        cfg = self.gan_cfg
        lam_att = self.hparams["lambda_attention"]
        clf = self.modules["classifier"]
        k_x, k_z = jax.random.split(key)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        state, x_fake = self._gen_fake(state, z, y)
        c = state["classifier"]

        def loss_fn(cp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            logits, attn = clf.apply({"params": cp}, both, train=True)
            rl, fl = jnp.split(logits, 2, axis=0)
            loss = (losses.cross_entropy(rl, y) + losses.cross_entropy(fl, y)
                    + lam_att * losses.attention_entropy(attn))
            return loss, {"mutables": c.mutables}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, class_id, epoch, key):
        cfg = self.gan_cfg
        hp = self.hparams
        enc, gen = self.modules["encoder"], self.modules["generator"]
        dis, clf = self.modules["discriminator"], self.modules["classifier"]
        k_x, k_eps, k_z = jax.random.split(key, 3)
        x_real, y = self._sample_batch(k_x, data, class_id)
        z_prior = shard_leading(
            jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        e, g = state["encoder"], state["generator"]
        d, c = state["discriminator"], state["classifier"]

        def loss_fn(ep, gp):
            ((mu, log_var), e_attn), e_mut = enc.apply(
                {"params": ep, **e.mutables}, x_real, y, train=True,
                mutable=list(e.mutables.keys()),
            )
            z_enc = mlp.reparameterize(k_eps, mu, log_var)
            (x_recon, _), g_mut = gen.apply(
                {"params": gp, **g.mutables}, z_enc, y, train=True,
                mutable=list(g.mutables.keys()),
            )
            (x_fake, g_attn), g_mut = gen.apply(
                {"params": gp, **dict(g_mut)}, z_prior, y, train=True,
                mutable=list(g.mutables.keys()),
            )
            (d_fake, _), d_mut = dis.apply(
                {"params": d.params, **d.mutables}, x_fake, y, train=True,
                mutable=["spectral"],
            )
            logits, _ = clf.apply({"params": c.params}, x_fake, train=True)

            recon = losses.mse(x_recon, x_real)
            kl = losses.kl_standard_normal(mu, log_var)
            adv = losses.wasserstein_g_loss(d_fake)
            ce = losses.cross_entropy(logits, y)
            att = (losses.attention_entropy(e_attn)
                   + losses.attention_entropy(g_attn))
            lam_c = progressive_lambda(epoch, hp["lambda_class"], 200, 500)
            total = (hp["lambda_recon"] * recon + hp["lambda_kl"] * kl
                     + hp["lambda_adv"] * adv + lam_c * ce
                     + hp["lambda_attention"] * att)
            return total, {"mutables_a": dict(e_mut), "mutables_b": dict(g_mut),
                           "d_mut": dict(d_mut), "recon": recon, "kl": kl,
                           "adv": adv, "class": ce, "att": att}

        new_e, new_g, aux = grad_update_pair(
            e, g, self.txs["encoder"], self.txs["generator"], loss_fn)
        state = {**state, "encoder": new_e, "generator": new_g,
                 "discriminator": d.replace(mutables=aux["d_mut"])}
        return state, {"recon_loss": aux["recon"], "kl_loss": aux["kl"],
                       "adv_loss": aux["adv"], "class_loss": aux["class"],
                       "attention_loss": aux["att"]}

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

    def _on_chunk_end(self, epochs_done: int) -> None:
        """Record mean attention weights at every 50-epoch chunk boundary
        (`epoch_chunk=50`), matching the reference's 10-points-per-500-epoch
        cadence (`src/rain_gan.py:291-316`). One cached jitted dispatch
        evaluates all four networks' attention on a fixed probe (eager
        applies cost ~1s each over the device tunnel)."""
        fn = getattr(self, "_attn_record_fn", None)
        if fn is None:
            enc, gen = self.modules["encoder"], self.modules["generator"]
            dis, clf = self.modules["discriminator"], self.modules["classifier"]
            z_size = self.gan_cfg.z_size

            def _record(state, x, y):
                e, g = state["encoder"], state["generator"]
                d, c = state["discriminator"], state["classifier"]
                _, e_attn = enc.apply({"params": e.params, **e.mutables},
                                      x, y, train=False)
                _, c_attn = clf.apply({"params": c.params, **c.mutables},
                                      x, train=False)
                z = jnp.zeros((x.shape[0], z_size))
                x_fake, g_attn = gen.apply(
                    {"params": g.params, **g.mutables}, z,
                    jnp.zeros_like(y), train=False)
                _, d_attn = dis.apply(
                    {"params": d.params, **d.mutables}, x_fake,
                    jnp.zeros_like(y), train=False)
                return {k: jnp.mean(v) for k, v in
                        {"encoder": e_attn, "generator": g_attn,
                         "discriminator": d_attn, "classifier": c_attn}.items()}

            fn = jax.jit(_record)
            self._attn_record_fn = fn
        n = min(32, int(self._data["samples"].shape[0]))
        means = jax.device_get(fn(self.state, self._data["samples"][:n],
                                  self._data["labels"][:n]))
        for name, val in means.items():
            self.attention_history[name].append(float(val))

    # --------------------------------------------------------- generation
    def _generator_forward(self, state, z, labels, key):
        gen = self.modules["generator"]
        g = state["generator"]
        x, _ = gen.apply({"params": g.params, **g.mutables}, z, labels,
                         train=False)
        return x

    def _classifier_logits(self, state, x):
        clf = self.modules["classifier"]
        c = state["classifier"]
        logits, _ = clf.apply({"params": c.params, **c.mutables}, x,
                              train=False)
        return logits

    def reconstruct_samples(self, samples, labels):
        """Encode with z_enc, decode (`src/rain_gan.py:456-480`)."""
        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("recon")
        if fn is None:
            def _recon(state, key, x, y):
                enc = self.modules["encoder"]
                e = state["encoder"]
                (mu, log_var), _ = enc.apply(
                    {"params": e.params, **e.mutables}, x, y, train=False)
                z = mlp.reparameterize(key, mu, log_var)
                return self._generator_forward(state, z, y, None)

            fn = jax.jit(_recon)
            self._gen_cache["recon"] = fn
        return np.asarray(fn(self.state, self._next_key(),
                             jnp.asarray(samples, jnp.float32),
                             jnp.asarray(labels, jnp.int32)))

    def visualize_attention(self, samples, labels):
        """Eval-mode encoder/classifier attention maps
        (`src/rain_gan.py:482-502`)."""
        assert self.state is not None, "call fit() first"
        x = jnp.asarray(samples, jnp.float32)
        y = jnp.asarray(labels, jnp.int32)
        enc = self.modules["encoder"]
        e = self.state["encoder"]
        (_, _), e_attn = enc.apply({"params": e.params, **e.mutables}, x, y,
                                   train=False)
        clf = self.modules["classifier"]
        c = self.state["classifier"]
        _, c_attn = clf.apply({"params": c.params, **c.mutables}, x,
                              train=False)
        return {
            "encoder_attention": np.asarray(e_attn),
            "classifier_attention": np.asarray(c_attn),
        }

    def plot_attention_history(self):
        """Attention-weight history curves (`src/rain_gan.py:396-415`)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if not any(self.attention_history.values()):
            return None
        plt.figure(figsize=(12, 8))
        for model_name, weights in self.attention_history.items():
            if weights:
                plt.plot(weights, label=f"{model_name} attention")
        plt.xlabel("Epoch (recorded every 50)")
        plt.ylabel("Mean attention weight")
        plt.title("RAIN-GAN attention history")
        plt.legend()
        plt.grid(True, alpha=0.3)
        out = self.settings.paths.gan_outs / "rain_gan_attention_history.jpg"
        plt.savefig(out)
        plt.close()
        return out
