"""VAE — unconditional encoder/decoder + auxiliary classifier.

Capability parity with reference `src/vae.py` + `src/models/vae_models.py`:
per epoch, the aux classifier takes `c_loop_num` CE steps on real data and
the encoder/decoder take `g_loop_num` joint steps on
`lambda_recon*MSE + lambda_kl*KL` over uniform random batches
(`src/vae.py:94-117`). `generate_samples(num)` is unconditional;
`generate_qualified_samples(label, num)` filters via the aux classifier.

Divergence (documented fix): the reference VAE cannot be constructed at all
— it references `models.ClassifierModel`, which does not exist
(`src/vae.py:24`). We build the standard classifier architecture
(`src/models/vae_models.py:110-151`) instead.
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


class VAE(GenerativeTrainer):
    name = "vae"
    config_key = "vae"
    conditional_sampling = False
    loss_keys = ("recon_loss", "kl_loss")

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "encoder": mlp.GaussianEncoder(num_classes=0, latent_dim=cfg.z_size),
            "decoder": mlp.Generator(output_dim=self.feature_num, num_classes=0),
            "classifier": mlp.Classifier(num_classes=self.label_num),
        }
        self.txs = {
            "encoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "decoder": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
            "classifier": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
        }
        ks = jax.random.split(key, 3)
        x = jnp.zeros((2, self.feature_num))
        z = jnp.zeros((2, cfg.z_size))
        return {
            "encoder": init_net(self.modules["encoder"], ks[0],
                                self.txs["encoder"], x),
            "decoder": init_net(self.modules["decoder"], ks[1],
                                self.txs["decoder"], z),
            "classifier": init_net(self.modules["classifier"], ks[2],
                                   self.txs["classifier"], x),
        }

    def _c_step(self, state, data, key):
        """Aux classifier CE step on real data only (`src/vae.py:94-113`)."""
        cfg = self.gan_cfg
        clf = self.modules["classifier"]
        k_x, k_drop = jax.random.split(key)
        x, y = sample_random_batch(k_x, data["samples"], data["labels"],
                                   cfg.batch_size)
        c = state["classifier"]

        def loss_fn(cp):
            logits = clf.apply({"params": cp}, x, train=True,
                               rngs={"dropout": k_drop})
            return losses.cross_entropy(logits, y), {"mutables": c.mutables}

        new_c, aux = grad_update(c, self.txs["classifier"], loss_fn)
        return {**state, "classifier": new_c}, aux["loss"]

    def _g_step(self, state, data, key):
        """Joint encoder/decoder step on MSE + KL (`src/vae.py:94-117`)."""
        cfg = self.gan_cfg
        hp = self.hparams
        enc, dec = self.modules["encoder"], self.modules["decoder"]
        k_x, k_eps = jax.random.split(key)
        x, _ = sample_random_batch(k_x, data["samples"], data["labels"],
                                   cfg.batch_size)
        e, d = state["encoder"], state["decoder"]

        def loss_fn(ep, dp):
            (mu, log_var), e_mut = enc.apply(
                {"params": ep, **e.mutables}, x, train=True,
                mutable=["batch_stats"],
            )
            z = mlp.reparameterize(k_eps, mu, log_var)
            (x_recon, _), d_mut = dec.apply(
                {"params": dp, **d.mutables}, z, train=True,
                mutable=["batch_stats"],
            )
            recon = losses.mse(x_recon, x)
            kl = losses.kl_standard_normal(mu, log_var)
            total = hp["lambda_recon"] * recon + hp["lambda_kl"] * kl
            return total, {"mutables_a": dict(e_mut), "mutables_b": dict(d_mut),
                           "recon": recon, "kl": kl}

        new_e, new_d, aux = grad_update_pair(
            e, d, self.txs["encoder"], self.txs["decoder"], loss_fn
        )
        state = {**state, "encoder": new_e, "decoder": new_d}
        return state, {"recon_loss": aux["recon"], "kl_loss": aux["kl"]}

    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg
        kc, kg = jax.random.split(key)

        def c_body(s, k):
            return self._c_step(s, data, k)

        def g_body(s, k):
            return self._g_step(s, data, k)

        state, _ = jax.lax.scan(c_body, state,
                                jax.random.split(kc, cfg.c_loop_num))
        state, g_losses = jax.lax.scan(g_body, state,
                                       jax.random.split(kg, cfg.g_loop_num))
        return state, jax.tree.map(lambda x: x[-1], g_losses)

    # --------------------------------------------------------- generation
    def _generator_forward(self, state, z, labels, key):
        del labels  # unconditional decoder
        x, _ = apply_eval(self.modules["decoder"], state["decoder"], z)
        return x

    def _classifier_logits(self, state, x):
        return apply_eval(self.modules["classifier"], state["classifier"], x)

    def generate_samples(self, num: int):  # type: ignore[override]
        """Unconditional prior sampling (`src/vae.py:generate_samples`) —
        signature differs from the conditional family on purpose."""
        import numpy as np

        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("gen")
        if fn is None:
            def _gen(state, key, z):
                return self._generator_forward(state, z, None, key)

            fn = jax.jit(_gen)
            self._gen_cache["gen"] = fn
        z = jax.random.normal(self._next_key(), (num, self.gan_cfg.z_size))
        return np.asarray(fn(self.state, self._next_key(), z))

    # generate_qualified_samples: inherited from the base class — the
    # unconditional generator simply ignores the label argument while the
    # aux classifier filters to the requested class
    # (`src/vae.py:generate_qualified_samples` semantics).

    def reconstruct_samples(self, samples):  # type: ignore[override]
        """Unconditional encode->decode (`src/vae.py:reconstruct_samples`)."""
        import numpy as np

        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("recon")
        if fn is None:
            def _recon(state, key, x):
                mu, log_var = apply_eval(self.modules["encoder"],
                                         state["encoder"], x)
                z = mlp.reparameterize(key, mu, log_var)
                out, _ = apply_eval(self.modules["decoder"], state["decoder"], z)
                return out

            fn = jax.jit(_recon)
            self._gen_cache["recon"] = fn
        x = jnp.asarray(samples, jnp.float32)
        return np.asarray(fn(self.state, self._next_key(), x))
