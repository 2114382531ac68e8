"""TMG-GAN — Targeted Multi-Generator GAN.

Capability parity with reference `src/tmg_gan.py` + `src/models/
tmg_gan_models.py`:
  * one generator per class + a shared CD network with critic and
    softmax-classifier heads over a common trunk (`src/tmg_gan.py:13-20`),
  * per class per epoch: CD x5 on `(E[D(G)]-E[D(x)])/2 + CE` (`:61-86`),
    G x3 on `-E[D(G)] + CE + (-cos(hidden_real, hidden_fake))` with the
    cosine term disabled for e<1000 (`:89-119`),
  * an EPOCH-LEVEL cross-generator diversity step: every generator emits
    3 samples and the mean pairwise cosine similarity of their trunk
    hidden states (divided by feature_num) is backpropagated through ALL
    generators (`:120-146`),
  * epoch-mod-10 scatter snapshots into gan_outs/tmg_<e>.jpg (`:149-177`),
  * CD-argmax qualified sampling with patience 10 that falls back to
    accepting an arbitrary sample when patience runs out — always
    returning exactly `num` rows (`:234-263`).

TPU-native design: the python list of generators becomes a STACKED
parameter bank; per-class updates slice the bank with
`lax.dynamic_index_in_dim`, and the diversity step is one vmapped
forward + a vmapped per-generator Adam update.

Reference quirk reproduced on purpose: the CD classification head applies
softmax and the loss then applies log-softmax on top
(`src/models/tmg_gan_models.py:31-34`, `src/tmg_gan.py:75-79`).
Divergences (documented): the reference keeps no loss_history — we record
d_loss/g_loss so `plot_loss_history` works uniformly; `_get_target_samples`
uses with-replacement sampling already (`random.choices`), so our sampler
is exact parity here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cvaegan_tpu.algorithms.base import GenerativeTrainer
from cvaegan_tpu.core import losses
from cvaegan_tpu.core.state import NetState, adam, grad_update, init_net
from cvaegan_tpu.data.sampler import sample_class_batch
from cvaegan_tpu.models.tmg import TMGCD, TMGGenerator
from cvaegan_tpu.parallel.mesh import shard_leading


def tree_slice(tree, i):
    return jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tree
    )


def tree_put(tree, i, sub):
    return jax.tree.map(
        lambda x, s: jax.lax.dynamic_update_index_in_dim(x, s[None], i, 0),
        tree, sub,
    )


class TMGGAN(GenerativeTrainer):
    name = "tmg_gan"
    config_key = "tmg_gan"
    loss_keys = ("d_loss", "g_loss")
    #: snapshot cadence — the reference saves a scatter every 10 epochs
    #: (`src/tmg_gan.py:149`); chunking by 10 puts the host callback at
    #: exactly those boundaries.
    epoch_chunk: int = 10

    def __init__(self, seed=None, settings=None, balanced_mode=False):
        if balanced_mode:
            raise ValueError(
                "TMG-GAN has one generator per class — its training is "
                "intrinsically per-class, so balanced_mode does not apply")
        super().__init__(seed=seed, settings=settings)

    def _build(self, key: jax.Array) -> Dict[str, NetState]:
        cfg = self.gan_cfg
        self.modules = {
            "cd": TMGCD(num_classes=self.label_num),
            "generator": TMGGenerator(feature_num=self.feature_num),
        }
        self.txs = {
            "cd": adam(cfg.c_lr, cfg.adam_b1, cfg.adam_b2),
            "generator": adam(cfg.g_lr, cfg.adam_b1, cfg.adam_b2),
        }
        k_cd, k_g = jax.random.split(key)
        x = jnp.zeros((2, self.feature_num))
        z = jnp.zeros((2, cfg.z_size))
        cd_state = init_net(self.modules["cd"], k_cd, self.txs["cd"], x)

        # Stacked generator bank: vmap init over label_num keys.
        gen = self.modules["generator"]
        gkeys = jax.random.split(k_g, self.label_num)

        def init_one(k):
            variables = gen.init({"params": k}, z, train=False)
            return variables["params"], {
                c: v for c, v in variables.items() if c != "params"
            }

        stacked_params, stacked_muts = jax.vmap(init_one)(gkeys)
        stacked_opt = jax.vmap(self.txs["generator"].init)(stacked_params)
        gens = NetState(params=stacked_params, mutables=stacked_muts,
                        opt_state=stacked_opt)
        return {"cd": cd_state, "gens": gens}

    # ------------------------------------------------------------ helpers
    def _gen_forward_slice(self, gens: NetState, class_id, z, train: bool):
        """Forward one generator of the bank; returns (x, hidden, new
        slice mutables)."""
        gen = self.modules["generator"]
        params = tree_slice(gens.params, class_id)
        muts = tree_slice(gens.mutables, class_id)
        if train:
            (x, hidden), new_muts = gen.apply(
                {"params": params, **muts}, z, train=True,
                mutable=list(muts.keys()),
            )
            return x, hidden, dict(new_muts)
        x, hidden = gen.apply({"params": params, **muts}, z, train=False)
        return x, hidden, muts

    def _cd_step(self, state, data, class_id, key):
        """CD update: (E[D(G)]-E[D(x)])/2 + CE on real softmax probs
        (`src/tmg_gan.py:61-86`)."""
        cfg = self.gan_cfg
        cd = self.modules["cd"]
        k_x, k_z, k_d = jax.random.split(key, 3)
        x_real = sample_class_batch(k_x, data["index"], data["samples"],
                                    class_id, cfg.batch_size)
        y = shard_leading(jnp.full((cfg.batch_size,), class_id, jnp.int32))
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        x_fake, _, new_g_muts = self._gen_forward_slice(
            state["gens"], class_id, z, train=True)
        gens = state["gens"].replace(
            mutables=tree_put(state["gens"].mutables, class_id, new_g_muts))
        state = {**state, "gens": gens}
        c = state["cd"]

        def loss_fn(cp):
            both = jnp.concatenate([x_real, x_fake], axis=0)
            (scores, probs, _), m = cd.apply(
                {"params": cp, **c.mutables}, both, train=True,
                rngs={"dropout": k_d}, mutable=["spectral"],
            )
            s_real, s_fake = jnp.split(scores.astype(jnp.float32), 2, axis=0)
            probs_real = probs[: cfg.batch_size]
            d_loss = (jnp.mean(s_fake) - jnp.mean(s_real)) / 2.0
            # CE over softmax outputs — faithful reference quirk.
            c_loss = losses.cross_entropy(probs_real, y)
            return d_loss + c_loss, {"mutables": dict(m), "d": d_loss}

        new_cd, aux = grad_update(c, self.txs["cd"], loss_fn)
        return {**state, "cd": new_cd}, aux["d"]

    def _g_step(self, state, data, class_id, epoch, key):
        """Per-class generator update (`src/tmg_gan.py:89-119`)."""
        cfg = self.gan_cfg
        cd = self.modules["cd"]
        gen = self.modules["generator"]
        k_x, k_z, k_d1, k_d2 = jax.random.split(key, 4)
        x_real = sample_class_batch(k_x, data["index"], data["samples"],
                                    class_id, cfg.batch_size)
        y = shard_leading(jnp.full((cfg.batch_size,), class_id, jnp.int32))
        z = shard_leading(jax.random.normal(k_z, (cfg.batch_size, cfg.z_size)))
        gens = state["gens"]
        c = state["cd"]
        g_params = tree_slice(gens.params, class_id)
        g_muts = tree_slice(gens.mutables, class_id)
        g_opt = tree_slice(gens.opt_state, class_id)
        cos_gate = jnp.where(epoch < 1000, 0.0, 1.0)

        def loss_fn(gp):
            (x_fake, _), new_g_muts = gen.apply(
                {"params": gp, **g_muts}, z, train=True,
                mutable=list(g_muts.keys()),
            )
            (_, _, hidden_real), m1 = cd.apply(
                {"params": c.params, **c.mutables}, x_real, train=True,
                rngs={"dropout": k_d1}, mutable=["spectral"],
            )
            (s_fake, probs_fake, hidden_fake), m2 = cd.apply(
                {"params": c.params, **dict(m1)}, x_fake, train=True,
                rngs={"dropout": k_d2}, mutable=["spectral"],
            )
            cos = losses.cosine_similarity(hidden_real, hidden_fake)
            g_loss = (-jnp.mean(s_fake.astype(jnp.float32))
                      + losses.cross_entropy(probs_fake, y)
                      - cos_gate * cos)
            return g_loss, {"g_muts": dict(new_g_muts), "cd_muts": dict(m2),
                            "g": g_loss}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, new_opt = self.txs["generator"].update(grads, g_opt, g_params)
        import optax
        new_params = optax.apply_updates(g_params, updates)
        gens = NetState(
            params=tree_put(gens.params, class_id, new_params),
            mutables=tree_put(gens.mutables, class_id, aux["g_muts"]),
            opt_state=tree_put(gens.opt_state, class_id, new_opt),
        )
        state = {**state, "gens": gens,
                 "cd": c.replace(mutables=aux["cd_muts"])}
        return state, aux["g"]

    def _diversity_step(self, state, key):
        """Cross-generator hidden-state decorrelation (`src/tmg_gan.py:
        120-146`): 3 samples per generator, mean pairwise cosine of
        hidden states / feature_num, one Adam step on every generator."""
        cfg = self.gan_cfg
        gen = self.modules["generator"]
        gens = state["gens"]
        L = self.label_num
        z = jax.random.normal(key, (L, 3, cfg.z_size))

        def loss_fn(stacked_params):
            def fwd(p, m, zz):
                (x, hidden), new_m = gen.apply(
                    {"params": p, **m}, zz, train=True,
                    mutable=list(m.keys()),
                )
                return hidden, dict(new_m)

            hidden, new_muts = jax.vmap(fwd)(stacked_params, gens.mutables, z)
            hidden = hidden.astype(jnp.float32)
            hn = hidden / (jnp.linalg.norm(hidden, axis=-1, keepdims=True) + 1e-8)
            # mean pairwise row-wise cosine over ordered pairs i != j
            cos_mat = jnp.einsum("ikd,jkd->ijk", hn, hn)
            mask = 1.0 - jnp.eye(L)
            pair_mean = jnp.sum(cos_mat.mean(-1) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0)
            return pair_mean / self.feature_num, new_muts

        (loss, new_muts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(gens.params)
        import optax

        def upd(g, o, p):
            u, no = self.txs["generator"].update(g, o, p)
            return optax.apply_updates(p, u), no

        new_params, new_opt = jax.vmap(upd)(grads, gens.opt_state, gens.params)
        state = {**state, "gens": NetState(new_params, new_muts, new_opt)}
        return state, loss

    # ------------------------------------------------------------- epoch
    def _epoch_body(self, state, data, epoch, key):
        cfg = self.gan_cfg

        def class_body(carry, class_id):
            state, key = carry
            key, kc, kg = jax.random.split(key, 3)
            state, d_losses = jax.lax.scan(
                lambda s, k: self._cd_step(s, data, class_id, k), state,
                jax.random.split(kc, cfg.c_loop_num))
            state, g_losses = jax.lax.scan(
                lambda s, k: self._g_step(s, data, class_id, epoch, k), state,
                jax.random.split(kg, cfg.g_loop_num))
            return (state, key), {"d_loss": d_losses[-1],
                                  "g_loss": g_losses[-1]}

        (state, key), per_class = jax.lax.scan(
            self._guard_class_round(class_body, data), (state, key),
            jnp.arange(self.label_num))
        key, k_div = jax.random.split(key)
        # The cross-generator diversity step keeps coupling ALL
        # generators (absent-class generators included), mirroring the
        # reference's epoch-level step (`src/tmg_gan.py:120-146`).
        state, _ = self._diversity_step(state, k_div)
        return state, self._epoch_losses(per_class, data)

    def _on_chunk_end(self, epochs_done: int) -> None:
        """Scatter snapshot of generated samples, the reference's
        epoch-mod-10 diagnostic (`src/tmg_gan.py:149-177`)."""
        if self.feature_num < 2:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        samples = [self.generate_samples(i, 10) for i in range(self.label_num)]
        plt.figure(figsize=(10, 8))
        for i, s in enumerate(samples):
            plt.scatter(s[:, 0], s[:, 1], label=f"Class {i}", alpha=0.6)
        plt.title(f"TMG-GAN Generated Samples (Epoch {epochs_done})")
        plt.xlabel("Feature 0")
        plt.ylabel("Feature 1")
        plt.legend()
        plt.grid(True, alpha=0.3)
        plt.savefig(self.settings.paths.gan_outs / f"tmg_{epochs_done}.jpg")
        plt.close()

    # --------------------------------------------------------- generation
    def _generator_forward(self, state, z, labels, key):
        """Mixed-label-safe bank forward: run every generator of the bank
        (vmap over stacked params — eval mode has no batch coupling, so
        per-row selection is exact) and gather each row's output from its
        label's generator. label_num× the FLOPs of a single slice, but the
        MLPs are tiny and this removes the silent labels[0] keying for
        mixed-label batches (VERDICT r1 Weak #6)."""
        gen = self.modules["generator"]
        gens = state["gens"]

        def fwd(p, m):
            x, _ = gen.apply({"params": p, **m}, z, train=False)
            return x

        x_all = jax.vmap(fwd)(gens.params, gens.mutables)  # [L, n, F]
        return x_all[labels, jnp.arange(z.shape[0])]

    def _classifier_logits(self, state, x):
        cd = self.modules["cd"]
        c = state["cd"]
        _, probs, _ = cd.apply({"params": c.params, **c.mutables}, x,
                               train=False)
        return probs

    def generate_qualified_samples(self, target_label: int, num: int):
        """CD-argmax filter with patience-10 fallback: always returns
        exactly `num` samples (`src/tmg_gan.py:234-263`)."""
        assert self.state is not None, "call fit() first"
        fn = self._gen_cache.get("qualified")
        if fn is None:
            def _qualified(state, key, labels):
                kz, kg = jax.random.split(key)
                z = jax.random.normal(kz, (labels.shape[0], self.gan_cfg.z_size))
                x = self._generator_forward(state, z, labels, kg)
                probs = self._classifier_logits(state, x)
                valid = jnp.argmax(probs, axis=-1) == labels
                return x, valid

            fn = jax.jit(_qualified)
            self._gen_cache["qualified"] = fn

        # pow2-bucketed candidate batch, never shrinking: the jitted
        # filter is shape-keyed on `cand`, so distinct per-class needs
        # would otherwise each retrace it (VERDICT r3 item 3).
        cand = 256
        while cand < min(4096, 2 * num):
            cand *= 2
        cand = max(cand, self._gen_cache.get("qualified_cand", 0))
        self._gen_cache["qualified_cand"] = cand
        labels = jnp.full((cand,), target_label, jnp.int32)
        collected, total, empty_rounds = [], 0, 0
        while total < num:
            x, valid = fn(self.state, self._next_key(), labels)
            x = np.asarray(x)
            good = x[np.asarray(valid)]
            if len(good) == 0:
                empty_rounds += 1
                if empty_rounds >= 10:
                    # patience exhausted: accept arbitrary samples
                    take = x[: num - total]
                    collected.append(take)
                    total += len(take)
                    empty_rounds = 0
                continue
            empty_rounds = 0
            take = good[: num - total]
            collected.append(take)
            total += len(take)
        return np.concatenate(collected, axis=0)
