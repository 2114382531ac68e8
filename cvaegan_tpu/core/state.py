"""Training-state plumbing for alternating-update adversarial training.

A trainer's device state is a dict of `NetState` pytrees (one per network:
encoder / generator / discriminator / classifier ...). Each `NetState`
carries the parameter tree, the mutable variable collections (`batch_stats`
for BatchNorm running stats, `spectral` for power-iteration vectors — the
explicit-state equivalents of torch's forward-hook buffers), and the optax
optimizer state. Everything is a pytree, so the whole dict flows through
`jit`/`lax.scan` with donated buffers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import optax
from flax import struct


@struct.dataclass
class NetState:
    params: Any
    mutables: Dict[str, Any]
    opt_state: Any


def init_net(
    module,
    key: jax.Array,
    tx: optax.GradientTransformation,
    *example_args,
    **example_kwargs,
) -> NetState:
    """Initialise a Flax module + its optimizer into a NetState."""
    kp, kd = jax.random.split(key)
    variables = module.init(
        {"params": kp, "dropout": kd}, *example_args, train=False, **example_kwargs
    )
    params = variables["params"]
    mutables = {k: v for k, v in variables.items() if k != "params"}
    return NetState(params=params, mutables=mutables, opt_state=tx.init(params))


def apply_eval(module, net: NetState, *args, **kwargs):
    """Forward pass in eval mode (running BN stats, frozen spectral u/v,
    no dropout)."""
    return module.apply({"params": net.params, **net.mutables}, *args,
                        train=False, **kwargs)


def apply_train(module, net: NetState, rng: jax.Array, *args, **kwargs):
    """Forward pass in train mode, returning (outputs, new_mutables).

    Used for no-grad forwards (e.g. the generator inside the D-step): BN
    running stats and spectral u/v still update, matching torch modules in
    `.train()` mode under `no_grad` (reference `src/cvae_gan.py:110-113`).
    """
    mutable = list(net.mutables.keys())
    out, new_mut = module.apply(
        {"params": net.params, **net.mutables},
        *args,
        train=True,
        rngs={"dropout": rng},
        mutable=mutable,
        **kwargs,
    )
    return out, dict(new_mut)


def adam(lr: float, b1: float = 0.5, b2: float = 0.999) -> optax.GradientTransformation:
    """GAN-family Adam (reference betas `src/cvae_gan.py:75-97`)."""
    return optax.adam(lr, b1=b1, b2=b2)


def grad_update(
    net: NetState,
    tx: optax.GradientTransformation,
    loss_fn: Callable[[Any], Tuple[Any, Dict[str, Any]]],
) -> Tuple[NetState, Any]:
    """One optimizer step on a single network.

    `loss_fn(params) -> (loss, aux)` where `aux` must contain key
    'mutables' with the network's updated mutable collections.
    Returns (new_state, aux).
    """
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(net.params)
    updates, new_opt = tx.update(grads, net.opt_state, net.params)
    new_params = optax.apply_updates(net.params, updates)
    aux["loss"] = loss
    return NetState(new_params, aux.pop("mutables"), new_opt), aux


def grad_update_pair(
    net_a: NetState,
    net_b: NetState,
    tx_a: optax.GradientTransformation,
    tx_b: optax.GradientTransformation,
    loss_fn: Callable[[Any, Any], Tuple[Any, Dict[str, Any]]],
) -> Tuple[NetState, NetState, Any]:
    """One joint optimizer step on two networks sharing a loss (the
    encoder+generator update, reference `src/cvae_gan.py:159-216`).

    `loss_fn(params_a, params_b) -> (loss, aux)`; aux must contain
    'mutables_a' and 'mutables_b'.
    """
    (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        net_a.params, net_b.params
    )
    ga, gb = grads
    ua, oa = tx_a.update(ga, net_a.opt_state, net_a.params)
    ub, ob = tx_b.update(gb, net_b.opt_state, net_b.params)
    new_a = NetState(optax.apply_updates(net_a.params, ua), aux.pop("mutables_a"), oa)
    new_b = NetState(optax.apply_updates(net_b.params, ub), aux.pop("mutables_b"), ob)
    aux["loss"] = loss
    return new_a, new_b, aux
