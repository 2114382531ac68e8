"""Loss-weight schedules.

The GAN family enables the generator's classification loss progressively:
0 before `warmup` epochs, linear ramp to `lam` between `warmup` and `full`,
then constant (reference `src/cvae_gan.py:198-204`). Implemented as a pure
function of a traced epoch scalar so it lives inside the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp


def progressive_lambda(epoch, lam: float, warmup: int = 200, full: int = 500):
    """λ_class(e): 0 for e<warmup, linear ramp on [warmup, full), lam after."""
    e = jnp.asarray(epoch, jnp.float32)
    progress = jnp.clip((e - warmup) / float(max(full - warmup, 1)), 0.0, 1.0)
    return lam * progress
