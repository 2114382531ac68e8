"""Model introspection: first-layer feature importance.

Parity with the reference's `get_feature_importance` helpers
(`src/models/cvae_gan_models.py:231-247,285-292`): the mean |weight| of
the first Linear layer per input feature — for conditional
discriminators, split into data-feature vs condition importance.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def _first_dense_kernel(params) -> Optional[np.ndarray]:
    """Depth-first search for the first 2-D 'kernel' leaf ([in, out])."""
    found = []

    def visit(path, leaf):
        if (not found and hasattr(leaf, "ndim") and leaf.ndim == 2
                and path and getattr(path[-1], "key", None) == "kernel"):
            found.append(np.asarray(leaf))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return found[0] if found else None


def first_layer_importance(params) -> Optional[np.ndarray]:
    """Mean |W| over the output dim of the first dense layer ->
    per-input-feature importance [in_features]."""
    kernel = _first_dense_kernel(params)
    if kernel is None:
        return None
    return np.mean(np.abs(kernel), axis=1)


def split_importance(params, in_features: int) -> Tuple[Optional[np.ndarray],
                                                        Optional[np.ndarray]]:
    """Conditional-network variant: (data_importance, condition_importance)
    (`src/models/cvae_gan_models.py:231-247`)."""
    imp = first_layer_importance(params)
    if imp is None:
        return None, None
    return imp[:in_features], imp[in_features:]
