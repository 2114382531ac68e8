"""Device-mesh utilities: first-class data/tensor parallelism.

The reference has NO distributed support of any kind (SURVEY.md §2.4:
single `config.device`, unused SLURM gpu:2). Here parallelism is native:

  * a 2-D `jax.sharding.Mesh` over ('data', 'model') axes,
  * batches sharded over 'data' (data parallelism) via
    `with_sharding_constraint` inside the jitted train step — XLA inserts
    the gradient `psum` over ICI automatically,
  * parameters optionally sharded over 'model' (tensor parallelism of the
    MLP hidden dims) via `shard_net_state`,
  * the same train-step code runs on 1 chip (trivial mesh) or a pod.

A process-wide "active mesh" context lets the samplers and prior draws
annotate leading-axis shardings without threading a mesh handle through
every algorithm.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(n_data: int, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh from the first n_data*n_model
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"mesh needs {need} devices, found {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Activate a mesh for the duration of a block; samplers and prior
    draws pick it up via `shard_leading`."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def shard_leading(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain the leading (batch) axis over the 'data' mesh axis when a
    mesh is active; no-op otherwise. This is the single annotation that
    turns the fused train step into a data-parallel SPMD program."""
    mesh = _ACTIVE_MESH
    if mesh is None or "data" not in mesh.axis_names:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(shape, n_model: int) -> P:
    """Tensor-parallel spec for one parameter leaf: shard the output/
    feature dim over 'model' when it divides evenly, else replicate.
    Dense kernels are [in, out] -> P(None, 'model'); 1-D scales/biases
    [out] -> P('model')."""
    if n_model <= 1:
        return P()
    if len(shape) == 2 and shape[1] % n_model == 0:
        return P(None, "model")
    if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= n_model:
        return P("model")
    return P()


def shard_net_state(state, mesh: Mesh):
    """Build a NamedSharding pytree for a trainer state dict: parameters
    (and their optimizer moments, which mirror the param shapes) sharded
    over 'model', everything else replicated."""
    n_model = mesh.shape.get("model", 1)

    def leaf_sharding(leaf):
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return NamedSharding(mesh, _leaf_spec(leaf.shape, n_model))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, state)


def place(state, shardings):
    """Device-put a state pytree onto its shardings."""
    return jax.tree.map(jax.device_put, state, shardings)
