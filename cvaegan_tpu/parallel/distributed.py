"""Multi-host (pod / multi-slice) bootstrap.

The reference has no distributed support at all (its SLURM file requests
2 GPUs and uses one, `scripts/run.sbatch:8`, SURVEY.md §2.4). Here
multi-host runs are the standard JAX recipe: every host calls
`initialize()`, builds the same global mesh over `jax.devices()` (which
then spans all hosts), and runs the identical jitted train step — XLA
routes collectives over ICI within a slice and DCN across slices.

Single-host usage needs none of this; `cvaegan_tpu.parallel.mesh` works
directly on the local devices.

Verification level: `initialize()` is exercised in LOOPBACK form (a
1-process jax.distributed cluster + a global-mesh epoch,
`tests/test_parallel.py::test_distributed_initialize_loopback_smoke`);
real multi-host coordination cannot be verified in a single-host
environment — treat this module as the standard recipe, validated to
the loopback boundary.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the jax.distributed cluster.

    With no arguments, defers to JAX's environment autodetection (TPU
    pods set the coordination env automatically). Explicit arguments
    follow `jax.distributed.initialize` semantics.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multi_host() -> bool:
    return jax.process_count() > 1


def global_mesh(n_model: int = 1):
    """Build a ('data','model') mesh spanning every device in the
    (possibly multi-host) cluster."""
    from cvaegan_tpu.parallel.mesh import make_mesh

    n_total = len(jax.devices())
    if n_total % max(n_model, 1):
        raise ValueError(
            f"model-parallel degree {n_model} does not divide the "
            f"{n_total} global devices")
    return make_mesh(n_total // n_model, n_model)
