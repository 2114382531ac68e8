"""On-device class-conditional batch sampling.

TPU-native replacement for the reference's per-label python dict built by
O(n^2) `torch.cat` (`src/cvae_gan.py:238-245`) and its host-side
`_get_target_samples` resampling (`:247-260`): the whole train set lives in
device memory, and a padded [label_num, max_count] index table lets a
jitted step gather a class-conditional batch with two array ops.

Divergence note: the reference samples WITHOUT replacement when a class has
more rows than the batch; we sample with replacement (uniform over the
class) in all cases — statistically equivalent for SGD and branch-free
under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ClassIndex:
    """Padded per-class row-index table for class-conditional gathers."""

    table: jnp.ndarray   # [label_num, max_count] int32, rows padded with idx 0
    counts: jnp.ndarray  # [label_num] int32 true class sizes

    @classmethod
    def build(cls, labels: np.ndarray, label_num: int,
              pad_to: int | None = None) -> "ClassIndex":
        """`pad_to` fixes the table width (>= the largest class) so
        windows of varying class mixes share ONE compiled program — the
        out-of-core `fit_streamed` path depends on this shape stability."""
        labels = np.asarray(labels)
        counts = np.bincount(labels, minlength=label_num).astype(np.int32)
        max_count = max(int(counts.max()), 1)
        width = max_count if pad_to is None else int(pad_to)
        if width < max_count:
            raise ValueError(f"pad_to {width} < largest class {max_count}")
        table = np.zeros((label_num, width), dtype=np.int32)
        for c in range(label_num):
            idx = np.nonzero(labels == c)[0].astype(np.int32)
            table[c, : len(idx)] = idx
        return cls(table=jnp.asarray(table), counts=jnp.asarray(counts))

    @property
    def label_num(self) -> int:
        return self.table.shape[0]


def sample_class_batch(
    key: jax.Array,
    index: ClassIndex,
    samples: jnp.ndarray,
    class_id: jnp.ndarray,
    batch_size: int,
) -> jnp.ndarray:
    """Draw `batch_size` rows of `samples` belonging to `class_id`.

    `class_id` may be a traced scalar, so one compiled step serves every
    class. Uniform with replacement over the class's rows.
    """
    from cvaegan_tpu.parallel.mesh import shard_leading

    count = jnp.maximum(index.counts[class_id], 1)
    r = jax.random.randint(key, (batch_size,), 0, count)
    # Constrain the INDEX vector, not the gathered rows: the gather of a
    # replicated table with data-sharded indices is natively sharded on
    # the batch axis, whereas constraining the gather output forces a
    # device-order change XLA can only satisfy by full rematerialization
    # (observed SPMD warnings in the round-1 multichip dryrun).
    rows = index.table[class_id, shard_leading(r)]
    return samples[rows]


def present_labels(key: jax.Array, shape: Tuple[int, ...],
                   index: ClassIndex) -> jnp.ndarray:
    """Uniform label draws over the classes PRESENT in `index`
    (counts > 0).

    Branch-free streamed-window support: a time-ordered corpus window may
    hold zero rows of a rare class; drawing its label would gather
    padding rows (row 0) under a wrong label. The sparse-window draw uses
    a traced maxval (`randint(key, shape, 0, n_present)`) — unbiased for
    ANY present count, unlike a `% n_present` fold of a [0, label_num)
    draw, which skews toward lower-ranked present classes whenever
    n_present does not divide label_num. When every class is present the
    select picks the plain [0, label_num) draw bitwise, so in-memory fits
    are unchanged.
    """
    present = index.counts > 0
    n_present = jnp.maximum(jnp.sum(present), 1)
    order = jnp.argsort(~present, stable=True)  # present first, original order
    raw = jax.random.randint(key, shape, 0, index.label_num)
    unbiased = jax.random.randint(key, shape, 0, n_present)
    return jnp.where(n_present == index.label_num, raw, order[unbiased])


def sample_balanced_batch(
    key: jax.Array,
    index: ClassIndex,
    samples: jnp.ndarray,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-balanced mixed batch: labels drawn uniformly over (present)
    classes, rows drawn uniformly within each label's pool.

    This powers the beyond-parity `balanced_mode` training scheme (one
    mixed-class update round per epoch instead of the reference's
    per-class round-robin): every step sees all classes equally,
    and the epoch cost is independent of label_num.
    """
    from cvaegan_tpu.parallel.mesh import shard_leading

    k_lab, k_row = jax.random.split(key)
    labels = shard_leading(present_labels(k_lab, (batch_size,), index))
    counts = jnp.maximum(index.counts[labels], 1)
    r = jax.random.randint(k_row, (batch_size,), 0, jnp.iinfo(jnp.int32).max)
    rows = index.table[labels, r % counts]  # sharding follows `labels`
    return samples[rows], labels


def sample_random_batch(
    key: jax.Array, samples: jnp.ndarray, labels: jnp.ndarray, batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform batch over the whole train set (unconditional family,
    reference `src/gan.py:149-185`)."""
    from cvaegan_tpu.parallel.mesh import shard_leading

    r = shard_leading(
        jax.random.randint(key, (batch_size,), 0, samples.shape[0]))
    return samples[r], labels[r]  # sharding follows the index vector
