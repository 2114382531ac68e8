"""Ring (context-parallel) attention over a mesh axis.

The reference's only attention runs on singleton sequences
(`src/models/rain_gan_models.py:139` — `unsqueeze(1)`), so context
parallelism has no parity obligation; this module is the promised
long-context extension of `kernels/block_attention.py` (SURVEY.md §5
"Long-context / sequence parallelism"): the same online-softmax
recurrence, but with KV *shards* streamed from neighbouring devices over
ICI instead of KV *blocks* streamed from local HBM.

Design (the standard ring schedule):
  * the sequence axis is sharded over a mesh axis — every device holds
    one Q shard `[bh, seq/N, d]` and one KV shard of the same length;
  * N steps: each device attends its Q shard to the KV shard it
    currently holds, folds the partial result into running
    (max, sum, accumulator) statistics — the same (m, l, acc) merge the
    blockwise kernel uses — then passes the KV shard to the next device
    with `jax.lax.ppermute` (a pure ICI neighbour exchange, no
    all-gather, O(seq/N) memory per device);
  * after N steps every device has attended to the full sequence and
    normalises locally. Exact per-row attention entropy is carried the
    same way (running Σ p·s statistic, see `_attn_ent_kernel`).

Per-step local compute is a single fused matmul chain XLA maps onto the
MXU; on-device block decomposition inside a shard is `block_attention`'s
job and composes (each local step may itself call the Pallas kernel).

Communication cost: N-1 ppermutes of the KV shard (2·seq/N·d floats)
— bandwidth-optimal for attention over ICI, and compute on step i
overlaps with the (asynchronous) transfer of shard i+1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _merge_step(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                scale: float, carry, with_entropy: bool):
    """Fold one KV shard into the running online-softmax statistics.

    carry = (m, l, acc[, sl]) with m,l,sl of shape [bh, sq, 1] and acc of
    shape [bh, sq, d]; identical recurrence to `_attn_kernel` /
    `_attn_ent_kernel` in block_attention.py, proven there against the
    dense oracle.
    """
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    if with_entropy:
        m_prev, l_prev, acc, sl_prev = carry
    else:
        m_prev, l_prev, acc = carry
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc = alpha * acc + jnp.einsum("bqk,bkd->bqd", p, v,
                                   preferred_element_type=jnp.float32)
    if with_entropy:
        sl_new = alpha * sl_prev + jnp.sum(p * s, axis=-1, keepdims=True)
        return m_new, l_new, acc, sl_new
    return m_new, l_new, acc


def _ring_body(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               axis_name: str, with_entropy: bool):
    """Per-device body run under shard_map: q/k/v are the LOCAL shards."""
    bh, sq, d = q.shape
    scale = d ** -0.5
    n = jax.lax.psum(1, axis_name)

    m0 = jnp.full((bh, sq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bh, sq, 1), jnp.float32)
    acc0 = jnp.zeros((bh, sq, d), jnp.float32)
    carry = (m0, l0, acc0, jnp.zeros((bh, sq, 1), jnp.float32)) \
        if with_entropy else (m0, l0, acc0)
    # The carry becomes device-varying after the first merge; mark the
    # (replicated) initial values as varying over the ring axis so the
    # fori_loop carry type is stable under shard_map's manual-axes check.
    # jax >= 0.9 spells this jax.lax.pcast(..., to='varying'); pvary is
    # deprecated there but still the only spelling on older versions.
    if hasattr(jax.lax, "pcast"):
        _vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    else:  # pragma: no cover - legacy jax
        _vary = lambda x: jax.lax.pvary(x, (axis_name,))
    carry = jax.tree.map(_vary, carry)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(i, state):
        kv, carry = state
        k_i, v_i = kv
        carry = _merge_step(q, k_i, v_i, scale, carry, with_entropy)
        # Rotate KV to the next device unconditionally: after n steps the
        # shards are back at their origin (the final rotation overlaps
        # with the epilogue and keeps the loop body collective-uniform).
        kv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), kv)
        return kv, carry

    _, carry = jax.lax.fori_loop(0, n, step, ((k, v), carry))
    if with_entropy:
        m, l, acc, sl = carry
        return acc / l, (m + jnp.log(l) - sl / l)[..., 0]
    m, l, acc = carry
    return acc / l


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, axis: str = "data",
    with_entropy: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact softmax(q kᵀ/√d) v with the sequence axis sharded over
    `axis` of `mesh`.

    q, k, v: [bh, seq, d] global arrays (seq must be a multiple of the
    ring size — pad the sequence up to one if needed). Returns
    [bh, seq, d] (plus per-row entropy [bh, seq] when `with_entropy`),
    numerically identical to the dense oracle up to float32 reduction
    order.
    """
    bh, seq, d = q.shape
    n = mesh.shape[axis]
    if seq % n:
        raise ValueError(
            f"ring size {n} must divide seq {seq} — pad seq to a "
            f"multiple of {n}")

    spec = P(None, axis, None)
    ent_spec = P(None, axis)
    body = functools.partial(_ring_body, axis_name=axis,
                             with_entropy=with_entropy)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, ent_spec) if with_entropy else spec,
    )
    return fn(q, k, v)
