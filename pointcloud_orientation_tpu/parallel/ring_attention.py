"""Ring attention: exact sequence-parallel attention with explicit
ppermute collectives.

The reference's only "long context" is the point transformer's full O(N^2)
self-attention on one device (`models/point_transformer.py:9-12`,
SURVEY.md §5 long-context). Sharding the point axis under plain ``jit``
works (XLA all-gathers K/V), but materializes the full K/V on every device.
Ring attention never does: each device keeps its Q shard resident and
streams K/V shards around the ring (one ``ppermute`` per step, riding ICI),
merging partial results with the streaming-softmax (log-sum-exp) update —
memory per device stays O(N/n_devices), communication overlaps compute.

Use via ``shard_map`` over a mesh axis:

    mesh = make_mesh(("data", "model"), (dp, sp))
    attn = shard_map(
        partial(ring_attention, axis_name="model"),
        mesh=mesh,
        in_specs=(P("data", "model"), P("data", "model"), P("data", "model")),
        out_specs=P("data", "model"),
    )
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _attend_block(q, k, v, scale, compute_dtype=None):
    """Scores and un-normalized attention for one K/V block.

    Returns ``(block_max (..., Sq, 1), exp_scores @ v, exp_sums)`` for the
    streaming-softmax merge. With ``compute_dtype`` (e.g. bf16) the two
    einsums run at reduced precision with f32 accumulation — the softmax
    bookkeeping (max/exp/sums and the ring merge) always stays f32.
    """
    if compute_dtype is not None:
        s = jnp.einsum(
            "...qd,...kd->...qk",
            q.astype(compute_dtype), k.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * scale
    else:
        s = jnp.einsum("...qd,...kd->...qk", q, k) * scale  # (..., Sq, Sk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if compute_dtype is not None:
        o = jnp.einsum(
            "...qk,...kd->...qd",
            p.astype(compute_dtype), v.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        o = jnp.einsum("...qk,...kd->...qd", p, v)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return m, o, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "model",
    scale: Optional[float] = None,
    compute_dtype=None,
) -> jax.Array:
    """Exact softmax attention with Q/K/V sharded over ``axis_name``.

    Must run inside ``shard_map`` (or ``pmap``) with ``axis_name`` bound.
    Shapes are the *local shards*: ``q (..., Sq, D)``, ``k/v (..., Sk, D)``;
    the logical sequence is ``n_devices * S``. Numerics match full
    attention to f32 rounding (streaming log-sum-exp merge);
    ``compute_dtype=jnp.bfloat16`` runs the block matmuls on the MXU at
    bf16 with f32 accumulation (merge stays f32).
    """
    n = jax.lax.psum(1, axis_name)
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    perm = [(i, (i + 1) % n) for i in range(n)]

    def merge(acc, blk):
        # streaming-softmax merge of a new block into the accumulators
        m_acc, o_acc, l_acc = acc
        m_blk, o_blk, l_blk = blk
        m_new = jnp.maximum(m_acc, m_blk)
        alpha = jnp.exp(m_acc - m_new)
        beta = jnp.exp(m_blk - m_new)
        return m_new, o_acc * alpha + o_blk * beta, l_acc * alpha + l_blk * beta

    if n == 1:
        m0, o0, l0 = _attend_block(q, k, v, scale, compute_dtype)
        return o0 / l0

    # Overlapped ring schedule: each step STARTS the ppermute of the
    # resident (not-yet-attended) block, then attends that same resident
    # block while the transfer is in flight — the two have no data
    # dependence, so the scheduler hides the ICI latency under the block
    # matmuls (per step: max(transfer, compute), not transfer + compute).
    # Merge order (own block, then received blocks in ring order) is
    # IDENTICAL to the serial schedule, so numerics are unchanged.
    k_nxt = jax.lax.ppermute(k, axis_name, perm)
    v_nxt = jax.lax.ppermute(v, axis_name, perm)
    acc = _attend_block(q, k, v, scale, compute_dtype)

    def body(i, carry):
        acc, k_cur, v_cur = carry
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        acc = merge(acc, _attend_block(q, k_cur, v_cur, scale, compute_dtype))
        return acc, k_nxt, v_nxt

    acc, k_last, v_last = jax.lax.fori_loop(
        0, n - 2, body, (acc, k_nxt, v_nxt)
    )
    m_acc, o_acc, l_acc = merge(
        acc, _attend_block(q, k_last, v_last, scale, compute_dtype))
    return o_acc / l_acc


def make_ring_attention(mesh, axis_name: str = "model", data_axis: str = "data",
                        compute_dtype=None):
    """Build a shard_mapped ring attention over ``mesh``:
    ``fn(q, k, v) -> out`` with ``(B, H, N, D)`` arrays whose N axis is
    sharded over ``axis_name`` and batch over ``data_axis``."""
    from jax import shard_map

    spec = P(data_axis, None, axis_name, None)
    return shard_map(
        functools.partial(ring_attention, axis_name=axis_name,
                          compute_dtype=compute_dtype),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
