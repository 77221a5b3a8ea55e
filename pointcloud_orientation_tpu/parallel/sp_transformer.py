"""Sequence-parallel point-transformer training via shard_map + ring attention.

The fully explicit SPMD path for very large point counts: parameters are
replicated, the ``(B, N, C)`` activations are sharded over ``data`` x
``model``, attention mixes information across the point axis through
:func:`.ring_attention.ring_attention` (ppermute K/V streaming), and
gradients are all-reduced over both mesh axes inside the mapped function.
Per-device attention memory is O((N/n)^2-free): no device ever holds the
full K/V or the full score matrix.

This complements the implicit path (plain ``jit`` + sharding constraints,
where XLA inserts K/V all-gathers): same math, explicitly scheduled
communication.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from .ring_attention import ring_attention


class RingSelfAttention(nn.Module):
    """Multi-head self-attention whose mixing runs over a mesh axis.

    QKV/out projections are local (feature-dim matmuls with replicated
    params); the sequence-axis interaction uses ring attention when
    ``axis_name`` is bound (inside shard_map), falling back to full local
    attention otherwise — so one module definition serves both paths with
    one parameter tree.
    """

    embed_dim: int
    num_heads: int
    axis_name: Optional[str] = "model"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, S, E = x.shape
        H = self.num_heads
        D = E // H
        qkv = nn.DenseGeneral((3, H, D), axis=-1, name="qkv")(x)  # (B,S,3,H,D)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, S, H, D)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))  # (B, H, S, D)

        in_shard_map = False
        if self.axis_name is not None:
            try:
                jax.lax.axis_index(self.axis_name)
                in_shard_map = True
            except NameError:
                in_shard_map = False
        if in_shard_map:
            out = ring_attention(q, k, v, axis_name=self.axis_name)
        else:
            scale = D**-0.5
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, S, E)
        return nn.DenseGeneral(E, axis=-1, name="out")(out)


class RingTransformerLayer(nn.Module):
    """Post-norm encoder layer using ring self-attention (LayerNorm is local
    to each point, so it needs no communication)."""

    embed_dim: int
    num_heads: int
    ffn_dim: int = 256
    axis_name: Optional[str] = "model"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        attn = RingSelfAttention(self.embed_dim, self.num_heads, self.axis_name)(x)
        x = nn.LayerNorm()(x + attn)
        h = nn.Dense(self.ffn_dim)(x)
        h = nn.Dense(self.embed_dim)(nn.relu(h))
        return nn.LayerNorm()(x + h)


class RingPointTransformer(nn.Module):
    """Sequence-parallel point transformer: embed -> ring layers -> global
    mean pool (a psum over the sharded point axis) -> 3-vector head.

    Works both inside shard_map (sharded point axis, ring attention,
    cross-shard mean via psum) and as a plain single-device module.
    """

    embed_dim: int = 64
    num_heads: int = 4
    depth: int = 2
    ffn_dim: int = 256
    axis_name: Optional[str] = "model"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim)(x)
        for i in range(self.depth):
            h = RingTransformerLayer(
                self.embed_dim, self.num_heads, self.ffn_dim, self.axis_name,
                name=f"layer_{i}",
            )(h)
        pooled = jnp.mean(h, axis=1)  # local mean over the point shard
        if self.axis_name is not None:
            try:
                pooled = jax.lax.pmean(pooled, self.axis_name)
            except NameError:
                pass
        return nn.Dense(3)(pooled)


def make_sp_train_step(
    model: RingPointTransformer,
    tx,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Build the explicit-SPMD training step.

    Returns ``step(params, opt_state, x, target) -> (params, opt_state,
    loss)`` where ``x (B, N, 3)`` is sharded ``(data, model)`` on (B, N),
    ``target (B, 3)`` sharded ``(data,)``, params/opt_state replicated.

    Gradient correctness rests on shard_map's varying-manual-axes tracking
    (``check_vma``, on by default): the loss is made fully replicated inside
    the mapped function (pmean over ``data``; the model-axis reduction is
    the pooled pmean inside the model), so AD's collective transposes yield
    complete, replicated gradients — no manual grad psum is needed, and
    params used on sharded vs replicated paths are both handled exactly.
    """
    import optax
    from jax import shard_map

    def local_step(params, opt_state, x, target):
        def loss_fn(p):
            out = model.apply({"params": p}, x)  # (b_local, 3)
            local = jnp.mean((out - target) ** 2)
            return jax.lax.pmean(local, data_axis)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return jax.jit(
        shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P(data_axis, model_axis), P(data_axis)),
            out_specs=(P(), P(), P()),
        )
    )
