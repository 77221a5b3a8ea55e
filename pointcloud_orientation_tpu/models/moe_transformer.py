"""MoE point transformer: conditional capacity for the flagship backbone.

A capability extension with no reference counterpart (the torch reference's
`models/point_transformer.py:4-20` is a dense 6-layer encoder): the same
embed → post-norm encoder → mean-pool → regress pipeline as
:class:`~pointcloud_orientation_tpu.models.PointTransformer`, but each
layer's dense FFN is replaced by the top-1 routed
:class:`~pointcloud_orientation_tpu.parallel.MoEFeedForward` — ``n_experts``
FFNs with parameters stacked on a leading expert axis, switch-style
load-balance auxiliary loss accumulated across layers.

Expert parallelism falls out of the parameter layout: shard the stacked
``wi/bi/wo/bo`` leaves ``P('expert')`` (:func:`moe_ep_param_specs`) and jit —
the masked dense dispatch einsums carry the expert axis, so XLA's SPMD
partitioner keeps each chip's compute on its local expert slice and inserts
one psum at the combine. The model code is identical sharded and unsharded
(test-pinned equal in ``tests/test_moe_transformer.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.ep import MoEFeedForward


class MoETransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (torch-default structure, as the dense
    flagship) with a routed-MoE FFN; returns ``(x, aux_loss)``."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    n_experts: int = 4
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    dispatch: str = "masked"
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )(x, x)
        x = nn.LayerNorm(dtype=self.dtype)(
            x + nn.Dropout(self.dropout)(attn, deterministic=not train)
        )
        h, aux = MoEFeedForward(
            embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            n_experts=self.n_experts,
            dispatch=self.dispatch,
            capacity_factor=self.capacity_factor,
        )(x)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        return x, aux


class MoEPointTransformer(nn.Module):
    """Embed → ``depth`` MoE encoder layers → mean-pool → regress 3-vector.

    Returns ``(out (B, 3), aux)`` where ``aux`` is the mean load-balance
    loss over layers — add ``aux_weight * aux`` (0.01 is the usual switch
    coefficient) to the task loss when training.
    """

    in_dim: int = 3
    embed_dim: int = 64
    num_heads: int = 4
    depth: int = 6
    ffn_dim: int = 2048
    n_experts: int = 4
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    dispatch: str = "masked"
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        aux_total = jnp.zeros((), jnp.float32)
        for i in range(self.depth):
            h, aux = MoETransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.ffn_dim,
                self.n_experts, self.dropout, dtype=self.dtype,
                dispatch=self.dispatch,
                capacity_factor=self.capacity_factor,
                name=f"MoETransformerEncoderLayer_{i}",
            )(h, train)
            aux_total = aux_total + aux.astype(jnp.float32)
        h = jnp.mean(h.astype(jnp.float32), axis=1)
        return nn.Dense(3)(h), aux_total / self.depth


def moe_ep_param_specs(params, axis: str = "expert"):
    """PartitionSpec tree: expert-stacked leaves (``wi/bi/wo/bo`` inside any
    ``MoEFeedForward_*``) sharded on their leading axis; all else replicated.
    Composable with the TP/FSDP spec choosers on orthogonal axes."""

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if keys and keys[-1] in ("wi", "bi", "wo", "bo") and any(
                "MoEFeedForward" in k for k in keys):
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_moe_params(params, mesh: Mesh, axis: str = "expert"):
    """Place a :class:`MoEPointTransformer` param tree on ``mesh`` with the
    experts scattered over ``axis``."""
    specs = moe_ep_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
