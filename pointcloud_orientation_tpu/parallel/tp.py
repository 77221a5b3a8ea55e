"""Tensor parallelism for the point transformer (Megatron-style sharding).

The reference is strictly single-device (SURVEY.md §2.7); this module is the
TPU-native capability extension: the flagship
:class:`~pointcloud_orientation_tpu.models.PointTransformer`'s *parameters*
are sharded over the mesh ``model`` axis — attention heads column-parallel
(q/k/v projections split over the head axis, the out projection row-parallel)
and the FFN column→row parallel (``W1`` split over its 2048-wide hidden dim,
``W2`` over its input dim) — the classic Megatron-LM layout, expressed the
idiomatic JAX way: a :class:`~jax.sharding.PartitionSpec` per parameter and a
plain ``jit``. XLA's SPMD partitioner propagates the operand shardings
through the matmuls and inserts exactly the two all-reduces per layer
(after ``out`` and after ``W2``) over ICI; there is no hand-written
communication and no model-code change.

This composes with data parallelism (batch over ``data``) and with sequence
parallelism/ring attention (:mod:`.sp_transformer`): DP shards the batch, SP
shards activations over points, TP shards parameters over heads/hidden —
three orthogonal axes of the same mesh story.

Why TP matters here: at ``ffn_dim=2048`` (torch-default, the parity config)
the FFN weights dominate the parameter count; TP divides both the per-chip
parameter/optimizer memory and the per-chip matmul FLOPs by the ``model``
axis size while keeping the activation layout untouched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_specs(params, axis: str = "model"):
    """PartitionSpec pytree for a :class:`PointTransformer` param tree.

    Megatron layout per encoder layer (flax MHA / Dense kernel shapes):

    ======================================  ==============  =================
    parameter                               shape           spec
    ======================================  ==============  =================
    attention ``query/key/value`` kernel    ``(E, H, D)``   ``P(None, axis)``
    attention ``query/key/value`` bias      ``(H, D)``      ``P(axis)``
    attention ``out`` kernel                ``(H, D, E)``   ``P(axis)``
    attention ``out`` bias                  ``(E,)``        replicated
    FFN ``Dense_0`` (W1) kernel             ``(E, F)``      ``P(None, axis)``
    FFN ``Dense_0`` bias                    ``(F,)``        ``P(axis)``
    FFN ``Dense_1`` (W2) kernel             ``(F, E)``      ``P(axis)``
    FFN ``Dense_1`` bias                    ``(E,)``        replicated
    embed/head Dense, LayerNorms            —               replicated
    ======================================  ==============  =================

    Sharding the *leading* dim of a spec shards that dim of the kernel;
    trailing dims are replicated (``P(axis)`` on a rank-3 kernel ≡
    ``P(axis, None, None)``). The specs only name mesh axes — the same tree
    drives a 2-chip or a 256-chip ``model`` axis.
    """

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(k) for k in keys)
        if "MultiHeadDotProductAttention" in joined:
            last = keys[-1]
            proj = keys[-2] if len(keys) >= 2 else ""
            if proj in ("query", "key", "value"):
                return P(None, axis) if last == "kernel" else P(axis)
            if proj == "out":
                return P(axis) if last == "kernel" else P()
        if "TransformerEncoderLayer" in joined and "Dense_0" in keys:
            return P(None, axis) if keys[-1] == "kernel" else P(axis)
        if "TransformerEncoderLayer" in joined and "Dense_1" in keys:
            return P(axis) if keys[-1] == "kernel" else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_tp_params(params, mesh: Mesh, axis: str = "model"):
    """Place a param tree on ``mesh`` under the Megatron specs."""
    specs = tp_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_tp_train_step(
    model,
    tx,
    mesh: Mesh,
    data_axis: str = "data",
    train: bool = False,
):
    """Build ``step(params, opt_state, x, target[, rng]) -> (params,
    opt_state, loss)`` with TP(+DP) sharding.

    ``params``/``opt_state`` live under :func:`tp_param_specs` shardings
    (use :func:`shard_tp_params` — the model axis is chosen there;
    ``tx.init`` on sharded params yields like-sharded moments);
    ``x (B, N, 3)``/``target (B, 3)`` are constrained to shard over
    ``data_axis`` (only when the mesh has that axis). Inside ``jit`` the
    gradient of a sharded parameter inherits its sharding, so Adam updates
    stay chip-local; the only cross-chip traffic is the two activation
    all-reduces per layer (TP) and the loss-gradient all-reduce over
    ``data`` (DP), all inserted by XLA.

    ``train=True`` runs dropout and therefore REQUIRES ``rng`` (the
    ``'dropout'`` PRNG collection, the repo convention).
    """
    import optax

    out_spec = NamedSharding(mesh, P())
    batch_spec = (
        NamedSharding(mesh, P(data_axis))
        if data_axis in mesh.axis_names else None
    )

    @jax.jit
    def step(params, opt_state, x, target, rng=None):
        if train and rng is None:
            raise ValueError(
                "make_tp_train_step(train=True) requires step(..., rng=...) "
                "for the 'dropout' PRNG collection")
        if batch_spec is not None:
            x = jax.lax.with_sharding_constraint(x, batch_spec)
            target = jax.lax.with_sharding_constraint(target, batch_spec)

        def loss_fn(p):
            rngs = {"dropout": rng} if rng is not None else None
            out = model.apply({"params": p}, x, train=train, rngs=rngs)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, jax.lax.with_sharding_constraint(loss, out_spec)

    return step
