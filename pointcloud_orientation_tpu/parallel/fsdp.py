"""Fully-sharded data parallelism (ZeRO-3 style) for any model in the zoo.

The reference is strictly single-device (SURVEY.md §2.7); this module is the
TPU-native capability extension that completes the parallelism portfolio
(DP / SP / TP / PP / EP / ring): *every* parameter — and, through ``tx.init``,
every optimizer moment — is sharded over the ``data`` mesh axis, so per-chip
parameter + optimizer memory scales as 1/`|data|` while the batch stays
data-parallel on the same axis.

Expressed the idiomatic JAX way: a :class:`~jax.sharding.PartitionSpec` per
parameter and a plain ``jit``. XLA's SPMD partitioner sees a sharded weight
feeding an unsharded (per-shard-batch) matmul and inserts the all-gather
before use; the transpose of that all-gather in the backward pass is exactly
the ZeRO reduce-scatter, so each chip receives only *its* gradient shard and
the Adam update stays chip-local on 1/`|data|` of the state. No hand-written
collectives, no model-code change — the same step function as plain DP.

Spec choice per leaf: shard the largest dimension divisible by the axis size
(ties go to the trailing/feature dim, which XLA lays out contiguously);
leaves smaller than ``min_weight_size`` or with no divisible dim stay
replicated — the classic FSDP small-tensor escape hatch that avoids
all-gathering biases and layer-norm scales for no memory win.

Composes with tensor parallelism on an orthogonal ``model`` axis: pass
``skip=tp_param_specs(params)`` and FSDP shards what TP left replicated
(embed/head/norms) over ``data`` while TP keeps heads/FFN over ``model``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_param_specs(
    params,
    axis_size: int,
    axis: str = "data",
    min_weight_size: int = 1024,
    skip=None,
):
    """PartitionSpec pytree sharding each leaf's largest divisible dim.

    ``axis_size`` is the size of the mesh ``axis`` the specs will run on —
    divisibility is decided here, so the same tree can be built without a
    live mesh. Leaves with ``size < min_weight_size`` (biases, norm scales)
    or with no dim divisible by ``axis_size`` are replicated.

    ``skip`` (optional) is a like-structured spec tree (e.g. from
    :func:`~pointcloud_orientation_tpu.parallel.tp_param_specs`); any leaf
    whose skip-spec is non-trivial keeps that spec untouched, letting FSDP
    fill in only the parameters another scheme left replicated.
    """

    def spec_for(leaf, prior):
        if prior is not None and tuple(prior) != ():
            return prior
        shape = getattr(leaf, "shape", ())
        size = int(getattr(leaf, "size", 0))
        if not shape or size < min_weight_size:
            return P()
        divisible = [d for d, n in enumerate(shape) if n % axis_size == 0]
        if not divisible:
            return P()
        # largest dim wins; on ties prefer the trailing (feature) dim
        best = max(divisible, key=lambda d: (shape[d], d))
        spec = [None] * len(shape)
        spec[best] = axis
        return P(*spec)

    if skip is None:
        return jax.tree_util.tree_map(lambda l: spec_for(l, None), params)
    return jax.tree_util.tree_map(spec_for, params, skip)


def shard_fsdp_params(
    params,
    mesh: Mesh,
    axis: str = "data",
    min_weight_size: int = 1024,
    skip=None,
):
    """Place a param tree on ``mesh`` under :func:`fsdp_param_specs`."""
    specs = fsdp_param_specs(
        params, mesh.shape[axis], axis, min_weight_size, skip
    )
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_fsdp_train_step(
    model,
    tx,
    mesh: Mesh,
    axis: str = "data",
    train: bool = False,
    remat: bool = False,
):
    """Build ``step(params, opt_state, x, target) -> (params, opt_state,
    loss)`` with every weight AND its optimizer state sharded over ``axis``.

    ``params``/``opt_state`` live under :func:`fsdp_param_specs` shardings
    (use :func:`shard_fsdp_params`; ``tx.init`` on sharded params yields
    like-sharded moments). ``x (B, N, 3)``/``target (B, 3)`` are sharded
    over the same ``axis`` — FSDP *is* data parallelism, just with the
    weights scattered instead of replicated. With ``remat=True`` the forward
    is rematerialized in the backward pass, so the gathered full weights are
    re-gathered rather than held live across the whole backward — the
    standard FSDP memory/traffic trade.

    ``train=True`` runs dropout and therefore REQUIRES passing ``rng``
    (the ``'dropout'`` PRNG collection) to the step.
    """
    import optax

    out_spec = NamedSharding(mesh, P())

    def fwd(p, x, rng):
        rngs = {"dropout": rng} if rng is not None else None
        return model.apply({"params": p}, x, train=train, rngs=rngs)

    if remat:
        # close over `train` so jax.checkpoint never traces the bool
        fwd = jax.checkpoint(fwd)

    @jax.jit
    def step(params, opt_state, x, target, rng=None):
        if train and rng is None:
            raise ValueError(
                "make_fsdp_train_step(train=True) requires "
                "step(..., rng=...) for the 'dropout' PRNG collection")

        def loss_fn(p):
            out = fwd(p, x, rng)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, jax.lax.with_sharding_constraint(loss, out_spec)

    return step
