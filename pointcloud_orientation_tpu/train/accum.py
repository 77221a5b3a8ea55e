"""Gradient accumulation: large effective batches in bounded memory.

The reference trains at batch 16 on one device and has no notion of
effective-batch scaling (SURVEY.md §2.7); this utility is the TPU-native
capability extension that completes the memory toolkit next to remat and
FSDP: split a global batch into ``n_micro`` microbatches, run them through
one ``lax.scan`` (so activation memory is that of ONE microbatch), and take
a single optimizer step on the averaged gradients.

For batch-independent models (LayerNorm, no BatchNorm — e.g. the
:class:`~pointcloud_orientation_tpu.models.PointTransformer`) the averaged
microbatch gradient of a mean loss equals the full-batch gradient exactly,
so the accumulated step is *numerically identical* to the unaccumulated one
(test-pinned). With BatchNorm the statistics become per-microbatch — the
same semantic delta every framework's accumulation has; documented, and the
reason the PointNet++ trainer keeps whole-batch steps by default.

Composes with data parallelism/FSDP: the scan splits the *leading* batch
axis, which under a ``data``-sharded batch is the per-chip shard axis —
each chip accumulates its local microbatches and XLA's gradient
all-reduce/reduce-scatter happens once per optimizer step, not per
microbatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accumulated_value_and_grad(loss_fn, n_micro: int):
    """``value_and_grad`` over ``n_micro`` sequential microbatches.

    ``loss_fn(params, batch) -> scalar`` must be a *mean* over the batch
    axis. Returns ``vag(params, batch) -> (loss, grads)`` where every leaf
    of ``batch`` has a leading dim divisible by ``n_micro``; the scan keeps
    only one microbatch's activations live at a time, and loss/grads are
    the microbatch averages (== the full-batch values for mean losses on
    batch-independent models).
    """
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")

    def vag(params, batch):
        def to_micro(x):
            b = x.shape[0]
            if b % n_micro:
                raise ValueError(
                    f"batch dim {b} not divisible by n_micro={n_micro}")
            return x.reshape((n_micro, b // n_micro) + x.shape[1:])

        micro = jax.tree_util.tree_map(to_micro, batch)

        def body(carry, mb):
            acc_loss, acc_g = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            acc_g = jax.tree_util.tree_map(jnp.add, acc_g, grads)
            return (acc_loss + loss, acc_g), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, p.dtype), params)
        (total_loss, total_g), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros), micro)
        scale = 1.0 / n_micro
        return total_loss * scale, jax.tree_util.tree_map(
            lambda g: g * scale, total_g)

    return vag


def make_accum_train_step(model, tx, n_micro: int, train: bool = False):
    """Build ``step(params, opt_state, x, target) -> (params, opt_state,
    loss)`` that accumulates gradients over ``n_micro`` microbatches before
    one optimizer update (MSE objective, mirroring the other
    ``parallel/``-style step builders; for custom objectives use
    :func:`accumulated_value_and_grad` directly).

    Works unchanged on sharded inputs: jit it with the batch sharded over
    ``data`` and/or params under FSDP/TP specs — the scan carries the
    param-sharded gradient accumulator, so per-chip memory stays bounded.
    """
    import optax

    def loss_fn(p, mb):
        x, target = mb
        out = model.apply({"params": p}, x, train=train)
        return jnp.mean((out - target) ** 2)

    vag = accumulated_value_and_grad(loss_fn, n_micro)

    @jax.jit
    def step(params, opt_state, x, target):
        loss, grads = vag(params, (x, target))
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return step
