"""Pipeline parallelism for the point transformer (GPipe-style staging).

Completes the mesh-parallelism story (§2.7): DP shards the batch, SP/ring
shard the point axis, TP (:mod:`.tp`) shards head/FFN parameters — PP
shards the *depth*: each device on the ``stage`` mesh axis holds
``depth / n_stages`` of the transformer's encoder layers and microbatches
stream through the pipe over ``lax.ppermute`` (ICI neighbor hops), the
canonical TPU pipelining pattern (scaling-book "pipelining" recipe): a
``lax.scan`` over ``M + S - 1`` ticks where at tick ``t`` stage ``s``
processes microbatch ``t - s``, giving the usual ``(S-1)/(M+S-1)`` bubble.

Everything is expressed with ``shard_map`` + collectives and is fully
differentiable: AD transposes the ``ppermute`` into the reverse-direction
cotangent stream and the backward pipeline falls out of ``lax.scan``'s
reverse pass — no hand-written backward schedule. Embed/head parameters
are replicated; each is consumed on exactly one stage (embed feeds stage 0,
the head reads the last stage) and shard_map's vma-aware transpose
all-reduces their stage-local gradient contributions back into replicated
gradients automatically. The optimizer update
itself runs *outside* ``shard_map`` under the same ``jit``: gradients come
out carrying the parameter shardings, so Adam moments and updates stay
stage-local by sharding propagation alone.

Layer-stack layout: the per-layer parameter trees of
``TransformerEncoderLayer_{i}`` are stacked on a leading ``depth`` axis and
sharded ``P('stage')`` — the local view inside ``shard_map`` is the
``(depth/S, ...)`` slice owned by that stage, scanned layer-by-layer.

The reference is single-device torch (no pipelining of any kind); this
module reproduces no reference lines — it is the TPU-native scale-out path
for deep/long-context variants of `models/point_transformer.py:4-20`'s
architecture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def split_pipeline_params(params, depth: int):
    """Split a :class:`PointTransformer` param tree for pipelining.

    Returns ``(stacked, rest)``: ``stacked`` holds the ``depth`` encoder
    layers' params stacked on a new leading axis (shard it ``P('stage')``),
    ``rest`` the embed/head params (replicate it).
    """
    layers = [params[f"TransformerEncoderLayer_{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)
    rest = {k: v for k, v in params.items()
            if not k.startswith("TransformerEncoderLayer_")}
    return stacked, rest


def place_pipeline_state(stacked, rest, mesh: Mesh, axis_name: str = "stage"):
    """Device-put the split param trees under their pipeline shardings."""
    s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis_name))), stacked)
    r = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), rest)
    return s, r


def _make_stage_fn(model):
    """Per-stage compute: scan this stage's stacked layer slice over the
    activations with one shared :class:`TransformerEncoderLayer` module
    (identical structure per layer, so one definition serves all slices)."""
    from ..models.point_transformer import TransformerEncoderLayer

    layer = TransformerEncoderLayer(
        model.embed_dim, model.num_heads, model.ffn_dim, model.dropout,
        dtype=model.dtype, attention_impl=model.attention_impl,
    )

    def stage_fn(local_layers, h):
        def body(h, p):
            return layer.apply({"params": p}, h, False), None

        h, _ = lax.scan(body, h, local_layers)
        return h

    return stage_fn


def _embed_apply(model, rest, x):
    """Pre-pipeline input embedding (`models/point_transformer.py:120`)."""
    dt = model.dtype or x.dtype
    k = rest["Dense_0"]["kernel"]
    b = rest["Dense_0"]["bias"]
    return x.astype(dt) @ k.astype(dt) + b.astype(dt)


def _head_apply(model, rest, h):
    """Post-pipeline f32 mean pool + 3-vector head
    (`models/point_transformer.py:133-134`)."""
    pooled = jnp.mean(h.astype(jnp.float32), axis=1)
    return pooled @ rest["Dense_1"]["kernel"] + rest["Dense_1"]["bias"]


def _pipeline(stage_fn, local_layers, x_mb, axis_name: str):
    """Stream microbatches through the stage pipe. Inside ``shard_map``.

    ``x_mb (M, mb, ...)`` must be replicated across stages (every device
    computes the cheap embed; only stage 0's copy enters the pipe). Returns
    the stage-local collected outputs ``(M, mb, ...)`` — real microbatch
    outputs on the LAST stage only (callers mask + psum).
    """
    S = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    M = x_mb.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]
    # the carry is device-varying from tick 1 on; mark the zero init as such
    # so scan's carry types are stable under shard_map's vma tracking
    buf = lax.pcast(jnp.zeros_like(x_mb[0]), (axis_name,), to="varying")
    ys = lax.pcast(jnp.zeros_like(x_mb), (axis_name,), to="varying")

    def tick(carry, t):
        buf, ys = carry
        feed = lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        x_in = jnp.where((idx == 0) & (t < M), feed, buf)
        y = stage_fn(local_layers, x_in)
        m_out = t - (S - 1)
        write = lax.dynamic_update_index_in_dim(
            ys, y, jnp.clip(m_out, 0, M - 1), 0)
        ys = jnp.where(m_out >= 0, write, ys)
        buf = lax.ppermute(y, axis_name, perm)
        return (buf, ys), None

    (_, ys), _ = lax.scan(tick, (buf, ys), jnp.arange(M + S - 1))
    return ys  # stage-local; only the last stage's slots hold real outputs


def _forward(model, stage_fn, stacked, rest, x, microbatches, axis_name):
    # Each replicated-param consumption is gated to exactly ONE stage (embed
    # feeds the pipe on stage 0 inside _pipeline's tick; the head below is
    # masked to the last stage before the psum) so the automatic all-reduce
    # the vma transpose inserts for `rest`'s gradient counts every
    # contribution exactly once.
    B = x.shape[0]
    mb = B // microbatches
    h = _embed_apply(model, rest, x)
    h_mb = h.reshape(microbatches, mb, *h.shape[1:])
    ys = _pipeline(stage_fn, stacked, h_mb, axis_name)
    out_local = _head_apply(model, rest, ys.reshape(B, *ys.shape[2:]))
    idx = lax.axis_index(axis_name)
    S = lax.axis_size(axis_name)
    return lax.psum(
        jnp.where(idx == S - 1, out_local, jnp.zeros_like(out_local)),
        axis_name)


def make_pp_apply(model, mesh: Mesh, microbatches: int,
                  axis_name: str = "stage"):
    """Build ``apply(stacked, rest, x) -> (B, 3)`` — the pipelined forward.

    ``model`` is a :class:`PointTransformer` whose ``depth`` divides the
    ``stage`` axis size; ``stacked``/``rest`` come from
    :func:`split_pipeline_params` (place with :func:`place_pipeline_state`);
    ``x (B, N, 3)`` is replicated — PP parallelizes depth, not the batch
    (compose DP/TP on other mesh axes for that). ``B`` must divide into
    ``microbatches``. Deterministic (dropout off).
    """
    from jax import shard_map

    stage_fn = _make_stage_fn(model)

    def local_apply(stacked, rest, x):
        return _forward(model, stage_fn, stacked, rest, x, microbatches,
                        axis_name)

    return jax.jit(shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=P(),
    ))


def make_pp_train_step(model, tx, mesh: Mesh, microbatches: int,
                       axis_name: str = "stage", data_axis: str = None):
    """Build ``step(params2, opt_state, x, target) -> (params2, opt_state,
    loss)`` where ``params2 = (stacked, rest)``.

    Gradients are computed inside ``shard_map`` (stage-local layer grads are
    complete without reduction — every microbatch visits every stage;
    embed/head grads come back replicated via the vma-aware transpose's
    automatic all-reduce); the optax update runs outside,
    where the grads' shardings make moments/updates stage-local
    automatically. ``opt_state = tx.init((stacked, rest))`` on placed params.

    With ``data_axis`` set (2-D ``(data, stage)`` mesh), DP composes with
    PP: ``x``/``target`` are additionally batch-sharded over ``data_axis``
    (each data slice runs its own pipeline over its stage row), the loss is
    pmean'd over ``data`` so it is replicated, and param gradients come
    back data-summed automatically (params are unvarying over ``data``, so
    the vma transpose inserts that all-reduce too — divide-by-n lives in
    the pmean'd loss).

    NOTE: like :func:`make_pp_apply`, the pipelined stages run
    DETERMINISTIC (dropout off) — stage layers would each need a
    per-stage/per-microbatch PRNG threaded through the shard_map pipe.
    Models trained through this step therefore run without dropout
    regularization; use the DP trainer (which trains with the ``'dropout'``
    collection) when reference-exact regularization matters.
    """
    import optax
    from jax import shard_map

    stage_fn = _make_stage_fn(model)

    def local_grads(stacked, rest, x, target):
        def loss_fn(stacked, rest):
            out = _forward(model, stage_fn, stacked, rest, x, microbatches,
                           axis_name)
            local = jnp.mean((out - target) ** 2)
            if data_axis is not None:
                local = lax.pmean(local, data_axis)
            return local

        loss, (g_s, g_r) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            stacked, rest)
        # Neither g_r nor the cross-data reduction of g_s needs a manual
        # psum: params enter shard_map unvarying over those axes, so the
        # vma-aware transpose already all-reduces the per-device
        # contributions — same rule the SP step relies on
        # (sp_transformer.make_sp_train_step).
        return loss, g_s, g_r

    batch_spec = P() if data_axis is None else P(data_axis)
    grad_fn = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(axis_name), P(), batch_spec, batch_spec),
        out_specs=(P(), P(axis_name), P()),
    )

    @jax.jit
    def step(params2, opt_state, x, target):
        loss, g_s, g_r = grad_fn(params2[0], params2[1], x, target)
        updates, opt_state = tx.update((g_s, g_r), opt_state, params2)
        return optax.apply_updates(params2, updates), opt_state, loss

    return step
