"""Vmapped per-label protocol: train EVERY label's model in one program.

The reference's canonical `train.py:250-276` protocol trains one model per
category, *sequentially* — 40 independent 200-epoch runs. Each per-label
model here is small (a few MXU-starved matmuls per step at batch 16), so on
TPU the sequential protocol is dominated by per-program dispatch and
underutilized systolic arrays.

This module is the TPU-idiomatic alternative the torch stack cannot
express: ``jax.vmap`` over a stacked *model* axis turns the L per-label
trainings into ONE XLA program — every step trains all L models at once on
stacked parameters/optimizer states/residents, multiplying arithmetic
intensity by L while keeping each label's math identical to its sequential
run: per-label runs share the config and seed, and therefore the exact
same PRNG streams; the per-label resident data and batch index matrices
are exactly the axes vmap maps over. Test-pinned
(``tests/test_ensemble.py``): at L=1 the vmapped program equals the
sequential one to float noise; at L>=2 a label's result is INDEPENDENT of
which labels co-train and of slot order (no leakage, asserted exactly);
and vs the sequential protocol the L>=2 run sits within a ~1% envelope —
batched kernels accumulate in a different order than unbatched ones, and
that float noise can flip near-tied kNN neighbor selections (a discrete
jump), the same sensitivity any numeric perturbation of the sequential
run has.

Unequal label subsets (real ModelNet40 categories are unbalanced) are
handled by padding: residents pad to the largest subset, shorter labels'
epochs pad with all-invalid batches, and the trainer's empty-step freeze
(`Trainer.enable_empty_step_freeze`) makes those padded steps bitwise
no-ops — each label still sees exactly its sequential batch sequence,
optimizer step count, and schedule position.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import OrientationDataset
from .metrics import masked_angular_mean, write_summary_txt
from .trainer import Trainer


def _stack_tree(tree, L: int):
    return jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * L), tree)


def _pad_rows(a: jax.Array, n: int) -> jax.Array:
    """Pad the leading (sample) axis to ``n`` by repeating row 0. Padded
    rows are never selected by any batch index matrix; they only make the
    per-label residents stackable."""
    if a.shape[0] == n:
        return a
    reps = jnp.broadcast_to(a[:1], (n - a.shape[0],) + a.shape[1:])
    return jnp.concatenate([a, reps], axis=0)


def shard_stacked_axis(tree, mesh, axis: str):
    """Shard every leaf's leading stacked axis (labels here, seeds in
    `train/multiseed.py`) over ``mesh[axis]``. The stacked trainings are
    independent, so XLA partitions the vmapped program with ZERO
    collectives — the protocol weak-scales across chips like a DP mesh
    scales batches."""
    if mesh is None:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _stack_batches(mats, valids, nb: int):
    """Stack per-label (nb_l, B) index/valid matrices, padding shorter
    labels with all-invalid batches (idx 0, valid 0)."""
    B = mats[0].shape[1]
    out_i, out_v = [], []
    for im, vm in zip(mats, valids):
        pad = nb - im.shape[0]
        if pad:
            im = jnp.concatenate([im, jnp.zeros((pad, B), im.dtype)])
            vm = jnp.concatenate([vm, jnp.zeros((pad, B), vm.dtype)])
        out_i.append(im)
        out_v.append(vm)
    return jnp.stack(out_i), jnp.stack(out_v)


def run_per_label_vmapped(
    cfg,
    dataset: OrientationDataset,
    out_dir: Optional[str] = None,
    labels: Optional[Sequence[str]] = None,
    log_every: int = 50,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
    preemption_guard=None,
) -> Optional[Dict[str, dict]]:
    """Train one model per label, all labels vmapped into one program.

    With ``mesh`` (any mesh whose FIRST axis divides the label count) the
    stacked label axis is sharded over that axis: each chip trains its
    slice of the labels, no communication (see :func:`shard_stacked_axis`).

    Reliability (same contract as the sequential ``Trainer.fit``):
    ``checkpoint_dir`` + ``cfg.checkpoint_every`` save the whole stacked
    carry at aligned block boundaries; a fired ``preemption_guard`` saves
    and returns ``None`` (incomplete); ``resume_from`` (a ``step_<E>``
    path) restores and continues, reproducing the uninterrupted run
    exactly — PRNG streams are keyed by absolute epoch numbers (pinned in
    ``tests/test_ensemble.py``).

    Returns ``{label: {"best_val", "best_val_epoch", "test_loss",
    "test_angular", "history"}}`` and (if ``out_dir``) writes the
    protocol's ``summary.txt`` plus a per-label ``metrics.json``.
    """
    from .protocol_ckpt import (
        checkpoint_and_maybe_stop,
        next_block_end,
        resume_protocol,
    )
    labels = list(labels if labels is not None else dataset.class_names)
    L = len(labels)
    axis = None
    if mesh is not None:
        axis = mesh.axis_names[0]
        if L % mesh.shape[axis] != 0:
            raise ValueError(
                f"label count {L} must divide over mesh axis "
                f"'{axis}' of size {mesh.shape[axis]}")
    subsets = [dataset.select_classes([l]) for l in labels]
    unequal = len({len(s) for s in subsets}) > 1

    sub_cfg = cfg.replace(classes=(labels[0],), per_label=False)
    template = Trainer(sub_cfg, subsets[0])
    if unequal:
        # padded epochs contain all-invalid batches; freeze makes them
        # exact no-ops so each label trains as if run sequentially
        template.enable_empty_step_freeze()
    epochs = sub_cfg.epochs

    # per-label splits -> stacked device residents (padded to the largest)
    splits = [s.split(cfg.seed) for s in subsets]

    def stack_res(i):
        res = [template._resident(sp[i]) for sp in splits]
        n_max = max(r["points"].shape[0] for r in res)
        return {k: jnp.stack([_pad_rows(r[k], n_max) for r in res])
                for k in res[0]}

    tr_res, va_res, te_res = (
        shard_stacked_axis(stack_res(i), mesh, axis) for i in range(3))
    template._resident_cache.clear()  # drop the unstacked per-split copies

    def label_batches(split_i: int, train: bool, epoch: int):
        mats, valids = zip(*(
            template._epoch_batches(sp[split_i], train, epoch)
            for sp in splits))
        nb = max(m.shape[0] for m in mats)
        return _stack_batches(mats, valids, nb)

    va_idx, va_valid = shard_stacked_axis(label_batches(1, False, 0), mesh, axis)

    # stacked carry: identical init per label (same seed), then diverging
    state = _stack_tree(template.state, L)
    bv = jnp.full((L,), jnp.inf, jnp.float32)
    bp = _stack_tree(template.state.params, L)
    bs = _stack_tree(template.state.batch_stats, L)
    be = jnp.zeros((L,), jnp.int32)
    carry = shard_stacked_axis((state, bv, bp, bs, be), mesh, axis)

    vblock = jax.jit(
        jax.vmap(
            template._run_block,
            in_axes=(0, 0, 0, 0, 0, 0, 0, None, None),
        ),
        donate_argnums=(0,),
    )

    history = {l: {"train": [], "val": [], "train_ang": [], "val_ang": []}
               for l in labels}
    block = max(1, int(os.environ.get("PCOT_EPOCH_BLOCK", "25")))
    t_start = time.time()
    epoch = 1
    if resume_from:
        carry, history, epoch = resume_protocol(
            resume_from, carry, labels,
            lambda c: shard_stacked_axis(c, mesh, axis))
    while epoch <= epochs:
        e_hi = next_block_end(epoch, block, epochs, cfg.checkpoint_every)
        nums = list(range(epoch, e_hi + 1))
        per_epoch = [label_batches(0, True, e) for e in nums]
        tr_idx = jnp.stack([im for im, _ in per_epoch], axis=1)  # (L,E,nb,B)
        tr_valid = jnp.stack([vm for _, vm in per_epoch], axis=1)
        tr_idx, tr_valid = shard_stacked_axis((tr_idx, tr_valid), mesh, axis)
        t0 = time.perf_counter()
        carry, stacked = vblock(
            carry, tr_res, va_res, tr_idx, tr_valid, va_idx, va_valid,
            jnp.asarray(nums, jnp.int32), jnp.int32(cfg.seed))
        # metrics: (L, E, nb, B) per-sample losses/angles
        tper, tang, _, vper, vang, _ = (np.asarray(x) for x in stacked)
        dt = time.perf_counter() - t0
        tvn = np.asarray(tr_valid)  # (L, E, nb, B)
        vvn = np.asarray(va_valid)[:, None]  # (L, 1, nb, B)
        tmask = tvn / np.maximum(tvn.sum(axis=(-2, -1), keepdims=True), 1.0)
        vmask = vvn / np.maximum(vvn.sum(axis=(-2, -1), keepdims=True), 1.0)
        for li, l in enumerate(history):
            for j in range(len(nums)):
                history[l]["train"].append(
                    float((tper[li, j] * tmask[li, j]).sum()))
                history[l]["val"].append(
                    float((vper[li, j] * vmask[li, 0]).sum()))
                history[l]["train_ang"].append(
                    masked_angular_mean(tang[li, j], tvn[li, j]))
                history[l]["val_ang"].append(
                    masked_angular_mean(vang[li, j], vvn[li, 0]))
        if log_every and (e_hi % log_every == 0 or e_hi == epochs):
            n_clouds = float(np.asarray(tr_valid).sum())
            print(
                f"Ep {e_hi:03}/{epochs} x {L} labels  "
                f"{dt / len(nums):.3f}s/ep-block  "
                f"({n_clouds / max(dt, 1e-9):.0f} clouds/s across labels)",
                flush=True,
            )
        epoch = e_hi + 1
        if checkpoint_and_maybe_stop(
                e_hi, epochs, carry, history, labels, checkpoint_dir,
                cfg.checkpoint_every, preemption_guard):
            return None

    state, bv, bp, bs, be = carry
    bv, be = np.asarray(bv), np.asarray(be)

    # test phase: vmapped eval with each label's best params/stats restored
    te_idx, te_valid = shard_stacked_axis(label_batches(2, False, 0), mesh, axis)
    eval_key = jax.random.PRNGKey(cfg.seed * 104729 + 17)
    best_state = state.replace(params=bp, batch_stats=bs)
    tper, tang, _ = jax.vmap(
        template._eval_epoch, in_axes=(0, 0, 0, 0, None)
    )(best_state, te_res, te_idx, te_valid, eval_key)
    tper, tang = np.asarray(tper), np.asarray(tang)
    te_v = np.asarray(te_valid)  # (L, nb, B)
    te_w = te_v / np.maximum(te_v.sum(axis=(-2, -1), keepdims=True), 1.0)

    results = {}
    wall = time.time() - t_start
    for li, l in enumerate(labels):
        results[l] = {
            "best_val": float(bv[li]),
            "best_val_epoch": int(be[li]),
            "test_loss": float((tper[li] * te_w[li]).sum()),
            "test_angular": masked_angular_mean(tang[li], te_v[li]),
            "history": history[l],
        }

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_summary_txt(
            os.path.join(out_dir, "summary.txt"),
            {l: results[l]["best_val"] for l in labels})
        for l in labels:
            ldir = os.path.join(out_dir, l)
            os.makedirs(ldir, exist_ok=True)
            payload = {
                "config": dataclasses.asdict(sub_cfg.replace(classes=(l,))),
                "history": results[l]["history"],
                "best_val": results[l]["best_val"],
                "best_val_epoch": results[l]["best_val_epoch"],
                "test": {"loss": results[l]["test_loss"],
                         "mean_angular_error_deg": results[l]["test_angular"]},
                "vmapped_protocol": {"labels": L, "wall_seconds": wall},
            }
            with open(os.path.join(ldir, "metrics.json"), "w") as f:
                json.dump(payload, f, indent=2, default=float)
    return results
