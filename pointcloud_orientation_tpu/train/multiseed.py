"""Vmapped multi-seed protocol: train S seeds of one preset in one program.

Seed studies are how this repo (and the reference's own result tables)
separate optimization signal from run-to-run noise — the MvM bistability
analysis, the cosine-LR A/B, and the vm_kl saturation triad each trained
3-5 seeds *sequentially*. Like the per-label protocol (`train/ensemble.py`,
the reference's `train.py:250-276` loop), sequential seed sweeps on TPU are
dispatch-bound and MXU-starved at the reference's small model sizes.

The trainer was built for this: the seed rides through `_run_block` as a
TRACED argument (`trainer.py:443-450`), so a stacked seed axis is just
`jax.vmap` with `in_axes=0` on the seed — every seed's math is identical
to its sequential run (same split, same shuffles, same PRNG streams, same
init) while the chip trains all of them at once. Everything that differs
per seed — the 70/15/15 split (`Trainer.__init__`, split(config.seed)),
the per-epoch shuffles (`_epoch_batches`, seed+epoch), the init
(`_init_state`, PRNGKey(seed..seed+2)) — is stacked; everything else is
the same compiled program.

When to use it (measured, RESULTS.md "Vmapped multi-seed protocol"):
seed-vmapping is compute-neutral where one training already saturates the
chip (N=1024: vmapped per-seed epoch rate == sequential; N=10k: ~40%
worse from 3× VMEM pressure) — unlike the dispatch-bound per-label
protocol, which vmapping speeds 21–27×. It still buys one
process/compile/dispatch stream per sweep (N=1024 wall 251 vs 381 s) and,
decisively, multi-chip seed sweeps: the seed axis shards over a mesh with
zero collectives, so S seeds on S chips cost one run's wall-clock.

Exactness contract (mirrors the per-label protocol, pinned by
``tests/test_multiseed.py``): at S=1 the vmapped program equals the
sequential one to float noise; a seed's result is independent of which
seeds co-train and of slot order; vs a sequential run the S>=2 envelope
carries the usual batched-kernel reduction-order noise that near-tied kNN
selections amplify. With ``mesh`` the seed axis shards with zero
collectives (independent trainings), like the label axis.
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
from .ensemble import shard_stacked_axis as _shard_S
from .metrics import masked_angular_mean
from .trainer import Trainer


def run_multi_seed(
    cfg,
    dataset: OrientationDataset,
    seeds: Sequence[int],
    out_dir: Optional[str] = None,
    log_every: int = 50,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
    preemption_guard=None,
    return_params: bool = False,
) -> Optional[Dict[int, dict]]:
    """Train ``cfg`` once per seed, all seeds vmapped into one program.

    ``return_params=True`` additionally returns each seed's BEST-val
    weights (``"params"``/``"batch_stats"`` numpy trees, unstacked) so the
    protocol's winner can be served/exported/evaluated downstream without
    re-training — without it the vmapped sweep reports metrics but the
    winning model is unrecoverable unless ``checkpoint_dir`` happened to
    save the final block.

    Reliability mirrors the per-label protocol (`train/ensemble.py`):
    ``checkpoint_dir`` + ``cfg.checkpoint_every`` save the stacked carry at
    aligned block boundaries, a fired ``preemption_guard`` saves and
    returns ``None``, and ``resume_from`` continues bit-exactly (absolute-
    epoch PRNG streams; pinned in ``tests/test_multiseed.py``).

    Returns ``{seed: {"best_val", "best_val_epoch", "test_loss",
    "test_angular", "history"}}`` plus, when ``out_dir`` is given, a
    per-seed ``seed_<s>/metrics.json`` and a ``seeds_summary.json`` with
    the across-seed mean/std/min/max of the end metrics — the artifact the
    sequential seed studies assembled by hand.
    """
    from .protocol_ckpt import (
        checkpoint_and_maybe_stop,
        next_block_end,
        resume_protocol,
    )
    seeds = [int(s) for s in seeds]
    if len(set(seeds)) != len(seeds):
        raise ValueError(f"duplicate seeds: {seeds}")
    S = len(seeds)
    axis = None
    if mesh is not None:
        axis = mesh.axis_names[0]
        if S % mesh.shape[axis] != 0:
            raise ValueError(
                f"seed count {S} must divide over mesh axis "
                f"'{axis}' of size {mesh.shape[axis]}")
    if cfg.per_label:
        raise ValueError("multi-seed vmapping composes with single-model "
                         "presets; per-label protocols sweep seeds label-wise")

    # One trainer per seed: carries that seed's split, shuffles and init.
    # trainers[0] doubles as the template whose compiled programs run the
    # stacked computation (the programs are seed-independent by design).
    trainers = [Trainer(cfg.replace(seed=s), dataset) for s in seeds]
    template = trainers[0]
    epochs = cfg.epochs

    def stack_res(split_attr: str):
        res = [t._resident(getattr(t, split_attr)) for t in trainers]
        n = {r["points"].shape[0] for r in res}
        assert len(n) == 1, "same dataset => equal split sizes"
        return {k: jnp.stack([r[k] for r in res]) for k in res[0]}

    tr_res = _shard_S(stack_res("train_ds"), mesh, axis)
    va_res = _shard_S(stack_res("val_ds"), mesh, axis)
    te_res = _shard_S(stack_res("test_ds"), mesh, axis)
    for t in trainers:
        t._resident_cache.clear()  # drop the unstacked copies

    def seed_batches(split_attr: str, train: bool, epoch: int):
        mats, valids = zip(*(
            t._epoch_batches(getattr(t, split_attr), train, epoch)
            for t in trainers))
        return jnp.stack(mats), jnp.stack(valids)

    va_idx, va_valid = _shard_S(seed_batches("val_ds", False, 0), mesh, axis)

    stack = lambda trees: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *trees)
    state = stack([t.state for t in trainers])
    bv = jnp.full((S,), jnp.inf, jnp.float32)
    copy = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), tree)
    bp = copy(state.params)
    bs = copy(state.batch_stats)
    be = jnp.zeros((S,), jnp.int32)
    carry = _shard_S((state, bv, bp, bs, be), mesh, axis)
    seed_vec = _shard_S(jnp.asarray(seeds, jnp.int32), mesh, axis)

    vblock = jax.jit(
        jax.vmap(
            template._run_block,
            # carry..va_valid stacked per seed; epoch numbers shared; the
            # SEED is the per-slot axis that differentiates the programs
            in_axes=(0, 0, 0, 0, 0, 0, 0, None, 0),
        ),
        donate_argnums=(0,),
    )

    history = {s: {"train": [], "val": [], "train_ang": [], "val_ang": []}
               for s in seeds}
    block = max(1, int(os.environ.get("PCOT_EPOCH_BLOCK", "25")))
    t_start = time.time()
    epoch = 1
    if resume_from:
        carry, history, epoch = resume_protocol(
            resume_from, carry, seeds, lambda c: _shard_S(c, mesh, axis))
    while epoch <= epochs:
        e_hi = next_block_end(epoch, block, epochs, cfg.checkpoint_every)
        nums = list(range(epoch, e_hi + 1))
        per_epoch = [seed_batches("train_ds", True, e) for e in nums]
        tr_idx = jnp.stack([im for im, _ in per_epoch], axis=1)  # (S,E,nb,B)
        tr_valid = jnp.stack([vm for _, vm in per_epoch], axis=1)
        tr_idx, tr_valid = _shard_S((tr_idx, tr_valid), mesh, axis)
        t0 = time.perf_counter()
        carry, stacked = vblock(
            carry, tr_res, va_res, tr_idx, tr_valid, va_idx, va_valid,
            jnp.asarray(nums, jnp.int32), seed_vec)
        tper, tang, _, vper, vang, _ = (np.asarray(x) for x in stacked)
        dt = time.perf_counter() - t0
        tvn = np.asarray(tr_valid)  # (S, E, nb, B)
        vvn = np.asarray(va_valid)[:, None]  # (S, 1, nb, B)
        tmask = tvn / np.maximum(tvn.sum(axis=(-2, -1), keepdims=True), 1.0)
        vmask = vvn / np.maximum(vvn.sum(axis=(-2, -1), keepdims=True), 1.0)
        for si, s in enumerate(seeds):
            for j in range(len(nums)):
                history[s]["train"].append(
                    float((tper[si, j] * tmask[si, j]).sum()))
                history[s]["val"].append(
                    float((vper[si, j] * vmask[si, 0]).sum()))
                history[s]["train_ang"].append(
                    masked_angular_mean(tang[si, j], tvn[si, j]))
                history[s]["val_ang"].append(
                    masked_angular_mean(vang[si, j], vvn[si, 0]))
        if log_every and (e_hi % log_every == 0 or e_hi == epochs):
            n_clouds = float(np.asarray(tr_valid).sum())
            print(
                f"Ep {e_hi:03}/{epochs} x {S} seeds  "
                f"{dt / len(nums):.3f}s/ep-block  "
                f"({n_clouds / max(dt, 1e-9):.0f} clouds/s across seeds)",
                flush=True,
            )
        epoch = e_hi + 1
        if checkpoint_and_maybe_stop(
                e_hi, epochs, carry, history, seeds, checkpoint_dir,
                cfg.checkpoint_every, preemption_guard):
            return None

    state, bv, bp, bs, be = carry
    bv, be = np.asarray(bv), np.asarray(be)

    # Diverged-seed guard (mirrors trainer._fit_blocks:558-564): a seed
    # whose val loss was never finite has best-val snapshots equal to the
    # stacked INIT params — test it on its FINAL state instead, and report
    # best_val=None rather than serializing Infinity.
    finite = np.isfinite(bv)
    if not finite.all():
        sel = jnp.asarray(finite)
        pick = lambda b, f: jnp.where(
            sel.reshape((S,) + (1,) * (b.ndim - 1)), b, f)
        bp = jax.tree_util.tree_map(pick, bp, state.params)
        bs = jax.tree_util.tree_map(pick, bs, state.batch_stats)
        print(f"WARNING: seeds {[s for s, f in zip(seeds, finite) if not f]} "
              "never produced a finite val loss; testing their final state")

    # test phase: per-seed best params/stats, per-seed eval keys
    te_idx, te_valid = _shard_S(seed_batches("test_ds", False, 0), mesh, axis)
    eval_keys = jax.vmap(
        lambda s: jax.random.PRNGKey(s * 104729 + 17))(seed_vec)
    best_state = state.replace(params=bp, batch_stats=bs)
    tper, tang, _ = jax.vmap(template._eval_epoch)(
        best_state, te_res, te_idx, te_valid, eval_keys)
    tper, tang = np.asarray(tper), np.asarray(tang)
    te_v = np.asarray(te_valid)
    te_w = te_v / np.maximum(te_v.sum(axis=(-2, -1), keepdims=True), 1.0)

    results = {}
    wall = time.time() - t_start
    if return_params:
        bp_np = jax.tree_util.tree_map(np.asarray, bp)
        bs_np = jax.tree_util.tree_map(np.asarray, bs)
    for si, s in enumerate(seeds):
        results[s] = {
            "best_val": float(bv[si]) if finite[si] else None,
            "best_val_epoch": int(be[si]) if finite[si] else None,
            "test_loss": float((tper[si] * te_w[si]).sum()),
            "test_angular": masked_angular_mean(tang[si], te_v[si]),
            "history": history[s],
        }
        if return_params:
            results[s]["params"] = jax.tree_util.tree_map(
                lambda x: x[si], bp_np)
            results[s]["batch_stats"] = jax.tree_util.tree_map(
                lambda x: x[si], bs_np)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        agg = {}
        for k in ("best_val", "test_loss", "test_angular"):
            vals = np.asarray(
                [results[s][k] for s in seeds
                 if results[s][k] is not None
                 and np.isfinite(results[s][k])], np.float64)
            agg[k] = (
                {"mean": float(vals.mean()), "std": float(vals.std()),
                 "min": float(vals.min()), "max": float(vals.max()),
                 "n": int(vals.size)}
                if vals.size else {"n": 0}
            )
        with open(os.path.join(out_dir, "seeds_summary.json"), "w") as f:
            json.dump({"seeds": seeds, "aggregate": agg,
                       "wall_seconds": wall}, f, indent=2)
        for s in seeds:
            sdir = os.path.join(out_dir, f"seed_{s}")
            os.makedirs(sdir, exist_ok=True)
            payload = {
                "config": dataclasses.asdict(cfg.replace(seed=s)),
                "history": results[s]["history"],
                "best_val": results[s]["best_val"],
                "best_val_epoch": results[s]["best_val_epoch"],
                "test": {"loss": results[s]["test_loss"],
                         "mean_angular_error_deg": results[s]["test_angular"]},
                "multiseed_protocol": {"seeds": S, "wall_seconds": wall},
            }
            with open(os.path.join(sdir, "metrics.json"), "w") as f:
                json.dump(payload, f, indent=2, default=float)
    return results
