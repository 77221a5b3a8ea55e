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
run: per-label runs share the config, seed, subset size, and therefore the
exact same PRNG streams and batch orders — the only thing that differs per
label is the resident data, which is exactly the axis vmap maps over.
Test-pinned three ways (``tests/test_ensemble.py``): at L=1 the vmapped
program equals the sequential one to float noise; at L>=2 a label's result
is INDEPENDENT of which labels co-train and of slot order (no leakage,
asserted exactly); and vs the sequential protocol the L>=2 run sits within
a ~1% envelope — batched kernels accumulate in a different order than
unbatched ones, and that float noise can flip near-tied kNN neighbor
selections (a discrete jump), the same sensitivity any numeric
perturbation of the sequential run has.

v1 constraint: all label subsets must have the same sample count (true for
the synthetic set and any `samples_per_class`-balanced source). Unequal
real-data labels would need per-label padding with zeroed valid masks —
diagnosed with a clear error, not silently mis-trained.
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
from .metrics import write_summary_txt
from .trainer import Trainer


def _stack_tree(tree, L: int):
    return jax.tree_util.tree_map(
        lambda x: jnp.stack([jnp.asarray(x)] * L), tree)


def run_per_label_vmapped(
    cfg,
    dataset: OrientationDataset,
    out_dir: Optional[str] = None,
    labels: Optional[Sequence[str]] = None,
    log_every: int = 50,
) -> Dict[str, dict]:
    """Train one model per label, all labels vmapped into one program.

    Returns ``{label: {"best_val", "best_val_epoch", "test_loss",
    "test_angular", "history"}}`` and (if ``out_dir``) writes the
    protocol's ``summary.txt`` plus a per-label ``metrics.json``.
    """
    labels = list(labels if labels is not None else dataset.class_names)
    L = len(labels)
    subsets = [dataset.select_classes([l]) for l in labels]
    sizes = sorted({len(s) for s in subsets})
    if len(sizes) != 1:
        raise ValueError(
            "run_per_label_vmapped needs equal-size label subsets (got "
            f"sizes {sizes}); rebalance the source (samples_per_class) or "
            "use the sequential run_per_label")

    sub_cfg = cfg.replace(classes=(labels[0],), per_label=False)
    template = Trainer(sub_cfg, subsets[0])
    epochs = sub_cfg.epochs

    # per-label splits -> stacked device residents (the ONLY per-label data)
    splits = [s.split(cfg.seed) for s in subsets]

    def stack_res(i):
        res = [template._resident(sp[i]) for sp in splits]
        return {k: jnp.stack([r[k] for r in res]) for k in res[0]}

    tr_res, va_res, te_res = stack_res(0), stack_res(1), stack_res(2)
    template._resident_cache.clear()  # drop the unstacked per-split copies

    # batch index matrices are label-independent (same size, same seed)
    tr0, va0, te0 = splits[0]
    va_idx, va_valid = template._epoch_batches(va0, False, 0)

    # stacked carry: identical init per label (same seed), then diverging
    state = _stack_tree(template.state, L)
    bv = jnp.full((L,), jnp.inf, jnp.float32)
    bp = _stack_tree(template.state.params, L)
    bs = _stack_tree(template.state.batch_stats, L)
    be = jnp.zeros((L,), jnp.int32)
    carry = (state, bv, bp, bs, be)

    vblock = jax.jit(
        jax.vmap(
            template._run_block,
            in_axes=(0, 0, 0, None, None, None, None, None, None),
        ),
        donate_argnums=(0,),
    )

    history = {l: {"train": [], "val": [], "train_ang": [], "val_ang": []}
               for l in labels}
    block = max(1, int(os.environ.get("PCOT_EPOCH_BLOCK", "25")))
    t_start = time.time()
    epoch = 1
    while epoch <= epochs:
        e_hi = min(epoch + block - 1, epochs)
        nums = list(range(epoch, e_hi + 1))
        tr_idx, tr_valid = [], []
        for e in nums:
            im, vm = template._epoch_batches(tr0, True, e)
            tr_idx.append(im)
            tr_valid.append(vm)
        tr_idx, tr_valid = jnp.stack(tr_idx), jnp.stack(tr_valid)
        t0 = time.perf_counter()
        carry, stacked = vblock(
            carry, tr_res, va_res, tr_idx, tr_valid, va_idx, va_valid,
            jnp.asarray(nums, jnp.int32), jnp.int32(cfg.seed))
        # metrics: (L, E, nb, B) per-sample losses/angles
        tper, tang, _, vper, vang, _ = (np.asarray(x) for x in stacked)
        dt = time.perf_counter() - t0
        tvn = np.asarray(tr_valid)[None]  # (1, E, nb, B) same for all labels
        vvn = np.asarray(va_valid)[None, None]
        tmask = tvn / np.maximum(tvn.sum(axis=(-2, -1), keepdims=True), 1.0)
        vmask = vvn / np.maximum(vvn.sum(axis=(-2, -1), keepdims=True), 1.0)
        for li, l in enumerate(history):
            for j in range(len(nums)):
                history[l]["train"].append(
                    float((tper[li, j] * tmask[0, j]).sum()))
                history[l]["val"].append(
                    float((vper[li, j] * vmask[0, 0]).sum()))
                history[l]["train_ang"].append(
                    float((tang[li, j] * tmask[0, j]).sum()))
                history[l]["val_ang"].append(
                    float((vang[li, j] * vmask[0, 0]).sum()))
        if log_every and (e_hi % log_every == 0 or e_hi == epochs):
            n_clouds = float(np.asarray(tr_valid).sum()) * L
            print(
                f"Ep {e_hi:03}/{epochs} x {L} labels  "
                f"{dt / len(nums):.3f}s/ep-block  "
                f"({n_clouds / max(dt, 1e-9):.0f} clouds/s across labels)",
                flush=True,
            )
        epoch = e_hi + 1

    state, bv, bp, bs, be = carry
    bv, be = np.asarray(bv), np.asarray(be)

    # test phase: vmapped eval with each label's best params/stats restored
    te_idx, te_valid = template._epoch_batches(te0, False, 0)
    eval_key = jax.random.PRNGKey(cfg.seed * 104729 + 17)
    best_state = state.replace(params=bp, batch_stats=bs)
    tper, tang, _ = jax.vmap(
        template._eval_epoch, in_axes=(0, 0, None, None, None)
    )(best_state, te_res, te_idx, te_valid, eval_key)
    tper, tang = np.asarray(tper), np.asarray(tang)
    te_v = np.asarray(te_valid)
    te_w = te_v / max(te_v.sum(), 1.0)

    results = {}
    wall = time.time() - t_start
    for li, l in enumerate(labels):
        results[l] = {
            "best_val": float(bv[li]),
            "best_val_epoch": int(be[li]),
            "test_loss": float((tper[li] * te_w).sum()),
            "test_angular": float((tang[li] * te_w).sum()),
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
