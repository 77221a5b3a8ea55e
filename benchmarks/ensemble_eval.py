"""Deep-ensemble accuracy: the vmapped seed sweep served as one model.

Every north-star envelope (RESULTS.md) shows seed-to-seed variance as the
dominant error term — e.g. 8dir seeds span 6.4°–12.4°, the vm tanh head is
outright bistable. The reference can neither train an ensemble cheaply
(sequential torch runs) nor serve one (no inference path at all). Here the
framework closes the loop: `run_multi_seed` trains S seeds as ONE vmapped
XLA program (21–27× the sequential cost, RESULTS.md) and
`OrientationPredictor.from_seed_sweep` serves all S members as ONE jitted
program, combining with the same per-family math as yaw-voting TTA.

Protocol mirrors `tta_eval.py`/`tta_dist_eval.py` exactly so the V=1
member baselines line up with the published TTA table: canonical preset,
synthetic 64/class at N=1024, frozen-rotation test split, shared metric
definitions. Rows: each member alone (V=1), the S-member ensemble (V=1),
and ensemble × TTA (V views per member, S·V evaluations in one program).

    python benchmarks/ensemble_eval.py --head 8dir
    python benchmarks/ensemble_eval.py --head vm
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import jax
import jax.numpy as jnp
import numpy as np


def frozen_test_batch(cfg, ds):
    """The same frozen-rotation eval batch recipe as the test phase
    (`tta_eval.py`); one batch shared by every member and ensemble row."""
    from pointcloud_orientation_tpu.train import Trainer

    t = Trainer(cfg, ds)
    n = len(t.test_ds)
    pts, labels, uniform, symm, k_spec = t.test_ds.gather_host(np.arange(n))
    eval_key = jax.random.fold_in(
        jax.random.PRNGKey(cfg.seed * 104729 + 17), 0)
    batch = t.augment(eval_key, jnp.asarray(pts), jnp.asarray(uniform),
                      jnp.asarray(symm), jnp.asarray(k_spec))
    return batch, np.asarray(uniform) > 0


def eval_8dir(out, batch, uni):
    from pointcloud_orientation_tpu.ops.dirs8 import DIRS_8

    probs = np.asarray(jax.nn.softmax(jnp.asarray(out), -1))
    gt_probs = np.asarray(batch["probs_8dir"])
    gt_fwd = np.asarray(batch["forward"])
    pred_fwd = probs @ np.asarray(DIRS_8)
    # axis=-1 (NOT positional: the 2nd positional arg of np.linalg.norm is
    # `ord`; ord=-1 is a matrix norm that returned exactly 0.0 for the
    # xz-planar DIRS_8 basis and made every angular row read 0° — the r4
    # "saturation" was this bug, found by the r4 advisor).
    pn = pred_fwd / (np.linalg.norm(pred_fwd, axis=-1, keepdims=True) + 1e-12)
    gn = gt_fwd / (np.linalg.norm(gt_fwd, axis=-1, keepdims=True) + 1e-12)
    ang = np.degrees(np.arccos(np.clip((pn * gn).sum(-1), -1, 1)))[~uni]
    kl = -(gt_probs * np.log(np.clip(probs, 1e-9, 1.0))).sum(-1)
    ent = -(gt_probs * np.log(np.clip(gt_probs, 1e-9, 1.0))).sum(-1)
    return dict(ang=float(ang.mean()), loss=float((kl - ent).mean()))


def eval_vm(out, batch, uni):
    from cross_stack import _metrics_vm

    mu, kappa = out
    vm_gt = np.stack([np.asarray(batch["vm_mu"]),
                      np.asarray(batch["vm_kappa"])], -1)
    losses, angs = _metrics_vm(mu, kappa, vm_gt)
    return dict(loss=float(np.mean(losses)), ang=float(np.nanmean(angs)))


def eval_mvm(out, batch, uni):
    """Matched loss (rect=True: V·K predicted components compete for the
    K_gt slots) + the assignment-free grid-KL density metric — the same
    pair the MvM TTA table uses (`tta_dist_eval.py`)."""
    from cross_stack import _metrics_mvm, _metrics_mvm_grid

    mu, kappa, w = out
    gt_params = np.stack([np.asarray(batch["mvm_mu"]),
                          np.asarray(batch["mvm_kappa"]),
                          np.asarray(batch["mvm_weight"])], -1)
    gt_k = np.asarray(batch["mvm_k"])
    losses, angs = _metrics_mvm(mu, kappa, w, gt_params, gt_k, rect=True)
    grid_kl = _metrics_mvm_grid(mu, kappa, w, gt_params, gt_k)
    return dict(loss=float(np.mean(losses)), ang=float(np.nanmean(angs)),
                grid_kl=float(np.mean(grid_kl)))


def run_head(head: str, seeds, epochs, num_points, tta_v):
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.infer import OrientationPredictor
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.multiseed import run_multi_seed

    name = {"8dir": "8dir_kl", "vm": "vm_kl", "mvm": "mvm"}[head]
    score = {"8dir": eval_8dir, "vm": eval_vm, "mvm": eval_mvm}[head]
    cfg = preset(name).replace(num_points=num_points, seed=42)
    if epochs:
        cfg = cfg.replace(epochs=epochs)
    ds = OrientationDataset.synthetic(
        samples_per_class=64, num_points=max(num_points, 512),
        class_names=list(cfg.classes))

    t0 = time.time()
    res = run_multi_seed(cfg, ds, seeds, return_params=True)
    train_s = time.time() - t0
    print(f"[{head}] {len(seeds)}-seed vmapped sweep: {train_s:.1f}s",
          flush=True)

    batch, uni = frozen_test_batch(cfg, ds)
    clouds = np.asarray(batch["points"])
    members = [{"params": res[s]["params"],
                "batch_stats": res[s]["batch_stats"]} for s in seeds]
    kwargs = (dict(mu_parameterization=cfg.vm_mu_parameterization)
              if head == "vm" else
              dict(max_K=cfg.max_k, weight_floor=cfg.mvm_weight_floor,
                   mu_init=cfg.mvm_mu_init) if head == "mvm" else {})

    rows = {"members": {}, "seeds": list(seeds)}
    # one predictor, swap member weights in — the S=1 program compiles once
    pred1 = OrientationPredictor(
        cfg.model, members[0]["params"], members[0]["batch_stats"],
        num_points=num_points, max_batch=64, **kwargs)
    for s, m in zip(seeds, members):
        pred1.variables = {"params": m["params"]}
        if m["batch_stats"]:
            pred1.variables["batch_stats"] = m["batch_stats"]
        rows["members"][s] = score(pred1(clouds), batch, uni)
        print(f"[{head}] member s{s}: {rows['members'][s]}", flush=True)
    mkeys = list(rows["members"][seeds[0]].keys())
    rows["member_mean"] = {
        k: float(np.mean([r[k] for r in rows["members"].values()]))
        for k in mkeys}
    rows["member_best"] = {
        k: float(np.min([r[k] for r in rows["members"].values()]))
        for k in mkeys}

    ens = OrientationPredictor.from_seed_sweep(
        cfg.model, members, num_points=num_points, max_batch=64, **kwargs)
    rows[f"ensemble_S{len(seeds)}"] = score(ens(clouds), batch, uni)
    print(f"[{head}] ensemble S={len(seeds)}: "
          f"{rows[f'ensemble_S{len(seeds)}']}", flush=True)

    if tta_v > 1:
        ens_tta = OrientationPredictor.from_seed_sweep(
            cfg.model, members, num_points=num_points, max_batch=64,
            tta_views=tta_v, **kwargs)
        rows[f"ensemble_S{len(seeds)}_V{tta_v}"] = score(
            ens_tta(clouds), batch, uni)
        print(f"[{head}] ensemble S={len(seeds)} x V={tta_v}: "
              f"{rows[f'ensemble_S{len(seeds)}_V{tta_v}']}", flush=True)
    rows["train_wall_s"] = train_s
    return rows


def main():
    # long TPU jobs can hang mid-dispatch after tunnel hiccups (CLAUDE.md);
    # a repeating traceback dump makes the hang site diagnosable from the log
    import faulthandler
    faulthandler.dump_traceback_later(240, repeat=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", choices=["8dir", "vm", "mvm", "both"],
                    default="both")
    ap.add_argument("--seeds", default="45,46,47,48,49,50,51,52",
                    help="the published envelope seeds (RESULTS.md)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--tta-views", type=int, default=8)
    a = ap.parse_args()
    seeds = [int(s) for s in a.seeds.split(",")]
    heads = ["8dir", "vm"] if a.head == "both" else [a.head]
    out = {}
    for h in heads:
        out[h] = run_head(h, seeds, a.epochs, a.num_points, a.tta_views)
        dst = REPO / "results" / "ensemble" / f"{h}.json"
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_text(json.dumps(out[h], indent=2))
        print(f"[{h}] -> {dst}", flush=True)


if __name__ == "__main__":
    main()
