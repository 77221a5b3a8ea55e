"""Yaw-voting TTA for the DISTRIBUTION heads (VERDICT r3 item 2): von
Mises and mixture-von-Mises, measured exactly like `tta_eval.py` measures
the 8-dir head.

The vM/MvM heads predict angles in the cloud's yaw frame
(`/root/reference/models/pointnet_pp_vonMises.py:8-38`,
`pointnet_pp_mvM.py:30-127`), so rotating a cloud by yaw(θ) shifts every
μ by −θ: the heads are exactly yaw-equivariant and view averaging is
well-defined. `infer.OrientationPredictor(tta_views=V)` implements it:

* vM: per-view μ derotates by +θ; the exact view-averaged density (a
  V-component mixture) is moment-matched back to one (μ, κ).
* MvM: component μ's derotate; output is the exact averaged mixture with
  V·K components (weights ÷ V).

Protocol: train the canonical preset (vm_kl 200 ep / mvm 100 ep,
synthetic, N=1024), evaluate the frozen-rotation test split through the
SHIPPED predictor at V = 1/2/4/8. Metrics are the cross-stack shared
definitions (`benchmarks/cross_stack.py`): vM analytic KL + |wrapped
μ−μ_gt| on asymmetric samples; MvM Hungarian-matched weighted KL + peak
error (rectangular cost matrix: the V·K predicted components compete for
the K_gt slots, so mixture TTA needs no refit to be scored).

    python benchmarks/tta_dist_eval.py [--head vm|mvm|both]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np


def run_head(head: str, epochs: int | None, num_points: int, seed: int,
             rotation: str | None = None, vm_preset: str = "vm_kl"):
    from cross_stack import _metrics_mvm, _metrics_mvm_grid, _metrics_vm
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.infer import OrientationPredictor
    from pointcloud_orientation_tpu.train import Trainer, preset

    name = {"vm": vm_preset, "mvm": "mvm",
            "fwd": "pointnet_pp_forward"}[head]
    cfg = preset(name).replace(num_points=num_points, seed=seed)
    if epochs:
        cfg = cfg.replace(epochs=epochs)
    if rotation:
        cfg = cfg.replace(rotation_mode=rotation)
    ds = OrientationDataset.synthetic(
        samples_per_class=64, num_points=max(num_points, 512),
        class_names=list(cfg.classes))
    t = Trainer(cfg, ds)
    t.fit(log_every=50)
    t.load_best()

    # frozen-rotation test batch: same eval-key recipe as the test phase
    n = len(t.test_ds)
    pts, labels, uniform, symm, k_spec = t.test_ds.gather_host(np.arange(n))
    eval_key = jax.random.fold_in(
        jax.random.PRNGKey(cfg.seed * 104729 + 17), 0)
    batch = t.augment(eval_key, jnp.asarray(pts), jnp.asarray(uniform),
                      jnp.asarray(symm), jnp.asarray(k_spec))
    clouds = np.asarray(batch["points"])
    if head == "fwd":
        gt_fwd = np.asarray(batch["axes"][:, cfg.target_row])
        uni = np.asarray(uniform) > 0
    elif head == "vm":
        vm_gt = np.stack([np.asarray(batch["vm_mu"]),
                          np.asarray(batch["vm_kappa"])], -1)
    else:
        gt_params = np.stack([np.asarray(batch["mvm_mu"]),
                              np.asarray(batch["mvm_kappa"]),
                              np.asarray(batch["mvm_weight"])], -1)
        gt_k = np.asarray(batch["mvm_k"])

    # model kwargs must mirror Trainer._build_model so params load 1:1
    kwargs = (dict(mu_parameterization=cfg.vm_mu_parameterization)
              if head == "vm" else
              dict(max_K=cfg.max_k, weight_floor=cfg.mvm_weight_floor,
                   mu_init=cfg.mvm_mu_init) if head == "mvm" else {})

    rows = {}
    for V in (1, 2, 4, 8):
        pred = OrientationPredictor(
            cfg.model, t.state.params, t.state.batch_stats,
            num_points=num_points, max_batch=64, tta_views=V, **kwargs)
        if head == "fwd":
            fwd = pred.forward_vectors(clouds)
            gn = gt_fwd / (np.linalg.norm(gt_fwd, axis=-1, keepdims=True)
                           + 1e-12)
            ang = np.degrees(np.arccos(np.clip((fwd * gn).sum(-1), -1, 1)))
            losses = ((fwd - gt_fwd) ** 2).mean(-1)
            angs = np.where(uni, np.nan, ang)  # uniform: angular undefined
        elif head == "vm":
            out = pred(clouds)
            mu, kappa = out
            losses, angs = _metrics_vm(mu, kappa, vm_gt)
        else:
            out = pred(clouds)
            mu, kappa, w = out
            # rect=True at EVERY V (incl. V=1): the square reference metric
            # truncates to the first K components, which for the view-major
            # TTA mixture is exactly the view-0 (V=1) prediction — scoring
            # with it makes TTA a no-op by construction (r4 review finding).
            losses, angs = _metrics_mvm(mu, kappa, w, gt_params, gt_k,
                                        rect=True)
            # assignment-free density metric: the matched metric is
            # slot-competition-sensitive for V*K mixtures; grid KL scores
            # the mixture as a DENSITY, which is what TTA averages
            grid_kl = _metrics_mvm_grid(mu, kappa, w, gt_params, gt_k)
        rows[V] = dict(loss=float(np.mean(losses)),
                       ang=float(np.nanmean(angs)))
        if head == "mvm":
            rows[V]["grid_kl"] = float(np.mean(grid_kl))
        print(f"[{head}] V={V}: loss {rows[V]['loss']:.4f}   "
              f"mean angular {rows[V]['ang']:6.2f} deg"
              + (f"   grid KL {rows[V]['grid_kl']:.4f}"
                 if head == "mvm" else ""), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", choices=["vm", "mvm", "fwd", "both"],
                    default="both")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override preset epochs (default: preset values)")
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--rotation", default=None,
                    help="override preset rotation_mode (yaw/so3/none)")
    ap.add_argument("--vm-preset", default="vm_kl",
                    help="vm head preset (vm_kl = parity tanh head, "
                         "vm_kl_atan2 = wrap-free framework head)")
    ap.add_argument("--out", default=None, help="write JSON summary here")
    a = ap.parse_args()

    heads = ["vm", "mvm"] if a.head == "both" else [a.head]
    results = {h: run_head(h, a.epochs, a.num_points, a.seed, a.rotation,
                           vm_preset=a.vm_preset)
               for h in heads}
    if a.out:
        with open(a.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
