"""Test-time augmentation for the 8-dir head: yaw-rotation voting.

The 8-direction basis (`ops/dirs8.py`) is exactly equivariant to yaw
rotations by multiples of 45°: rotating a cloud by k·45° shifts the
correct 8-dir distribution by k slots (verified empirically below against
the GT synthesis). So an opt-in TTA predicts V yaw-shifted views, unshifts
each distribution, and averages — view noise cancels while the signal
aligns, at V× inference FLOPs. The reference has no TTA anywhere; this is
an accuracy lever its protocol cannot express cheaply (it would need V
rotated copies on disk).

Protocol here: train the canonical 8dir_kl preset (200 epochs) on the
synthetic set at N=1024, then evaluate the frozen-rotation test split with
V = 1/2/4/8 views. Prints per-V mean angular error + soft-label KL.

    python benchmarks/tta_eval.py [--epochs 200] [--num-points 1024]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()

    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.ops import forward_to_8dir_probs
    from pointcloud_orientation_tpu.ops.rotations import yaw_matrix
    from pointcloud_orientation_tpu.train import Trainer, preset

    # --- sanity: label-space equivariance of the 45° yaw shift ---
    fwd = jnp.asarray([[0.1, 0.0, -0.9], [0.7, 0.0, 0.2], [-0.3, 0.0, -0.5]])
    for k in (1, 3):
        rot = (yaw_matrix(jnp.asarray(k * jnp.pi / 4)) @ fwd.T).T
        p_rot = np.asarray(forward_to_8dir_probs(rot))
        p_shift = np.roll(np.asarray(forward_to_8dir_probs(fwd)), -k, axis=-1)
        np.testing.assert_allclose(p_rot, p_shift, atol=2e-3)  # f32 rotation
        # rounding perturbs clamped dot products slightly; structure exact
    print("equivariance check: rotating forward by k*45deg == roll(probs, -k)")

    cfg = preset("8dir_kl").replace(
        num_points=a.num_points, epochs=a.epochs, seed=a.seed)
    ds = OrientationDataset.synthetic(
        samples_per_class=64, num_points=max(a.num_points, 512),
        class_names=list(cfg.classes))
    t = Trainer(cfg, ds)
    t.fit(log_every=50)
    t.load_best()

    # frozen-rotation test batch (the same eval keys the test phase uses)
    n = len(t.test_ds)
    pts, labels, uniform, symm, k_spec = t.test_ds.gather_host(np.arange(n))
    eval_key = jax.random.fold_in(
        jax.random.PRNGKey(cfg.seed * 104729 + 17), 0)
    batch = t.augment(eval_key, jnp.asarray(pts), jnp.asarray(uniform),
                      jnp.asarray(symm), jnp.asarray(k_spec))
    clouds = batch["points"]
    gt_probs = np.asarray(batch["probs_8dir"])
    gt_fwd = np.asarray(batch["forward"])
    uni = np.asarray(uniform) > 0

    from pointcloud_orientation_tpu.ops.dirs8 import DIRS_8

    @jax.jit
    def probs_for(clouds):
        logits = t.model.apply(
            t._variables(t.state.params, t.state.batch_stats),
            clouds, train=False, rngs={"sampling": jax.random.PRNGKey(0)})
        return jax.nn.softmax(logits, axis=-1)

    def evaluate(mean_probs):
        pred_fwd = mean_probs @ np.asarray(DIRS_8)
        pn = pred_fwd / (np.linalg.norm(pred_fwd, axis=-1, keepdims=True) + 1e-12)
        gn = gt_fwd / (np.linalg.norm(gt_fwd, axis=-1, keepdims=True) + 1e-12)
        ang = np.degrees(np.arccos(np.clip((pn * gn).sum(-1), -1, 1)))
        ang = ang[~uni]  # uniform classes: angular undefined (tasks.py)
        kl = -(gt_probs * np.log(np.clip(mean_probs, 1e-9, 1.0))).sum(-1)
        ent = -(gt_probs * np.log(np.clip(gt_probs, 1e-9, 1.0))).sum(-1)
        return float(ang.mean()), float((kl - ent).mean())

    per_view = []
    for k in range(8):
        rot = yaw_matrix(jnp.asarray(k * jnp.pi / 4))  # (3, 3)
        view = jnp.einsum("ij,bnj->bni", rot, clouds,
                          precision=jax.lax.Precision.HIGHEST)
        p = np.asarray(probs_for(view))
        per_view.append(np.roll(p, +k, axis=-1))  # unshift to frame 0
    per_view = np.stack(per_view)  # (8, B, 8)

    for V in (1, 2, 4, 8):
        step = 8 // V
        mean_probs = per_view[::step][:V].mean(0)
        ang, kl = evaluate(mean_probs)
        print(f"V={V}: mean angular {ang:6.2f} deg   test KL {kl:.4f}")


if __name__ == "__main__":
    main()
