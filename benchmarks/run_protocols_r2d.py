"""Round-2d: every remaining protocol at the reference's TRUE canonical
shape N=10,000 (train.py:35, train_8dir_*.py:22), sequential on the TPU:

1. the 40-label axes protocol (200 ep/label) at N=10,000 — the reference's
   flagship scope at its flagship shape;
2. 8dir_mse, multi_8dir at N=10,000, 200 ep;
3. 8dir chair per-label at N=10,000, 200 ep.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from run_protocols_r2 import MN40


def axes40_10k():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_per_label

    t0 = time.time()
    ds = OrientationDataset.synthetic(
        samples_per_class=128, num_points=10_000, class_names=MN40
    )
    cfg = preset("axes_all_labels")  # N=10,000, 200 ep — canonical
    summary = run_per_label(cfg, ds, "results/axes_all_40_10k", resume=True)
    vals = sorted(summary.values())
    print(
        f"40-label @10k done in {(time.time()-t0)/60:.1f} min: "
        f"best {vals[0]:.4f}, median {vals[20]:.4f}, worst {vals[-1]:.4f}",
        flush=True,
    )


def dirs_10k():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_per_label, run_single

    for name in ("8dir_mse", "multi_8dir"):
        t0 = time.time()
        cfg = preset(name)
        ds = OrientationDataset.synthetic(
            samples_per_class=64, num_points=10_000,
            class_names=list(cfg.classes),
        )
        run_single(cfg, ds, f"results/{name}_10k")
        print(f"{name}@10k done in {(time.time()-t0)/60:.1f} min", flush=True)

    t0 = time.time()
    cfg = preset("8dir")  # chair per-label scope
    ds = OrientationDataset.synthetic(
        samples_per_class=128, num_points=10_000, class_names=list(cfg.classes)
    )
    run_per_label(cfg, ds, "results/8dir_10k", resume=True)
    print(f"8dir chair@10k done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "axes"):
        axes40_10k()
    if which in ("all", "dirs"):
        dirs_10k()
