"""Round-2 full-budget protocol runs (VERDICT items 4 + 5), run sequentially
on the one TPU:

1. the 40-label axes protocol at the reference's 200-epoch/label budget
   (`/root/reference/train.py:250-276`), replacing the round-1 10-epoch
   placeholder (results/axes_all_40);
2. MvM A/B at the full 100-epoch protocol: parity `mvm` re-run vs
   `mvm_guarded`, each at the round-1 data volume (64 clouds/class) and at
   200 clouds/class (the reference trained on hundreds of real clouds per
   category — data volume is the prime suspect for the 0.114-vs-0.0777 gap).

Synthetic data (no network egress — caveat recorded in RESULTS.md).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

MN40 = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
    "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
    "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
    "mantel", "monitor", "night_stand", "person", "piano", "plant", "radio",
    "range_hood", "sink", "sofa", "stairs", "stool", "table", "tent",
    "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]


def axes_protocol():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_per_label

    t0 = time.time()
    ds = OrientationDataset.synthetic(
        samples_per_class=128, num_points=1024, class_names=MN40
    )
    cfg = preset("axes_all_labels").replace(
        num_points=1024, batch_size=16, epochs=200
    )
    summary = run_per_label(cfg, ds, "results/axes_all_40_full", resume=True)
    vals = sorted(summary.values())
    print(
        f"40-label 200-epoch protocol done in {(time.time()-t0)/60:.1f} min: "
        f"best {vals[0]:.4f}, median {vals[20]:.4f}, worst {vals[-1]:.4f}",
        flush=True,
    )


def mvm_ab():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import Trainer, preset
    from pointcloud_orientation_tpu.train.metrics import write_mvm_results_txt
    from pointcloud_orientation_tpu.train.run import run_single

    for out_name, preset_name, spc in [
        ("mvm_guarded_full", "mvm_guarded", 64),
        ("mvm_spc200", "mvm", 200),
        ("mvm_guarded_spc200", "mvm_guarded", 200),
    ]:
        t0 = time.time()
        cfg = preset(preset_name).replace(num_points=512, batch_size=16)
        ds = OrientationDataset.synthetic(
            samples_per_class=spc, num_points=512, class_names=list(cfg.classes)
        )
        run_single(cfg, ds, f"results/{out_name}")
        print(f"{out_name} done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "axes"):
        axes_protocol()
    if which in ("all", "mvm"):
        mvm_ab()
