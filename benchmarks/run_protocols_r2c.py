"""Round-2c protocol batch (sequential on the one TPU):

1. the full 40-label axes protocol at 200 ep/label, re-run under the
   shipped round-2 kernels/dispatch (exact train-mode BN, deferred-extract
   grouping) into results/axes_all_40_r2 — the earlier axes_all_40_full
   tree (round-1 dispatch) is kept as-is;
2. vm_kl and vm_kl_atan2 at the preset-canonical N=10,000, full 200 ep.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from run_protocols_r2 import MN40


def axes40():
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
    summary = run_per_label(cfg, ds, "results/axes_all_40_r2", resume=True)
    vals = sorted(summary.values())
    print(
        f"40-label r2 rerun done in {(time.time()-t0)/60:.1f} min: "
        f"best {vals[0]:.4f}, median {vals[20]:.4f}, worst {vals[-1]:.4f}",
        flush=True,
    )


def vm_10k():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_single

    for name in ("vm_kl", "vm_kl_atan2"):
        t0 = time.time()
        cfg = preset(name)  # N=10,000, 200 epochs
        ds = OrientationDataset.synthetic(
            samples_per_class=64, num_points=10_000,
            class_names=list(cfg.classes),
        )
        run_single(cfg, ds, f"results/{name}_10k")
        print(f"{name}@10k done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "axes"):
        axes40()
    if which in ("all", "vm"):
        vm_10k()
