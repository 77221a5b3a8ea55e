"""Round-2b protocol runs at the preset-canonical N=10,000 (the reference's
true shape), sequential on the one TPU:

1. `mvm` parity and `mvm_spread` at N=10,000, 100 epochs — the published
   512-pt runs validated dynamics; these pin the canonical-shape numbers.
2. `8dir_kl` full 200-epoch protocol at N=10,000 with the round-2 kernels
   (round-1 wall-clock was 5.7 min; this re-measures it).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def mvm_10k():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_single

    for name in ("mvm", "mvm_spread"):
        t0 = time.time()
        cfg = preset(name)  # num_points=10_000, epochs=100
        ds = OrientationDataset.synthetic(
            samples_per_class=64, num_points=10_000,
            class_names=list(cfg.classes),
        )
        run_single(cfg, ds, f"results/{name}_10k")
        print(f"{name}@10k done in {(time.time()-t0)/60:.1f} min", flush=True)


def kl_10k():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_single

    t0 = time.time()
    cfg = preset("8dir_kl")  # num_points=10_000, epochs=200
    ds = OrientationDataset.synthetic(
        samples_per_class=64, num_points=10_000, class_names=list(cfg.classes)
    )
    run_single(cfg, ds, "results/8dir_kl_10k_r2")
    print(f"8dir_kl@10k 200ep done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mvm"):
        mvm_10k()
    if which in ("all", "kl"):
        kl_10k()
