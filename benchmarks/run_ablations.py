"""The reference's published chair ablations at the canonical shape
(N=10,000, 200 ep, chair): orthogonality lambda 0.1 vs 1.0 vs Gram-Schmidt
(`results/zy_lambda0.1|zy_lambda1|chair_schemit/summary.txt:1` =
0.084 / 0.397 / 0.602) and the no-L2-norm head ablation
(`results/without_l2_norm/summary.txt`, range 0.22-0.37).
The check is the ORDERING/structure (synthetic data; absolute values are
not comparable to real ModelNet40).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.run import run_single

    ds = OrientationDataset.synthetic(
        samples_per_class=128, num_points=10_000, class_names=["chair"]
    )
    base = preset("axes_all_labels").replace(classes=("chair",), per_label=False)
    variants = {
        "ablation_lambda0.1": base,
        "ablation_lambda1": base.replace(lambda_orth=1.0),
        # with GS the orth penalty is identically 0, so lambda is inert
        "ablation_schmidt": base.replace(axes_gram_schmidt=True),
        "ablation_no_l2": base.replace(axes_normalize_heads=False),
    }
    for name, cfg in variants.items():
        t0 = time.time()
        run_single(cfg, ds, f"results/{name}")
        print(f"{name} done in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
