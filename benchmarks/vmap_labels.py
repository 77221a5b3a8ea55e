"""A/B the per-label protocol: sequential vs vmapped-ensemble, on TPU.

The reference's canonical protocol (`/root/reference/train.py:250-276`)
trains one model per category sequentially; each per-label step is tiny
(batch 16) and underutilizes the MXU. `train/ensemble.py` vmaps all L
label trainings into ONE program. This script measures both paths on the
same dataset/config and reports protocol wall-clock + clouds/s.

Timing follows the repo's measurement rule (CLAUDE.md): results are
synchronized by FETCHING values — both paths end by pulling per-epoch
metric histories to host numpy, so the wall numbers cover real device
compute, not dispatch. Each path runs `--runs` times in-process; the
first run carries compilation and is reported separately.

Usage (from /root/repo, TPU default platform):
    python benchmarks/vmap_labels.py --labels 40 --epochs 50
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.train import Trainer, preset
from pointcloud_orientation_tpu.train.ensemble import run_per_label_vmapped

# ModelNet40 category names (reference tree layout,
# `data_process/hdf5_process.py` / results/2d_0.1/summary.txt rows).
M40 = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
    "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
    "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
    "mantel", "monitor", "night_stand", "person", "piano", "plant",
    "radio", "range_hood", "sink", "sofa", "stairs", "stool", "table",
    "tent", "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]


def run_sequential(cfg, ds, labels):
    t0 = time.perf_counter()
    out = {}
    for label in labels:
        t = Trainer(cfg.replace(classes=(label,), per_label=False),
                    ds.select_classes([label]))
        t.fit(log_every=0)
        out[label] = float(t.best_val)
    return time.perf_counter() - t0, out


def run_vmapped(cfg, ds, labels):
    t0 = time.perf_counter()
    res = run_per_label_vmapped(cfg, ds, labels=labels, log_every=0)
    return time.perf_counter() - t0, {l: res[l]["best_val"] for l in labels}


def main():
    faulthandler.dump_traceback_later(240, repeat=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--samples-per-class", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--pallas", default=None, choices=["auto", "never"],
                    help="force the kernel dispatch mode (A/B the vmapped "
                         "program's Pallas batching against pure XLA)")
    ap.add_argument("--skip-sequential", action="store_true")
    ap.add_argument("--out", default="results/vmap_labels/ab.json")
    args = ap.parse_args()
    if args.pallas:
        from pointcloud_orientation_tpu.ops.geometry import set_pallas_mode
        set_pallas_mode(args.pallas)

    labels = M40[: args.labels]
    cfg = preset("axes_all_labels").replace(
        num_points=args.num_points, epochs=args.epochs)
    ds = OrientationDataset.synthetic(
        samples_per_class=args.samples_per_class,
        num_points=args.num_points + 512,
        class_names=labels,
    )
    # protocol size: one train epoch over every label's train split
    n_train = sum(
        int(len(ds.select_classes([l])) * 0.7) for l in labels)
    total_clouds = n_train * args.epochs

    record = {
        "labels": len(labels), "epochs": args.epochs,
        "num_points": args.num_points, "batch_size": cfg.batch_size,
        "samples_per_class": args.samples_per_class,
        "train_clouds_per_protocol": total_clouds,
        "pallas_mode": args.pallas or "auto",
        "sequential": [], "vmapped": [],
    }
    legs = [("vmapped", run_vmapped)]
    if not args.skip_sequential:
        legs.append(("sequential", run_sequential))
    for name, fn in legs:
        best = None
        for r in range(args.runs):
            wall, bv = fn(cfg, ds, labels)
            record[name].append({
                "run": r, "wall_s": wall,
                "clouds_per_s": total_clouds / wall,
            })
            best = bv
            print(f"{name} run {r}: {wall:.1f} s "
                  f"({total_clouds / wall:.0f} train clouds/s)", flush=True)
        record[f"{name}_best_val"] = best

    warm_vm = record["vmapped"][-1]["wall_s"]
    summary = {"vmapped_s": round(warm_vm, 1)}
    if not args.skip_sequential:
        warm_seq = record["sequential"][-1]["wall_s"]
        record["speedup_warm"] = warm_seq / warm_vm
        # the two paths train the same models; report metric agreement
        deltas = [abs(record["sequential_best_val"][l] -
                      record["vmapped_best_val"][l]) for l in labels]
        record["best_val_max_abs_delta"] = float(np.max(deltas))
        record["best_val_mean_abs_delta"] = float(np.mean(deltas))
        summary.update({
            "speedup_warm": round(record["speedup_warm"], 2),
            "sequential_s": round(warm_seq, 1),
            "best_val_mean_abs_delta": record["best_val_mean_abs_delta"],
        })

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
