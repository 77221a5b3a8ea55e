"""Standalone evaluation: run a trained checkpoint (ours or a reference
PyTorch ``.pth``) over a dataset and report loss + mean angular error.

This is the cross-stack validation path for BASELINE.json's angular-error
delta: evaluate the same reference weights under both stacks on the same
clouds.

    # reference torch weights
    python -m pointcloud_orientation_tpu.train.evaluate --preset 8dir_kl \
        --torch-ckpt results/8dir_KLdiv_0926.pth --data plygt:/path/to/tree

    # our orbax checkpoint
    python -m pointcloud_orientation_tpu.train.evaluate --preset 8dir_kl \
        --ckpt results/8dir_kl/ckpt/step_100 --data synthetic
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from ..utils import load_torch_checkpoint
from .config import PRESETS, preset
from .run import load_dataset
from .trainer import Trainer


def evaluate(cfg, dataset, torch_ckpt=None, orbax_ckpt=None):
    trainer = Trainer(cfg, dataset)
    if torch_ckpt:
        params, stats = load_torch_checkpoint(torch_ckpt, cfg.model)
        trainer.state = trainer.state.replace(
            params=jax.tree_util.tree_map(np.asarray, params),
            batch_stats=jax.tree_util.tree_map(np.asarray, stats),
        )
    elif orbax_ckpt:
        trainer.restore_checkpoint(orbax_ckpt)
    acc = trainer._run_phase(trainer.test_ds, train=False, epoch=0)
    return {
        "loss": acc.mean_loss,
        "mean_angular_error_deg": acc.mean_angular_error,
        "per_class": acc.per_class_mean(),
        "count": acc.count,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS), required=True)
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    args = ap.parse_args(argv)

    overrides = {}
    if args.num_points:
        overrides["num_points"] = args.num_points
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.data.startswith("plygt:"):
        overrides["rotation_mode"] = "none"
    cfg = preset(args.preset, **overrides)
    dataset = load_dataset(args.data, cfg.num_points)
    result = evaluate(cfg, dataset, args.torch_ckpt, args.ckpt)
    print(json.dumps(result, indent=2, default=float))


if __name__ == "__main__":
    main()
