"""CLI entry point: ``python -m pointcloud_orientation_tpu.train.run``.

One command replaces the reference's ten ``python <script>.py`` entry points
(SURVEY.md §2.5): pick a preset, a data source, and overrides.

Examples
--------
Train the 8-dir soft-label-KL config on synthetic data (smoke):

    python -m pointcloud_orientation_tpu.train.run --preset 8dir_kl \
        --data synthetic --epochs 5 --out results/8dir_kl

Train on a ModelNet40 HDF5 archive:

    python -m pointcloud_orientation_tpu.train.run --preset mvm \
        --data hdf5:/data/modelnet40_ply_hdf5_2048 --out results/mvm

Per-label training over every category (the `train.py` protocol):

    python -m pointcloud_orientation_tpu.train.run --preset axes_all_labels \
        --data hdf5:/data/modelnet40_ply_hdf5_2048 --out results/axes
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np

from ..data import OrientationDataset
from ..parallel import make_mesh
from .config import PRESETS, preset
from .metrics import write_mvm_results_txt, write_summary_txt
from .trainer import Trainer


def load_dataset(spec: str, num_points: int, classes=None) -> OrientationDataset:
    if spec == "synthetic":
        return OrientationDataset.synthetic(
            samples_per_class=64,
            num_points=max(num_points, 512),
            class_names=list(classes) if classes else None,
        )
    if spec.startswith("hdf5:"):
        return OrientationDataset.from_hdf5(spec[len("hdf5:") :])
    if spec.startswith("ply:"):
        return OrientationDataset.from_ply_tree(spec[len("ply:") :], num_points)
    if spec.startswith("plygt:"):
        # pre-rotated reference tree WITH sidecar GT: stored targets are
        # used verbatim (the trainer should run with rotation_mode='none')
        return OrientationDataset.from_ply_tree(
            spec[len("plygt:") :], num_points, load_sidecars=True
        )
    raise ValueError(
        f"unknown data spec: {spec} (use synthetic | hdf5:DIR | ply:DIR | plygt:DIR)"
    )


def _decode_axes(task: str, outputs, i: int):
    """Decode one sample's model outputs to [side, up, forward] vectors for
    the axes-PLY overlay (reference decodes: `train.py:236-237` cross
    product; `train_8dir.py:119-139` probability-weighted direction with a
    fixed up axis)."""
    from ..ops import DIRS_8
    from ..viz.axes_export import axes_from_two_heads

    up = np.array([0.0, 1.0, 0.0])

    def from_forward(fwd):
        fwd = np.asarray(fwd, np.float64)
        fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
        side = np.cross(up, fwd)
        side /= np.linalg.norm(side) + 1e-12
        return [side, up, fwd]

    if task == "axes":
        vy, vz = np.asarray(outputs[0][i]), np.asarray(outputs[1][i])
        return axes_from_two_heads(vy, vz)
    if task in ("8dir_mse", "8dir_kl"):
        import jax.nn

        probs = np.asarray(jax.nn.softmax(outputs[i]))
        return from_forward(probs @ np.asarray(DIRS_8))
    if task in ("forward_mse", "multi_8dir"):
        return from_forward(np.asarray(outputs[i]))
    if task == "vm_kl":
        mu = float(outputs[0][i])
        return from_forward([np.sin(mu), 0.0, -np.cos(mu)])
    if task == "mvm":
        mu_all, _, w = outputs
        mu = float(np.asarray(mu_all[i])[np.argmax(np.asarray(w[i]))])
        return from_forward([np.sin(mu), 0.0, -np.cos(mu)])
    return None


def export_test_predictions(trainer, out_dir: str, max_count: int = 10):
    """Write up to 10 axes-annotated prediction PLYs from the test split —
    the reference's end-of-training visualization artifact
    (`train.py:228-246`). Clouds are rotated with the frozen eval keys (the
    reference predicts on its rotated test files)."""
    import jax
    import jax.numpy as jnp

    from ..data.ply import write_ply_with_axes

    ds = trainer.test_ds
    n = min(max_count, len(ds))
    if n == 0:
        return 0
    pts, labels, uniform, symm, k_spec = ds.gather_host(np.arange(n))
    eval_key = jax.random.fold_in(
        jax.random.PRNGKey(trainer.cfg.seed * 104729 + 17), 0
    )
    batch = trainer.augment(
        eval_key, jnp.asarray(pts), jnp.asarray(uniform), jnp.asarray(symm),
        jnp.asarray(k_spec),
    )
    clouds = np.asarray(batch["points"])
    outputs = trainer.predict(clouds)
    written = 0
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        axes = _decode_axes(trainer.cfg.task, outputs, i)
        if axes is None:
            return 0
        write_ply_with_axes(
            clouds[i], axes, os.path.join(out_dir, f"sample_{i}_pred_{i + 1}.ply")
        )
        written += 1
    return written


def _write_8dir_distribution_summary(trainer, out_dir: str, max_count: int = 128):
    """Append the mean GT vs mean predicted 8-direction distributions over
    the test split — the reference's per-run summary extra
    (`train_8dir.py:92-114`)."""
    import jax
    import jax.numpy as jnp

    ds = trainer.test_ds
    n = min(max_count, len(ds))
    if n == 0:
        return
    pts, labels, uniform, symm, k_spec = ds.gather_host(np.arange(n))
    eval_key = jax.random.fold_in(
        jax.random.PRNGKey(trainer.cfg.seed * 104729 + 17), 0
    )
    batch = trainer.augment(
        eval_key, jnp.asarray(pts), jnp.asarray(uniform), jnp.asarray(symm),
        jnp.asarray(k_spec),
    )
    logits = trainer.predict(np.asarray(batch["points"]))
    pred = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)).mean(0)
    gt = np.asarray(batch["probs_8dir"]).mean(0)
    with open(os.path.join(out_dir, "summary.txt"), "a") as f:
        f.write("mean_gt_8dir\t" + " ".join(f"{v:.4f}" for v in gt) + "\n")
        f.write("mean_pred_8dir\t" + " ".join(f"{v:.4f}" for v in pred) + "\n")


def run_single(cfg, dataset, out_dir: str, mesh=None, label: Optional[str] = None):
    from .reliability import PreemptionGuard

    trainer = Trainer(cfg, dataset, mesh=mesh)
    with PreemptionGuard() as guard:
        trainer.fit(
            checkpoint_dir=os.path.join(out_dir, "ckpt")
            if cfg.checkpoint_every else None,
            preemption_guard=guard,
        )
    test_acc = trainer.test()
    trainer.write_artifacts(out_dir, test_acc)
    export_test_predictions(trainer, os.path.join(out_dir, "pred_ply"))
    if cfg.task in ("8dir_mse", "8dir_kl"):
        _write_8dir_distribution_summary(trainer, out_dir)
    print(
        f"[{label or cfg.task}] test loss {test_acc.mean_loss:.6f}  "
        f"angular {test_acc.mean_angular_error:.2f} deg  "
        f"best val {trainer.best_val:.6f} @ epoch {trainer.best_val_epoch}"
    )
    if cfg.task == "mvm":
        hist = {"total": {"train": trainer.history["train"], "val": trainer.history["val"]}}
        hist.update(trainer.class_history)
        write_mvm_results_txt(
            os.path.join(out_dir, "results.txt"),
            trainer.class_names,
            hist,
            test_kl=test_acc.mean_loss,
            best_val_epoch=trainer.best_val_epoch,
        )
        # polar density plots of a few test predictions
        # (`visualization/visualization_MVM.py` rendering)
        from ..viz import plot_predicted_density

        n = min(4, len(trainer.test_ds))
        if n:
            mu, kappa, w = trainer.predict(trainer.test_ds.points[:n, : trainer.num_points])
            for i in range(n):
                plot_predicted_density(
                    mu[i], kappa[i], w[i],
                    os.path.join(out_dir, "figs", f"pred_density_{i}.png"),
                )
    return trainer, test_acc


def _completed_best_val(label_dir: str, epochs: int):
    """best_val from a finished per-label run (metrics.json with a full
    history at this epoch budget and a test block), else None."""
    path = os.path.join(label_dir, "metrics.json")
    try:
        with open(path) as f:
            m = json.load(f)
        if len(m["history"]["val"]) == epochs and "test" in m:
            return float(m["best_val"])
    except (OSError, KeyError, ValueError, TypeError):
        pass
    return None


def run_per_label(cfg, dataset, out_dir: str, mesh=None, resume: bool = False):
    """The `train.py:250-276` protocol: one model per category, appending a
    per-label summary. With resume=True, labels whose metrics.json already
    records a completed run at this epoch budget are skipped (their best_val
    is read back), so an interrupted 40-label protocol continues in place."""
    os.makedirs(out_dir, exist_ok=True)
    summary = {}
    for label in dataset.class_names:
        sub_cfg = cfg.replace(classes=(label,), per_label=False)
        label_dir = os.path.join(out_dir, label)
        if resume:
            prior = _completed_best_val(label_dir, sub_cfg.epochs)
            if prior is not None:
                summary[label] = prior
                write_summary_txt(os.path.join(out_dir, "summary.txt"), summary)
                continue
        trainer, test_acc = run_single(
            sub_cfg, dataset.select_classes([label]), label_dir, mesh, label=label
        )
        summary[label] = trainer.best_val
        # append-as-you-go like the reference's summary.txt
        write_summary_txt(os.path.join(out_dir, "summary.txt"), summary)
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", choices=sorted(PRESETS), required=True)
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--out", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--classes", default=None, help="comma-separated override")
    ap.add_argument(
        "--compute-dtype", default=None, dest="compute_dtype",
        help="trunk computation dtype, e.g. bfloat16 (params/heads stay f32)",
    )
    ap.add_argument(
        "--attention", default=None, dest="transformer_attention",
        choices=("xla", "flash"),
        help="transformer attention backend (flash = Pallas blockwise, "
             "O(N) memory; the N>16k single-chip path)",
    )
    ap.add_argument("--checkpoint-every", type=int, default=None)
    ap.add_argument(
        "--profile-dir", default=None, dest="profile_dir",
        help="capture a jax.profiler trace of the run into this directory "
             "(view with TensorBoard/XProf)",
    )
    ap.add_argument(
        "--async-checkpoint", action="store_true", dest="async_checkpoint",
        help="overlap periodic checkpoint writes with training (Orbax "
             "AsyncCheckpointer); fit() waits for the last write",
    )
    ap.add_argument("--mesh", default=None, help="e.g. 'data:8' for 8-way DP")
    ap.add_argument("--debug-checks", action="store_true")
    ap.add_argument(
        "--host-resident", action="store_true", dest="host_resident",
        help="stream one batch per step from host memory instead of "
             "device-resident packed arrays (datasets larger than HBM); "
             "same math/PRNG streams, per-step dispatch overhead",
    )
    ap.add_argument(
        "--lr-schedule", default=None, dest="lr_schedule",
        choices=("cosine",),
        help="opt-in LR schedule (default: the reference's constant lr)",
    )
    ap.add_argument("--warmup-epochs", type=int, default=None,
                    dest="warmup_epochs")
    ap.add_argument(
        "--vmap-labels", action="store_true", dest="vmap_labels",
        help="run the per-label protocol with ALL labels vmapped into one "
             "program (equal-size label subsets; see train/ensemble.py)",
    )
    ap.add_argument(
        "--seeds", default=None,
        help="comma-separated seed list, e.g. 42,43,44: train every seed "
             "in ONE vmapped program (single-model presets; writes "
             "per-seed metrics + seeds_summary.json; see train/multiseed.py)",
    )
    ap.add_argument(
        "--resume-from", default=None, dest="resume_from",
        help="vmapped protocols (--seeds / --vmap-labels): resume from a "
             "protocol checkpoint step_<E> directory written by "
             "--checkpoint-every (see train/protocol_ckpt.py)",
    )
    ap.add_argument(
        "--moe-dispatch", default=None, choices=("masked", "capacity"),
        dest="moe_dispatch",
        help="MoE FFN dispatch (moe_point_transformer): masked dense "
             "(default, K-times redundant compute) or switch-style "
             "capacity-factor gather dispatch (parallel/ep.py)",
    )
    ap.add_argument(
        "--knn", default=None, choices=("exact", "approx"),
        help="neighbor-selection formulation: exact (default, reference "
             "semantics) or approx (TPU PartialReduce hardware top-k — "
             "1.85x at N=10,000, ~0.98 recall; RESULTS.md)",
    )
    args = ap.parse_args(argv)

    if args.knn:
        # trace-time knob: must be set before anything jits
        from ..ops import set_knn_impl

        set_knn_impl(args.knn)

    overrides = {}
    for field in ("epochs", "batch_size", "num_points", "lr", "seed",
                  "checkpoint_every", "compute_dtype", "transformer_attention",
                  "lr_schedule", "warmup_epochs", "moe_dispatch"):
        v = getattr(args, field)
        if v is not None:
            overrides[field] = v
    if args.classes:
        overrides["classes"] = tuple(args.classes.split(","))
    if args.debug_checks:
        overrides["debug_checks"] = True
    if args.host_resident:
        overrides["host_resident"] = True
    if args.async_checkpoint:
        overrides["async_checkpoint"] = True
    if args.data.startswith("plygt:"):
        overrides["rotation_mode"] = "none"
    cfg = preset(args.preset, **overrides)

    mesh = None
    if args.mesh:
        axis, _, size = args.mesh.partition(":")
        mesh = make_mesh((axis,), (int(size),) if size else None)

    dataset = load_dataset(args.data, cfg.num_points, classes=cfg.classes)
    out_dir = args.out or os.path.join(cfg.out_dir, args.preset)

    t0 = time.time()
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile_dir:
        from ..utils.profiling import capture_trace

        profile_ctx = capture_trace(args.profile_dir)
    vmapped = bool(args.seeds or (cfg.per_label and args.vmap_labels))
    if vmapped:
        unsupported = []
        if cfg.async_checkpoint:
            unsupported.append(
                "--async-checkpoint (vmapped protocol saves are "
                "synchronous at block boundaries)")
        if cfg.host_resident:
            unsupported.append(
                "--host-resident (the vmapped protocols build stacked "
                "device-resident splits)")
        if unsupported:
            import warnings

            warnings.warn(
                "ignored by the vmapped protocols (--seeds / "
                "--vmap-labels): " + "; ".join(unsupported),
                stacklevel=1,
            )
    if args.resume_from and not (args.seeds
                                 or (cfg.per_label and args.vmap_labels)):
        # fail fast: silently restarting from epoch 1 would overwrite the
        # artifacts the user is trying to continue (sequential runs resume
        # via the trainer's own Orbax checkpoints, not protocol ones)
        raise SystemExit(
            "--resume-from applies to the vmapped protocols only "
            "(--seeds / --vmap-labels); sequential runs resume via "
            "Trainer.load_checkpoint / --checkpoint-every artifacts")
    vm_ckpt_dir = (os.path.join(out_dir, "ckpt")
                   if cfg.checkpoint_every else None)
    with profile_ctx:
        if args.seeds:
            from .multiseed import run_multi_seed
            from .reliability import PreemptionGuard

            seeds = [int(s) for s in args.seeds.split(",")]
            with PreemptionGuard() as guard:
                run_multi_seed(
                    cfg, dataset, seeds, out_dir, mesh=mesh,
                    checkpoint_dir=vm_ckpt_dir,
                    resume_from=args.resume_from, preemption_guard=guard)
        elif cfg.per_label and args.vmap_labels:
            from .ensemble import run_per_label_vmapped
            from .reliability import PreemptionGuard

            with PreemptionGuard() as guard:
                run_per_label_vmapped(
                    cfg, dataset, out_dir, mesh=mesh,
                    checkpoint_dir=vm_ckpt_dir,
                    resume_from=args.resume_from, preemption_guard=guard)
        elif cfg.per_label:
            run_per_label(cfg, dataset, out_dir, mesh)
        else:
            run_single(cfg, dataset, out_dir, mesh)
    print(f"done in {(time.time() - t0) / 60:.1f} min; artifacts in {out_dir}")


if __name__ == "__main__":
    main()
