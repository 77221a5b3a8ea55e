"""Cross-stack north-star measurement: train BOTH stacks on identical data.

BASELINE.json's north star is "<0.5 deg mean angular-error delta vs the
reference"; this harness produces that number without ModelNet40 (no network
egress) by materializing the synthetic dataset as a reference-format PLY
tree, training the reference's own scripts (torch, CPU) and our presets on
the SAME tree, and evaluating both checkpoints on a SHARED held-out eval
tree with one metric definition.

Subcommands
-----------
materialize   build the shared train/eval trees under results/cross_stack/data
prep-ref      write path-patched copies of the reference train scripts to a
              scratch dir (never committed; the reference stays read-only)
eval-torch    evaluate a reference ``.pth`` with the reference's own torch
              model classes on a tree, reporting the same loss + angular
              metric our stack reports (independent of our import path)

Protocol (RESULTS.md "Cross-stack" section):
  python benchmarks/cross_stack.py materialize
  python benchmarks/cross_stack.py prep-ref --scratch /tmp/refrun
  (run the patched scripts; then train our presets with --data plygt:...)
  python benchmarks/cross_stack.py eval-torch --ckpt ... --head 8dir --tree ...

Reference entry points reproduced/patched: `train_8dir_KL.py:17-24` (path +
hyperparameter constants), `train.py:25-37` (same). Angular metric matches
`pointcloud_orientation_tpu/train/tasks.py` (`_8dir_ang`, `_axes_ang`).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
DATA_ROOT = os.path.join(REPO, "results", "cross_stack", "data")

CLASSES_8DIR = ["chair", "toilet", "sofa", "plant", "bowl", "bottle"]
# north-star eval labels (BASELINE.md): chair, bottle, door
CLASSES_ALL = CLASSES_8DIR + ["door"]
AXES_LABELS = ["chair", "bottle", "door"]


# ---------------------------------------------------------------- materialize

def materialize(root: str = DATA_ROOT, train_per_class: int = 64,
                eval_per_class: int = 32, src_points: int = 2048) -> None:
    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.data.hdf5 import synthetic_modelnet
    from pointcloud_orientation_tpu.data.offline import (
        generate_8dir_gt, rotate_tree)
    from pointcloud_orientation_tpu.data.ply import write_ply

    def write_canonical(dst, seed, per_class):
        pts, labels, names = synthetic_modelnet(
            seed=seed, class_names=CLASSES_ALL, samples_per_class=per_class,
            num_points=src_points)
        for ci, name in enumerate(names):
            cdir = os.path.join(dst, name)
            os.makedirs(cdir, exist_ok=True)
            for j, si in enumerate(np.flatnonzero(labels == ci)):
                write_ply(pts[si], os.path.join(cdir, f"{name}_{j:04d}.ply"))

    for split, seed_src, seed_rot, per_class in (
        ("train", 42, 42, train_per_class),
        ("eval", 7, 123, eval_per_class),
    ):
        canon = os.path.join(root, f"canon_{split}")
        tree = os.path.join(root, f"{split}_tree")
        if os.path.isdir(tree):
            print(f"{tree} exists; skipping")
            continue
        write_canonical(canon, seed_src, per_class)
        n = rotate_tree(canon, tree, mode="yaw", seed=seed_rot)
        m = generate_8dir_gt(tree)
        print(f"{split}: {n} clouds rotated, {m} 8dir sidecars -> {tree}")

    # 6-class view for the reference 8dir script (it trains on every dir
    # under ROOT; door must not leak into the 6-class-mixed protocol)
    view = os.path.join(root, "train_tree_6class")
    os.makedirs(view, exist_ok=True)
    for cls in CLASSES_8DIR:
        link = os.path.join(view, cls)
        if not os.path.islink(link):
            os.symlink(os.path.join(root, "train_tree", cls), link)
    print(f"6-class view -> {view}")


# ------------------------------------------------------------------ prep-ref

def _patch(src: str, subs) -> str:
    for pat, repl in subs:
        new, n = re.subn(pat, repl, src, count=1, flags=re.M)
        if n != 1:
            raise RuntimeError(f"patch failed: {pat!r}")
        src = new
    return src


def prep_ref(scratch: str, epochs_8dir: int = 200, epochs_axes: int = 200,
             num_points: int = 1024) -> None:
    """Write path/shape-patched copies of the reference scripts to
    ``scratch``. Only constants change (`train_8dir_KL.py:18-22`,
    `train.py:30-37`) plus one injected ``torch.save`` in train.py (which
    otherwise never persists weights, `train.py:215-216`)."""
    os.makedirs(scratch, exist_ok=True)
    res = os.path.join(scratch, "ref_results")

    with open(os.path.join(REF, "train_8dir_KL.py")) as f:
        src = f.read()
    src = _patch(src, [
        (r'^ROOT = Path\(".*?"\)',
         f'ROOT = Path("{DATA_ROOT}/train_tree_6class")'),
        (r'^RES  = Path\(".*?"\)', f'RES  = Path("{res}/8dir_kl")'),
        (r'^NUM_POINTS, BATCH, EPOCHS, LR = .*$',
         f'NUM_POINTS, BATCH, EPOCHS, LR = {num_points}, 16, {epochs_8dir}, 1e-3'),
    ])
    with open(os.path.join(scratch, "ref_train_8dir_KL.py"), "w") as f:
        f.write(src)

    with open(os.path.join(REF, "train.py")) as f:
        src = f.read()
    src = _patch(src, [
        (r'^DATA_ROOT    = ".*?"$', f'DATA_ROOT    = "{DATA_ROOT}/axes_view"'),
        (r'^RESULTS_ROOT = ".*?"$', f'RESULTS_ROOT = "{res}/axes"'),
        (r'^OUTPUT_ROOT  = ".*?"$', f'OUTPUT_ROOT  = "{res}/axes/output"'),
        (r'^NUM_POINTS   = .*$', f'NUM_POINTS   = {num_points}'),
        (r'^NUM_EPOCHS   = .*$', f'NUM_EPOCHS   = {epochs_axes}'),
        # the reference never torch.saves train.py weights; persist best_state
        # so the checkpoint can be cross-evaluated (injection, not behavior
        # change: added right after the in-memory best reload, train.py:215)
        (r'    if best_state:\n        model\.load_state_dict\(best_state\)',
         '    if best_state:\n        model.load_state_dict(best_state)\n'
         '        torch.save(best_state, os.path.join('
         'RESULTS_ROOT, f"{label_name}_best.pth"))'),
    ])
    with open(os.path.join(scratch, "ref_train_axes.py"), "w") as f:
        f.write(src)

    # per-label view for the axes run
    view = os.path.join(DATA_ROOT, "axes_view")
    os.makedirs(view, exist_ok=True)
    for cls in AXES_LABELS:
        link = os.path.join(view, cls)
        if not os.path.islink(link):
            os.symlink(os.path.join(DATA_ROOT, "train_tree", cls), link)
    print(f"patched scripts in {scratch}; axes view {view}")
    print(f"run with: cd {scratch} && "
          f"PYTHONPATH={REF} MPLBACKEND=Agg python ref_train_8dir_KL.py")


# ---------------------------------------------------------------- eval-torch

def _load_tree(tree: str, classes, num_points: int, seed: int = 0):
    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.data.ply import read_ply
    from pointcloud_orientation_tpu.data.sidecar import (
        read_8dir_txt, read_axes_txt)

    rng = np.random.default_rng(seed)
    pts, axes, probs, labels = [], [], [], []
    for ci, cls in enumerate(classes):
        cdir = os.path.join(tree, cls)
        for fname in sorted(os.listdir(cdir)):
            if not fname.endswith(".ply"):
                continue
            p = read_ply(os.path.join(cdir, fname))[:, :3]
            idx = rng.choice(p.shape[0], num_points, replace=p.shape[0] < num_points)
            pts.append(p[idx].astype(np.float32))
            stem = os.path.join(cdir, fname)[: -len(".ply")]
            axes.append(read_axes_txt(stem + ".txt"))
            try:
                probs.append(read_8dir_txt(stem + "_8dir.txt"))
            except OSError:
                probs.append(np.full(8, 0.125, np.float32))
            labels.append(ci)
    return (np.stack(pts), np.stack(axes), np.stack(probs),
            np.asarray(labels, np.int32))


def _mu(f):
    """Horizontal forward angle, matching ops.forward_to_mu: atan2(fx, -fz)."""
    return np.arctan2(f[..., 0], -f[..., 2])


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


_DIRS_8 = None


def _dirs8():
    global _DIRS_8
    if _DIRS_8 is None:
        from pointcloud_orientation_tpu.ops.dirs8 import DIRS_8

        _DIRS_8 = np.asarray(DIRS_8)
    return _DIRS_8


def _metrics_8dir(logits, probs, fwd_gt):
    """Per-sample soft-label CE (`train_8dir_KL.py:60-68`) + angular error of
    the probability-weighted forward (NaN for uniform-GT clouds) — ONE
    metric definition applied to both stacks' raw logits."""
    logq = logits - np.log(
        np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)
    ) - logits.max(-1, keepdims=True)
    losses = -(probs * logq).sum(-1)
    pred_fwd = np.exp(logq) @ _dirs8()
    ang = np.degrees(np.abs(_wrap(_mu(pred_fwd) - _mu(fwd_gt))))
    is_uni = probs.max(-1) - probs.min(-1) < 1e-6
    return losses, np.where(is_uni, np.nan, ang)


def _metrics_axes(vy, vz, axes):
    """Per-sample axes loss (mean-MSE of the two heads + 0.1 orth penalty,
    `train.py:147-246`) + forward angular error."""
    gy, gz = axes[:, 1], axes[:, 2]
    per = (np.mean((vy - gy) ** 2, -1) + np.mean((vz - gz) ** 2, -1)) / 2
    per = per + 0.1 * np.sum(vy * vz, -1) ** 2
    cos = np.clip(
        (vz * gz).sum(-1)
        / (np.linalg.norm(vz, axis=-1) * np.linalg.norm(gz, axis=-1) + 1e-8),
        -1,
        1,
    )
    return per, np.degrees(np.arccos(cos))


def _summarize(losses, angs, labels, classes, **extra):
    losses = np.asarray(losses)
    per_class = {
        cls: float(losses[labels == ci].mean()) for ci, cls in enumerate(classes)
    }
    out = {
        "loss": float(np.mean(losses)),
        "mean_angular_error_deg": float(np.nanmean(np.asarray(angs))),
        "per_class": per_class,
        "count": int(len(losses)),
    }
    out.update(extra)
    return out


def eval_torch(ckpt: str, tree: str, head: str, classes, num_points: int,
               batch: int = 16) -> dict:
    import torch

    sys.path.insert(0, REF)
    sys.path.insert(0, REPO)
    torch.manual_seed(0)
    pts, axes, probs, labels = _load_tree(tree, classes, num_points)

    if head == "8dir":
        from models.pointnet_pp_8dir import PointNetPP8Dir
        model = PointNetPP8Dir()
    elif head == "axes":
        from models.Pointnet_pp_xyz_Schedmit import PointNetPPXYZ_Schedmit
        model = PointNetPPXYZ_Schedmit()
    else:
        raise ValueError(head)
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    model.eval()

    losses, angs = [], []
    with torch.no_grad():
        for s in range(0, len(pts), batch):
            x = torch.from_numpy(pts[s : s + batch])
            if head == "8dir":
                logits = model(x).numpy()
                l, a = _metrics_8dir(logits, probs[s : s + batch],
                                     axes[s : s + batch, 2])
            else:
                vy, vz = model(x)
                l, a = _metrics_axes(vy.numpy(), vz.numpy(), axes[s : s + batch])
            losses.extend(l.tolist())
            angs.extend(a.tolist())
    return _summarize(losses, angs, labels, classes, head=head, ckpt=ckpt,
                      tree=tree, stack="torch")


# ------------------------------------------------------------------ ours


def _eval_ours_arrays(cfg, params, batch_stats, pts, head, batch: int = 32):
    """Forward (M, N, 3) numpy clouds through OUR flax model under eval
    semantics, returning numpy head outputs."""
    import jax
    import jax.numpy as jnp

    module = _ModelShim(cfg).module  # built exactly as the trainer does

    variables = {"params": params}
    if jax.tree_util.tree_leaves(batch_stats):
        variables["batch_stats"] = batch_stats

    @jax.jit
    def fwd(p):
        return module.apply(
            variables, p, train=False, rngs={"sampling": jax.random.PRNGKey(0)}
        )

    outs = []
    for s in range(0, len(pts), batch):
        chunk = pts[s : s + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        o = fwd(jnp.asarray(chunk))
        o = jax.tree_util.tree_map(np.asarray, o)
        if pad:
            o = jax.tree_util.tree_map(lambda a: a[: batch - pad], o)
        outs.append(o)
    if isinstance(outs[0], tuple):
        return tuple(np.concatenate([o[i] for o in outs]) for i in range(len(outs[0])))
    return np.concatenate(outs)


class _ModelShim:
    """Reuse Trainer._build_model's cfg->module wiring without a dataset."""

    def __init__(self, cfg):
        from pointcloud_orientation_tpu.models import MODEL_REGISTRY
        from pointcloud_orientation_tpu.train.trainer import Trainer

        self.cfg = cfg
        self.module = Trainer._build_model(self, MODEL_REGISTRY[cfg.model])


def _our_cfg(head: str, label: str | None = None):
    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.train.config import preset

    if head == "8dir":
        return preset("8dir_kl").replace(
            num_points=1024, rotation_mode="none",
            classes=tuple(CLASSES_8DIR),
        )
    return preset("axes_all_labels").replace(
        num_points=1024, rotation_mode="none", per_label=False,
        classes=(label,),
    )


def eval_ours_torch_ckpt(ckpt: str, tree: str, head: str, classes,
                         num_points: int, label=None) -> dict:
    """Reference ``.pth`` imported into OUR stack, evaluated with the shared
    metric on the shared clouds (the reverse of `eval-torch` on our export)."""
    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.utils import load_torch_checkpoint

    cfg = _our_cfg(head, label)
    params, stats = load_torch_checkpoint(ckpt, cfg.model)
    pts, axes, probs, labels = _load_tree(tree, classes, num_points)
    if head == "8dir":
        logits = _eval_ours_arrays(cfg, params, stats, pts, head)
        losses, angs = _metrics_8dir(logits, probs, axes[:, 2])
    else:
        vy, vz = _eval_ours_arrays(cfg, params, stats, pts, head)
        losses, angs = _metrics_axes(vy, vz, axes)
    return _summarize(losses, angs, labels, classes, head=head, ckpt=ckpt,
                      tree=tree, stack="ours(import)")


def train_ours(head: str, eval_tree: str, out_dir: str,
               num_points: int = 1024) -> dict:
    """Train OUR matching preset on the shared train tree, evaluate the
    best-val params on the shared eval tree with the shared metric, and
    export a reference-loadable ``.pth`` for the reverse cross-load."""
    sys.path.insert(0, REPO)
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import Trainer
    from pointcloud_orientation_tpu.utils import save_torch_checkpoint

    os.makedirs(out_dir, exist_ok=True)
    results = {}
    jobs = (
        [("8dir", None, os.path.join(DATA_ROOT, "train_tree_6class"), CLASSES_8DIR)]
        if head == "8dir"
        else [("axes", lab, _single_label_view(lab), [lab]) for lab in AXES_LABELS]
    )
    for h, label, tree, classes in jobs:
        cfg = _our_cfg(h, label)
        ds = OrientationDataset.from_ply_tree(tree, cfg.num_points,
                                              load_sidecars=True)
        tr = Trainer(cfg, ds)
        tr.fit(log_every=50)
        tr.load_best()
        params = tr.state.params
        pts, axes, probs, labels = _load_tree(eval_tree, classes, num_points)
        if h == "8dir":
            logits = _eval_ours_arrays(cfg, params, tr.state.batch_stats, pts, h)
            losses, angs = _metrics_8dir(logits, probs, axes[:, 2])
        else:
            vy, vz = _eval_ours_arrays(cfg, params, tr.state.batch_stats, pts, h)
            losses, angs = _metrics_axes(vy, vz, axes)
        name = label or "8dir"
        pth = os.path.join(out_dir, f"ours_{name}.pth")
        save_torch_checkpoint(pth, params, tr.state.batch_stats, cfg.model)
        results[name] = _summarize(
            losses, angs, labels, classes, head=h, ckpt=pth,
            tree=eval_tree, stack="ours", best_val=float(tr.best_val),
        )
        print(json.dumps(results[name], indent=2))
    with open(os.path.join(out_dir, f"ours_{head}_eval.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def _single_label_view(label: str) -> str:
    view = os.path.join(DATA_ROOT, f"axes_single_{label}")
    os.makedirs(view, exist_ok=True)
    link = os.path.join(view, label)
    if not os.path.islink(link):
        os.symlink(os.path.join(DATA_ROOT, "train_tree", label), link)
    return view


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("materialize")
    m.add_argument("--root", default=DATA_ROOT)
    p = sub.add_parser("prep-ref")
    p.add_argument("--scratch", default="/tmp/refrun")
    p.add_argument("--epochs-8dir", type=int, default=200)
    p.add_argument("--epochs-axes", type=int, default=200)
    p.add_argument("--num-points", type=int, default=1024)
    e = sub.add_parser("eval-torch")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--tree", required=True)
    e.add_argument("--head", choices=["8dir", "axes"], required=True)
    e.add_argument("--classes", default=None,
                   help="comma-separated; default: 6-class (8dir) / the label")
    e.add_argument("--num-points", type=int, default=1024)
    t = sub.add_parser("train-ours")
    t.add_argument("--head", choices=["8dir", "axes"], required=True)
    t.add_argument("--eval-tree", default=os.path.join(DATA_ROOT, "eval_tree"))
    t.add_argument("--out", default=os.path.join(REPO, "results", "cross_stack"))
    o = sub.add_parser("eval-ours")
    o.add_argument("--torch-ckpt", required=True,
                   help="reference .pth to import into OUR stack")
    o.add_argument("--tree", required=True)
    o.add_argument("--head", choices=["8dir", "axes"], required=True)
    o.add_argument("--label", default=None, help="axes label (axes head)")
    o.add_argument("--classes", default=None)
    o.add_argument("--num-points", type=int, default=1024)
    args = ap.parse_args(argv)

    if args.cmd == "materialize":
        materialize(args.root)
    elif args.cmd == "prep-ref":
        prep_ref(args.scratch, args.epochs_8dir, args.epochs_axes,
                 args.num_points)
    elif args.cmd == "train-ours":
        train_ours(args.head, args.eval_tree, args.out)
    elif args.cmd == "eval-ours":
        classes = (args.classes.split(",") if args.classes
                   else CLASSES_8DIR if args.head == "8dir"
                   else [args.label or AXES_LABELS[0]])
        result = eval_ours_torch_ckpt(args.torch_ckpt, args.tree, args.head,
                                      classes, args.num_points,
                                      label=args.label)
        print(json.dumps(result, indent=2))
    else:
        classes = (args.classes.split(",") if args.classes
                   else CLASSES_8DIR if args.head == "8dir" else AXES_LABELS)
        result = eval_torch(args.ckpt, args.tree, args.head, classes,
                            args.num_points)
        print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
