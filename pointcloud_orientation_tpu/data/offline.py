"""Offline dataset materialization — the reference's `data_process/` pipeline.

The training path never needs these (augmentation + GT synthesis run
on-device, :mod:`.pipeline`), but they provide full interchange with the
reference's on-disk dataset layout: rotated PLY trees with axes sidecars,
and the three GT synthesis passes (8-dir, single-peak vM, multi-peak MvM).
All math is the same batched jnp used on-device, applied per directory.

Reference scripts reproduced (SURVEY.md §2.4): `rotate_without_normals.py`
(yaw rotation + axes GT), `2d_rotate_without_normals.py` (SO(3) variant),
`2d_8dir_sample.py`, `2d_single_peak_vM_gt.py` (with its ``vec_to_mu`` bug
fixed per the validated notebook), `2d_multi_peak_MvM_gt_1.py`,
`hdf5_process.py` (HDF5 -> PLY tree).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    axes_gt_from_rotation,
    forward_to_8dir_probs,
    forward_to_mu,
    random_so3_matrix,
    random_yaw_matrix,
)
from .gt import K_DICT, KAPPA_DEFAULT, SYMM_CLASSES, UNIFORM_CLASSES
from .ply import read_ply, write_ply
from .sidecar import (
    read_axes_txt,
    write_8dir_txt,
    write_axes_txt,
    write_multi_peak_vm_txt,
    write_single_peak_vm_txt,
)


def rotate_tree(
    input_dir: str,
    output_dir: str,
    mode: str = "yaw",
    seed: int = 42,
) -> int:
    """Rotate every ``<class>/<file>.ply`` and write the rotated cloud plus
    the 3-row axes sidecar (side, up, forward).

    ``mode='yaw'`` reproduces `rotate_without_normals.py`, ``'so3'``
    reproduces `2d_rotate_without_normals.py`. Returns files written.
    """
    key = jax.random.PRNGKey(seed)
    count = 0
    for cls in sorted(os.listdir(input_dir)):
        cdir = os.path.join(input_dir, cls)
        if not os.path.isdir(cdir):
            continue
        out_cdir = os.path.join(output_dir, cls)
        os.makedirs(out_cdir, exist_ok=True)
        for fname in sorted(os.listdir(cdir)):
            if not fname.lower().endswith(".ply"):
                continue
            verts = read_ply(os.path.join(cdir, fname))[:, :3]
            key, sub = jax.random.split(key)
            if mode == "yaw":
                rot = random_yaw_matrix(sub, 1)
            elif mode == "so3":
                rot = random_so3_matrix(sub, 1)
            else:
                raise ValueError(f"unknown mode: {mode}")
            rotated = np.asarray(verts @ np.asarray(rot[0]).T)
            axes = np.asarray(axes_gt_from_rotation(rot))[0]
            dst = os.path.join(out_cdir, fname)
            write_ply(rotated, dst)
            write_axes_txt(axes, dst[: -len(".ply")] + ".txt")
            count += 1
    return count


def _iter_axes_sidecars(root: str, cls: str):
    cdir = os.path.join(root, cls)
    for path in sorted(glob(os.path.join(cdir, "*.txt"))):
        stem = os.path.basename(path)
        if any(
            stem.endswith(sfx)
            for sfx in ("_8dir.txt", "_single_peak_vM_gt.txt", "_multi_peak_vM_gt.txt")
        ):
            continue
        yield path


def generate_8dir_gt(
    root: str, uniform_classes: Optional[Sequence[str]] = None
) -> int:
    """Write ``<stem>_8dir.txt`` soft labels from the axes sidecars.

    Parity: `data_process/2d_8dir_sample.py` (uniform classes get 0.125).
    """
    uniform = set(uniform_classes if uniform_classes is not None else UNIFORM_CLASSES)
    count = 0
    for cls in sorted(os.listdir(root)):
        if not os.path.isdir(os.path.join(root, cls)):
            continue
        for path in _iter_axes_sidecars(root, cls):
            if cls in uniform:
                probs = np.full(8, 0.125, np.float32)
            else:
                fwd = read_axes_txt(path)[2]
                probs = np.asarray(forward_to_8dir_probs(jnp.asarray(fwd)))
            write_8dir_txt(probs, path[: -len(".txt")] + "_8dir.txt")
            count += 1
    return count


def generate_single_peak_gt(
    root: str,
    symm_classes: Optional[Sequence[str]] = None,
    kappa_default: float = KAPPA_DEFAULT,
) -> int:
    """Write ``<stem>_single_peak_vM_gt.txt`` (mu, kappa) sidecars.

    Parity: `data_process/2d_single_peak_vM_gt.py` with the working mu
    formula ``atan2(fx, -fz)`` (the script's own ``vec_to_mu`` is broken,
    :39-41; the notebook validates the formula used here).
    """
    symm = set(symm_classes if symm_classes is not None else SYMM_CLASSES)
    count = 0
    for cls in sorted(os.listdir(root)):
        if not os.path.isdir(os.path.join(root, cls)):
            continue
        kappa = 0.0 if cls in symm else kappa_default
        for path in _iter_axes_sidecars(root, cls):
            fwd = read_axes_txt(path)[2]
            mu = float(forward_to_mu(jnp.asarray(fwd)))
            write_single_peak_vm_txt(mu, kappa, path[: -len(".txt")] + "_single_peak_vM_gt.txt")
            count += 1
    return count


def generate_mvm_gt(
    src_root: str,
    dst_root: str,
    k_dict: Optional[Dict[str, int]] = None,
    kappa_default: float = KAPPA_DEFAULT,
    max_k: int = 4,
) -> int:
    """Write the multi-peak MvM GT tree.

    Parity: `data_process/2d_multi_peak_MvM_gt_1.py` — peaks in order
    (front, -front, side, -side) truncated to the class K; K=0 classes get a
    single uniform peak (kappa=0); uniform weights.
    """
    k_dict = dict(k_dict if k_dict is not None else K_DICT)
    count = 0
    for cls, k_spec in k_dict.items():
        cdir = os.path.join(src_root, cls)
        if not os.path.isdir(cdir):
            continue
        out_dir = os.path.join(dst_root, cls)
        os.makedirs(out_dir, exist_ok=True)
        for path in _iter_axes_sidecars(src_root, cls):
            axes = read_axes_txt(path)
            side, forward = axes[0], axes[2]
            if k_spec <= 0:
                peaks = [forward]
                kappa = 0.0
            else:
                candidates = [forward, -forward, side, -side]
                peaks = candidates[:k_spec]
                kappa = kappa_default
            k = len(peaks)
            params = np.zeros((max_k, 3), np.float32)
            for i, p in enumerate(peaks[:max_k]):
                params[i] = [float(forward_to_mu(jnp.asarray(p))), kappa, 1.0 / k]
            stem = os.path.splitext(os.path.basename(path))[0]
            write_multi_peak_vm_txt(
                params, min(k, max_k), os.path.join(out_dir, f"{stem}_multi_peak_vM_gt.txt")
            )
            count += 1
    return count


def txt_to_ply(txt_path: str, ply_path: str) -> int:
    """Convert one comma-separated ``x,y,z[,nx,ny,nz]`` text file to ASCII
    PLY (normals auto-detected and dropped — the downstream consumers use
    xyz only). Parity: `data_process/DataProcess.py:8-36` /
    `convert_txt_to_ply.py:6-45`. Returns the vertex count."""
    pts = np.loadtxt(txt_path, delimiter=",", dtype=np.float32)
    if pts.ndim == 1:
        pts = pts[None, :]
    write_ply(pts[:, :3], ply_path)
    return int(pts.shape[0])


def txt_to_ply_tree(input_dir: str, output_dir: str) -> int:
    """Convert a ``<class>/<file>.txt`` tree of comma-separated clouds to the
    PLY tree layout. Parity: `data_process/convert_txt_to_ply.py`."""
    count = 0
    for cls in sorted(os.listdir(input_dir)):
        cdir = os.path.join(input_dir, cls)
        if not os.path.isdir(cdir):
            continue
        out_cdir = os.path.join(output_dir, cls)
        os.makedirs(out_cdir, exist_ok=True)
        for fname in sorted(os.listdir(cdir)):
            if not fname.endswith(".txt"):
                continue
            txt_to_ply(
                os.path.join(cdir, fname),
                os.path.join(out_cdir, fname[: -len(".txt")] + ".ply"),
            )
            count += 1
    return count


def hdf5_to_ply_tree(dataset_dir: str, output_dir: str) -> int:
    """Explode a ModelNet40 HDF5 archive into the per-category ASCII PLY
    tree (`data_process/hdf5_process.py`). Honors the optional
    ``*_id2file.json`` name mappings next to each ``.h5`` when present
    (`hdf5_process.py:64-101,136-151`); otherwise names are
    ``<class>_<idx>.ply``. Interchange only — training consumes the packed
    arrays directly."""
    import json
    import re

    import h5py

    names_file = os.path.join(dataset_dir, "shape_names.txt")
    with open(names_file, "r") as f:
        names = [ln.strip() for ln in f if ln.strip()]

    counters: Dict[int, int] = {i: 0 for i in range(len(names))}
    total = 0
    for fname in sorted(f for f in os.listdir(dataset_dir) if f.endswith(".h5")):
        base = os.path.splitext(fname)[0]
        id2file = None
        m = re.match(r"(.*?)(\d+)$", base)
        candidates = [f"{base}_id2file.json"]
        if m:
            candidates.insert(0, f"{m.group(1)}_{m.group(2)}_id2file.json")
        for cand in candidates:
            path = os.path.join(dataset_dir, cand)
            if os.path.exists(path):
                try:
                    with open(path) as jf:
                        id2file = json.load(jf)
                except (OSError, ValueError):
                    id2file = None
                break
        with h5py.File(os.path.join(dataset_dir, fname), "r") as f:
            data = f["data"][:]
            labels = f["label"][:]
        if labels.ndim > 1:
            labels = labels[:, 0]
        for i, (cloud, label) in enumerate(zip(data, labels)):
            label = int(label)
            cls = names[label]
            out_dir = os.path.join(output_dir, cls)
            os.makedirs(out_dir, exist_ok=True)
            mapped = None
            if isinstance(id2file, dict):
                mapped = id2file.get(str(i))
            elif isinstance(id2file, list) and i < len(id2file):
                mapped = id2file[i]
            if mapped:
                out_name = os.path.basename(mapped)
                if not out_name.endswith(".ply"):
                    out_name += ".ply"
            else:
                out_name = f"{cls}_{counters[label]:04d}.ply"
            counters[label] += 1
            write_ply(np.asarray(cloud[:, :3], np.float32),
                      os.path.join(out_dir, out_name))
            total += 1
    return total
