"""Readers/writers for the reference's ground-truth sidecar text formats.

Four formats (SURVEY.md §2.3), kept byte-compatible so datasets produced by
either stack interoperate:

* axes: 3 rows x 3 floats (side, up, forward) — `dataloader.py:41-58`,
  written by `data_process/rotate_without_normals.py:119-135`;
* 8-dir: one row of 8 probabilities — `dataloader_8dir_sampled.py`,
  written by `data_process/2d_8dir_sample.py:40-41`;
* single-peak vM: ``# mu(rad)\tkappa`` comment then ``mu kappa`` —
  `dataloader_single_peak_vonMises.py:16-52`,
  written by `data_process/2d_single_peak_vM_gt.py:60-63`;
* multi-peak vM: comment, ``K n``, header, n x ``mu kappa weight`` rows —
  `dataloader_multi_peak_vonMises.py:37-64`,
  written by `data_process/2d_multi_peak_MvM_gt_1.py:122-131`.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def read_axes_txt(path: str | os.PathLike) -> np.ndarray:
    """Read the 3x3 axes sidecar (rows: side, up, forward)."""
    rows = []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                rows.append([float(p) for p in parts])
            if len(rows) == 3:
                break
    if len(rows) < 3:
        raise ValueError(f"axes sidecar needs 3 rows: {path}")
    return np.asarray(rows, dtype=np.float32)


def write_axes_txt(axes: np.ndarray, path: str | os.PathLike) -> None:
    with open(path, "w") as f:
        for v in np.asarray(axes)[:3]:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")


def read_8dir_txt(path: str | os.PathLike) -> np.ndarray:
    """Read one row of 8 probabilities."""
    probs = np.loadtxt(path, dtype=np.float32).reshape(-1)
    if probs.shape[0] != 8:
        raise ValueError(f"expected 8 probabilities in {path}")
    return probs


def write_8dir_txt(probs: np.ndarray, path: str | os.PathLike) -> None:
    np.savetxt(path, np.asarray(probs).reshape(1, 8), fmt="%.6f")


def read_single_peak_vm_txt(path: str | os.PathLike) -> Tuple[float, float]:
    """Read ``(mu, kappa)``; parse failures yield ``(0, 0)`` like the
    reference dataloader (`dataloader_single_peak_vonMises.py:43-45`)."""
    try:
        with open(path, "r") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                return float(parts[0]), float(parts[1])
    except (OSError, ValueError, IndexError):
        pass
    return 0.0, 0.0


def write_single_peak_vm_txt(mu: float, kappa: float, path: str | os.PathLike) -> None:
    with open(path, "w") as f:
        f.write("# mu(rad)\tkappa\n")
        f.write(f"{mu:.8f}\t{kappa:.6f}\n")


def read_multi_peak_vm_txt(
    path: str | os.PathLike, max_k: int = 4
) -> Tuple[np.ndarray, int]:
    """Read the MvM sidecar; returns ``(params (max_k, 3) [mu, kappa, w]
    zero-padded, K)``."""
    params = np.zeros((max_k, 3), dtype=np.float32)
    k = 0
    with open(path, "r") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    rows = []
    for ln in lines:
        if ln.startswith("#"):
            continue
        parts = ln.split()
        if parts[0] == "K":
            k = int(parts[1])
            continue
        try:
            vals = [float(p) for p in parts]
        except ValueError:
            continue  # the "mu(rad) kappa weight" header row
        if len(vals) >= 3:
            rows.append(vals[:3])
    for i, row in enumerate(rows[:max_k]):
        params[i] = row
    k = min(k if k > 0 else len(rows), max_k)
    return params, k


def write_multi_peak_vm_txt(
    params: np.ndarray, k: int, path: str | os.PathLike
) -> None:
    params = np.asarray(params)
    with open(path, "w") as f:
        f.write("# von Mises mixture ground truth\n")
        f.write(f"K {k}\n")
        f.write("mu(rad)\tkappa\tweight\n")
        for i in range(k):
            mu, kappa, w = params[i]
            f.write(f"{mu:.8f}\t{kappa:.6f}\t{w:.6f}\n")
