"""ASCII PLY import/export.

Kept as *interchange utilities* only: the training pipeline consumes packed
arrays (see :mod:`.hdf5`), never per-epoch ASCII parsing — the reference
re-parses every 10k-point PLY in its DataLoader workers every epoch
(`dataloader.py:33-39`), which SURVEY.md §3.1 identifies as its dominant CPU
cost. Output formats are byte-compatible with the reference's artifacts.

A native C++ fast parser is available as an optional accelerator (see
``native/fastply``); this module falls back to NumPy parsing when the
extension is not built.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def read_ply(path: str | os.PathLike) -> np.ndarray:
    """Read an ASCII PLY's vertex block; returns ``(N, C)`` float32
    (C = 3 or 6 with normals).

    Robust to trailing non-vertex elements (e.g. our axes files' edge rows):
    parses ``element vertex`` from the header and reads exactly that many
    rows. Parity of accepted inputs: `dataloader.py:6-15`,
    `data_process/rotate_without_normals.py:18-67`.
    """
    from .fastply import try_read_ply_native

    native = try_read_ply_native(str(path))
    if native is not None:
        return native

    with open(path, "r") as f:
        n_vertex = None
        for line in f:
            stripped = line.strip()
            if stripped.startswith("element vertex"):
                n_vertex = int(stripped.split()[-1])
            if stripped == "end_header":
                break
        else:
            raise ValueError(f"no end_header in PLY file: {path}")
        rows = []
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            rows.append([float(p) for p in parts])
            if n_vertex is not None and len(rows) >= n_vertex:
                break
    if not rows:
        raise ValueError(f"no vertices in PLY file: {path}")
    return np.asarray(rows, dtype=np.float32)


def write_ply(vertices: np.ndarray, path: str | os.PathLike) -> None:
    """Write ``(N, 3)`` vertices as ASCII PLY, 6-decimal fixed point.

    Byte-format parity: `data_process/hdf5_process.py:28-47`.
    """
    vertices = np.asarray(vertices)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {vertices.shape[0]}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for x, y, z in vertices[:, :3]:
            f.write(f"{x:.6f} {y:.6f} {z:.6f}\n")


def write_ply_with_axes(
    vertices: np.ndarray, axes: Sequence[np.ndarray], path: str | os.PathLike
) -> None:
    """Write a cloud plus 4 extra vertices (origin + 3 axis endpoints) and 3
    edge rows — the reference's prediction-visualization artifact.

    Byte-format parity: ``write_ply_with_axes`` in `train.py:63-100` (extra
    vertices first at indices 0..3, edges ``0 1 / 0 2 / 0 3``).
    """
    vertices = np.asarray(vertices)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {vertices.shape[0] + 4}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element edge 3\n"
            "property int vertex1\nproperty int vertex2\n"
            "end_header\n"
        )
        f.write("0.000000 0.000000 0.000000\n")
        for vec in axes:
            f.write(f"{vec[0]:.6f} {vec[1]:.6f} {vec[2]:.6f}\n")
        for pt in vertices[:, :3]:
            f.write(f"{pt[0]:.6f} {pt[1]:.6f} {pt[2]:.6f}\n")
        f.write("0 1\n0 2\n0 3\n")
