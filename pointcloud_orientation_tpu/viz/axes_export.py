"""Export prediction-visualization PLYs with axes overlays.

Reproduces the reference's end-of-training artifact: for sampled test
clouds, run the model and write an axes-annotated PLY
(`train.py:228-246` — ``vx`` recovered as ``cross(vy, vz)`` then normalized).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from ..data.ply import write_ply_with_axes


def export_prediction_plys(
    predict_axes: Callable[[np.ndarray], Sequence[np.ndarray]],
    clouds: np.ndarray,
    out_dir: str,
    names: Optional[Sequence[str]] = None,
    max_count: int = 10,
) -> int:
    """Write up to ``max_count`` axes PLYs.

    ``predict_axes(cloud (N,3)) -> [vx, vy, vz]`` produces the three axis
    vectors for one cloud (model-specific decode supplied by the caller).
    """
    os.makedirs(out_dir, exist_ok=True)
    n = min(max_count, len(clouds))
    for i in range(n):
        axes = [np.asarray(v).reshape(3) for v in predict_axes(clouds[i])]
        base = names[i] if names is not None else f"sample_{i}"
        write_ply_with_axes(clouds[i], axes, os.path.join(out_dir, f"{base}_pred_{i + 1}.ply"))
    return n


def axes_from_two_heads(vy: np.ndarray, vz: np.ndarray) -> list:
    """Decode (up, forward) heads to the 3-axis overlay: ``vx = cross(vy, vz)``
    unit-normalized (`train.py:236-237`)."""
    vx = np.cross(vy, vz)
    vx = vx / (np.linalg.norm(vx) + 1e-12)
    return [vx, np.asarray(vy), np.asarray(vz)]
