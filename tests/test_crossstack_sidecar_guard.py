"""Pins the partial-materialization guard in `benchmarks/cross_stack.py`:

a matrix cell must never be scored against sidecar-reader *fallback* GT
(uniform 8-dir / (0,0) vM / k=0 MvM). Round 5 hit exactly this: a killed
materialize left `dist_eval_tree` with 1401/1536 vM and 0/1536 MvM
sidecars, and the vm s45 reference cell silently scored 50.9 deg against
fallback GT (38.4 deg on the real GT). `_load_tree` now counts missing
sidecar files per family and `_require_sidecars` refuses the affected
head while leaving complete families scoreable.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from cross_stack import _load_tree, _require_sidecars  # noqa: E402

from pointcloud_orientation_tpu.data.sidecar import (  # noqa: E402
    write_8dir_txt, write_axes_txt, write_multi_peak_vm_txt,
    write_single_peak_vm_txt)


def _mini_tree(root, with_vm, with_mvm):
    cdir = os.path.join(root, "chair")
    os.makedirs(cdir)
    rng = np.random.default_rng(0)
    for i in range(2):
        stem = os.path.join(cdir, f"chair_{i:04d}")
        pts = rng.normal(size=(32, 3)).astype(np.float32)
        with open(stem + ".ply", "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(pts)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        write_axes_txt(np.eye(3, dtype=np.float32), stem + ".txt")
        write_8dir_txt(np.full(8, 0.125, np.float32), stem + "_8dir.txt")
        # drop the LAST cloud's vm/mvm sidecars to simulate a partial tree
        if with_vm or i == 0:
            write_single_peak_vm_txt(0.5, 8.0, stem + "_single_peak_vM_gt.txt")
        if with_mvm or i == 0:
            params = np.zeros((4, 3), np.float32)
            params[0] = [0.5, 8.0, 1.0]
            write_multi_peak_vm_txt(params, 1, stem + "_multi_peak_vM_gt.txt")
    return root


def test_partial_tree_refused_for_affected_heads_only(tmp_path):
    tree = _mini_tree(str(tmp_path / "t"), with_vm=False, with_mvm=False)
    data = _load_tree(tree, ["chair"], 16)
    assert data["missing"] == {"8dir": 0, "vm": 1, "mvm": 1}
    for head in ("vm", "mvm"):
        with pytest.raises(RuntimeError, match="partially materialized"):
            _require_sidecars(data, head, tree)
    # complete families (and axes, which has no fallback) still score
    _require_sidecars(data, "8dir", tree)
    _require_sidecars(data, "axes", tree)


def test_complete_tree_passes_every_head(tmp_path):
    tree = _mini_tree(str(tmp_path / "t"), with_vm=True, with_mvm=True)
    data = _load_tree(tree, ["chair"], 16)
    assert data["missing"] == {"8dir": 0, "vm": 0, "mvm": 0}
    for head in ("8dir", "vm", "mvm", "axes"):
        _require_sidecars(data, head, tree)
