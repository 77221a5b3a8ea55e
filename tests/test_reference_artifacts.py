"""Interop with the reference's own shipped artifacts (skipped when the
reference checkout is not mounted)."""

import os
from glob import glob

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "results")), reason="reference not mounted"
)

from pointcloud_orientation_tpu.data import read_ply  # noqa: E402
from pointcloud_orientation_tpu.data.fastply import (  # noqa: E402
    native_available,
    try_read_ply_native,
)


def _some_pred_plys(n=3):
    files = sorted(glob(os.path.join(REF, "results", "*", "*", "*_pred_*.ply")))
    assert files, "no shipped prediction PLYs found"
    return files[:n]


def test_read_reference_prediction_plys():
    """The reference's axes-annotated prediction PLYs (written by
    `train.py:63-100`) parse with our reader: 4 extra vertices first
    (origin + 3 unit axis endpoints), then the cloud."""
    for path in _some_pred_plys():
        verts = read_ply(path)
        assert verts.shape[0] > 4 and verts.shape[1] == 3
        np.testing.assert_allclose(verts[0], 0.0, atol=1e-6)  # origin
        norms = np.linalg.norm(verts[1:4], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)  # unit axes


def test_native_parser_matches_on_reference_files():
    if not native_available():
        pytest.skip("libfastply.so not built")
    for path in _some_pred_plys(2):
        a = try_read_ply_native(path)
        b = read_ply(path)  # same (native preferred) — compare vs a forced
        np.testing.assert_allclose(a, b, atol=0)
        assert a.shape[1] == 3
