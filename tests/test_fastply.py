"""Native PLY parser: correctness vs the NumPy fallback (skipped unless
native/build.sh has been run)."""

import numpy as np
import pytest

from pointcloud_orientation_tpu.data import read_ply, write_ply
from pointcloud_orientation_tpu.data.fastply import (
    native_available,
    try_read_ply_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libfastply.so not built (run native/build.sh)"
)


def test_native_matches_numpy(tmp_path, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    p = tmp_path / "c.ply"
    write_ply(pts, p)
    native = try_read_ply_native(str(p))
    assert native is not None and native.shape == (500, 3)
    np.testing.assert_allclose(native, pts, atol=1e-6)
    # the public read_ply prefers the native path; same result
    np.testing.assert_allclose(read_ply(p), native, atol=0)


def test_native_handles_axes_ply(tmp_path, rng):
    from pointcloud_orientation_tpu.data import write_ply_with_axes

    pts = rng.normal(size=(40, 3)).astype(np.float32)
    p = tmp_path / "a.ply"
    write_ply_with_axes(pts, [np.eye(3)[i] for i in range(3)], p)
    out = read_ply(p)
    # 44 vertices; the 3 trailing edge rows must NOT leak into the block
    assert out.shape == (44, 3)
    np.testing.assert_allclose(out[4:], pts, atol=1e-6)


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_text("not a ply at all\n")
    assert try_read_ply_native(str(bad)) is None
