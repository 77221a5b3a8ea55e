"""Native PLY parser: correctness vs the NumPy fallback (skipped unless
native/build.sh has been run)."""

import numpy as np
import pytest

from pointcloud_orientation_tpu.data import read_ply, write_ply
from pointcloud_orientation_tpu.data.fastply import (
    native_available,
    try_read_ply_bulk_native,
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


def test_bulk_matches_per_file(tmp_path, rng):
    paths = []
    expect = []
    for i in range(17):  # more files than pool threads; exercises stealing
        pts = rng.normal(size=(100 + 7 * i, 3)).astype(np.float32)
        p = tmp_path / f"c{i}.ply"
        write_ply(pts, p)
        paths.append(str(p))
        expect.append(pts)
    bulk = try_read_ply_bulk_native(paths)
    assert bulk is not None and len(bulk) == len(paths)
    for got, want in zip(bulk, expect):
        assert got is not None
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_bulk_flags_bad_files_individually(tmp_path, rng):
    good = tmp_path / "good.ply"
    write_ply(rng.normal(size=(50, 3)).astype(np.float32), good)
    bad = tmp_path / "bad.ply"
    bad.write_text("nope\n")
    out = try_read_ply_bulk_native([str(good), str(bad), str(good)])
    assert out[0] is not None and out[2] is not None
    assert out[1] is None


def test_bulk_empty_list():
    assert try_read_ply_bulk_native([]) == []


def test_from_ply_tree_same_with_and_without_bulk(tmp_path, rng, monkeypatch):
    """The bulk fast path must not perturb the pack (incl. the sampling
    RNG stream)."""
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.data import dataset as dataset_mod

    root = tmp_path / "tree"
    for cname in ("chair", "bottle"):
        (root / cname).mkdir(parents=True)
        for i in range(3):
            pts = rng.normal(size=(300, 3)).astype(np.float32)
            write_ply(pts, root / cname / f"{cname}_{i}.ply")

    with_bulk = OrientationDataset.from_ply_tree(str(root), num_points=128)
    monkeypatch.setattr(
        dataset_mod, "try_read_ply_bulk_native", lambda paths: None,
        raising=False,
    )
    # the import inside from_ply_tree resolves through the module each call;
    # patch at the source instead
    import pointcloud_orientation_tpu.data.fastply as fastply_mod

    monkeypatch.setattr(fastply_mod, "try_read_ply_bulk_native", lambda paths, nthreads=0: None)
    without = OrientationDataset.from_ply_tree(str(root), num_points=128)
    np.testing.assert_array_equal(with_bulk.points, without.points)
    np.testing.assert_array_equal(with_bulk.labels, without.labels)
