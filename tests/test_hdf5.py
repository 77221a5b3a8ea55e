"""HDF5 ingest + PLY-tree explosion on a synthetic archive."""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from pointcloud_orientation_tpu.data import load_modelnet_hdf5, read_ply
from pointcloud_orientation_tpu.data.offline import hdf5_to_ply_tree


@pytest.fixture
def archive(tmp_path, rng):
    d = tmp_path / "mn40"
    d.mkdir()
    (d / "shape_names.txt").write_text("airplane\nchair\n")
    pts = rng.normal(size=(6, 64, 3)).astype(np.float32)
    labels = np.asarray([0, 1, 1, 0, 1, 0], np.uint8)
    with h5py.File(d / "ply_data_train0.h5", "w") as f:
        f.create_dataset("data", data=pts)
        f.create_dataset("label", data=labels[:, None])
    # id2file mapping for the train file
    mapping = [f"orig_{i}.ply" for i in range(6)]
    (d / "ply_data_train_0_id2file.json").write_text(json.dumps(mapping))
    return d, pts, labels


def test_load_modelnet_hdf5(archive):
    d, pts, labels = archive
    data, lab, names = load_modelnet_hdf5(str(d))
    assert names == ["airplane", "chair"]
    np.testing.assert_allclose(data, pts)
    np.testing.assert_array_equal(lab, labels)


def test_hdf5_to_ply_tree_with_id2file(archive, tmp_path):
    d, pts, labels = archive
    out = tmp_path / "tree"
    n = hdf5_to_ply_tree(str(d), str(out))
    assert n == 6
    # id2file names honored
    assert (out / "airplane" / "orig_0.ply").exists()
    assert (out / "chair" / "orig_1.ply").exists()
    back = read_ply(out / "airplane" / "orig_0.ply")
    np.testing.assert_allclose(back, np.round(pts[0], 6), atol=1e-6)
