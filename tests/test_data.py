"""Data layer: PLY/sidecar round trips, GT synthesis, pipeline, dataset."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu import data as D
from pointcloud_orientation_tpu.ops import forward_to_mu


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    path = tmp_path / "cloud.ply"
    D.write_ply(pts, path)
    back = D.read_ply(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_ply_with_axes_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    axes = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, -1.0])]
    path = tmp_path / "axes.ply"
    D.write_ply_with_axes(pts, axes, path)
    back = D.read_ply(path)
    assert back.shape == (24, 3)  # origin + 3 endpoints + 20 points
    np.testing.assert_allclose(back[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(back[1:4], np.stack(axes), atol=1e-6)
    np.testing.assert_allclose(back[4:], pts, atol=1e-6)
    # header contract from the reference artifact format
    text = path.read_text()
    assert "element vertex 24" in text and "element edge 3" in text
    assert text.rstrip().endswith("0 1\n0 2\n0 3")


def test_axes_sidecar_roundtrip(tmp_path, rng):
    axes = rng.normal(size=(3, 3)).astype(np.float32)
    p = tmp_path / "a.txt"
    D.write_axes_txt(axes, p)
    np.testing.assert_allclose(D.read_axes_txt(p), axes, atol=1e-6)


def test_8dir_sidecar_roundtrip(tmp_path):
    probs = np.asarray([0.5, 0.25, 0.25, 0, 0, 0, 0, 0], np.float32)
    p = tmp_path / "x_8dir.txt"
    D.write_8dir_txt(probs, p)
    np.testing.assert_allclose(D.read_8dir_txt(p), probs, atol=1e-6)


def test_single_peak_sidecar_roundtrip(tmp_path):
    p = tmp_path / "x_single_peak_vM_gt.txt"
    D.write_single_peak_vm_txt(1.234, 8.0, p)
    mu, kappa = D.read_single_peak_vm_txt(p)
    assert mu == pytest.approx(1.234, abs=1e-6)
    assert kappa == pytest.approx(8.0)


def test_single_peak_sidecar_missing_returns_zero(tmp_path):
    mu, kappa = D.read_single_peak_vm_txt(tmp_path / "missing.txt")
    assert (mu, kappa) == (0.0, 0.0)


def test_multi_peak_sidecar_roundtrip(tmp_path):
    params = np.zeros((4, 3), np.float32)
    params[0] = [0.5, 8.0, 0.5]
    params[1] = [-2.6, 8.0, 0.5]
    p = tmp_path / "x_multi_peak_vM_gt.txt"
    D.write_multi_peak_vm_txt(params, 2, p)
    back, k = D.read_multi_peak_vm_txt(p)
    assert k == 2
    np.testing.assert_allclose(back, params, atol=1e-6)


def test_class_masks():
    uniform, symm, k = D.gt.class_masks(["chair", "bottle", "door", "bathtub"])
    assert uniform.tolist() == [False, True, False, False]
    assert symm.tolist() == [False, True, False, False]
    assert k.tolist() == [1, 0, 2, 4]


def test_mvm_gt_symmetric_class():
    side = jnp.asarray([[1.0, 0, 0]])
    fwd = jnp.asarray([[0.0, 0, -1.0]])
    mu, kappa, w, k = D.mvm_gt(side, fwd, jnp.asarray([0]))
    assert int(k[0]) == 1
    np.testing.assert_allclose(np.asarray(kappa[0]), [0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w[0]), [1, 0, 0, 0], atol=1e-6)


def test_mvm_gt_two_peak_class():
    side = jnp.asarray([[1.0, 0, 0]])
    fwd = jnp.asarray([[0.0, 0, -1.0]])
    mu, kappa, w, k = D.mvm_gt(side, fwd, jnp.asarray([2]))
    assert int(k[0]) == 2
    np.testing.assert_allclose(np.asarray(kappa[0]), [8, 8, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w[0]), [0.5, 0.5, 0, 0], atol=1e-6)
    # peaks: forward (mu=0) and -forward (mu=pi or -pi)
    assert float(mu[0, 0]) == pytest.approx(0.0, abs=1e-6)
    assert abs(float(mu[0, 1])) == pytest.approx(math.pi, abs=1e-6)


def test_augment_batch_consistency():
    ds = D.OrientationDataset.synthetic(samples_per_class=4, num_points=256)
    idx = np.arange(8)
    pts, labels, uniform, symm, k_spec = ds.gather_host(idx)
    fn = D.make_augment_fn(num_points=128, rotation_mode="yaw")
    out = fn(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uniform),
             jnp.asarray(symm), jnp.asarray(k_spec))
    assert out["points"].shape == (8, 128, 3)
    # forward row of axes == forward output, and is horizontal for yaw
    np.testing.assert_allclose(
        np.asarray(out["forward"]), np.asarray(out["axes"][:, 2]), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out["forward"][:, 1]), 0.0, atol=1e-6)
    # vm_mu consistent with the forward vector
    np.testing.assert_allclose(
        np.asarray(out["vm_mu"]),
        np.asarray(forward_to_mu(out["forward"])),
        atol=1e-6,
    )
    # 8-dir targets sum to one
    np.testing.assert_allclose(np.asarray(out["probs_8dir"]).sum(-1), 1.0, rtol=1e-5)
    # rotation actually applied: rotating canonical points by rot reproduces
    sub = np.asarray(out["points"])
    assert sub.shape[1] == 128


def test_augment_so3_rotations_are_3d():
    ds = D.OrientationDataset.synthetic(samples_per_class=2, num_points=64)
    pts, labels, uniform, symm, k_spec = ds.gather_host(np.arange(4))
    fn = D.make_augment_fn(num_points=64, rotation_mode="so3")
    out = fn(jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(uniform),
             jnp.asarray(symm), jnp.asarray(k_spec))
    # up axis is generally NOT [0,1,0] under SO(3)
    up = np.asarray(out["axes"][:, 1])
    assert np.abs(up - np.array([0, 1, 0])).max() > 0.1


def test_split_deterministic():
    a = D.split_indices(100, seed=42)
    b = D.split_indices(100, seed=42)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert len(a[0]) == 70 and len(a[1]) == 15 and len(a[2]) == 15


def test_dataset_select_classes_and_batches():
    ds = D.OrientationDataset.synthetic(samples_per_class=5, num_points=64)
    sub = ds.select_classes(["chair", "bottle"])
    assert len(sub) == 10
    assert sub.class_names == ["chair", "bottle"]
    assert set(sub.labels.tolist()) == {0, 1}
    batches = list(sub.batches(batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 3
    idx, valid, frac = batches[-1]
    assert idx.shape == (4,)
    assert valid.sum() == 2  # 10 = 4 + 4 + 2 padded
    assert frac == 1.0


def test_from_ply_tree(tmp_path, rng):
    for cls in ["chair", "sofa"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            D.write_ply(rng.normal(size=(100, 3)).astype(np.float32), d / f"{cls}_{i}.ply")
    ds = D.OrientationDataset.from_ply_tree(str(tmp_path), num_points=64)
    assert len(ds) == 6
    assert ds.points.shape == (6, 64, 3)
    assert ds.class_names == ["chair", "sofa"]


def test_subsample_with_replacement_path():
    # M < num_points exercises the with-replacement branch
    # (`dataloader.py:20-21` semantics)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 50, 3)).astype(np.float32))
    out = D.subsample_points(jax.random.PRNGKey(0), pts, 128)
    assert out.shape == (2, 128, 3)
    # every output point exists in the source cloud
    src = np.asarray(pts[0])
    got = np.asarray(out[0])
    for row in got[:10]:
        assert np.min(np.sum((src - row) ** 2, axis=1)) < 1e-10
