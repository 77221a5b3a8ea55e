"""Offline dataset materialization: rotate tree + GT generation round trip."""

import math
import os

import numpy as np
import pytest

from pointcloud_orientation_tpu.data import (
    OrientationDataset,
    read_8dir_txt,
    read_axes_txt,
    read_multi_peak_vm_txt,
    read_single_peak_vm_txt,
    write_ply,
)
from pointcloud_orientation_tpu.data import offline


@pytest.fixture
def canonical_tree(tmp_path, rng):
    root = tmp_path / "canonical"
    for cls in ["chair", "bottle", "door"]:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(2):
            write_ply(rng.normal(size=(64, 3)).astype(np.float32), d / f"{cls}_{i}.ply")
    return root


def test_rotate_tree_and_gt_generation(canonical_tree, tmp_path):
    rotated = tmp_path / "rotated"
    n = offline.rotate_tree(str(canonical_tree), str(rotated), mode="yaw", seed=0)
    assert n == 6
    # axes sidecars exist and are unit rows
    axes = read_axes_txt(rotated / "chair" / "chair_0.txt")
    np.testing.assert_allclose(np.linalg.norm(axes, axis=1), 1.0, atol=1e-5)
    # yaw rotation: up stays +y
    np.testing.assert_allclose(axes[1], [0, 1, 0], atol=1e-5)

    n8 = offline.generate_8dir_gt(str(rotated))
    assert n8 == 6
    probs = read_8dir_txt(rotated / "chair" / "chair_0_8dir.txt")
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-4)
    bottle = read_8dir_txt(rotated / "bottle" / "bottle_0_8dir.txt")
    np.testing.assert_allclose(bottle, 0.125, atol=1e-6)  # uniform class

    nv = offline.generate_single_peak_gt(str(rotated))
    assert nv == 6
    mu, kappa = read_single_peak_vm_txt(
        rotated / "chair" / "chair_0_single_peak_vM_gt.txt"
    )
    assert kappa == pytest.approx(8.0)
    assert abs(mu) <= math.pi
    _, kappa_b = read_single_peak_vm_txt(
        rotated / "bottle" / "bottle_0_single_peak_vM_gt.txt"
    )
    assert kappa_b == pytest.approx(0.0)  # symmetric class

    mvm_root = tmp_path / "mvm"
    nm = offline.generate_mvm_gt(str(rotated), str(mvm_root))
    assert nm == 6
    params, k = read_multi_peak_vm_txt(
        mvm_root / "door" / "door_0_multi_peak_vM_gt.txt"
    )
    assert k == 2  # door has K=2
    np.testing.assert_allclose(params[:2, 2], 0.5, atol=1e-6)
    params_b, k_b = read_multi_peak_vm_txt(
        mvm_root / "bottle" / "bottle_0_multi_peak_vM_gt.txt"
    )
    assert k_b == 1 and params_b[0, 1] == pytest.approx(0.0)

    # the generated tree round-trips through the PLY importer
    ds = OrientationDataset.from_ply_tree(str(rotated), num_points=32)
    assert len(ds) == 6


def test_txt_to_ply_tree(tmp_path, rng):
    src = tmp_path / "txt"
    for cls in ["chair"]:
        d = src / cls
        d.mkdir(parents=True)
        pts = rng.normal(size=(30, 6)).astype(np.float32)  # xyz + normals
        np.savetxt(d / "chair_0.txt", pts, delimiter=",", fmt="%.6f")
    out = tmp_path / "ply"
    n = offline.txt_to_ply_tree(str(src), str(out))
    assert n == 1
    from pointcloud_orientation_tpu.data import read_ply

    back = read_ply(out / "chair" / "chair_0.ply")
    assert back.shape == (30, 3)


def test_mu_consistency_between_sidecar_and_ondevice(canonical_tree, tmp_path):
    """The offline single-peak mu must match the on-device synthesis for the
    same forward vector."""
    import jax.numpy as jnp

    from pointcloud_orientation_tpu.ops import forward_to_mu

    rotated = tmp_path / "rot2"
    offline.rotate_tree(str(canonical_tree), str(rotated), mode="yaw", seed=3)
    offline.generate_single_peak_gt(str(rotated))
    axes = read_axes_txt(rotated / "chair" / "chair_1.txt")
    mu, _ = read_single_peak_vm_txt(rotated / "chair" / "chair_1_single_peak_vM_gt.txt")
    assert mu == pytest.approx(float(forward_to_mu(jnp.asarray(axes[2]))), abs=1e-6)
