"""Rotation sampling and axes ground-truth synthesis."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.ops import (
    axes_gt_from_rotation,
    random_so3_matrix,
    random_yaw_matrix,
    rotate_points,
    yaw_matrix,
)


def test_yaw_matrix_is_rotation():
    theta = jnp.asarray([0.0, 0.7, 2.0, 5.5])
    R = np.asarray(yaw_matrix(theta))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)
        # vertical axis is fixed
        np.testing.assert_allclose(r @ np.array([0, 1, 0.0]), [0, 1, 0], atol=1e-6)


def test_random_so3_is_rotation():
    R = np.asarray(random_so3_matrix(jax.random.PRNGKey(0), batch=8))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_rotate_points_matches_matmul(rng):
    pts = rng.normal(size=(2, 11, 3)).astype(np.float32)
    R = np.asarray(random_yaw_matrix(jax.random.PRNGKey(3), batch=2))
    got = np.asarray(rotate_points(jnp.asarray(pts), jnp.asarray(R)))
    expect = np.stack([pts[b] @ R[b].T for b in range(2)])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_axes_gt_rows_are_rotated_canonical_axes():
    R = np.asarray(random_so3_matrix(jax.random.PRNGKey(1), batch=4))
    axes = np.asarray(axes_gt_from_rotation(jnp.asarray(R)))
    canon = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1.0]])
    for b in range(4):
        for a in range(3):
            np.testing.assert_allclose(axes[b, a], R[b] @ canon[a], atol=1e-5)
            np.testing.assert_allclose(np.linalg.norm(axes[b, a]), 1.0, atol=1e-5)


def test_yaw_gt_identity_at_zero():
    axes = np.asarray(axes_gt_from_rotation(yaw_matrix(jnp.asarray([0.0]))))
    np.testing.assert_allclose(
        axes[0], [[-1, 0, 0], [0, 1, 0], [0, 0, -1.0]], atol=1e-6
    )
