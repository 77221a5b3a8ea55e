"""Rotation sampling, point-cloud rotation, and orientation ground truth.

The reference rotates clouds *offline* with per-file NumPy and writes the
ground truth to sidecar text files (`data_process/rotate_without_normals.py`,
`2d_rotate_without_normals.py`, `2d_8dir_sample.py`, `2d_single_peak_vM_gt.py`,
`2d_multi_peak_MvM_gt_1.py`). Here rotation is an *on-device, jitted batch
transform* driven by ``jax.random`` — the ground truth becomes a pure
function of the sampled rotation, so augmentation is free and fresh every
step instead of a frozen dataset.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

# Canonical object axes in ModelNet40's frame: rows are (side, up, forward).
# Parity: `data_process/rotate_without_normals.py:119-123`.
CANONICAL_AXES = jnp.asarray(
    [[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]], dtype=jnp.float32
)


def yaw_matrix(theta: jax.Array) -> jax.Array:
    """Rotation about the vertical (+y) axis; ``theta (...,) -> (..., 3, 3)``.

    Parity: `data_process/rotate_without_normals.py:5-15`.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    rows = jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def random_yaw_matrix(key: jax.Array, batch: int = 1) -> jax.Array:
    """Random yaw-only rotations, ``theta ~ U[0, 2 pi)``; returns (B, 3, 3)."""
    theta = jax.random.uniform(key, (batch,), minval=0.0, maxval=2.0 * math.pi)
    return yaw_matrix(theta)


def random_so3_matrix(key: jax.Array, batch: int = 1) -> jax.Array:
    """Random rotations ``R = Rz @ Ry @ Rx`` with Euler angles ~ U[0, 2 pi).

    This reproduces the reference's *distribution* of rotations
    (`data_process/rotate.py:45-75`; note Euler sampling is not Haar-uniform
    on SO(3), which is intentional parity). Returns ``(B, 3, 3)``.
    """
    tx, ty, tz = jnp.moveaxis(
        jax.random.uniform(key, (batch, 3), minval=0.0, maxval=2.0 * math.pi), -1, 0
    )
    cx, sx = jnp.cos(tx), jnp.sin(tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)

    rx = jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, cx, -sx], -1),
            jnp.stack([z, sx, cx], -1),
        ],
        -2,
    )
    ry = jnp.stack(
        [
            jnp.stack([cy, z, sy], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-sy, z, cy], -1),
        ],
        -2,
    )
    rz = jnp.stack(
        [
            jnp.stack([cz, -sz, z], -1),
            jnp.stack([sz, cz, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(rz, ry, precision=hi), rx, precision=hi)


def rotate_points(points: jax.Array, rot: jax.Array) -> jax.Array:
    """Apply rotations ``rot (B,3,3)`` to clouds ``points (B,N,3)``.

    ``p' = R p`` for every point, expressed as ``points @ R^T`` — one batched
    matmul. Parity: `data_process/rotate_without_normals.py:111-112`.
    """
    return jnp.einsum(
        "bij,bnj->bni", rot, points, precision=jax.lax.Precision.HIGHEST
    )


def axes_gt_from_rotation(rot: jax.Array) -> jax.Array:
    """Ground-truth axes rows (side, up, forward) for a rotation ``(B,3,3)``.

    ``row_i = R @ canonical_axis_i``, unit-normalized; returned as ``(B,3,3)``
    matching the 3-row sidecar file layout the axes dataloader consumes
    (`data_process/rotate_without_normals.py:119-135`, `dataloader.py:41-58`).
    """
    axes = jnp.einsum(
        "bij,aj->bai", rot, CANONICAL_AXES, precision=jax.lax.Precision.HIGHEST
    )
    norm = jnp.linalg.norm(axes, axis=-1, keepdims=True)
    return axes / jnp.where(norm > 1e-6, norm, 1.0)


def forward_to_mu(forward: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Yaw angle of a forward vector: project to the x-z plane, then
    ``mu = atan2(fx, -fz)``; a near-vertical forward degenerates to ``mu = 0``
    (forward = -z).

    This is the mu convention validated by the reference's golden notebook
    (`data_process/2d_single_peak_vM_test.ipynb`); the on-disk script's
    ``vec_to_mu`` ships a bug returning an undefined variable
    (`data_process/2d_single_peak_vM_gt.py:39-41`) — the working formula also
    appears in `data_process/2d_multi_peak_MvM_gt_1.py:50-59`.
    """
    fx = forward[..., 0]
    fz = forward[..., 2]
    r = jnp.hypot(fx, fz)
    degenerate = r < eps
    fx = jnp.where(degenerate, 0.0, fx)
    fz = jnp.where(degenerate, -1.0, fz)
    return jnp.arctan2(fx, -fz)
