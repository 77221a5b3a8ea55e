"""On-device, jitted batch pipeline: subsample -> rotate -> synthesize GT.

One fused function produces the augmented cloud plus *every* orientation
target (axes rows, forward vector, 8-dir soft label, single-peak vM, MvM
mixture) — the per-target math is trivial next to the rotation matmul, and a
single pipeline keeps all training entry points on one code path. This
replaces the reference's offline rotation scripts + per-epoch ASCII parsing
dataloaders (SURVEY.md §3.1 hot loop).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import (
    axes_gt_from_rotation,
    random_so3_matrix,
    random_yaw_matrix,
    rotate_points,
)
from .gt import KAPPA_DEFAULT, eight_dir_gt, mvm_gt, single_peak_gt


def subsample_points(key: jax.Array, pts: jax.Array, num_points: int) -> jax.Array:
    """Random per-cloud subsample of ``num_points`` from ``pts (B, M, 3)``.

    Without replacement when ``M >= num_points`` (else with replacement),
    matching ``sample_points`` in `dataloader.py:17-22`. The
    without-replacement path is one fused uniform draw + top-k — no host RNG.
    """
    B, M, _ = pts.shape
    if M == num_points:
        return pts
    if M >= num_points:
        u = jax.random.uniform(key, (B, M))
        _, idx = jax.lax.top_k(u, num_points)
    else:
        idx = jax.random.randint(key, (B, num_points), 0, M)
    return jnp.take_along_axis(pts, idx[:, :, None], axis=1)


@functools.partial(
    jax.jit, static_argnames=("num_points", "rotation_mode", "kappa_default", "max_k")
)
def augment_batch(
    key: jax.Array,
    pts: jax.Array,
    uniform_mask: jax.Array,
    symm_mask: jax.Array,
    k_spec: jax.Array,
    num_points: int,
    rotation_mode: str = "yaw",
    kappa_default: float = KAPPA_DEFAULT,
    max_k: int = 4,
) -> Dict[str, jax.Array]:
    """Subsample, rotate, and synthesize all orientation targets.

    Args:
      key: PRNG key for this batch.
      pts: raw canonical clouds ``(B, M, 3)``.
      uniform_mask / symm_mask / k_spec: per-sample class behavior ``(B,)``
        (see :func:`..data.gt.class_masks`).
      num_points: points per cloud after subsampling.
      rotation_mode: ``"yaw"`` (2d tasks), ``"so3"`` (3d tasks), ``"none"``.

    Returns a dict with ``points (B,N,3)``, ``rotation (B,3,3)``,
    ``axes (B,3,3)`` (side, up, forward rows), ``forward (B,3)``,
    ``probs_8dir (B,8)``, ``vm_mu/vm_kappa (B,)``,
    ``mvm_mu/mvm_kappa/mvm_weight (B,max_k)``, ``mvm_k (B,)``.
    """
    B = pts.shape[0]
    k_sub, k_rot = jax.random.split(key)
    pts = subsample_points(k_sub, pts, num_points)

    if rotation_mode == "yaw":
        rot = random_yaw_matrix(k_rot, B)
    elif rotation_mode == "so3":
        rot = random_so3_matrix(k_rot, B)
    elif rotation_mode == "none":
        rot = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype)[None], (B, 3, 3))
    else:
        raise ValueError(f"unknown rotation_mode: {rotation_mode}")

    pts = rotate_points(pts, rot)
    axes = axes_gt_from_rotation(rot)
    side, forward = axes[:, 0], axes[:, 2]

    probs = eight_dir_gt(forward, uniform_mask)
    vm_mu, vm_kappa = single_peak_gt(forward, symm_mask, kappa_default)
    mvm_mu, mvm_kappa, mvm_w, mvm_k = mvm_gt(
        side, forward, k_spec, kappa_default, max_k
    )
    return {
        "points": pts,
        "rotation": rot,
        "axes": axes,
        "forward": forward,
        "probs_8dir": probs,
        "vm_mu": vm_mu,
        "vm_kappa": vm_kappa,
        "mvm_mu": mvm_mu,
        "mvm_kappa": mvm_kappa,
        "mvm_weight": mvm_w,
        "mvm_k": mvm_k,
    }


def make_augment_fn(
    num_points: int,
    rotation_mode: str = "yaw",
    kappa_default: float = KAPPA_DEFAULT,
    max_k: int = 4,
):
    """Bind the static pipeline configuration; returns
    ``fn(key, pts, uniform_mask, symm_mask, k_spec) -> batch dict``."""

    def fn(key, pts, uniform_mask, symm_mask, k_spec):
        return augment_batch(
            key,
            pts,
            uniform_mask,
            symm_mask,
            k_spec,
            num_points=num_points,
            rotation_mode=rotation_mode,
            kappa_default=kappa_default,
            max_k=max_k,
        )

    return fn
