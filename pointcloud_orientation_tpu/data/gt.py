"""On-device ground-truth synthesis as pure functions of the rotation.

The reference materializes GT to sidecar files offline
(`data_process/2d_8dir_sample.py`, `2d_single_peak_vM_gt.py`,
`2d_multi_peak_MvM_gt_1.py`); here the same math runs jitted per batch from
the sampled rotation, so augmentation is fresh every step and the L1+L2
layers of the reference collapse into the input pipeline (SURVEY.md §7
step 2). Class-dependent behavior (uniform / symmetric / K) enters as
per-sample arrays computed once from the label map.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import forward_to_8dir_probs, forward_to_mu

# Per-category peak counts for the MvM task; K = 0 marks fully symmetric
# categories (single peak, kappa = 0). Parity:
# `data_process/2d_multi_peak_MvM_gt_1.py:13-26`.
K_DICT: Dict[str, int] = {
    "cone": 0,
    "bowl": 0,
    "chair": 1,
    "bottle": 0,
    "plant": 0,
    "car": 1,
    "sofa": 1,
    "toilet": 1,
    "door": 2,
    "curtain": 2,
    "bathtub": 4,
    "glass_box": 4,
}

# Categories whose 8-dir target is the uniform distribution
# (`data_process/2d_8dir_sample.py:6`, `train_8dir_KL.py:26`).
UNIFORM_CLASSES = frozenset({"bottle", "bowl", "plant"})

# Single-peak vM: categories with a clear forward (kappa = 8) vs symmetric
# (kappa = 0). Parity: `data_process/2d_single_peak_vM_gt.py:6-8,43-46`.
CLEAR_CLASSES = frozenset({"chair", "sofa", "toilet"})
SYMM_CLASSES = frozenset({"bottle", "plant", "bowl"})
KAPPA_DEFAULT = 8.0


def class_masks(
    class_names: Sequence[str],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-class (uniform_8dir, symmetric_vm, k_mvm) arrays from names."""
    uniform = np.asarray([c in UNIFORM_CLASSES for c in class_names], bool)
    symm = np.asarray([c in SYMM_CLASSES for c in class_names], bool)
    k = np.asarray([K_DICT.get(c, 1) for c in class_names], np.int32)
    return uniform, symm, k


def eight_dir_gt(forward: jax.Array, uniform_mask: jax.Array) -> jax.Array:
    """8-direction soft label: projection of the forward vector, or the
    uniform distribution for symmetric categories.

    Parity: `data_process/2d_8dir_sample.py:29-39`.
    """
    probs = forward_to_8dir_probs(forward)
    return jnp.where(uniform_mask[:, None], 0.125, probs)


def single_peak_gt(
    forward: jax.Array, symm_mask: jax.Array, kappa_default: float = KAPPA_DEFAULT
) -> Tuple[jax.Array, jax.Array]:
    """Single-peak von Mises GT: ``mu = atan2(fx, -fz)`` from the projected
    forward; ``kappa = 0`` for symmetric categories else ``kappa_default``.

    Parity: `data_process/2d_single_peak_vM_gt.py:10-46` (using the
    notebook-validated mu formula).
    """
    mu = forward_to_mu(forward)
    kappa = jnp.where(symm_mask, 0.0, kappa_default)
    return mu, kappa


def mvm_gt(
    side: jax.Array,
    forward: jax.Array,
    k_spec: jax.Array,
    kappa_default: float = KAPPA_DEFAULT,
    max_k: int = 4,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Mixture-of-von-Mises GT from the rotated side/forward axes.

    Candidate peaks in order (front, -front, side, -side); a category with
    ``k_spec = 0`` degenerates to a single uniform peak (K=1, kappa=0), else
    the first ``k_spec`` candidates get ``kappa_default`` and weight ``1/K``.
    Returns ``(mu (B, max_k), kappa (B, max_k), weight (B, max_k), k (B,))``
    zero-padded beyond ``k`` like the reference dataloader
    (`dataloader_multi_peak_vonMises.py:37-64`).

    Parity: `data_process/2d_multi_peak_MvM_gt_1.py:66-131`.
    """
    mus = jnp.stack(
        [
            forward_to_mu(forward),
            forward_to_mu(-forward),
            forward_to_mu(side),
            forward_to_mu(-side),
        ],
        axis=-1,
    )[:, :max_k]  # (B, max_k)

    k = jnp.where(k_spec <= 0, 1, k_spec).astype(jnp.int32)
    valid = jnp.arange(max_k)[None, :] < k[:, None]
    kappa_val = jnp.where(k_spec <= 0, 0.0, kappa_default)[:, None]
    mu = jnp.where(valid, mus, 0.0)
    kappa = jnp.where(valid, kappa_val, 0.0)
    weight = jnp.where(valid, 1.0 / k[:, None], 0.0)
    return mu, kappa, weight, k
