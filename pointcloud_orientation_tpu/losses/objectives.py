"""All training objectives of the reference, vectorized and on-device.

Each function returns ``(scalar_loss, per_sample (B,))`` so the trainer can
both optimize and bucket per-category metrics (the reference accumulates
per-sample losses for its per-label summaries, e.g.
`train_8dir_KL.py:99-109`). Gradients flow exactly like the reference's
(detached assignment in the MvM loss; the rest are smooth).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import forward_to_8dir_probs, kl_von_mises, matched_mvm_loss
from ..models.pointnet import feature_transform_regularizer

Loss = Tuple[jax.Array, jax.Array]


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over all elements (torch ``nn.MSELoss`` default)."""
    return jnp.mean((pred - target) ** 2)


def _per_sample_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2, axis=tuple(range(1, pred.ndim)))


def forward_mse_loss(pred: jax.Array, target: jax.Array) -> Loss:
    """Direct forward-vector regression: MSE(pred, gt).

    Parity: `simple_pointnet_train.py` / `PointNet++_train.py` criterion.
    """
    per = _per_sample_mse(pred, target)
    return jnp.mean(per), per


def axes_orth_loss(
    vy: jax.Array,
    vz: jax.Array,
    gy: jax.Array,
    gz: jax.Array,
    lam: float = 0.1,
) -> Loss:
    """Two-axis regression with orthogonality regularization:

    ``(MSE(vy, gy) + MSE(vz, gz)) / 2 + lam * mean((vy . vz)^2)``.
    Parity: `train.py:183-187` (lambda = 0.1).
    """
    per_pred = (_per_sample_mse(vy, gy) + _per_sample_mse(vz, gz)) / 2.0
    dot = jnp.sum(vy * vz, axis=-1)
    per = per_pred + lam * dot**2
    return jnp.mean(per), per


def softmax_mse_8dir_loss(logits: jax.Array, probs_gt: jax.Array) -> Loss:
    """MSE between softmax(logits) and a target 8-dir distribution.

    Parity: `train_8dir.py:66-67` (target from forward projection) and
    `train_8dir_MSE.py:79-83` (target from sidecar files).
    """
    pred = jax.nn.softmax(logits, axis=-1)
    per = _per_sample_mse(pred, probs_gt)
    return jnp.mean(per), per


def soft_label_kl_8dir(logits: jax.Array, probs_gt: jax.Array) -> Loss:
    """Soft-label cross-entropy ``-sum P log_softmax(logits)`` per sample
    (== KL(P||Q) up to the constant H(P)).

    Parity: ``kl_loss_per_sample_from_logits`` in `train_8dir_KL.py:60-68`.
    """
    log_q = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(probs_gt * log_q, axis=-1)
    return jnp.mean(per), per


def projected_probs_mse_loss(forward_pred: jax.Array, probs_gt: jax.Array) -> Loss:
    """Project a predicted unit forward vector to 8-dir probabilities, then
    MSE against the target distribution.

    Parity: ``proj_probs`` + MSE in `train_multi_8dir.py:41-44,100-101`.
    """
    pred = forward_to_8dir_probs(forward_pred)
    per = _per_sample_mse(pred, probs_gt)
    return jnp.mean(per), per


def single_peak_vm_kl_loss(
    mu_pred: jax.Array,
    kappa_pred: jax.Array,
    mu_gt: jax.Array,
    kappa_gt: jax.Array,
) -> Loss:
    """Mean analytic von Mises KL(pred || gt) over the batch.

    Parity: `train_single_peak_vonMises_KL.py:23-28,82-83`. Uses the hardened
    clamped/wrapped KL (equivalent for in-range inputs, stable everywhere).
    """
    per = kl_von_mises(mu_pred, kappa_pred, mu_gt, kappa_gt)
    return jnp.mean(per), per


def mvm_matched_loss(
    mu_pred: jax.Array,
    kappa_pred: jax.Array,
    w_pred: jax.Array,
    mu_gt: jax.Array,
    kappa_gt: jax.Array,
    k_gt: jax.Array,
    unmatched_penalty: float = 0.0,
) -> Loss:
    """Hungarian-matched weighted mixture-of-von-Mises KL (see
    :func:`pointcloud_orientation_tpu.ops.matched_mvm_loss`)."""
    per = matched_mvm_loss(
        mu_pred, kappa_pred, w_pred, mu_gt, kappa_gt, k_gt,
        unmatched_penalty=unmatched_penalty,
    )
    return jnp.mean(per), per


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> Loss:
    """Negative log-likelihood on log-probabilities (torch ``F.nll_loss``)."""
    per = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(per), per


def pointnet_cls_loss(
    log_probs: jax.Array,
    labels: jax.Array,
    trans_feat: jax.Array,
    mat_diff_loss_scale: float = 0.001,
) -> Loss:
    """Classifier NLL + feature-transform orthogonality penalty.

    Parity: ``get_loss`` in `PointNetDemo.py:163-172`.
    """
    scalar, per = nll_loss(log_probs, labels)
    reg = feature_transform_regularizer(trans_feat)
    return scalar + mat_diff_loss_scale * reg, per
