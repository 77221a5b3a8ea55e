"""Task adapters: map (model outputs, augmented batch) -> per-sample loss
and per-sample angular error.

One adapter per reference training objective; the trainer composes them with
the shared step/metrics machinery. Angular error (degrees) is the
cross-stack comparison metric (BASELINE.json north star); it is NaN where
undefined (e.g. symmetric categories for vM).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .. import losses as L
from ..ops import DIRS_8, forward_to_mu, wrap_angle
from ..ops.matching import hungarian_small
from ..ops.von_mises import kl_von_mises


def _unit(v, eps=1e-8):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def _vec_angle_deg(a, b):
    cos = jnp.clip(jnp.sum(_unit(a) * _unit(b), axis=-1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def _horizontal_angle_deg(pred_forward, gt_forward):
    """Yaw-only angular error: compare mu angles of the horizontal
    projections."""
    d = wrap_angle(forward_to_mu(pred_forward) - forward_to_mu(gt_forward))
    return jnp.degrees(jnp.abs(d))


@dataclasses.dataclass(frozen=True)
class TaskAdapter:
    loss: Callable  # (outputs, batch, cfg) -> per-sample loss (B,)
    angular_error: Optional[Callable] = None  # (outputs, batch, cfg) -> (B,) deg


def _forward_mse(outputs, batch, cfg):
    target = batch["axes"][:, cfg.target_row]
    return jnp.mean((outputs - target) ** 2, axis=-1)


def _forward_mse_ang(outputs, batch, cfg):
    return _vec_angle_deg(outputs, batch["axes"][:, cfg.target_row])


def _forward_mse_aux(outputs, batch, cfg):
    """Forward MSE for models that return ``(out, aux_loss)`` — the MoE
    transformer's switch load-balance aux (models/moe_transformer.py).
    The scalar aux adds to every per-sample loss, so the masked batch mean
    contributes exactly ``moe_aux_weight * aux`` to the step loss."""
    out, aux = outputs
    target = batch["axes"][:, cfg.target_row]
    per = jnp.mean((out - target) ** 2, axis=-1)
    return per + cfg.moe_aux_weight * aux


def _forward_mse_aux_ang(outputs, batch, cfg):
    return _vec_angle_deg(outputs[0], batch["axes"][:, cfg.target_row])


def _axes(outputs, batch, cfg):
    vy, vz = outputs
    gy, gz = batch["axes"][:, 1], batch["axes"][:, 2]
    per = (
        jnp.mean((vy - gy) ** 2, -1) + jnp.mean((vz - gz) ** 2, -1)
    ) / 2.0
    per = per + cfg.lambda_orth * jnp.sum(vy * vz, -1) ** 2
    return per


def _axes_ang(outputs, batch, cfg):
    _, vz = outputs
    return _vec_angle_deg(vz, batch["axes"][:, 2])


def _probs_to_forward(probs):
    """Probability-weighted compass direction (the reference's 8-dir
    visualization decode, `train_8dir.py:119-139`)."""
    return _unit(probs @ DIRS_8)


def _8dir_mse(outputs, batch, cfg):
    _, per = L.softmax_mse_8dir_loss(outputs, batch["probs_8dir"])
    return per


def _8dir_ang(outputs, batch, cfg):
    pred = _probs_to_forward(jax.nn.softmax(outputs, axis=-1))
    ang = _horizontal_angle_deg(pred, batch["forward"])
    # undefined for uniform-target categories
    uniform = jnp.max(batch["probs_8dir"], -1) - jnp.min(batch["probs_8dir"], -1) < 1e-6
    return jnp.where(uniform, jnp.nan, ang)


def _8dir_kl(outputs, batch, cfg):
    _, per = L.soft_label_kl_8dir(outputs, batch["probs_8dir"])
    return per


def _multi_8dir(outputs, batch, cfg):
    _, per = L.projected_probs_mse_loss(outputs, batch["probs_8dir"])
    return per


def _multi_8dir_ang(outputs, batch, cfg):
    ang = _horizontal_angle_deg(outputs, batch["forward"])
    uniform = jnp.max(batch["probs_8dir"], -1) - jnp.min(batch["probs_8dir"], -1) < 1e-6
    return jnp.where(uniform, jnp.nan, ang)


def _vm_kl(outputs, batch, cfg):
    mu, kappa = outputs
    return kl_von_mises(mu, kappa, batch["vm_mu"], batch["vm_kappa"])


def _vm_ang(outputs, batch, cfg):
    mu, _ = outputs
    ang = jnp.degrees(jnp.abs(wrap_angle(mu - batch["vm_mu"])))
    return jnp.where(batch["vm_kappa"] > 0, ang, jnp.nan)


def _mvm(outputs, batch, cfg):
    mu, kappa, w = outputs
    _, per = L.mvm_matched_loss(
        mu, kappa, w, batch["mvm_mu"], batch["mvm_kappa"], batch["mvm_k"],
        unmatched_penalty=getattr(cfg, "mvm_unmatched_penalty", 0.0),
    )
    return per


def _mvm_ang(outputs, batch, cfg):
    """Weight-averaged matched peak angular error over categories with
    concentrated peaks (kappa > 0)."""
    mu, kappa, w = outputs
    k = batch["mvm_k"]
    cost = kl_von_mises(
        mu[:, :, None], kappa[:, :, None],
        batch["mvm_mu"][:, None, :], batch["mvm_kappa"][:, None, :],
    )
    cost = jnp.nan_to_num(cost, nan=1e6, posinf=1e6, neginf=1e6)
    col, _ = hungarian_small(cost, k)
    matched_gt_mu = jnp.take_along_axis(batch["mvm_mu"], col, axis=1)
    ang = jnp.degrees(jnp.abs(wrap_angle(mu - matched_gt_mu)))
    valid = (jnp.arange(mu.shape[1])[None] < k[:, None]) & (
        batch["mvm_kappa"].max(-1, keepdims=True) > 0
    )
    mean = jnp.sum(jnp.where(valid, ang, 0.0), -1) / jnp.maximum(
        jnp.sum(valid, -1), 1
    )
    return jnp.where(jnp.any(valid, -1), mean, jnp.nan)


def _cls(outputs, batch, cfg):
    log_probs = outputs[0] if isinstance(outputs, tuple) else outputs
    per = -jnp.take_along_axis(log_probs, batch["labels"][:, None], -1)[:, 0]
    return per


TASKS: Dict[str, TaskAdapter] = {
    "forward_mse": TaskAdapter(_forward_mse, _forward_mse_ang),
    "forward_mse_aux": TaskAdapter(_forward_mse_aux, _forward_mse_aux_ang),
    "axes": TaskAdapter(_axes, _axes_ang),
    "8dir_mse": TaskAdapter(_8dir_mse, _8dir_ang),
    "8dir_kl": TaskAdapter(_8dir_kl, _8dir_ang),
    "multi_8dir": TaskAdapter(_multi_8dir, _multi_8dir_ang),
    "vm_kl": TaskAdapter(_vm_kl, _vm_ang),
    "mvm": TaskAdapter(_mvm, _mvm_ang),
    "classification": TaskAdapter(_cls, None),
}
