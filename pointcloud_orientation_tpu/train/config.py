"""Dataclass configuration for every training entry point.

The reference hardcodes all constants per script (SURVEY.md §5-config); this
module centralizes them. ``PRESETS`` reproduces each of the reference's ten
entry points with its canonical hyperparameters: N=10,000 points (clamped to
the packed cloud size), B=16, 200 epochs (100 for MvM), Adam lr=1e-3,
seed=42, 70/15/15 split, dropout 0.5, kappa=8, max_K=4, kappa_max=80,
temp=0.7, lambda_orth=0.1, grad-clip 1.0 (MvM only).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

# The reference's 6-class mixed-category scope
# (`train_8dir_KL.py:17`, dir name `chair_toilet_sofa_plant_bowl_bottle`).
SIX_CLASS_MIX: Tuple[str, ...] = ("chair", "toilet", "sofa", "plant", "bowl", "bottle")

# The 12-category MvM scope (`data_process/2d_multi_peak_MvM_gt_1.py:13-26`).
MVM_CLASSES: Tuple[str, ...] = (
    "cone", "bowl", "chair", "bottle", "plant", "car",
    "sofa", "toilet", "door", "curtain", "bathtub", "glass_box",
)


@dataclasses.dataclass
class TrainConfig:
    # task + model
    task: str = "8dir_kl"
    model: str = "pointnet_pp_8dir"
    # data
    num_points: int = 1024
    rotation_mode: str = "yaw"  # "yaw" | "so3" | "none"
    classes: Optional[Sequence[str]] = SIX_CLASS_MIX
    per_label: bool = False  # train one model per category (train.py style)
    target_row: int = 2  # which axes row is "the" target vector (2=forward)
    # optimization
    batch_size: int = 16
    epochs: int = 200
    lr: float = 1e-3
    # opt-in LR schedule (None = the reference's constant lr):
    #   "cosine"  — cosine decay from lr to 0 over `epochs`, with an
    #               optional linear warmup of `warmup_epochs`
    lr_schedule: Optional[str] = None
    warmup_epochs: int = 0
    optimizer: str = "adam"  # "adam" (reference) | "sgd"
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" trunk compute
    # (params/optimizer/heads/geometry stay f32; see PointNetPPTrunk.dtype)
    seed: int = 42
    grad_clip: Optional[float] = None
    lambda_orth: float = 0.1
    # axes-task ablation knobs (reference: results/chair_schemit,
    # results/without_l2_norm)
    axes_gram_schmidt: bool = False  # orthogonalize up against forward
    axes_normalize_heads: bool = True  # False = no-L2-norm ablation
    # transformer attention backend: "xla" (default; faster at this model's
    # head_dim where both fit) or "flash" (Pallas blockwise, O(N) memory —
    # the N>16k single-chip path; RESULTS.md long-context)
    transformer_attention: str = "xla"
    # distribution heads
    kappa_default: float = 8.0
    max_k: int = 4
    # MoE transformer (task "forward_mse_aux")
    moe_experts: int = 4
    moe_aux_weight: float = 0.01  # switch load-balance coefficient
    moe_dispatch: str = "masked"  # "capacity" = switch gather dispatch
    moe_capacity_factor: float = 1.25  # per-expert slots = T/K * factor
    # framework improvements over the reference (0/"tanh" = exact parity)
    mvm_unmatched_penalty: float = 0.0  # guard vs the weight-collapse minimum
    mvm_weight_floor: float = 0.0  # w = (1-f)*softmax + f/K (anti-collapse)
    mvm_mu_init: str = "zero"  # "spread" = init component mus around the circle
    vm_mu_parameterization: str = "tanh"  # "atan2" = wrap-free mu head
    # runtime
    out_dir: str = "results"
    checkpoint_every: int = 0  # epochs between mid-run checkpoints (0 = off)
    async_checkpoint: bool = False  # overlap periodic checkpoint writes with training
    keep_best: bool = True
    debug_checks: bool = False  # per-step finite checks (the _debug harness)
    # keep the dataset host-resident and stream one batch per step to the
    # device (gather + H2D per batch) instead of device-resident packed
    # arrays — for datasets whose packed splits exceed device memory. Same
    # math and PRNG streams as the resident path, traded for per-step
    # dispatch overhead.
    host_resident: bool = False
    bn_sync_axis: Optional[str] = None

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def _p(**kw) -> TrainConfig:
    return TrainConfig(**kw)


# One preset per reference entry point (SURVEY.md §2.5).
PRESETS = {
    # simple_pointnet_train.py — SimplePointNet, MSE on the first axes row,
    # one category (chair), SO(3)-rotated tree.
    "simple_pointnet": _p(
        task="forward_mse", model="simple_pointnet", rotation_mode="so3",
        classes=("chair",), target_row=0, num_points=10_000,
    ),
    # PointNet++_train.py — inline PointNetPP, MSE forward, one category.
    "pointnet_pp_forward": _p(
        task="forward_mse", model="pointnet_pp", rotation_mode="so3",
        classes=("bookshelf",), target_row=0, num_points=10_000,
    ),
    # train.py — two-axis + orthogonality over all 40 labels, per-label loop.
    "axes_all_labels": _p(
        task="axes", model="pointnet_pp_xyz_schmidt", rotation_mode="so3",
        classes=None, per_label=True, num_points=10_000, lambda_orth=0.1,
    ),
    # train_8dir.py — 8-dir softmax-MSE vs projection of the GT forward,
    # per-label (chair), yaw rotations.
    "8dir": _p(
        task="8dir_mse", model="pointnet_pp_8dir", rotation_mode="yaw",
        classes=("chair",), per_label=True, num_points=10_000,
    ),
    # train_8dir_MSE.py — 8-dir softmax-MSE vs sidecar labels, 6-class mix.
    "8dir_mse": _p(
        task="8dir_mse", model="pointnet_pp_8dir", rotation_mode="yaw",
        classes=SIX_CLASS_MIX, num_points=10_000,
    ),
    # train_8dir_KL.py — 8-dir soft-label KL, 6-class mix.
    "8dir_kl": _p(
        task="8dir_kl", model="pointnet_pp_8dir", rotation_mode="yaw",
        classes=SIX_CLASS_MIX, num_points=10_000,
    ),
    # train_multi_8dir.py — unit-forward head projected to 8-dir, MSE.
    "multi_8dir": _p(
        task="multi_8dir", model="pointnet_pp_fwd", rotation_mode="yaw",
        classes=SIX_CLASS_MIX, num_points=10_000,
    ),
    # train_single_peak_vonMises_KL.py — single-peak vM KL, 6-class mix.
    "vm_kl": _p(
        task="vm_kl", model="pointnet_pp_von_mises", rotation_mode="yaw",
        classes=SIX_CLASS_MIX, num_points=10_000,
    ),
    # framework-improved single-peak vM: wrap-free atan2 mu head
    # (A/B in RESULTS.md: test KL 1.28 -> 0.27 vs the tanh parity head)
    "vm_kl_atan2": _p(
        task="vm_kl", model="pointnet_pp_von_mises", rotation_mode="yaw",
        classes=SIX_CLASS_MIX, num_points=10_000,
        vm_mu_parameterization="atan2",
    ),
    # framework-improved MvM: unmatched-weight penalty removes the
    # weight-collapse degenerate minimum (RESULTS.md)
    "mvm_guarded": _p(
        task="mvm", model="pointnet_pp_mvm", rotation_mode="yaw",
        classes=MVM_CLASSES, epochs=100, grad_clip=1.0, num_points=10_000,
        mvm_unmatched_penalty=1.0,
    ),
    # Spread-mu-init MvM: the SAME parity matched-KL objective, only the
    # head init changes (component mus start spread around the circle
    # instead of the reference's all-zero init). Eliminates the seed
    # bistability: test KL 0.0006-0.019 over seeds 42-44 vs the reference's
    # published 0.0777 (RESULTS.md "bistability").
    "mvm_spread": _p(
        task="mvm", model="pointnet_pp_mvm", rotation_mode="yaw",
        classes=MVM_CLASSES, epochs=100, grad_clip=1.0, num_points=10_000,
        mvm_mu_init="spread",
    ),
    # Anti-collapse MvM (framework improvement): weight floor keeps every
    # component's mu gradient alive and the spread init breaks the all-mus-
    # equal symmetry of the reference's zero-init; objective itself stays the
    # parity matched KL. See RESULTS.md "bistability".
    "mvm_robust": _p(
        task="mvm", model="pointnet_pp_mvm", rotation_mode="yaw",
        classes=MVM_CLASSES, epochs=100, grad_clip=1.0, num_points=10_000,
        mvm_weight_floor=0.1, mvm_mu_init="spread",
    ),
    # train_multi_peaks_vonMises_KL.py — matched MvM KL, 12 categories,
    # 100 epochs, grad clip 1.0.
    "mvm": _p(
        task="mvm", model="pointnet_pp_mvm", rotation_mode="yaw",
        classes=MVM_CLASSES, epochs=100, grad_clip=1.0, num_points=10_000,
    ),
    # train_multi_peaks_vonMises_KL_debug.py — same plus finite checks.
    "mvm_debug": _p(
        task="mvm", model="pointnet_pp_mvm", rotation_mode="yaw",
        classes=MVM_CLASSES, epochs=100, grad_clip=1.0, num_points=10_000,
        debug_checks=True,
    ),
    # point transformer variant (exported model, `models/point_transformer.py`)
    "point_transformer": _p(
        task="forward_mse", model="point_transformer", rotation_mode="so3",
        classes=("chair",), num_points=1024,
    ),
    # conditional-capacity variant (no reference counterpart): same data and
    # objective as the dense flagship, MoE FFNs + switch aux loss.
    "moe_point_transformer": _p(
        task="forward_mse_aux", model="moe_point_transformer",
        rotation_mode="so3", classes=("chair",), num_points=1024,
    ),
}


def preset(name: str, **overrides) -> TrainConfig:
    cfg = PRESETS[name]
    return cfg.replace(**overrides) if overrides else cfg
