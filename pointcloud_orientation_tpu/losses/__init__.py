from .objectives import (
    mse,
    forward_mse_loss,
    axes_orth_loss,
    softmax_mse_8dir_loss,
    soft_label_kl_8dir,
    projected_probs_mse_loss,
    single_peak_vm_kl_loss,
    mvm_matched_loss,
    nll_loss,
    pointnet_cls_loss,
)

__all__ = [
    "mse",
    "forward_mse_loss",
    "axes_orth_loss",
    "softmax_mse_8dir_loss",
    "soft_label_kl_8dir",
    "projected_probs_mse_loss",
    "single_peak_vm_kl_loss",
    "mvm_matched_loss",
    "nll_loss",
    "pointnet_cls_loss",
]
