"""Geometric and numeric primitives.

Pure-XLA (jnp) formulations live in :mod:`.geometry`, :mod:`.von_mises`,
:mod:`.rotations`, :mod:`.matching`, :mod:`.dirs8`. Pallas TPU kernels for
the hot paths live under :mod:`.pallas_kernels` and are selected via
``use_pallas=`` switches on the public entry points.
"""

from .geometry import (
    index_points,
    square_distance,
    knn_query,
    ball_query,
    farthest_point_sample,
    random_sample_indices,
    sample_and_group,
    group_all,
    set_pallas_mode,
    set_knn_impl,
)
from .von_mises import (
    kl_von_mises,
    wrap_angle,
    log_i0,
    bessel_ratio,
    von_mises_pdf,
    mixture_von_mises_pdf,
    mvm_density_on_grid,
)
from .matching import matched_mvm_loss, hungarian_small
from .dirs8 import DIRS_8, forward_to_8dir_probs
from .rotations import (
    random_so3_matrix,
    random_yaw_matrix,
    yaw_matrix,
    rotate_points,
    axes_gt_from_rotation,
    forward_to_mu,
)

__all__ = [
    "index_points",
    "square_distance",
    "knn_query",
    "ball_query",
    "farthest_point_sample",
    "random_sample_indices",
    "sample_and_group",
    "group_all",
    "set_pallas_mode",
    "set_knn_impl",
    "kl_von_mises",
    "wrap_angle",
    "log_i0",
    "bessel_ratio",
    "von_mises_pdf",
    "mixture_von_mises_pdf",
    "mvm_density_on_grid",
    "matched_mvm_loss",
    "hungarian_small",
    "DIRS_8",
    "forward_to_8dir_probs",
    "random_so3_matrix",
    "random_yaw_matrix",
    "yaw_matrix",
    "rotate_points",
    "axes_gt_from_rotation",
    "forward_to_mu",
]
