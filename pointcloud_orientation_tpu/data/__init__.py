from .ply import read_ply, write_ply, write_ply_with_axes
from .sidecar import (
    read_axes_txt,
    write_axes_txt,
    read_8dir_txt,
    write_8dir_txt,
    read_single_peak_vm_txt,
    write_single_peak_vm_txt,
    read_multi_peak_vm_txt,
    write_multi_peak_vm_txt,
)
from .gt import (
    K_DICT,
    UNIFORM_CLASSES,
    CLEAR_CLASSES,
    SYMM_CLASSES,
    KAPPA_DEFAULT,
    eight_dir_gt,
    single_peak_gt,
    mvm_gt,
)
from .dataset import OrientationDataset, split_indices
from .pipeline import subsample_points, make_augment_fn
from .hdf5 import load_modelnet_hdf5, synthetic_modelnet

__all__ = [
    "read_ply",
    "write_ply",
    "write_ply_with_axes",
    "read_axes_txt",
    "write_axes_txt",
    "read_8dir_txt",
    "write_8dir_txt",
    "read_single_peak_vm_txt",
    "write_single_peak_vm_txt",
    "read_multi_peak_vm_txt",
    "write_multi_peak_vm_txt",
    "K_DICT",
    "UNIFORM_CLASSES",
    "CLEAR_CLASSES",
    "SYMM_CLASSES",
    "KAPPA_DEFAULT",
    "eight_dir_gt",
    "single_peak_gt",
    "mvm_gt",
    "OrientationDataset",
    "split_indices",
    "subsample_points",
    "make_augment_fn",
    "load_modelnet_hdf5",
    "synthetic_modelnet",
]
