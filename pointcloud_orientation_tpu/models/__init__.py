"""flax.linen model zoo.

Every model takes a ``(B, N, 3)`` point cloud and returns head-specific
outputs, mirroring the reference's export surface (`models/__init__.py:1-9`)
plus the two script-local models (SimplePointNet, the demo classifiers).
"""

from .layers import SetAbstraction, SharedMLP, PointNetPPTrunk
from .simple_pointnet import SimplePointNet
from .pointnet import STN3d, STNkd, PointNetEncoder, PointNet, PointNetCls
from .pointnet_pp import (
    PointNetPP,
    PointNetPPXYZ,
    PointNetPPXYZSchmidt,
    PointNetPP8Dir,
    PointNetPPFwd,
    PointNetPPVonMises,
    PointNetPPMvM,
    PointNetPPCls,
)
from .point_transformer import PointTransformer
from .moe_transformer import (
    MoEPointTransformer,
    moe_ep_param_specs,
    shard_moe_params,
)
from ..parallel.sp_transformer import RingPointTransformer

MODEL_REGISTRY = {
    "simple_pointnet": SimplePointNet,
    "pointnet": PointNet,
    "pointnet_cls": PointNetCls,
    "pointnet_pp": PointNetPP,
    "pointnet_pp_xyz": PointNetPPXYZ,
    "pointnet_pp_xyz_schmidt": PointNetPPXYZSchmidt,
    "pointnet_pp_8dir": PointNetPP8Dir,
    "pointnet_pp_fwd": PointNetPPFwd,
    "pointnet_pp_von_mises": PointNetPPVonMises,
    "pointnet_pp_mvm": PointNetPPMvM,
    "pointnet_pp_cls": PointNetPPCls,
    "point_transformer": PointTransformer,
    # sequence-parallel ring-attention variant (plain path when no mesh
    # axis is bound; see parallel/sp_transformer.py for the SPMD step)
    "ring_point_transformer": RingPointTransformer,
    # conditional-capacity flagship variant: returns (out, aux_loss) — the
    # trainer's "forward_mse_aux" task consumes the tuple; the serving
    # predictor and torch import/export paths do not apply to it.
    "moe_point_transformer": MoEPointTransformer,
}

# Models whose __call__ returns a tuple with an auxiliary loss rather than
# a single head output. Single-output consumers (the serving predictor,
# the HTTP demo, torch import/export) must check this set and refuse —
# their tree_map/asarray post-processing silently mangles (out, aux).
MULTI_OUTPUT_MODELS = frozenset({"moe_point_transformer"})

__all__ = [
    "MoEPointTransformer",
    "moe_ep_param_specs",
    "shard_moe_params",
    "SetAbstraction",
    "SharedMLP",
    "PointNetPPTrunk",
    "SimplePointNet",
    "STN3d",
    "STNkd",
    "PointNetEncoder",
    "PointNet",
    "PointNetCls",
    "PointNetPP",
    "PointNetPPXYZ",
    "PointNetPPXYZSchmidt",
    "PointNetPP8Dir",
    "PointNetPPFwd",
    "PointNetPPVonMises",
    "PointNetPPMvM",
    "PointNetPPCls",
    "PointTransformer",
    "RingPointTransformer",
    "MODEL_REGISTRY",
    "MULTI_OUTPUT_MODELS",
]
