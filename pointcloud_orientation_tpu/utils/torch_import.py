"""Import PyTorch reference checkpoints into the flax parameter pytree.

The reference saves raw ``state_dict``s (e.g. ``mvM_best.pth``,
`train_multi_peaks_vonMises_KL.py:289-290`). This converter maps its naming
scheme (`models/pointnet_pp.py:14-19,52-57`: ``sa{1..3}.convs.{i}`` /
``sa.bns.{i}`` / ``fc1/fc2/bn1/bn2`` or ``ln1/ln2`` / head layers) onto the
flax tree (``PointNetPPTrunk_0/SetAbstraction_{k}/SharedMLP_0/Dense_{i}`` ...)
so trained reference weights can be validated against this stack.

Layout conversions: torch ``Conv2d(Cin, Cout, 1)`` weight ``(Cout, Cin, 1, 1)``
-> Dense kernel ``(Cin, Cout)``; torch ``Linear`` weight ``(out, in)`` ->
kernel ``(in, out)``; BN ``weight/bias/running_mean/running_var`` ->
``scale/bias`` params + ``mean/var`` batch stats.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

# Head layers per model name (torch layer -> flax module name).
_HEADS = {
    "pointnet_pp": {"fc3": "Dense_0"},
    "pointnet_pp_8dir": {"fc3": "Dense_0"},
    "pointnet_pp_fwd": {"fc3": "Dense_0"},
    "pointnet_pp_von_mises": {"fc3": "Dense_0"},
    "pointnet_pp_xyz": {"head_x": "head_x", "head_y": "head_y"},
    "pointnet_pp_xyz_schmidt": {"head_y": "head_y", "head_z": "head_z"},
    "pointnet_pp_mvm": {
        "head_pi": "head_pi",
        "head_mu": "head_mu",
        "head_kappa": "head_kappa",
    },
}


def _to_np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_pointnet_pp_state_dict(
    state_dict: Mapping[str, Any], model: str = "pointnet_pp_8dir"
) -> Tuple[Dict, Dict]:
    """Convert a reference PointNet++-family ``state_dict`` to
    ``(params, batch_stats)`` pytrees for the matching flax model."""
    if model not in _HEADS:
        raise ValueError(f"unsupported model for import: {model}")
    params: Dict = {}
    stats: Dict = {}
    trunk = ("PointNetPPTrunk_0",)
    mvm = model == "pointnet_pp_mvm"

    for name, tensor in state_dict.items():
        arr = _to_np(tensor)
        parts = name.split(".")
        # --- SA stages: sa{k}.convs.{i}.* / sa{k}.bns.{i}.* ---
        if parts[0].startswith("sa") and len(parts) >= 4:
            k = int(parts[0][2:]) - 1
            i = int(parts[2])
            base = trunk + (f"SetAbstraction_{k}", "SharedMLP_0")
            if parts[1] == "convs":
                if parts[3] == "weight":
                    _set(params, base + (f"Dense_{i}", "kernel"), arr[:, :, 0, 0].T)
                else:
                    _set(params, base + (f"Dense_{i}", "bias"), arr)
            elif parts[1] == "bns":
                leaf = parts[3]
                if leaf == "weight":
                    _set(params, base + (f"BatchNorm_{i}", "scale"), arr)
                elif leaf == "bias":
                    _set(params, base + (f"BatchNorm_{i}", "bias"), arr)
                elif leaf == "running_mean":
                    _set(stats, base + (f"BatchNorm_{i}", "mean"), arr)
                elif leaf == "running_var":
                    _set(stats, base + (f"BatchNorm_{i}", "var"), arr)
            continue
        # --- trunk FC funnel ---
        if parts[0] in ("fc1", "fc2"):
            idx = 0 if parts[0] == "fc1" else 1
            leaf = "kernel" if parts[1] == "weight" else "bias"
            val = arr.T if parts[1] == "weight" else arr
            _set(params, trunk + (f"Dense_{idx}", leaf), val)
            continue
        if parts[0] in ("bn1", "bn2") and not mvm:
            idx = 0 if parts[0] == "bn1" else 1
            leaf = parts[1]
            if leaf == "weight":
                _set(params, trunk + (f"BatchNorm_{idx}", "scale"), arr)
            elif leaf == "bias":
                _set(params, trunk + (f"BatchNorm_{idx}", "bias"), arr)
            elif leaf == "running_mean":
                _set(stats, trunk + (f"BatchNorm_{idx}", "mean"), arr)
            elif leaf == "running_var":
                _set(stats, trunk + (f"BatchNorm_{idx}", "var"), arr)
            continue
        if parts[0] in ("ln1", "ln2") and mvm:
            idx = 0 if parts[0] == "ln1" else 1
            leaf = "scale" if parts[1] == "weight" else "bias"
            _set(params, trunk + (f"LayerNorm_{idx}", leaf), arr)
            continue
        # --- heads ---
        head_map = _HEADS[model]
        if parts[0] in head_map:
            flax_name = head_map[parts[0]]
            leaf = "kernel" if parts[1] == "weight" else "bias"
            val = arr.T if parts[1] == "weight" else arr
            _set(params, (flax_name, leaf), val)
            continue
        if parts[-1] == "num_batches_tracked":
            continue
        raise KeyError(f"unmapped state_dict entry: {name}")
    return params, stats


def _convert_block(
    params: Dict, stats: Dict, base: Tuple[str, ...], kind: str, idx: int,
    leaf: str, arr: np.ndarray
):
    """Map one torch layer entry under ``base``.

    kind='conv': Conv1d (out,in,1) -> Dense kernel (in,out);
    kind='fc':   Linear (out,in)   -> Dense kernel (in,out);
    kind='bn':   BatchNorm params + running stats.
    """
    if kind in ("conv", "fc"):
        if leaf == "weight":
            w = arr[:, :, 0].T if arr.ndim == 3 else arr.T
            _set(params, base + (f"Dense_{idx}", "kernel"), w)
        else:
            _set(params, base + (f"Dense_{idx}", "bias"), arr)
    elif kind == "bn":
        name = f"BatchNorm_{idx}"
        if leaf == "weight":
            _set(params, base + (name, "scale"), arr)
        elif leaf == "bias":
            _set(params, base + (name, "bias"), arr)
        elif leaf == "running_mean":
            _set(stats, base + (name, "mean"), arr)
        elif leaf == "running_var":
            _set(stats, base + (name, "var"), arr)


# torch layer name -> (kind, flax index) for the STN/encoder/head blocks.
_STN_MAP = {
    "conv1": ("conv", 0), "conv2": ("conv", 1), "conv3": ("conv", 2),
    "bn1": ("bn", 0), "bn2": ("bn", 1), "bn3": ("bn", 2),
    "fc1": ("fc", 3), "fc2": ("fc", 4), "fc3": ("fc", 5),
    "bn4": ("bn", 3), "bn5": ("bn", 4),
}
_ENCODER_MAP = {
    "conv1": ("conv", 0), "conv2": ("conv", 1), "conv3": ("conv", 2),
    "bn1": ("bn", 0), "bn2": ("bn", 1), "bn3": ("bn", 2),
}
_PN_HEAD_MAP = {
    "fc1": ("fc", 0), "fc2": ("fc", 1), "fc3": ("fc", 2),
    "bn1": ("bn", 0), "bn2": ("bn", 1),
}
_SIMPLE_MAP = {
    "conv1": ("conv", 0), "conv2": ("conv", 1), "conv3": ("conv", 2),
    "bn1": ("bn", 0), "bn2": ("bn", 1), "bn3": ("bn", 2),
    "fc1": ("fc", 3), "bn4": ("bn", 3), "fc2": ("fc", 4),
}


def import_pointnet_state_dict(
    state_dict: Mapping[str, Any], model: str = "pointnet"
) -> Tuple[Dict, Dict]:
    """Convert a reference PointNet-family ``state_dict``:

    * ``'pointnet'`` — ``PointNet`` (`models/pointnet.py:111-129`, encoder
      attr ``encoder``);
    * ``'pointnet_cls'`` — ``get_model`` (`PointNetDemo.py:139-161`, encoder
      attr ``feat``);
    * ``'simple_pointnet'`` — `simple_pointnet_train.py:86-113`.
    """
    params: Dict = {}
    stats: Dict = {}
    enc_attr = {"pointnet": "encoder", "pointnet_cls": "feat"}.get(model)

    for name, tensor in state_dict.items():
        arr = _to_np(tensor)
        parts = name.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if model == "simple_pointnet":
            kind, idx = _SIMPLE_MAP[parts[0]]
            _convert_block(params, stats, (), kind, idx, parts[1], arr)
            continue
        if parts[0] == enc_attr:
            enc = ("PointNetEncoder_0",)
            if parts[1] == "stn":
                kind, idx = _STN_MAP[parts[2]]
                _convert_block(params, stats, enc + ("STN3d_0",), kind, idx, parts[3], arr)
            elif parts[1] == "fstn":
                kind, idx = _STN_MAP[parts[2]]
                _convert_block(params, stats, enc + ("STNkd_0",), kind, idx, parts[3], arr)
            else:
                kind, idx = _ENCODER_MAP[parts[1]]
                _convert_block(params, stats, enc, kind, idx, parts[2], arr)
            continue
        kind, idx = _PN_HEAD_MAP[parts[0]]
        _convert_block(params, stats, (), kind, idx, parts[1], arr)
    return params, stats


def import_point_transformer_state_dict(
    state_dict: Mapping[str, Any], num_heads: int = 4
) -> Tuple[Dict, Dict]:
    """Convert the reference ``PointTransformer`` state_dict
    (`models/point_transformer.py:4-20`: Linear 3->64, torch
    ``nn.TransformerEncoder`` of post-norm layers, Linear 64->3) onto the
    flax :class:`..models.PointTransformer` tree.

    Layout notes: torch ``nn.MultiheadAttention`` packs q/k/v as the row
    thirds of ``in_proj_weight (3E, E)``; flax splits them into per-head
    kernels ``(E, H, E/H)`` (head-major concatenation, matching torch's
    ``(B, H, N, Dh) -> (B, N, H*Dh)`` reshape). torch ``Linear`` weights are
    ``(out, in)`` = transposed flax kernels.
    """
    params: Dict = {}

    def dense(path, w, b):
        _set(params, path + ("kernel",), _to_np(w).T)
        _set(params, path + ("bias",), _to_np(b))

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    dense(("Dense_0",), sd["input_proj.weight"], sd["input_proj.bias"])
    dense(("Dense_1",), sd["fc_out.weight"], sd["fc_out.bias"])

    layers = sorted(
        {int(k.split(".")[2]) for k in sd if k.startswith("transformer.layers.")}
    )
    for i in layers:
        p = f"transformer.layers.{i}."
        lp = (f"TransformerEncoderLayer_{i}",)
        E = sd[p + "self_attn.in_proj_weight"].shape[1]
        H, Dh = num_heads, E // num_heads
        in_w = sd[p + "self_attn.in_proj_weight"]  # (3E, E) rows = q,k,v
        in_b = sd[p + "self_attn.in_proj_bias"]
        attn = lp + ("MultiHeadDotProductAttention_0",)
        for j, name in enumerate(("query", "key", "value")):
            w = in_w[j * E : (j + 1) * E]  # (E, E), out-major
            b = in_b[j * E : (j + 1) * E]
            _set(params, attn + (name, "kernel"), w.T.reshape(E, H, Dh))
            _set(params, attn + (name, "bias"), b.reshape(H, Dh))
        ow = sd[p + "self_attn.out_proj.weight"]  # (E, E)
        _set(params, attn + ("out", "kernel"), ow.T.reshape(H, Dh, E))
        _set(params, attn + ("out", "bias"), sd[p + "self_attn.out_proj.bias"])
        dense(lp + ("Dense_0",), sd[p + "linear1.weight"], sd[p + "linear1.bias"])
        dense(lp + ("Dense_1",), sd[p + "linear2.weight"], sd[p + "linear2.bias"])
        for t, flax_name in (("norm1", "LayerNorm_0"), ("norm2", "LayerNorm_1")):
            _set(params, lp + (flax_name, "scale"), sd[p + t + ".weight"])
            _set(params, lp + (flax_name, "bias"), sd[p + t + ".bias"])
    return params, {}


_PP_MODELS = frozenset(_HEADS)


def load_torch_checkpoint(
    path: str, model: str = "pointnet_pp_8dir"
) -> Tuple[Dict, Dict]:
    """Load a ``.pth`` state_dict file and convert it (any supported model)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if model in _PP_MODELS:
        return import_pointnet_pp_state_dict(sd, model)
    if model == "point_transformer":
        return import_point_transformer_state_dict(sd)
    return import_pointnet_state_dict(sd, model)
