"""Export flax parameters to reference-format PyTorch ``state_dict``s.

The inverse of :mod:`.torch_import`: weights trained in this framework load
directly into the reference's model classes (`models/pointnet_pp.py:14-19,
52-57` naming: ``sa{k}.convs.{i}`` / ``sa{k}.bns.{i}`` / ``fc1/fc2`` /
``bn1/bn2`` (``ln1/ln2`` for the MvM trunk) / head layers), so a user of the
reference stack can consume checkpoints produced here with
``model.load_state_dict(..., strict=True)``.

Layout conversions (mirror of the importer): Dense kernel ``(Cin, Cout)`` ->
Conv2d weight ``(Cout, Cin, 1, 1)`` for the SA shared MLPs, ``(out, in)``
Linear weight otherwise; BatchNorm ``scale/bias`` params + ``mean/var``
batch stats -> ``weight/bias/running_mean/running_var`` (+ a zero
``num_batches_tracked``, which torch checkpoints carry).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from .torch_import import _HEADS

_TRUNK = "PointNetPPTrunk_0"


def _np(a) -> np.ndarray:
    return np.asarray(a)


def export_pointnet_pp_state_dict(
    params: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
    model: str = "pointnet_pp_8dir",
) -> Dict[str, np.ndarray]:
    """Convert ``(params, batch_stats)`` of a PointNet++-family flax model to
    the reference's ``state_dict`` naming (numpy values; wrap with
    ``torch.from_numpy`` to load)."""
    if model not in _HEADS:
        raise ValueError(f"unsupported model for export: {model}")
    mvm = model == "pointnet_pp_mvm"
    out: Dict[str, np.ndarray] = {}
    trunk_p = params[_TRUNK]
    trunk_s = (batch_stats or {}).get(_TRUNK, {})

    # --- SA stages ---
    for k in range(3):
        sa_p = trunk_p[f"SetAbstraction_{k}"]["SharedMLP_0"]
        sa_s = trunk_s.get(f"SetAbstraction_{k}", {}).get("SharedMLP_0", {})
        i = 0
        while f"Dense_{i}" in sa_p:
            d = sa_p[f"Dense_{i}"]
            out[f"sa{k + 1}.convs.{i}.weight"] = (
                _np(d["kernel"]).T[:, :, None, None]
            )
            out[f"sa{k + 1}.convs.{i}.bias"] = _np(d["bias"])
            bn = sa_p[f"BatchNorm_{i}"]
            out[f"sa{k + 1}.bns.{i}.weight"] = _np(bn["scale"])
            out[f"sa{k + 1}.bns.{i}.bias"] = _np(bn["bias"])
            st = sa_s.get(f"BatchNorm_{i}", {})
            n = _np(bn["scale"]).shape[0]
            out[f"sa{k + 1}.bns.{i}.running_mean"] = _np(
                st.get("mean", np.zeros(n, np.float32))
            )
            out[f"sa{k + 1}.bns.{i}.running_var"] = _np(
                st.get("var", np.ones(n, np.float32))
            )
            out[f"sa{k + 1}.bns.{i}.num_batches_tracked"] = np.zeros(
                (), np.int64
            )
            i += 1

    # --- trunk FC funnel ---
    for idx, name in ((0, "fc1"), (1, "fc2")):
        d = trunk_p[f"Dense_{idx}"]
        out[f"{name}.weight"] = _np(d["kernel"]).T
        out[f"{name}.bias"] = _np(d["bias"])
    if mvm:
        for idx, name in ((0, "ln1"), (1, "ln2")):
            ln = trunk_p[f"LayerNorm_{idx}"]
            out[f"{name}.weight"] = _np(ln["scale"])
            out[f"{name}.bias"] = _np(ln["bias"])
    else:
        for idx, name in ((0, "bn1"), (1, "bn2")):
            bn = trunk_p[f"BatchNorm_{idx}"]
            out[f"{name}.weight"] = _np(bn["scale"])
            out[f"{name}.bias"] = _np(bn["bias"])
            st = trunk_s.get(f"BatchNorm_{idx}", {})
            n = _np(bn["scale"]).shape[0]
            out[f"{name}.running_mean"] = _np(
                st.get("mean", np.zeros(n, np.float32))
            )
            out[f"{name}.running_var"] = _np(
                st.get("var", np.ones(n, np.float32))
            )
            out[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)

    # --- heads ---
    for torch_name, flax_name in _HEADS[model].items():
        d = params[flax_name]
        out[f"{torch_name}.weight"] = _np(d["kernel"]).T
        out[f"{torch_name}.bias"] = _np(d["bias"])
    return out


def _emit_block(out, p_node, s_node, torch_name, kind, idx):
    """Inverse of torch_import._convert_block for one torch layer."""
    if kind in ("conv", "fc"):
        d = p_node[f"Dense_{idx}"]
        w = _np(d["kernel"]).T
        if kind == "conv":
            w = w[:, :, None]  # Conv1d weight (out, in, 1)
        out[f"{torch_name}.weight"] = w
        out[f"{torch_name}.bias"] = _np(d["bias"])
    else:  # bn
        bn = p_node[f"BatchNorm_{idx}"]
        out[f"{torch_name}.weight"] = _np(bn["scale"])
        out[f"{torch_name}.bias"] = _np(bn["bias"])
        st = (s_node or {}).get(f"BatchNorm_{idx}", {})
        n = _np(bn["scale"]).shape[0]
        out[f"{torch_name}.running_mean"] = _np(
            st.get("mean", np.zeros(n, np.float32)))
        out[f"{torch_name}.running_var"] = _np(
            st.get("var", np.ones(n, np.float32)))
        out[f"{torch_name}.num_batches_tracked"] = np.zeros((), np.int64)


def export_pointnet_state_dict(
    params: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
    model: str = "pointnet",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`..torch_import.import_pointnet_state_dict` for the
    PointNet family: ``'pointnet'`` (`models/pointnet.py:111-129`),
    ``'pointnet_cls'`` (`PointNetDemo.py:139-161`), ``'simple_pointnet'``
    (`simple_pointnet_train.py:86-113`)."""
    from .torch_import import _ENCODER_MAP, _PN_HEAD_MAP, _SIMPLE_MAP, _STN_MAP

    stats = batch_stats or {}
    out: Dict[str, np.ndarray] = {}
    if model == "simple_pointnet":
        for tname, (kind, idx) in _SIMPLE_MAP.items():
            _emit_block(out, params, stats, tname, kind, idx)
        return out
    enc_attr = {"pointnet": "encoder", "pointnet_cls": "feat"}.get(model)
    if enc_attr is None:
        raise ValueError(f"unsupported model for export: {model}")
    enc_p = params["PointNetEncoder_0"]
    enc_s = stats.get("PointNetEncoder_0", {})
    for tname, (kind, idx) in _ENCODER_MAP.items():
        _emit_block(out, enc_p, enc_s, f"{enc_attr}.{tname}", kind, idx)
    for stn_attr, stn_mod in (("stn", "STN3d_0"), ("fstn", "STNkd_0")):
        if stn_mod not in enc_p:
            continue
        for tname, (kind, idx) in _STN_MAP.items():
            _emit_block(out, enc_p[stn_mod], enc_s.get(stn_mod, {}),
                        f"{enc_attr}.{stn_attr}.{tname}", kind, idx)
    for tname, (kind, idx) in _PN_HEAD_MAP.items():
        _emit_block(out, params, stats, tname, kind, idx)
    return out


def export_point_transformer_state_dict(
    params: Mapping[str, Any],
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`..torch_import.import_point_transformer_state_dict`:
    flax :class:`..models.PointTransformer` params -> the reference's torch
    ``nn.TransformerEncoder`` state_dict (in_proj q/k/v row-thirds,
    out_proj, linear1/2, norm1/2)."""
    out: Dict[str, np.ndarray] = {}

    def dense(torch_name, node):
        out[f"{torch_name}.weight"] = _np(node["kernel"]).T
        out[f"{torch_name}.bias"] = _np(node["bias"])

    dense("input_proj", params["Dense_0"])
    dense("fc_out", params["Dense_1"])

    i = 0
    while f"TransformerEncoderLayer_{i}" in params:
        lp = params[f"TransformerEncoderLayer_{i}"]
        p = f"transformer.layers.{i}."
        attn = lp["MultiHeadDotProductAttention_0"]
        qkv_w, qkv_b = [], []
        for name in ("query", "key", "value"):
            k = _np(attn[name]["kernel"])  # (E, H, Dh)
            E = k.shape[0]
            qkv_w.append(k.reshape(E, E).T)  # (E_out, E_in)
            qkv_b.append(_np(attn[name]["bias"]).reshape(E))
        out[p + "self_attn.in_proj_weight"] = np.concatenate(qkv_w, axis=0)
        out[p + "self_attn.in_proj_bias"] = np.concatenate(qkv_b, axis=0)
        ok = _np(attn["out"]["kernel"])  # (H, Dh, E)
        E = ok.shape[-1]
        out[p + "self_attn.out_proj.weight"] = ok.reshape(E, E).T
        out[p + "self_attn.out_proj.bias"] = _np(attn["out"]["bias"])
        dense(p + "linear1", lp["Dense_0"])
        dense(p + "linear2", lp["Dense_1"])
        for t, flax_name in (("norm1", "LayerNorm_0"), ("norm2", "LayerNorm_1")):
            out[p + t + ".weight"] = _np(lp[flax_name]["scale"])
            out[p + t + ".bias"] = _np(lp[flax_name]["bias"])
        i += 1
    return out


def to_torch_state_dict(np_state_dict: Mapping[str, np.ndarray]):
    """Wrap a numpy state_dict in torch tensors (requires torch)."""
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in np_state_dict.items()}


def save_torch_checkpoint(
    path: str,
    params: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
    model: str = "pointnet_pp_8dir",
):
    """Write a reference-loadable ``.pth`` (raw state_dict, as the reference
    saves them — e.g. `train_multi_peaks_vonMises_KL.py:289-290`)."""
    import torch

    if model in _HEADS:
        np_sd = export_pointnet_pp_state_dict(params, batch_stats, model)
    else:
        np_sd = export_pointnet_state_dict(params, batch_stats, model)
    torch.save(to_torch_state_dict(np_sd), path)


def _main(argv=None):
    """CLI: export an Orbax checkpoint (as written by Trainer.save_checkpoint)
    to a reference-loadable .pth.

        python -m pointcloud_orientation_tpu.utils.torch_export \\
            --orbax results/run/ckpt/step_100 --model pointnet_pp_8dir \\
            --out best.pth
    """
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("--orbax", required=True,
                    help="Orbax checkpoint dir (a step_N directory)")
    ap.add_argument(
        "--model", required=True,
        choices=sorted(_HEADS) + ["pointnet", "pointnet_cls",
                                  "simple_pointnet"],
    )
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args(argv)

    import os

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckpt = ckptr.restore(os.path.abspath(args.orbax))
    save_torch_checkpoint(
        args.out, ckpt["params"], ckpt.get("batch_stats"), args.model
    )
    print(f"wrote {args.out} ({args.model})")


if __name__ == "__main__":
    _main()
