"""Weight-only int8 quantization for serving.

The reference has no serving path at all (SURVEY.md §5 — inference is an
ad-hoc loop inside `train.py:228-246`); this module extends the framework's
:class:`~pointcloud_orientation_tpu.infer.OrientationPredictor` with the
standard production trick: store every weight matrix as int8 plus a
per-output-channel f32 scale (symmetric, zero-point-free), dequantize at
use inside the jitted program. Parameter memory/transfer drops ~4× while
activations, accumulation, and every op stay f32 — on TPU the dequant
multiply fuses into the matmul prologue, so this is a pure memory/bandwidth
trade with a measured, test-pinned accuracy envelope (see
``tests/test_quantize.py``).

Quantized leaves: rank>=2 ``kernel`` arrays (Dense/Conv weights). Biases,
norm scales/statistics, and anything rank<2 stay f32 — they are tiny and
precision-critical.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _path_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def _is_quantizable(path, leaf) -> bool:
    keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    return bool(keys) and keys[-1] == "kernel" and getattr(leaf, "ndim", 0) >= 2


def quantize_params_int8(params) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Split a param tree into ``(quantized, scales)``.

    ``quantized`` mirrors ``params`` with every quantizable kernel replaced
    by its int8 representation; ``scales`` maps the leaf's ``a/b/c`` tree
    path to its per-output-channel (last-dim) f32 scale. Non-quantized
    leaves pass through unchanged and have no ``scales`` entry.
    """
    scales: Dict[str, np.ndarray] = {}

    def q(path, leaf):
        if not _is_quantizable(path, leaf):
            return leaf
        w = np.asarray(leaf, np.float32)
        # per-output-channel symmetric scale over all input dims
        absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        scales[_path_key(path)] = scale
        return np.clip(np.round(w / scale), -127, 127).astype(np.int8)

    quantized = jax.tree_util.tree_map_with_path(q, params)
    return quantized, scales


def dequantize_params(quantized, scales: Dict[str, np.ndarray]):
    """Rebuild an f32 param tree. jit-safe: run on device inside the serving
    program, where XLA fuses the scale multiply into the consumer matmul."""

    def d(path, leaf):
        key = _path_key(path)
        if key in scales:
            return leaf.astype(jnp.float32) * scales[key]
        return leaf

    return jax.tree_util.tree_map_with_path(d, quantized)


def param_bytes(tree) -> int:
    """Total parameter bytes of a tree (for measuring the ~4× shrink)."""
    return sum(
        np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(tree)
    )


# ---------- serialized int8 artifact (.npz) ----------
#
# One flat .npz holding the quantized tree, the per-kernel scales, and the
# (f32) batch statistics — the on-disk serving artifact, ~4× smaller than
# the f32 checkpoint and loadable without the training stack.

_Q, _S, _B = "q::", "s::", "b::"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_key(path)] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_quantized_checkpoint(path: str, params, batch_stats=None) -> None:
    """Quantize ``params`` and write the int8 serving artifact to ``path``
    (.npz). Batch statistics stay f32 (they are tiny and fold into BN)."""
    quantized, scales = quantize_params_int8(params)
    arrays = {_Q + k: v for k, v in _flatten(quantized).items()}
    arrays.update({_S + k: v for k, v in scales.items()})
    if batch_stats:
        arrays.update({_B + k: v for k, v in _flatten(batch_stats).items()})
    np.savez(path, **arrays)


def load_quantized_checkpoint(path: str):
    """Load an int8 artifact: returns ``(quantized, scales, batch_stats)``
    ready for :class:`~pointcloud_orientation_tpu.infer.OrientationPredictor`
    (pass ``pre_quantized=(quantized, scales)``) or for
    :func:`dequantize_params`."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    quantized = _unflatten(
        {k[len(_Q):]: v for k, v in arrays.items() if k.startswith(_Q)})
    scales = {k[len(_S):]: v for k, v in arrays.items() if k.startswith(_S)}
    stats_flat = {k[len(_B):]: v for k, v in arrays.items()
                  if k.startswith(_B)}
    batch_stats = _unflatten(stats_flat) if stats_flat else None
    return quantized, scales, batch_stats
