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
