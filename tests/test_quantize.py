"""Weight-only int8 serving quantization (utils/quantize.py + infer.py).

Pins: (a) which leaves get quantized and the ~4x parameter-byte shrink,
(b) dequantize round-trip error bounded by the per-channel step size,
(c) the serving contract — an int8 predictor's decoded forward vectors
deviate from the f32 predictor's by a small measured angle on realistic
clouds (weight-only quantization must not change predictions materially).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.infer import OrientationPredictor
from pointcloud_orientation_tpu.models import PointNetPP8Dir
from pointcloud_orientation_tpu.utils import (
    dequantize_params,
    param_bytes,
    quantize_params_int8,
)


def _init_8dir(num_points=256):
    model = PointNetPP8Dir()
    pts = jax.random.normal(
        jax.random.PRNGKey(0), (2, num_points, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "sampling": jax.random.PRNGKey(2)},
        pts, train=False)
    return variables["params"], variables.get("batch_stats")


def test_quantize_selects_kernels_and_shrinks():
    params, _ = _init_8dir()
    q, scales = quantize_params_int8(params)
    flat_q = jax.tree_util.tree_flatten_with_path(q)[0]
    n_int8 = 0
    for path, leaf in flat_q:
        keys = [str(getattr(p, "key", "")) for p in path]
        if keys[-1] == "kernel" and leaf.ndim >= 2:
            assert leaf.dtype == np.int8, keys
            n_int8 += 1
        else:
            assert leaf.dtype != np.int8, keys
    assert n_int8 == len(scales) > 0
    # kernels dominate this model's params -> close to 4x total shrink
    assert param_bytes(params) / param_bytes(q) > 3.0


def test_dequantize_error_within_step_size():
    params, _ = _init_8dir()
    q, scales = quantize_params_int8(params)
    deq = dequantize_params(
        jax.tree_util.tree_map(jnp.asarray, q),
        {k: jnp.asarray(v) for k, v in scales.items()})
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_d = dict(jax.tree_util.tree_flatten_with_path(deq)[0])
    checked = 0
    for path, leaf in flat_p:
        keys = [str(getattr(p, "key", "")) for p in path]
        if keys[-1] == "kernel" and np.asarray(leaf).ndim >= 2:
            d = np.asarray(flat_d[path])
            w = np.asarray(leaf)
            step = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)),
                          keepdims=True) / 127.0
            assert np.all(np.abs(d - w) <= step * 0.5 + 1e-8)
            checked += 1
    assert checked > 0


def test_quantized_checkpoint_roundtrip(tmp_path):
    from pointcloud_orientation_tpu.utils import (
        load_quantized_checkpoint,
        save_quantized_checkpoint,
    )

    params, stats = _init_8dir()
    path = str(tmp_path / "int8.npz")
    save_quantized_checkpoint(path, params, stats)

    q_ref, s_ref = quantize_params_int8(params)
    q, s, st = load_quantized_checkpoint(path)
    # bitwise round-trip of the quantized tree and scales
    ref_flat = dict(jax.tree_util.tree_flatten_with_path(q_ref)[0])
    for path_k, leaf in jax.tree_util.tree_flatten_with_path(q)[0]:
        np.testing.assert_array_equal(leaf, np.asarray(ref_flat[path_k]))
    assert set(s) == set(s_ref)
    for k in s:
        np.testing.assert_array_equal(s[k], s_ref[k])
    assert st is not None

    # artifact is ~4x smaller than the f32 params it came from
    import os
    assert os.path.getsize(path) < 0.35 * param_bytes(params)

    # serving from the artifact == serving from in-memory quantization
    ds = OrientationDataset.synthetic(samples_per_class=1, num_points=256)
    clouds = np.asarray(ds.points[:2], np.float32)
    p_mem = OrientationPredictor("pointnet_pp_8dir", params, stats,
                                 quantize="int8", num_points=256, seed=0)
    p_art = OrientationPredictor.from_quantized_checkpoint(
        path, "pointnet_pp_8dir", num_points=256, seed=0)
    np.testing.assert_allclose(
        p_mem.forward_vectors(clouds), p_art.forward_vectors(clouds),
        atol=1e-6)


def test_int8_predictor_matches_f32():
    # realistic (synthetic-tree) clouds, the flagship 8-dir head
    ds = OrientationDataset.synthetic(samples_per_class=2, num_points=256)
    clouds = np.asarray(ds.points[:8], np.float32)
    params, stats = _init_8dir()

    kw = dict(num_points=256, seed=0)
    p32 = OrientationPredictor("pointnet_pp_8dir", params, stats, **kw)
    p8 = OrientationPredictor("pointnet_pp_8dir", params, stats,
                              quantize="int8", **kw)

    # distribution-level agreement: per-direction probabilities within 1%
    probs32 = np.asarray(jax.nn.softmax(jnp.asarray(p32(clouds)), axis=-1))
    probs8 = np.asarray(jax.nn.softmax(jnp.asarray(p8(clouds)), axis=-1))
    assert float(np.abs(probs32 - probs8).max()) < 0.01

    # decoded forward vectors: an UNTRAINED head's near-uniform softmax is
    # the worst case (the prob-weighted direction sum is nearly zero, so
    # normalization amplifies tiny deltas); still low single-digit degrees
    f32 = p32.forward_vectors(clouds)
    i8 = p8.forward_vectors(clouds)
    cos = np.clip(np.sum(f32 * i8, axis=-1), -1.0, 1.0)
    max_deg = float(np.degrees(np.arccos(cos)).max())
    assert max_deg < 2.5, f"int8 deviates {max_deg:.3f} deg from f32"
