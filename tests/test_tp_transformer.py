"""Tensor parallelism for the point transformer (parallel/tp.py).

TP is a capability the reference lacks entirely (it is single-device torch);
these tests pin the Megatron sharding layout and, most importantly, that a
TP(+DP) training step is numerically identical to the unsharded one — the
whole point of sharding via PartitionSpec + jit is that XLA partitions the
math without changing it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pointcloud_orientation_tpu.models import PointTransformer
from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.parallel.tp import (
    make_tp_train_step,
    shard_tp_params,
    tp_param_specs,
)


def _model():
    # dropout 0 so sharded/unsharded paths are bit-comparable; small dims,
    # but heads=4 / ffn=32 still divide a model axis of up to 4
    return PointTransformer(depth=2, embed_dim=16, num_heads=4, ffn_dim=32,
                            dropout=0.0)


def _init(model, B=4, N=24):
    kx, kp, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, N, 3), jnp.float32)
    target = jax.random.normal(kt, (B, 3), jnp.float32)
    params = model.init({"params": kp}, x, train=False)["params"]
    return params, x, target


def test_tp_param_specs_layout():
    model = _model()
    params, _, _ = _init(model)
    specs = tp_param_specs(params)
    layer = specs["TransformerEncoderLayer_0"]
    attn = layer["MultiHeadDotProductAttention_0"]
    assert attn["query"]["kernel"] == P(None, "model")
    assert attn["query"]["bias"] == P("model")
    assert attn["out"]["kernel"] == P("model")
    assert attn["out"]["bias"] == P()
    assert layer["Dense_0"]["kernel"] == P(None, "model")
    assert layer["Dense_0"]["bias"] == P("model")
    assert layer["Dense_1"]["kernel"] == P("model")
    assert layer["Dense_1"]["bias"] == P()
    # embed + head + layer norms stay replicated
    assert specs["Dense_0"]["kernel"] == P()
    assert specs["Dense_1"]["kernel"] == P()
    assert layer["LayerNorm_0"]["scale"] == P()


@pytest.mark.parametrize("shape", [(1, 4), (2, 2), (1, 2)])
def test_tp_train_step_matches_single_device(shape):
    # SGD, not Adam: Adam's first step is ~sign(g), which amplifies the
    # legitimate reduction-order float noise of the partitioned psums on
    # near-zero gradients into full ±lr flips; SGD keeps the comparison
    # linear in the gradients.
    n_data, n_model = shape
    model = _model()
    params, x, target = _init(model)
    tx = optax.sgd(0.1)

    # ---- unsharded baseline step ----
    @jax.jit
    def base_step(p, o, x, t):
        def loss_fn(p):
            out = model.apply({"params": p}, x, train=False)
            return jnp.mean((out - t) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, o_ref, loss_ref = base_step(params, tx.init(params), x, target)

    # ---- TP(+DP) step on the virtual mesh ----
    devs = jax.devices()[: n_data * n_model]
    mesh = make_mesh(("data", "model"), (n_data, n_model), devs)
    from jax.sharding import NamedSharding

    tp_params = shard_tp_params(params, mesh)
    tp_opt = tx.init(tp_params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(target, NamedSharding(mesh, P("data")))
    step = make_tp_train_step(model, tx, mesh)
    p_tp, o_tp, loss_tp = step(tp_params, tp_opt, xs, ts)

    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    for a, b in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_tp_params_actually_sharded():
    model = _model()
    params, x, target = _init(model)
    mesh = make_mesh(("data", "model"), (2, 4), jax.devices()[:8])
    tp_params = shard_tp_params(params, mesh)
    k = tp_params["TransformerEncoderLayer_0"]["Dense_0"]["kernel"]
    # (E, F) kernel split over F on 4 model chips -> per-shard F/4
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(16, 32 // 4)}
    out_k = tp_params["TransformerEncoderLayer_0"][
        "MultiHeadDotProductAttention_0"]["out"]["kernel"]
    shard_shapes = {s.data.shape for s in out_k.addressable_shards}
    assert shard_shapes == {(1, 4, 16)}  # (H/4, D, E)


def test_tp_second_step_and_finite():
    """Two chained TP steps keep shardings stable and losses finite
    (opt-state moments inherit the param shardings through tx.init)."""
    model = _model()
    params, x, target = _init(model)
    mesh = make_mesh(("data", "model"), (2, 2), jax.devices()[:4])
    from jax.sharding import NamedSharding

    tx = optax.adam(1e-3)
    tp_params = shard_tp_params(params, mesh)
    tp_opt = tx.init(tp_params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(target, NamedSharding(mesh, P("data")))
    step = make_tp_train_step(model, tx, mesh)
    p, o, l1 = step(tp_params, tp_opt, xs, ts)
    p, o, l2 = step(p, o, xs, ts)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)
    k = p["TransformerEncoderLayer_0"]["Dense_0"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {(16, 16)}


def test_tp_train_step_with_dropout_rng():
    """train=True runs dropout and requires an rng — previously this path
    crashed with flax's missing-'dropout'-rng error (review finding r3s4);
    now it trains, and omitting the rng raises a clear ValueError."""
    model = PointTransformer(depth=2, embed_dim=16, num_heads=4, ffn_dim=32,
                             dropout=0.1)
    params, x, target = _init(model)
    tx = optax.adam(1e-3)
    mesh = make_mesh(("data", "model"), (1, 2), jax.devices()[:2])
    tp_params = shard_tp_params(params, mesh)
    step = make_tp_train_step(model, tx, mesh, train=True)
    with pytest.raises(ValueError, match="rng"):
        step(tp_params, tx.init(tp_params), x, target)
    p, o, loss = step(tp_params, tx.init(tp_params), x, target,
                      rng=jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    # dropout actually fired: two different rngs give different losses
    _, _, loss2 = step(tp_params, tx.init(tp_params), x, target,
                       rng=jax.random.PRNGKey(8))
    assert float(loss) != float(loss2)
