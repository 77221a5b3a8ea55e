"""Pipeline parallelism for the point transformer (parallel/pp.py).

GPipe-style depth staging is a capability the reference lacks entirely;
these tests pin that the ppermute microbatch pipeline is numerically
identical to the plain sequential model — forward AND through a full
training step (the backward pipeline is AD-derived, so this is the test
that matters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloud_orientation_tpu.models import PointTransformer
from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.parallel.pp import (
    make_pp_apply,
    make_pp_train_step,
    place_pipeline_state,
    split_pipeline_params,
)

DEPTH = 4


def _model():
    return PointTransformer(depth=DEPTH, embed_dim=16, num_heads=4,
                            ffn_dim=32, dropout=0.0)


def _init(model, B=8, N=24):
    kx, kp, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, N, 3), jnp.float32)
    target = jax.random.normal(kt, (B, 3), jnp.float32)
    params = model.init({"params": kp}, x, train=False)["params"]
    return params, x, target


def _placed(params, n_stages):
    mesh = make_mesh(("stage",), (n_stages,), jax.devices()[:n_stages])
    stacked, rest = split_pipeline_params(params, DEPTH)
    stacked, rest = place_pipeline_state(stacked, rest, mesh)
    return mesh, stacked, rest


def test_split_roundtrips_layer_order():
    model = _model()
    params, _, _ = _init(model)
    stacked, rest = split_pipeline_params(params, DEPTH)
    k = stacked["MultiHeadDotProductAttention_0"]["query"]["kernel"]
    assert k.shape[0] == DEPTH
    for i in range(DEPTH):
        ref = params[f"TransformerEncoderLayer_{i}"][
            "MultiHeadDotProductAttention_0"]["query"]["kernel"]
        np.testing.assert_array_equal(np.asarray(k[i]), np.asarray(ref))
    assert set(rest) == {"Dense_0", "Dense_1"}


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (2, 2)])
def test_pp_forward_matches_sequential(stages, microbatches):
    model = _model()
    params, x, _ = _init(model)
    ref = model.apply({"params": params}, x, train=False)
    mesh, stacked, rest = _placed(params, stages)
    apply = make_pp_apply(model, mesh, microbatches=microbatches)
    out = apply(stacked, rest, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 4), (4, 8)])
def test_pp_train_step_matches_single_device(stages, microbatches):
    # SGD so the comparison stays linear in the gradients (same rationale
    # as the TP test: Adam's first step amplifies reduction-order noise)
    model = _model()
    params, x, target = _init(model)
    tx = optax.sgd(0.1)

    def base_loss(p):
        out = model.apply({"params": p}, x, train=False)
        return jnp.mean((out - target) ** 2)

    loss_ref, g = jax.value_and_grad(base_loss)(params)
    new_ref = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, params, g)
    ns_ref, nr_ref = split_pipeline_params(new_ref, DEPTH)

    mesh, stacked, rest = _placed(params, stages)
    step = make_pp_train_step(model, tx, mesh, microbatches=microbatches)
    (new_s, new_r), _, loss = step(
        (stacked, rest), tx.init((stacked, rest)), x, target)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    for ref_leaf, got_leaf in zip(jax.tree_util.tree_leaves((ns_ref, nr_ref)),
                                  jax.tree_util.tree_leaves((new_s, new_r))):
        np.testing.assert_allclose(
            np.asarray(got_leaf), np.asarray(ref_leaf), atol=2e-6)


def test_pp_params_actually_sharded():
    model = _model()
    params, _, _ = _init(model)
    mesh, stacked, rest = _placed(params, 4)
    k = stacked["MultiHeadDotProductAttention_0"]["query"]["kernel"]
    # (depth, E, H, D) split over depth on 4 stages -> 1 layer per shard
    assert {s.data.shape[0] for s in k.addressable_shards} == {1}
    r = rest["Dense_0"]["kernel"]
    assert {s.data.shape for s in r.addressable_shards} == {r.shape}


def test_pp_composes_with_dp_on_2d_mesh():
    """DP×PP on a (data=2, stage=4) mesh: batch sharded over `data`, depth
    over `stage`; one SGD step equals the single-device step exactly (the
    cross-data grad reduction is inserted by the vma transpose, the 1/n by
    the pmean'd loss)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    model = _model()
    params, x, target = _init(model)
    tx = optax.sgd(0.1)

    def base_loss(p):
        out = model.apply({"params": p}, x, train=False)
        return jnp.mean((out - target) ** 2)

    loss_ref, g = jax.value_and_grad(base_loss)(params)
    new_ref = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, params, g)
    ns_ref, nr_ref = split_pipeline_params(new_ref, DEPTH)

    mesh = make_mesh(("data", "stage"), (2, 4), jax.devices()[:8])
    stacked, rest = split_pipeline_params(params, DEPTH)
    stacked = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("stage"))), stacked)
    rest = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), rest)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(target, NamedSharding(mesh, P("data")))
    step = make_pp_train_step(model, tx, mesh, microbatches=2,
                              data_axis="data")
    (new_s, new_r), _, loss = step(
        (stacked, rest), tx.init((stacked, rest)), xs, ts)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    for ref_leaf, got_leaf in zip(jax.tree_util.tree_leaves((ns_ref, nr_ref)),
                                  jax.tree_util.tree_leaves((new_s, new_r))):
        np.testing.assert_allclose(
            np.asarray(got_leaf), np.asarray(ref_leaf), atol=2e-6)


def test_pp_adam_steps_train():
    """Two chained Adam steps: loss decreases, shardings stay put (moments
    inherit the stacked params' stage sharding by propagation)."""
    model = _model()
    params, x, target = _init(model)
    mesh, stacked, rest = _placed(params, 2)
    tx = optax.adam(1e-2)
    step = make_pp_train_step(model, tx, mesh, microbatches=4)
    p2, opt = (stacked, rest), tx.init((stacked, rest))
    p2, opt, l1 = step(p2, opt, x, target)
    p2, opt, l2 = step(p2, opt, x, target)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)
    k = p2[0]["MultiHeadDotProductAttention_0"]["query"]["kernel"]
    assert {s.data.shape[0] for s in k.addressable_shards} == {DEPTH // 2}
