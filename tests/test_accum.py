"""Gradient accumulation (train/accum.py).

Pins the exactness contract: for a mean loss on a batch-independent model
(LayerNorm point transformer), the gradients accumulated over n_micro
microbatches — and therefore the whole optimizer step — equal the
full-batch ones, while activation memory is that of one microbatch. Also
pins composition with an FSDP-sharded step on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pointcloud_orientation_tpu.models import PointTransformer
from pointcloud_orientation_tpu.parallel import make_mesh, shard_fsdp_params
from pointcloud_orientation_tpu.train.accum import (
    accumulated_value_and_grad,
    make_accum_train_step,
)


def _model():
    return PointTransformer(depth=2, embed_dim=16, num_heads=4, ffn_dim=32,
                            dropout=0.0)


def _init(model, B=8, N=24):
    kx, kp, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, N, 3), jnp.float32)
    target = jax.random.normal(kt, (B, 3), jnp.float32)
    params = model.init({"params": kp}, x, train=False)["params"]
    return params, x, target


def _loss_fn(model):
    def loss_fn(p, mb):
        x, t = mb
        out = model.apply({"params": p}, x, train=False)
        return jnp.mean((out - t) ** 2)

    return loss_fn


@pytest.mark.parametrize("n_micro", [1, 2, 4, 8])
def test_accumulated_grads_equal_full_batch(n_micro):
    model = _model()
    params, x, target = _init(model)
    loss_fn = _loss_fn(model)

    full_loss, full_g = jax.value_and_grad(loss_fn)(params, (x, target))
    acc_loss, acc_g = jax.jit(
        accumulated_value_and_grad(loss_fn, n_micro))(params, (x, target))

    np.testing.assert_allclose(float(acc_loss), float(full_loss), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(full_g),
                    jax.tree_util.tree_leaves(acc_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_accum_step_matches_full_batch_step():
    model = _model()
    params, x, target = _init(model)
    tx = optax.sgd(0.1)
    loss_fn = _loss_fn(model)

    @jax.jit
    def base_step(p, o, x, t):
        loss, grads = jax.value_and_grad(loss_fn)(p, (x, t))
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, _, loss_ref = base_step(params, tx.init(params), x, target)
    step = make_accum_train_step(model, tx, n_micro=4)
    p_acc, _, loss_acc = step(params, tx.init(params), x, target)

    np.testing.assert_allclose(float(loss_acc), float(loss_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_accum_rejects_indivisible_batch():
    model = _model()
    params, x, target = _init(model, B=6)
    vag = accumulated_value_and_grad(_loss_fn(model), 4)
    with pytest.raises(ValueError, match="not divisible"):
        vag(params, (x, target))


def test_accum_composes_with_fsdp_sharding():
    model = _model()
    params, x, target = _init(model)
    tx = optax.sgd(0.1)
    loss_fn = _loss_fn(model)

    full_loss, _ = jax.value_and_grad(loss_fn)(params, (x, target))

    mesh = make_mesh(("data",), (2,), jax.devices()[:2])
    fp = shard_fsdp_params(params, mesh, min_weight_size=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(target, NamedSharding(mesh, P("data")))
    step = make_accum_train_step(model, tx, n_micro=2)
    p, _, loss = step(fp, tx.init(fp), xs, ts)
    np.testing.assert_allclose(float(loss), float(full_loss), rtol=1e-5)
    # params keep their FSDP shardings through the accumulated step
    k = p["TransformerEncoderLayer_0"]["Dense_0"]["kernel"]
    assert {s.data.shape for s in k.addressable_shards} == {(16, 16)}
