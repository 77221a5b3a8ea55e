"""Explicit-SPMD ring-attention transformer vs the plain single-device path:
forward values, losses, and one full optimizer step must match."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.parallel.sp_transformer import (
    RingPointTransformer,
    make_sp_train_step,
)

B, N, E = 4, 32, 16


@pytest.fixture(scope="module")
def setup():
    model_plain = RingPointTransformer(
        embed_dim=E, num_heads=2, depth=2, ffn_dim=32, axis_name=None
    )
    model_ring = RingPointTransformer(
        embed_dim=E, num_heads=2, depth=2, ffn_dim=32, axis_name="model"
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    target = jax.random.normal(jax.random.PRNGKey(1), (B, 3), jnp.float32)
    params = model_plain.init({"params": jax.random.PRNGKey(2)}, x)["params"]
    return model_plain, model_ring, x, target, params


def test_forward_matches(setup):
    model_plain, model_ring, x, target, params = setup
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ref = model_plain.apply({"params": params}, x)

    mesh = make_mesh(("data", "model"), (2, 4))
    fwd = jax.jit(
        shard_map(
            lambda p, a: model_ring.apply({"params": p}, a),
            mesh=mesh,
            in_specs=(P(), P("data", "model")),
            out_specs=P("data"),
        )
    )
    got = fwd(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_train_step_matches_single_device(setup):
    model_plain, model_ring, x, target, params = setup
    tx = optax.sgd(1e-2)

    # single-device reference step
    def loss_fn(p):
        out = model_plain.apply({"params": p}, x)
        return jnp.mean((out - target) ** 2)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, updates)

    mesh = make_mesh(("data", "model"), (2, 4))
    step = make_sp_train_step(model_ring, tx, mesh)
    params_sp, _, loss_sp = step(params, tx.init(params), x, target)

    assert float(loss_sp) == pytest.approx(float(loss_ref), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        params_sp,
        params_ref,
    )


def test_multiple_sp_steps_stay_finite(setup):
    model_plain, model_ring, x, target, params = setup
    tx = optax.adam(1e-3)
    mesh = make_mesh(("data", "model"), (1, 8))
    step = make_sp_train_step(model_ring, tx, mesh)
    opt = tx.init(params)
    losses = []
    p = params
    for _ in range(5):
        p, opt, loss = step(p, opt, x, target)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it optimizes
