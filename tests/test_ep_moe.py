"""Expert parallelism (parallel/ep.py).

The dense MoEFeedForward is the numerical ground truth; the expert-sharded
path must match it exactly — values, aux loss, and gradients — since the
sharding only partitions the expert loop, never the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.parallel.ep import (
    MoEFeedForward,
    make_ep_apply,
    place_ep_params,
)


def _setup(n_experts=4):
    mod = MoEFeedForward(embed_dim=16, ffn_dim=32, n_experts=n_experts)
    kx, kp = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (4, 24, 16), jnp.float32)
    params = mod.init(kp, x)["params"]
    return mod, params, x


def test_dense_moe_routes_to_multiple_experts():
    mod, params, x = _setup()
    probs = jax.nn.softmax(
        x @ params["router"]["kernel"], axis=-1)
    used = np.unique(np.asarray(jnp.argmax(probs, axis=-1)))
    assert len(used) > 1  # routing is non-degenerate at init
    y, aux = mod.apply({"params": params}, x)
    assert y.shape == x.shape
    assert np.isfinite(float(aux)) and float(aux) >= 1.0  # >= 1 by Cauchy-Schwarz


@pytest.mark.parametrize("n_chips", [2, 4])
def test_ep_matches_dense(n_chips):
    mod, params, x = _setup()
    y_ref, aux_ref = mod.apply({"params": params}, x)
    mesh = make_mesh(("expert",), (n_chips,), jax.devices()[:n_chips])
    placed = place_ep_params(params, mesh)
    apply = make_ep_apply(mod, mesh)
    y, aux = apply(placed, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-6)


def test_ep_params_actually_sharded():
    mod, params, x = _setup()
    mesh = make_mesh(("expert",), (4,), jax.devices()[:4])
    placed = place_ep_params(params, mesh)
    assert {s.data.shape[0] for s in placed["wi"].addressable_shards} == {1}
    r = placed["router"]["kernel"]
    assert {s.data.shape for s in r.addressable_shards} == {r.shape}


def test_ep_train_step_matches_dense():
    """One SGD step on loss = MSE(pooled) + 0.01*aux through the EP path
    equals the dense step (TP/PP rationale: SGD keeps it linear in grads)."""
    mod, params, x = _setup()
    target = jax.random.normal(jax.random.PRNGKey(3), (4, 16), jnp.float32)
    tx = optax.sgd(0.1)

    def dense_loss(p):
        y, aux = mod.apply({"params": p}, x)
        return jnp.mean((jnp.mean(y, axis=1) - target) ** 2) + 0.01 * aux

    _, g = jax.value_and_grad(dense_loss)(params)
    ref = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, params, g)

    mesh = make_mesh(("expert",), (4,), jax.devices()[:4])
    placed = place_ep_params(params, mesh)
    apply = make_ep_apply(mod, mesh)

    @jax.jit
    def ep_step(p):
        def loss(p):
            y, aux = apply(p, x)
            return jnp.mean((jnp.mean(y, axis=1) - target) ** 2) + 0.01 * aux

        gr = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, gr)

    new = ep_step(placed)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
    # expert shards stay put through the step
    assert {s.data.shape[0] for s in new["wi"].addressable_shards} == {1}
