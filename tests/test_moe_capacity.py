"""Capacity-factor (switch-style) MoE dispatch (parallel/ep.py).

The masked-dense form is the numerical ground truth. At
``capacity_factor >= n_experts`` no token can drop, so the capacity form
must match it (values, aux, gradients); below that, overflow tokens are
dropped with EXACTLY zero output (the residual carries them). The
expert-sharded capacity path must match the dense capacity path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.parallel.ep import (
    MoEFeedForward,
    _expert_compute,
    _expert_compute_capacity,
    expert_capacity,
    make_ep_apply,
    place_ep_params,
)


def _setup(dispatch="capacity", capacity_factor=1.25, n_experts=4):
    mod = MoEFeedForward(embed_dim=16, ffn_dim=32, n_experts=n_experts,
                         dispatch=dispatch, capacity_factor=capacity_factor)
    kx, kp = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (4, 24, 16), jnp.float32)
    params = mod.init(kp, x)["params"]
    return mod, params, x


def test_expert_capacity_rounding():
    assert expert_capacity(96, 4, 1.0) == 24
    assert expert_capacity(96, 4, 1.25) == 32  # ceil(30) -> 32 (8-multiple)
    # factor == K covers every token even if one expert takes them all
    assert expert_capacity(96, 4, 4.0) * 1 >= 96
    assert expert_capacity(1, 4, 1.0) == 8


def test_capacity_matches_masked_when_no_drop():
    mod_m, params, x = _setup(dispatch="masked")
    mod_c = mod_m.clone(dispatch="capacity", capacity_factor=4.0)
    y_m, aux_m = mod_m.apply({"params": params}, x)
    y_c, aux_c = mod_c.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_m), atol=1e-6)
    np.testing.assert_allclose(float(aux_c), float(aux_m), rtol=1e-6)


def test_capacity_grads_match_masked_when_no_drop():
    mod_m, params, x = _setup(dispatch="masked")
    mod_c = mod_m.clone(dispatch="capacity", capacity_factor=4.0)

    def loss(mod):
        def f(p, xx):
            y, aux = mod.apply({"params": p}, xx)
            return jnp.mean(y**2) + 0.01 * aux
        return f

    g_m, gx_m = jax.grad(loss(mod_m), argnums=(0, 1))(params, x)
    g_c, gx_c = jax.grad(loss(mod_c), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_m),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_m), atol=1e-6)


def test_capacity_drop_is_exact_zero():
    """All tokens routed to expert 0, capacity < T: the first C tokens (in
    flattened router order) match the dense compute, the rest are 0.0."""
    K, E, F, B, N = 4, 16, 32, 2, 12
    T = B * N
    k1, k2, k3, kx = jax.random.split(jax.random.PRNGKey(1), 4)
    wi = jax.random.normal(k1, (K, E, F)) * 0.1
    bi = jax.random.normal(k2, (K, F)) * 0.1
    wo = jax.random.normal(k3, (K, F, E)) * 0.1
    bo = jnp.zeros((K, E)).at[0].set(0.5)  # nonzero bias: drops must beat it
    x = jax.random.normal(kx, (B, N, E))
    assign = jnp.zeros((B, N), jnp.int32)

    cap = 8
    y = _expert_compute_capacity(x, assign, wi, bi, wo, bo, cap)
    onehot = jax.nn.one_hot(assign, K, dtype=x.dtype)
    y_full = _expert_compute(x, onehot, wi, bi, wo, bo)

    yf = np.asarray(y).reshape(T, E)
    ff = np.asarray(y_full).reshape(T, E)
    np.testing.assert_allclose(yf[:cap], ff[:cap], atol=1e-6)
    assert np.all(yf[cap:] == 0.0)  # dropped: exact zero, no bias leakage


def test_capacity_empty_expert_no_bias_leak():
    """An expert that receives zero tokens must contribute nothing, even
    with nonzero biases (empty slots feed the sentinel row both ways)."""
    K, E, F = 4, 16, 32
    wi = jnp.zeros((K, E, F))
    bi = jnp.ones((K, F))
    wo = jnp.zeros((K, F, E))
    bo = jnp.ones((K, E))
    x = jnp.zeros((1, 8, E))
    assign = jnp.zeros((1, 8), jnp.int32)  # experts 1..3 empty
    y = _expert_compute_capacity(x, assign, wi, bi, wo, bo, 16)
    # expert 0 output for its 8 tokens: relu(0+1) @ 0 + 1 = 1
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)


@pytest.mark.parametrize("n_chips", [2, 4])
def test_ep_capacity_matches_dense(n_chips):
    mod, params, x = _setup(dispatch="capacity", capacity_factor=1.25)
    y_ref, aux_ref = mod.apply({"params": params}, x)
    mesh = make_mesh(("expert",), (n_chips,), jax.devices()[:n_chips])
    placed = place_ep_params(params, mesh)
    apply = make_ep_apply(mod, mesh)
    y, aux = apply(placed, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-6)


def test_model_capacity_dispatch_runs_and_matches():
    from pointcloud_orientation_tpu.models import MoEPointTransformer

    kw = dict(embed_dim=16, num_heads=2, depth=2, ffn_dim=32, n_experts=4,
              dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
    m_m = MoEPointTransformer(**kw)
    variables = m_m.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    m_c = MoEPointTransformer(**kw, dispatch="capacity", capacity_factor=4.0)
    y_m, aux_m = m_m.apply(variables, x, train=False)
    y_c, aux_c = m_c.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_m), atol=1e-5)
    np.testing.assert_allclose(float(aux_c), float(aux_m), rtol=1e-6)
    # the production factor runs (drops allowed, output just differs)
    m_p = MoEPointTransformer(**kw, dispatch="capacity", capacity_factor=1.25)
    y_p, _ = m_p.apply(variables, x, train=False)
    assert np.all(np.isfinite(np.asarray(y_p)))
