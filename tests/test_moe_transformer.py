"""MoE point transformer (models/moe_transformer.py).

Pins: forward contract (out + layer-mean aux), the EP spec layout, that
expert-sharding the stacked FFN leaves over an 'expert' mesh axis leaves
outputs numerically identical (PartitionSpec + jit partitions the math
without changing it), and that a training step on mse + aux decreases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from pointcloud_orientation_tpu.models import (
    MoEPointTransformer,
    moe_ep_param_specs,
    shard_moe_params,
)
from pointcloud_orientation_tpu.parallel import make_mesh


def _model(**kw):
    return MoEPointTransformer(depth=2, embed_dim=16, num_heads=4,
                               ffn_dim=32, n_experts=4, dropout=0.0, **kw)


def _init(model, B=4, N=24):
    kx, kp, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, N, 3), jnp.float32)
    target = jax.random.normal(kt, (B, 3), jnp.float32)
    params = model.init({"params": kp}, x, train=False)["params"]
    return params, x, target


def test_forward_contract():
    model = _model()
    params, x, _ = _init(model)
    out, aux = model.apply({"params": params}, x, train=False)
    assert out.shape == (4, 3)
    assert aux.shape == () and np.isfinite(float(aux))
    # balanced-routing lower bound: aux >= 1 with equality at perfect balance
    assert float(aux) >= 1.0 - 1e-5


def test_ep_spec_layout():
    model = _model()
    params, _, _ = _init(model)
    specs = moe_ep_param_specs(params)
    layer = specs["MoETransformerEncoderLayer_0"]["MoEFeedForward_0"]
    assert layer["wi"] == P("expert") and layer["wo"] == P("expert")
    assert layer["bi"] == P("expert") and layer["bo"] == P("expert")
    assert layer["router"]["kernel"] == P()
    attn = specs["MoETransformerEncoderLayer_0"][
        "MultiHeadDotProductAttention_0"]
    assert attn["query"]["kernel"] == P()


def test_expert_sharded_forward_matches_unsharded():
    model = _model()
    params, x, _ = _init(model)
    out_ref, aux_ref = jax.jit(
        lambda p, x: model.apply({"params": p}, x, train=False))(params, x)

    for n_exp_chips in (2, 4):
        mesh = make_mesh(("expert",), (n_exp_chips,),
                         jax.devices()[:n_exp_chips])
        ep_params = shard_moe_params(params, mesh)
        out, aux = jax.jit(
            lambda p, x: model.apply({"params": p}, x, train=False)
        )(ep_params, jax.device_put(x, NamedSharding(mesh, P())))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   atol=2e-5)
        np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)
        # weights really are scattered 1/n per chip
        wi = ep_params["MoETransformerEncoderLayer_0"]["MoEFeedForward_0"]["wi"]
        assert {s.data.shape for s in wi.addressable_shards} == {
            (4 // n_exp_chips, 16, 32)}


def test_moe_train_step_decreases():
    model = _model()
    params, x, target = _init(model)
    tx = optax.adam(1e-3)

    @jax.jit
    def step(p, o, x, t):
        def loss_fn(p):
            out, aux = model.apply({"params": p}, x, train=False)
            return jnp.mean((out - t) ** 2) + 0.01 * aux

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    o = tx.init(params)
    p, o, l1 = step(params, o, x, target)
    for _ in range(4):
        p, o, l2 = step(p, o, x, target)
    assert np.isfinite(float(l1)) and float(l2) < float(l1)
