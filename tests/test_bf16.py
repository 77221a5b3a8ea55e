"""Mixed-precision (bfloat16 trunk) option: numerics and training."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.data import OrientationDataset
from pointcloud_orientation_tpu.models import PointNetPP8Dir
from pointcloud_orientation_tpu.train import Trainer, preset


def test_bf16_outputs_close_to_f32():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 3))
    m32 = PointNetPP8Dir()
    mbf = PointNetPP8Dir(dtype=jnp.bfloat16)
    variables = m32.init(
        {"params": jax.random.PRNGKey(1), "sampling": jax.random.PRNGKey(2)},
        x, train=False,
    )
    o32 = m32.apply(variables, x, train=False)
    obf = mbf.apply(variables, x, train=False)  # params stay f32
    assert obf.dtype == jnp.float32  # heads/outputs remain f32
    assert float(jnp.max(jnp.abs(o32 - obf))) < 0.05


def test_bf16_training_runs():
    ds = OrientationDataset.synthetic(samples_per_class=8, num_points=256)
    cfg = preset("8dir_kl").replace(
        num_points=128, batch_size=8, epochs=1, compute_dtype="bfloat16"
    )
    tr = Trainer(cfg, ds)
    hist = tr.fit(epochs=1, log_every=0)
    assert np.isfinite(hist["train"][0])


def test_point_transformer_bf16_close_to_f32():
    """dtype=bfloat16 transformer (params f32) stays close to the f32 path
    and keeps f32 outputs — the long-context HBM-traffic option."""
    from pointcloud_orientation_tpu.models import PointTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
    m32 = PointTransformer(depth=2, ffn_dim=128)
    mbf = PointTransformer(depth=2, ffn_dim=128, dtype=jnp.bfloat16)
    variables = m32.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    o32 = m32.apply(variables, x, train=False)
    obf = mbf.apply(variables, x, train=False)
    assert obf.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(o32 - obf))) < 0.05

    def loss(p):
        return jnp.sum(mbf.apply({"params": p}, x, train=False) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(
        np.isfinite(np.asarray(v)).all() for v in jax.tree_util.tree_leaves(g)
    )
