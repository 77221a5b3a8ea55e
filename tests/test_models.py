"""Shape/constraint tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.models import (
    PointNet,
    PointNetCls,
    PointNetPP,
    PointNetPP8Dir,
    PointNetPPCls,
    PointNetPPFwd,
    PointNetPPMvM,
    PointNetPPVonMises,
    PointNetPPXYZ,
    PointNetPPXYZSchmidt,
    PointTransformer,
    SimplePointNet,
)
from pointcloud_orientation_tpu.models.pointnet import feature_transform_regularizer

B, N = 4, 256


def _init_and_apply(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "sampling": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, train=False)
    apply_rngs = {"dropout": jax.random.PRNGKey(3), "sampling": jax.random.PRNGKey(4)}
    if train:
        out, _ = model.apply(
            variables, x, train=True, rngs=apply_rngs, mutable=["batch_stats"]
        )
    else:
        out = model.apply(variables, x, train=False, rngs=apply_rngs)
    return out, variables


@pytest.fixture(scope="module")
def cloud():
    return jax.random.normal(jax.random.PRNGKey(7), (B, N, 3))


def test_simple_pointnet(cloud):
    out, _ = _init_and_apply(SimplePointNet(), cloud)
    assert out.shape == (B, 3)


def test_pointnet(cloud):
    out, _ = _init_and_apply(PointNet(), cloud)
    assert out.shape == (B, 3)


def test_pointnet_cls(cloud):
    (logp, trans_feat), _ = _init_and_apply(PointNetCls(num_classes=40), cloud)
    assert logp.shape == (B, 40)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)
    assert trans_feat.shape == (B, 64, 64)
    reg = feature_transform_regularizer(trans_feat)
    assert np.isfinite(float(reg))


def test_pointnet_pp(cloud):
    out, _ = _init_and_apply(PointNetPP(), cloud)
    assert out.shape == (B, 3)


def test_pointnet_pp_train_mode_updates_bn(cloud):
    out, variables = _init_and_apply(PointNetPP(), cloud, train=True)
    assert out.shape == (B, 3)
    assert "batch_stats" in variables


def test_pointnet_pp_xyz(cloud):
    (v1, v2), _ = _init_and_apply(PointNetPPXYZ(), cloud)
    for v in (v1, v2):
        assert v.shape == (B, 3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-4)


def test_pointnet_pp_xyz_no_l2_norm_ablation(cloud):
    """normalize_heads=False reproduces the reference's without_l2_norm
    ablation: raw (non-unit) head outputs. Config plumbing via
    axes_normalize_heads is pinned too."""
    (v1, v2), _ = _init_and_apply(PointNetPPXYZ(normalize_heads=False), cloud)
    norms = np.linalg.norm(np.asarray(jnp.concatenate([v1, v2], 0)), axis=-1)
    assert np.abs(norms - 1.0).max() > 1e-3  # raw dense outputs, not unit

    from pointcloud_orientation_tpu.train import Trainer, preset
    from pointcloud_orientation_tpu.data import OrientationDataset

    cfg = preset("axes_all_labels").replace(
        classes=("chair",), per_label=False, num_points=256,
        axes_normalize_heads=False, axes_gram_schmidt=True,
    )
    ds = OrientationDataset.synthetic(
        samples_per_class=8, num_points=256, class_names=["chair"]
    )
    model = Trainer(cfg, ds).model
    assert model.normalize_heads is False and model.gram_schmidt is True


def test_pointnet_pp_xyz_schmidt_orthogonal(cloud):
    (v2, v3), _ = _init_and_apply(PointNetPPXYZSchmidt(gram_schmidt=True), cloud)
    dots = np.sum(np.asarray(v2) * np.asarray(v3), axis=-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)


def test_pointnet_pp_8dir(cloud):
    logits, _ = _init_and_apply(PointNetPP8Dir(), cloud)
    assert logits.shape == (B, 8)


def test_pointnet_pp_fwd_unit(cloud):
    v, _ = _init_and_apply(PointNetPPFwd(), cloud)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-4)


def test_pointnet_pp_von_mises(cloud):
    (mu, kappa), _ = _init_and_apply(PointNetPPVonMises(), cloud)
    assert mu.shape == (B,) and kappa.shape == (B,)
    assert np.all(np.abs(np.asarray(mu)) <= np.pi)
    assert np.all(np.asarray(kappa) >= 0)


def test_pointnet_pp_mvm(cloud):
    (mu, kappa, w), variables = _init_and_apply(PointNetPPMvM(), cloud)
    assert mu.shape == (B, 4) and kappa.shape == (B, 4) and w.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    assert np.all(np.asarray(kappa) > 0) and np.all(np.asarray(kappa) <= 80.0)
    assert np.all(np.abs(np.asarray(mu)) <= np.pi)
    # zero-init heads -> uniform weights and mu = 0 at init
    np.testing.assert_allclose(np.asarray(w), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu), 0.0, atol=1e-6)


def test_pointnet_pp_cls_with_normals():
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 128, 6))
    logp, _ = _init_and_apply(PointNetPPCls(num_classes=40), x)
    assert logp.shape == (2, 40)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)


def test_point_transformer(cloud):
    model = PointTransformer(depth=2, ffn_dim=128)
    out, _ = _init_and_apply(model, cloud)
    assert out.shape == (B, 3)


def test_sampling_rng_changes_output(cloud):
    model = PointNetPP()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        cloud,
        train=False,
    )
    a = model.apply(variables, cloud, train=False, rngs={"sampling": jax.random.PRNGKey(5)})
    b = model.apply(variables, cloud, train=False, rngs={"sampling": jax.random.PRNGKey(6)})
    c = model.apply(variables, cloud, train=False, rngs={"sampling": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c))


def test_no_sampling_rng_is_deterministic(cloud):
    model = PointNetPP()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        cloud,
        train=False,
    )
    a = model.apply(variables, cloud, train=False)
    b = model.apply(variables, cloud, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_point_transformer_remat_matches(cloud):
    base = PointTransformer(depth=2, ffn_dim=64)
    rem = PointTransformer(depth=2, ffn_dim=64, remat=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, cloud, train=False)
    a = base.apply(variables, cloud, train=False)
    b = rem.apply(variables, cloud, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # gradients flow through the remat layers
    def loss(p):
        return jnp.sum(rem.apply({"params": p}, cloud, train=False) ** 2)
    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_von_mises_atan2_parameterization(cloud):
    model = PointNetPPVonMises(mu_parameterization="atan2")
    (mu, kappa), _ = _init_and_apply(model, cloud)
    assert mu.shape == (B,) and kappa.shape == (B,)
    assert np.all(np.abs(np.asarray(mu)) <= np.pi + 1e-6)
    assert np.all(np.asarray(kappa) >= 0)
    # gradients finite through the atan2 head
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        cloud, train=False,
    )
    def loss(p):
        m, k = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                           cloud, train=False)
        return jnp.sum(m ** 2) + jnp.sum(k)
    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_mvm_robustness_knobs(rng):
    """weight_floor bounds every mixture weight below by f/K and mu_init=
    'spread' breaks the all-components-equal zero-init symmetry (the
    bistable-collapse mitigations; defaults keep exact reference parity)."""
    import numpy as np

    from pointcloud_orientation_tpu.models import PointNetPPMvM

    x = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    m = PointNetPPMvM(weight_floor=0.1, mu_init="spread")
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    mu, kappa, w = m.apply(v, x)
    assert float(jnp.min(w)) >= 0.1 / 4 - 1e-6
    np.testing.assert_allclose(
        np.asarray(mu[0]),
        [0.0, np.pi / 2, np.pi, -np.pi / 2],
        atol=1e-5,
    )
    # default = parity: all components at the degenerate-fallback angle 0
    m0 = PointNetPPMvM()
    v0 = m0.init({"params": jax.random.PRNGKey(0)}, x)
    mu0, _, _ = m0.apply(v0, x)
    np.testing.assert_array_equal(np.asarray(mu0), 0.0)
