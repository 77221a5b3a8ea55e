"""Serving API: bucketed batching, padding, decode paths."""

import jax
import numpy as np
import pytest

from pointcloud_orientation_tpu.infer import OrientationPredictor
from pointcloud_orientation_tpu.models import PointNetPP8Dir, PointNetPPFwd


def _make_predictor(model_name, model_cls, num_points=128, **kw):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, num_points, 3))
    variables = model_cls().init(
        {"params": jax.random.PRNGKey(1), "sampling": jax.random.PRNGKey(2)},
        x, train=False,
    )
    return OrientationPredictor(
        model_name,
        variables["params"],
        variables.get("batch_stats"),
        num_points=num_points,
        **kw,
    )


def test_predict_odd_batch_and_points(rng):
    p = _make_predictor("pointnet_pp_8dir", PointNetPP8Dir)
    clouds = rng.normal(size=(3, 200, 3)).astype(np.float32)  # N != num_points
    out = p(clouds)
    assert out.shape == (3, 8)
    fwd = p.forward_vectors(clouds)
    assert fwd.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(fwd, axis=-1), 1.0, rtol=1e-5)


def test_predict_small_points_padded(rng):
    p = _make_predictor("pointnet_pp_8dir", PointNetPP8Dir)
    clouds = rng.normal(size=(1, 130, 3)).astype(np.float32)  # < num_points
    out = p(clouds)
    assert out.shape == (1, 8)


def test_predict_chunks_large_batch(rng):
    p = _make_predictor("pointnet_pp_fwd", PointNetPPFwd, max_batch=4)
    clouds = rng.normal(size=(10, 128, 3)).astype(np.float32)
    fwd = p.forward_vectors(clouds)
    assert fwd.shape == (10, 3)


def test_padding_does_not_change_results(rng):
    p = _make_predictor("pointnet_pp_fwd", PointNetPPFwd, seed=7)
    clouds = rng.normal(size=(4, 128, 3)).astype(np.float32)
    full = np.asarray(p(clouds))
    p2 = _make_predictor("pointnet_pp_fwd", PointNetPPFwd, seed=7)
    # same first cloud served in a padded bucket of 1 -> identical row 0
    single = np.asarray(p2(clouds[:1]))
    np.testing.assert_allclose(single[0], full[0], atol=1e-5)


def test_export_pth_roundtrip_through_predictor(tmp_path):
    """save_torch_checkpoint -> OrientationPredictor.from_torch_checkpoint:
    a framework-trained model round-trips through a reference-style .pth
    into the serving path with identical outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloud_orientation_tpu.infer import OrientationPredictor
    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.utils import save_torch_checkpoint

    N = 256
    model = PointNetPP8Dir()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((2, N, 3), jnp.float32), train=False,
    )
    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(path, variables["params"],
                          variables.get("batch_stats"), "pointnet_pp_8dir")

    pred = OrientationPredictor.from_torch_checkpoint(
        path, "pointnet_pp_8dir", num_points=N)
    # reference predictor built directly from the original variables (same
    # serving rng seed) — outputs must match the .pth round trip exactly
    direct = OrientationPredictor(
        "pointnet_pp_8dir", variables["params"],
        variables.get("batch_stats"), num_points=N)
    clouds = np.random.default_rng(0).normal(size=(3, N, 3)).astype(np.float32)
    got = np.asarray(pred(clouds))
    expect = np.asarray(direct(clouds))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_mesh_sharded_serving_matches_single_device(rng):
    """mesh= shards each bucket over the data axis; results must match the
    unsharded predictor (weights replicated, pure DP inference)."""
    from pointcloud_orientation_tpu.parallel import make_mesh

    mesh = make_mesh(("data",), (8,))
    single = _make_predictor("pointnet_pp_8dir", PointNetPP8Dir, seed=7)
    sharded = _make_predictor(
        "pointnet_pp_8dir", PointNetPP8Dir, seed=7, mesh=mesh
    )
    clouds = rng.normal(size=(5, 128, 3)).astype(np.float32)  # pads to 8
    a = single(clouds)
    b = sharded(clouds)
    assert b.shape == a.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
    # sharded path also serves batches above the axis size
    big = rng.normal(size=(13, 128, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(single(big)), np.asarray(sharded(big)), rtol=2e-4, atol=2e-4
    )


def test_tta_views_validation():
    with pytest.raises(ValueError, match="tta_views"):
        _make_predictor("pointnet_pp_8dir", PointNetPP8Dir, tta_views=3)
    from pointcloud_orientation_tpu.models import PointNetPPCls

    # a classifier head has no yaw-equivariant output to derotate
    with pytest.raises(ValueError, match="equivariance|unsupported"):
        _make_predictor("pointnet_pp_cls", PointNetPPCls, tta_views=4)
    # vector and distribution heads accept any V >= 2 (no 45-deg restriction)
    _make_predictor("pointnet_pp_fwd", PointNetPPFwd, tta_views=3)
    from pointcloud_orientation_tpu.models import PointNetPPVonMises

    _make_predictor("pointnet_pp_von_mises", PointNetPPVonMises, tta_views=3)


def test_tta_matches_manual_view_average():
    """V=8 yaw-voting must equal the hand-computed unshift-average of the
    8 single-view predictions (deterministic 'first' sampling so the view
    stack and per-view calls run identical math)."""
    import functools

    import jax.numpy as jnp

    from pointcloud_orientation_tpu.ops.rotations import yaw_matrix

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    variables = PointNetPP8Dir(sampling="first").init(
        {"params": jax.random.PRNGKey(1)}, x, train=False)
    mk = functools.partial(
        OrientationPredictor, "pointnet_pp_8dir", variables["params"],
        variables.get("batch_stats"), num_points=64, sampling="first")
    p1, p8 = mk(), mk(tta_views=8)
    clouds = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 64, 3)), np.float32)

    views = []
    for k in range(8):
        rot = np.asarray(yaw_matrix(jnp.asarray(k * np.pi / 4)))
        view = clouds @ rot.T
        probs = np.asarray(jax.nn.softmax(jnp.asarray(p1(view)), axis=-1))
        views.append(np.roll(probs, k, axis=-1))
    manual = np.stack(views).mean(0)

    tta_probs = np.asarray(jax.nn.softmax(jnp.asarray(p8(clouds)), axis=-1))
    np.testing.assert_allclose(tta_probs, manual, atol=1e-5)
    np.testing.assert_allclose(tta_probs.sum(-1), 1.0, atol=1e-5)


def test_tta_vector_head_matches_manual_derotation():
    """Forward-vector heads TTA at any view count: predictions on rotated
    views, derotated (R^T v) and averaged, must match the predictor."""
    import functools

    import jax.numpy as jnp

    from pointcloud_orientation_tpu.models import PointNetPPFwd
    from pointcloud_orientation_tpu.ops.rotations import yaw_matrix

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    variables = PointNetPPFwd(sampling="first").init(
        {"params": jax.random.PRNGKey(1)}, x, train=False)
    mk = functools.partial(
        OrientationPredictor, "pointnet_pp_fwd", variables["params"],
        variables.get("batch_stats"), num_points=64, sampling="first")
    p1, p3 = mk(), mk(tta_views=3)  # any V works for vector heads
    clouds = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 64, 3)), np.float32)

    views = []
    for k in range(3):
        rot = np.asarray(yaw_matrix(jnp.asarray(k * 2 * np.pi / 3)))
        pred = np.asarray(p1(clouds @ rot.T))
        views.append(pred @ rot)  # R^T v  (row-vector form)
    manual = np.stack(views).mean(0)

    np.testing.assert_allclose(np.asarray(p3(clouds)), manual, atol=1e-5)


def test_tta_axes_tuple_head():
    """Two-head axes models TTA: each returned vector derotates."""
    from pointcloud_orientation_tpu.models import PointNetPPXYZ

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    variables = PointNetPPXYZ(sampling="first").init(
        {"params": jax.random.PRNGKey(1)}, x, train=False)
    p = OrientationPredictor(
        "pointnet_pp_xyz", variables["params"], variables.get("batch_stats"),
        num_points=64, sampling="first", tta_views=4)
    out = p(np.asarray(x, np.float32))
    assert isinstance(out, tuple) and len(out) == 2
    assert out[0].shape == (2, 3) and out[1].shape == (2, 3)


def test_tta_vm_head_matches_manual_moment_match():
    """von Mises TTA: per-view (mu, kappa) derotated by +theta and
    moment-matched must equal the predictor's combined output."""
    import functools

    import jax.numpy as jnp

    from pointcloud_orientation_tpu.models import PointNetPPVonMises
    from pointcloud_orientation_tpu.ops.rotations import yaw_matrix
    from pointcloud_orientation_tpu.ops.von_mises import (
        vm_mixture_moment_match,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    variables = PointNetPPVonMises(sampling="first").init(
        {"params": jax.random.PRNGKey(1)}, x, train=False)
    mk = functools.partial(
        OrientationPredictor, "pointnet_pp_von_mises", variables["params"],
        variables.get("batch_stats"), num_points=64, sampling="first")
    p1, p4 = mk(), mk(tta_views=4)
    clouds = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 64, 3)), np.float32)

    mus, kappas = [], []
    for k in range(4):
        theta = k * 2 * np.pi / 4
        rot = np.asarray(yaw_matrix(jnp.asarray(theta)))
        mu_v, kappa_v = p1(clouds @ rot.T)
        mus.append(np.asarray(mu_v) + theta)  # derotate: +theta
        kappas.append(np.asarray(kappa_v))
    mu_m, kappa_m = vm_mixture_moment_match(
        jnp.asarray(np.stack(mus)), jnp.asarray(np.stack(kappas)), axis=0)

    mu_t, kappa_t = p4(clouds)
    np.testing.assert_allclose(np.asarray(mu_t), np.asarray(mu_m), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kappa_t), np.asarray(kappa_m), atol=1e-4)
    assert np.all(np.abs(np.asarray(mu_t)) <= np.pi + 1e-6)


def test_tta_mvm_head_exact_mixture_average():
    """MvM TTA returns the exact averaged mixture: its grid density must
    equal the mean of the per-view derotated component densities."""
    import functools

    import jax.numpy as jnp

    from pointcloud_orientation_tpu.models import PointNetPPMvM
    from pointcloud_orientation_tpu.ops.rotations import yaw_matrix
    from pointcloud_orientation_tpu.ops.von_mises import (
        mixture_von_mises_pdf, wrap_angle,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
    variables = PointNetPPMvM(sampling="first").init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(5)},
        x, train=False)
    mk = functools.partial(
        OrientationPredictor, "pointnet_pp_mvm", variables["params"],
        variables.get("batch_stats"), num_points=64, sampling="first")
    p1, p3 = mk(), mk(tta_views=3)
    clouds = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 64, 3)), np.float32)

    grid = jnp.linspace(0.0, 2 * np.pi, 181)[:-1]
    densities = []
    for k in range(3):
        theta = k * 2 * np.pi / 3
        rot = np.asarray(yaw_matrix(jnp.asarray(theta)))
        mu_v, kappa_v, w_v = (jnp.asarray(np.asarray(o))
                              for o in p1(clouds @ rot.T))
        densities.append(mixture_von_mises_pdf(
            grid[None, :], wrap_angle(mu_v + theta), kappa_v, w_v))
    manual = jnp.stack(densities).mean(0)

    mu_t, kappa_t, w_t = (jnp.asarray(np.asarray(o)) for o in p3(clouds))
    assert mu_t.shape == (2, 3 * 4) and w_t.shape == (2, 3 * 4)
    np.testing.assert_allclose(
        float(jnp.sum(w_t, -1)[0]), 1.0, atol=1e-5)  # weights still sum to 1
    tta_density = mixture_von_mises_pdf(grid[None, :], mu_t, kappa_t, w_t)
    np.testing.assert_allclose(
        np.asarray(tta_density), np.asarray(manual), atol=1e-5)


def test_multi_output_models_rejected_at_construction():
    """`MULTI_OUTPUT_MODELS` members return (out, aux_loss) — the
    predictor's post-processing would silently mangle the tuple after a
    potentially minutes-long remote compile, so construction must fail
    fast with a clear redirect (r4 review finding)."""
    import pytest

    from pointcloud_orientation_tpu.infer import OrientationPredictor
    from pointcloud_orientation_tpu.models import (
        MODEL_REGISTRY, MULTI_OUTPUT_MODELS)

    assert MULTI_OUTPUT_MODELS <= set(MODEL_REGISTRY)
    for name in MULTI_OUTPUT_MODELS:
        with pytest.raises(ValueError, match="aux_loss"):
            OrientationPredictor(name, {})
