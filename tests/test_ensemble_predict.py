"""Deep-ensemble serving (`OrientationPredictor(ensemble_size=S)`).

The reference has no ensemble path; every north-star envelope shows seed
variance as the dominant error term, which member averaging targets
directly. These tests pin the combine math exactly: member averaging uses
the SAME per-family rules as yaw-voting TTA (members are "views at angle
0"), so each case is checked against a hand-computed average of
single-member predictions.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.infer import OrientationPredictor


def _init(model_cls, key, n=64, **kw):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, n, 3))
    rngs = {"params": jax.random.PRNGKey(key)}
    if model_cls.__name__ == "PointNetPPMvM":
        rngs["dropout"] = jax.random.PRNGKey(key + 1000)
    return model_cls(sampling="first").init(rngs, x, train=False)


def _members(model_cls, keys, n=64):
    out = []
    for k in keys:
        v = _init(model_cls, k, n)
        out.append({"params": v["params"],
                    "batch_stats": v.get("batch_stats")})
    return out


def _clouds(b=2, n=64):
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (b, n, 3)), np.float32)


def test_ensemble_of_identical_members_is_neutral():
    """S copies of the same weights must reproduce the single model: the
    8-dir combine returns log-mean-probs (a per-row constant away from the
    raw logits), so compare in probability space."""
    from pointcloud_orientation_tpu.models import PointNetPP8Dir

    v = _init(PointNetPP8Dir, 1)
    member = {"params": v["params"], "batch_stats": v.get("batch_stats")}
    single = OrientationPredictor(
        "pointnet_pp_8dir", v["params"], v.get("batch_stats"),
        num_points=64, sampling="first")
    ens = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_8dir", [member] * 3, num_points=64, sampling="first")
    assert ens.ensemble_size == 3
    clouds = _clouds()
    p_single = np.asarray(jax.nn.softmax(jnp.asarray(single(clouds)), -1))
    p_ens = np.asarray(jax.nn.softmax(jnp.asarray(ens(clouds)), -1))
    np.testing.assert_allclose(p_ens, p_single, atol=1e-5)


def test_ensemble_vector_head_matches_manual_member_average():
    from pointcloud_orientation_tpu.models import PointNetPPFwd

    members = _members(PointNetPPFwd, [1, 2, 3])
    singles = [
        OrientationPredictor(
            "pointnet_pp_fwd", m["params"], m["batch_stats"],
            num_points=64, sampling="first")
        for m in members
    ]
    ens = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_fwd", members, num_points=64, sampling="first")
    clouds = _clouds()
    manual = np.stack([np.asarray(p(clouds)) for p in singles]).mean(0)
    np.testing.assert_allclose(np.asarray(ens(clouds)), manual, atol=1e-5)


def test_ensemble_8dir_matches_manual_prob_average():
    from pointcloud_orientation_tpu.models import PointNetPP8Dir

    members = _members(PointNetPP8Dir, [1, 2])
    singles = [
        OrientationPredictor(
            "pointnet_pp_8dir", m["params"], m["batch_stats"],
            num_points=64, sampling="first")
        for m in members
    ]
    ens = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_8dir", members, num_points=64, sampling="first")
    clouds = _clouds()
    manual = np.stack([
        np.asarray(jax.nn.softmax(jnp.asarray(p(clouds)), -1))
        for p in singles
    ]).mean(0)
    got = np.asarray(jax.nn.softmax(jnp.asarray(ens(clouds)), -1))
    np.testing.assert_allclose(got, manual, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_ensemble_vm_head_joint_moment_match():
    """vM ensemble = joint first-circular-moment fit over all members."""
    from pointcloud_orientation_tpu.models import PointNetPPVonMises
    from pointcloud_orientation_tpu.ops.von_mises import (
        vm_mixture_moment_match,
    )

    members = _members(PointNetPPVonMises, [1, 2, 3])
    singles = [
        OrientationPredictor(
            "pointnet_pp_von_mises", m["params"], m["batch_stats"],
            num_points=64, sampling="first")
        for m in members
    ]
    ens = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_von_mises", members, num_points=64, sampling="first")
    clouds = _clouds()
    mus, kappas = zip(*[
        (np.asarray(p(clouds)[0]), np.asarray(p(clouds)[1]))
        for p in singles
    ])
    mu_m, kappa_m = vm_mixture_moment_match(
        jnp.asarray(np.stack(mus)), jnp.asarray(np.stack(kappas)), axis=0)
    mu_e, kappa_e = ens(clouds)
    np.testing.assert_allclose(np.asarray(mu_e), np.asarray(mu_m), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kappa_e), np.asarray(kappa_m), atol=1e-4)


def test_ensemble_composes_with_tta_mvm_exact_mixture():
    """S=2 members x V=2 views: the MvM output is the exact S*V*K-component
    averaged mixture — its grid density equals the mean of the per-(member,
    view) derotated densities, and weights still sum to 1."""
    from pointcloud_orientation_tpu.models import PointNetPPMvM
    from pointcloud_orientation_tpu.ops.rotations import yaw_matrix
    from pointcloud_orientation_tpu.ops.von_mises import (
        mixture_von_mises_pdf, wrap_angle,
    )

    members = _members(PointNetPPMvM, [1, 2])
    singles = [
        OrientationPredictor(
            "pointnet_pp_mvm", m["params"], m["batch_stats"],
            num_points=64, sampling="first")
        for m in members
    ]
    ens = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_mvm", members, num_points=64, sampling="first",
        tta_views=2)
    clouds = _clouds()
    grid = jnp.linspace(0.0, 2 * np.pi, 181)[:-1]
    densities = []
    for p in singles:
        for k in range(2):
            theta = k * 2 * np.pi / 2
            rot = np.asarray(yaw_matrix(jnp.asarray(theta)))
            mu_v, kappa_v, w_v = (jnp.asarray(np.asarray(o))
                                  for o in p(clouds @ rot.T))
            densities.append(mixture_von_mises_pdf(
                grid[None, :], wrap_angle(mu_v + theta), kappa_v, w_v))
    manual = jnp.stack(densities).mean(0)

    mu_e, kappa_e, w_e = (jnp.asarray(np.asarray(o)) for o in ens(clouds))
    # S=2 members x V=2 views each contribute the head's K components
    K = mu_e.shape[-1] // (2 * 2)
    assert K == PointNetPPMvM.max_K  # reference head K=4
    assert mu_e.shape == (2, 2 * 2 * K) and w_e.shape == (2, 2 * 2 * K)
    np.testing.assert_allclose(np.asarray(w_e.sum(-1)), 1.0, atol=1e-5)
    got = mixture_von_mises_pdf(grid[None, :], mu_e, kappa_e, w_e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               atol=1e-5)


def test_ensemble_tuple_head_shapes():
    from pointcloud_orientation_tpu.models import PointNetPPXYZ

    members = _members(PointNetPPXYZ, [1, 2])
    ens = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_xyz", members, num_points=64, sampling="first")
    out = ens(_clouds())
    assert isinstance(out, tuple) and len(out) == 2
    assert out[0].shape == (2, 3) and out[1].shape == (2, 3)


def test_ensemble_validation():
    from pointcloud_orientation_tpu.models import PointNetPP8Dir
    from pointcloud_orientation_tpu.parallel import make_mesh

    # classifier logits have no defined ensemble average here (validation
    # fires before params are touched, so an empty tree suffices)
    with pytest.raises(ValueError, match="unsupported"):
        OrientationPredictor(
            "pointnet_pp_cls", {}, num_points=64, ensemble_size=2)
    v8 = _init(PointNetPP8Dir, 1)
    with pytest.raises(ValueError, match="quantization"):
        OrientationPredictor(
            "pointnet_pp_8dir", v8["params"], v8.get("batch_stats"),
            num_points=64, ensemble_size=2, quantize="int8")
    with pytest.raises(ValueError, match="mesh"):
        OrientationPredictor(
            "pointnet_pp_8dir", v8["params"], v8.get("batch_stats"),
            num_points=64, ensemble_size=2,
            mesh=make_mesh(("data",), (8,)))
    with pytest.raises(ValueError, match="at least one"):
        OrientationPredictor.from_seed_sweep("pointnet_pp_8dir", [])


def test_from_protocol_checkpoint_serves_sweep(tmp_path):
    """The vmapped multi-seed protocol's checkpoint carry (stacked best-val
    weights) serves directly as the ensemble: outputs must match
    from_seed_sweep over the sweep's returned per-seed weights, and a
    members= subset must match the single-member predictor."""
    from pointcloud_orientation_tpu.data import OrientationDataset
    from pointcloud_orientation_tpu.train import preset
    from pointcloud_orientation_tpu.train.multiseed import run_multi_seed

    cfg = preset("8dir_kl").replace(
        num_points=128, batch_size=8, classes=("chair", "bottle"),
        epochs=4, checkpoint_every=2)
    ds = OrientationDataset.synthetic(samples_per_class=10, num_points=160)
    ck = str(tmp_path / "ck")
    # the final block never checkpoints (a completed run returns its state),
    # so step_2 is the mid-run save; epochs 1-2 are bitwise identical to a
    # 2-epoch run (absolute-epoch PRNG streams) — that run's returned best
    # weights are the ground truth for what step_2 stored
    run_multi_seed(cfg, ds, seeds=[42, 43], log_every=0, checkpoint_dir=ck)
    res = run_multi_seed(cfg.replace(epochs=2, checkpoint_every=0), ds,
                         seeds=[42, 43], log_every=0, return_params=True)
    step = ck + "/step_2"
    ens_ck = OrientationPredictor.from_protocol_checkpoint(
        step, cfg.model, num_points=128, sampling="first")
    assert ens_ck.ensemble_size == 2
    ens_mem = OrientationPredictor.from_seed_sweep(
        cfg.model,
        [{"params": res[s]["params"], "batch_stats": res[s]["batch_stats"]}
         for s in (42, 43)],
        num_points=128, sampling="first")
    clouds = _clouds(n=128)
    np.testing.assert_allclose(
        np.asarray(ens_ck(clouds)), np.asarray(ens_mem(clouds)), atol=1e-5)

    # subset of one member == that member's plain predictor
    solo_ck = OrientationPredictor.from_protocol_checkpoint(
        step, cfg.model, members=[1], num_points=128, sampling="first")
    assert solo_ck.ensemble_size == 1
    solo = OrientationPredictor(
        cfg.model, res[43]["params"], res[43]["batch_stats"],
        num_points=128, sampling="first")
    np.testing.assert_allclose(
        np.asarray(solo_ck(clouds)), np.asarray(solo(clouds)), atol=1e-5)


def test_from_seed_sweep_single_member_equals_plain():
    from pointcloud_orientation_tpu.models import PointNetPPFwd

    v = _init(PointNetPPFwd, 1)
    plain = OrientationPredictor(
        "pointnet_pp_fwd", v["params"], v.get("batch_stats"),
        num_points=64, sampling="first")
    swept = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_fwd",
        [{"params": v["params"], "batch_stats": v.get("batch_stats")}],
        num_points=64, sampling="first")
    clouds = _clouds()
    np.testing.assert_allclose(
        np.asarray(swept(clouds)), np.asarray(plain(clouds)), atol=1e-5)


def _fake_protocol_ckpt(tmp_path, best_val, keys, with_history=True):
    """Hand-build a step_<E> dir with the protocol checkpoint's layout:
    stacked best-val weights in an Orbax carry + the history.json sidecar
    (`train/protocol_ckpt.py::save_protocol_checkpoint`)."""
    import json

    import orbax.checkpoint as ocp

    from pointcloud_orientation_tpu.models import PointNetPP8Dir

    S = len(best_val)
    members = _members(PointNetPP8Dir, list(range(S)))
    stack = lambda trees: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees)
    carry = {
        "best_params": stack([m["params"] for m in members]),
        "best_batch_stats": stack([m["batch_stats"] for m in members]),
        "best_val": np.asarray(best_val, np.float32),
    }
    step = tmp_path / "step_2"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(str(step / "carry"), carry, force=True)
    if with_history:
        payload = {"epoch": 2, "keys": [str(k) for k in keys],
                   "history": {str(k): {"val_loss": [1.0]} for k in keys}}
        (step / "history.json").write_text(json.dumps(payload))
    return str(step), members


def test_protocol_ckpt_rejects_label_keys(tmp_path):
    """ADVICE r4: the per-label protocol writes the identical step_<E>
    layout; pointing from_protocol_checkpoint at it must fail loudly (an
    'ensemble' of 40 per-class models is meaningless), with an explicit
    override flag."""
    step, _ = _fake_protocol_ckpt(
        tmp_path, best_val=[0.5, 0.7], keys=["chair", "bottle"])
    with pytest.raises(ValueError, match="per-LABEL"):
        OrientationPredictor.from_protocol_checkpoint(
            step, "pointnet_pp_8dir", num_points=64, sampling="first")
    ens = OrientationPredictor.from_protocol_checkpoint(
        step, "pointnet_pp_8dir", num_points=64, sampling="first",
        allow_label_keys=True)
    assert ens.ensemble_size == 2


def test_protocol_ckpt_excludes_diverged_members(tmp_path):
    """ADVICE r4: members whose validation never improved (best_val=inf,
    init-epoch weights in the slot) are excluded by default with a warning;
    an explicit members= selection overrides but still warns."""
    step, members = _fake_protocol_ckpt(
        tmp_path, best_val=[0.5, np.inf, 0.7], keys=[42, 43, 44])
    with pytest.warns(UserWarning, match=r"\[1\] have non-finite"):
        ens = OrientationPredictor.from_protocol_checkpoint(
            step, "pointnet_pp_8dir", num_points=64, sampling="first")
    assert ens.ensemble_size == 2
    ref = OrientationPredictor.from_seed_sweep(
        "pointnet_pp_8dir", [members[0], members[2]],
        num_points=64, sampling="first")
    clouds = _clouds()
    np.testing.assert_allclose(
        np.asarray(ens(clouds)), np.asarray(ref(clouds)), atol=1e-5)

    with pytest.warns(UserWarning, match="untrained init-epoch"):
        solo = OrientationPredictor.from_protocol_checkpoint(
            step, "pointnet_pp_8dir", members=[1],
            num_points=64, sampling="first")
    assert solo.ensemble_size == 1


def test_protocol_ckpt_all_diverged_raises(tmp_path):
    step, _ = _fake_protocol_ckpt(
        tmp_path, best_val=[np.inf, np.nan], keys=[42, 43])
    with pytest.raises(ValueError, match="no usable ensemble members"):
        OrientationPredictor.from_protocol_checkpoint(
            step, "pointnet_pp_8dir", num_points=64, sampling="first")
