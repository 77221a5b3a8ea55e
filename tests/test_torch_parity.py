"""Numerical parity against the PyTorch reference implementation.

Loads the reference models from /root/reference (skipped when absent),
randomizes their weights, imports the state_dict through the converter, and
checks both stacks produce the same outputs on the same input.

Sampling is made deterministic on both sides by patching ``torch.randperm``
to identity (the reference's random-centroid path) and leaving our model
without a sampling rng (the deterministic 'first' fallback) — the two then
select identical centroids.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not mounted"
)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

if REF not in sys.path:
    sys.path.insert(0, REF)

from pointcloud_orientation_tpu.models import (  # noqa: E402
    PointNetPP,
    PointNetPP8Dir,
    PointNetPPFwd,
    PointNetPPMvM,
    PointNetPPVonMises,
    PointNetPPXYZ,
    PointNetPPXYZSchmidt,
)
from pointcloud_orientation_tpu.models import (  # noqa: E402
    PointNet,
    SimplePointNet,
)
from pointcloud_orientation_tpu.utils import (  # noqa: E402
    import_pointnet_pp_state_dict,
    import_pointnet_state_dict,
)

B, N = 3, 256


@pytest.fixture
def cloud(rng):
    return rng.normal(size=(B, N, 3)).astype(np.float32)


@pytest.fixture(autouse=True)
def deterministic_sampling(monkeypatch):
    monkeypatch.setattr(torch, "randperm", lambda n, **kw: torch.arange(n))


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.01)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()
    return model


def _ours(model_cls, name, torch_model, x, **kw):
    params, stats = import_pointnet_pp_state_dict(torch_model.state_dict(), name)
    variables = {"params": params, "batch_stats": stats}
    return model_cls(**kw).apply(variables, jnp.asarray(x), train=False)


def test_pp8dir_parity(cloud):
    from models.pointnet_pp_8dir import PointNetPP8Dir as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        expect = tm(torch.from_numpy(cloud)).numpy()
    got = np.asarray(_ours(PointNetPP8Dir, "pointnet_pp_8dir", tm, cloud))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_pp_forward_parity(cloud):
    from models.pointnet_pp import PointNetPP as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        expect = tm(torch.from_numpy(cloud)).numpy()
    got = np.asarray(_ours(PointNetPP, "pointnet_pp", tm, cloud))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_von_mises_parity(cloud):
    from models.pointnet_pp_vonMises import PointNetPPVonMises as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        mu_t, kappa_t = tm(torch.from_numpy(cloud))
    mu_j, kappa_j = _ours(PointNetPPVonMises, "pointnet_pp_von_mises", tm, cloud)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kappa_j), kappa_t.numpy(), rtol=1e-3, atol=1e-4)


def test_xyz_schmidt_parity(cloud):
    from models.Pointnet_pp_xyz_Schedmit import PointNetPPXYZ_Schedmit as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        v2_t, v3_t = tm(torch.from_numpy(cloud))
    v2_j, v3_j = _ours(PointNetPPXYZSchmidt, "pointnet_pp_xyz_schmidt", tm, cloud)
    np.testing.assert_allclose(np.asarray(v2_j), v2_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v3_j), v3_t.numpy(), rtol=1e-3, atol=1e-4)


def test_xyz_parity(cloud):
    from models.Pointnet_pp_xyz import PointNetPPXYZ as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        v1_t, v2_t = tm(torch.from_numpy(cloud))
    v1_j, v2_j = _ours(PointNetPPXYZ, "pointnet_pp_xyz", tm, cloud)
    np.testing.assert_allclose(np.asarray(v1_j), v1_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2_j), v2_t.numpy(), rtol=1e-3, atol=1e-4)


def test_fwd_parity(cloud):
    from models.pointnet_pp_Fwd import PointNetPPFwd as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        expect = tm(torch.from_numpy(cloud)).numpy()
    got = np.asarray(_ours(PointNetPPFwd, "pointnet_pp_fwd", tm, cloud))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_pointnet_parity(cloud):
    from models.pointnet import PointNet as TorchModel

    tm = _randomize(TorchModel(feature_transform=True))
    with torch.no_grad():
        expect = tm(torch.from_numpy(cloud)).numpy()
    params, stats = import_pointnet_state_dict(tm.state_dict(), "pointnet")
    got = np.asarray(
        PointNet(feature_transform=True).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(cloud),
            train=False,
        )
    )
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def test_simple_pointnet_parity(cloud, tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_simple", os.path.join(REF, "simple_pointnet_train.py")
    )
    # the reference script runs main() at import only under __main__; safe
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tm = _randomize(mod.SimplePointNet())
    with torch.no_grad():
        expect = tm(torch.from_numpy(cloud)).numpy()
    params, stats = import_pointnet_state_dict(tm.state_dict(), "simple_pointnet")
    got = np.asarray(
        SimplePointNet().apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(cloud),
            train=False,
        )
    )
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def test_mvm_parity(cloud):
    from models.pointnet_pp_mvM import PointNetPPMvM as TorchModel

    tm = _randomize(TorchModel())
    with torch.no_grad():
        mu_t, kappa_t, w_t = tm(torch.from_numpy(cloud))
    mu_j, kappa_j, w_j = _ours(PointNetPPMvM, "pointnet_pp_mvm", tm, cloud)
    np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kappa_j), kappa_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-3, atol=1e-4)


def test_point_transformer_parity(cloud):
    """Maps torch nn.TransformerEncoder weights (in_proj qkv row thirds,
    head-major out_proj) onto the flax tree; eval-mode outputs must match.
    Ref: `models/point_transformer.py:4-20`."""
    from models.point_transformer import PointTransformer as TorchModel

    from pointcloud_orientation_tpu.models import PointTransformer
    from pointcloud_orientation_tpu.utils import (
        import_point_transformer_state_dict,
    )

    tm = _randomize(TorchModel(depth=6))
    with torch.no_grad():
        expect = tm(torch.from_numpy(cloud)).numpy()
    params, _ = import_point_transformer_state_dict(tm.state_dict())
    got = PointTransformer(depth=6).apply(
        {"params": params}, jnp.asarray(cloud), train=False
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Export: flax-trained weights load into the REFERENCE torch models
# ---------------------------------------------------------------------------

def _flax_init(model_cls, x, **kw):
    m = model_cls(**kw)
    variables = m.init(
        {"params": jax.random.PRNGKey(3), "sampling": jax.random.PRNGKey(4)},
        jnp.asarray(x), train=False,
    )
    return m, variables


@pytest.mark.parametrize(
    "flax_cls,name,torch_path,torch_cls",
    [
        (PointNetPP8Dir, "pointnet_pp_8dir",
         "models.pointnet_pp_8dir", "PointNetPP8Dir"),
        (PointNetPP, "pointnet_pp", "models.pointnet_pp", "PointNetPP"),
        (PointNetPPVonMises, "pointnet_pp_von_mises",
         "models.pointnet_pp_vonMises", "PointNetPPVonMises"),
        (PointNetPPMvM, "pointnet_pp_mvm",
         "models.pointnet_pp_mvM", "PointNetPPMvM"),
    ],
)
def test_export_loads_into_reference_model(cloud, flax_cls, name, torch_path,
                                           torch_cls):
    """export_pointnet_pp_state_dict produces a state_dict the ACTUAL
    reference torch model loads with strict=True, and the torch forward
    matches the flax forward — round-trip interchange in both directions."""
    import importlib

    from pointcloud_orientation_tpu.utils import (
        export_pointnet_pp_state_dict,
        to_torch_state_dict,
    )

    TorchModel = getattr(importlib.import_module(torch_path), torch_cls)
    fm, variables = _flax_init(flax_cls, cloud)
    sd = to_torch_state_dict(export_pointnet_pp_state_dict(
        variables["params"], variables.get("batch_stats"), name))
    tm = TorchModel()
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    ours = fm.apply(variables, jnp.asarray(cloud), train=False)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(cloud))
    if isinstance(ours, tuple):
        for a, b in zip(ours, theirs):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), rtol=1e-3, atol=1e-4)
    else:
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-4)


def test_export_import_roundtrip(cloud):
    """import(export(tree)) == tree exactly (bitwise) for the 8dir family."""
    from pointcloud_orientation_tpu.utils import (
        export_pointnet_pp_state_dict,
        import_pointnet_pp_state_dict,
    )

    _, variables = _flax_init(PointNetPP8Dir, cloud)
    sd = export_pointnet_pp_state_dict(
        variables["params"], variables.get("batch_stats"), "pointnet_pp_8dir")
    params, stats = import_pointnet_pp_state_dict(sd, "pointnet_pp_8dir")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["batch_stats"], stats)


def test_export_pointnet_family_loads_into_reference(cloud, tmp_path):
    """export_pointnet_state_dict: flax PointNet (with both T-Nets) and
    SimplePointNet weights load into the reference torch models with
    strict=True and match forwards."""
    import importlib.util

    from pointcloud_orientation_tpu.utils import (
        export_pointnet_state_dict,
        to_torch_state_dict,
    )

    # --- full PointNet with feature transform ---
    from models.pointnet import PointNet as TorchPointNet

    fm = PointNet(feature_transform=True)
    variables = fm.init(
        {"params": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        jnp.asarray(cloud), train=False,
    )
    sd = to_torch_state_dict(export_pointnet_state_dict(
        variables["params"], variables.get("batch_stats"), "pointnet"))
    tm = TorchPointNet(feature_transform=True)
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    ours = np.asarray(fm.apply(variables, jnp.asarray(cloud), train=False))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(cloud)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)

    # --- SimplePointNet (defined inside the reference train script) ---
    spec = importlib.util.spec_from_file_location(
        "ref_simple2", os.path.join(REF, "simple_pointnet_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fs = SimplePointNet()
    vs = fs.init({"params": jax.random.PRNGKey(7)}, jnp.asarray(cloud),
                 train=False)
    sd2 = to_torch_state_dict(export_pointnet_state_dict(
        vs["params"], vs.get("batch_stats"), "simple_pointnet"))
    ts = mod.SimplePointNet()
    ts.load_state_dict(sd2, strict=True)
    ts.eval()
    ours2 = np.asarray(fs.apply(vs, jnp.asarray(cloud), train=False))
    with torch.no_grad():
        theirs2 = ts(torch.from_numpy(cloud)).numpy()
    np.testing.assert_allclose(ours2, theirs2, rtol=2e-3, atol=2e-4)


def test_export_point_transformer_loads_into_reference(cloud):
    """export_point_transformer_state_dict: flax transformer weights load
    into the reference's torch PointTransformer (strict=True) and match
    forwards; also round-trips bitwise through the importer."""
    from models.point_transformer import PointTransformer as TorchModel

    from pointcloud_orientation_tpu.models import PointTransformer
    from pointcloud_orientation_tpu.utils import (
        import_point_transformer_state_dict,
    )
    from pointcloud_orientation_tpu.utils.torch_export import (
        export_point_transformer_state_dict,
    )

    fm = PointTransformer(depth=2)
    variables = fm.init({"params": jax.random.PRNGKey(9)},
                        jnp.asarray(cloud), train=False)
    sd_np = export_point_transformer_state_dict(variables["params"])
    tm = TorchModel(depth=2)
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd_np.items()},
        strict=True,
    )
    tm.eval()
    ours = np.asarray(fm.apply(variables, jnp.asarray(cloud), train=False))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(cloud)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    p2, _ = import_point_transformer_state_dict(sd_np)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], p2)
