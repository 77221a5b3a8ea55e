"""StableHLO serving artifacts (``utils/stablehlo_export.py``).

The artifact must be self-contained (weights baked in), numerically equal
to the live model in eval mode, survive serialize -> deserialize, and
carry the requested multi-platform lowerings.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.models import MODEL_REGISTRY
from pointcloud_orientation_tpu.utils.stablehlo_export import (
    export_orientation_model,
    load_artifact,
    main as export_main,
    save_artifact,
)

B, N = 2, 256


@pytest.fixture(scope="module")
def model_and_vars():
    model = MODEL_REGISTRY["pointnet_pp_8dir"]()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, 3), jnp.float32)
    variables = model.init({"params": key}, x, train=False)
    return model, variables, x


def test_exported_matches_direct_apply(model_and_vars):
    model, variables, x = model_and_vars
    exported = export_orientation_model(
        "pointnet_pp_8dir",
        variables["params"],
        variables.get("batch_stats"),
        batch_size=B,
        num_points=N,
        platforms=("cpu",),
    )
    direct = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(exported.call(x)), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_serialize_roundtrip_and_platforms(model_and_vars, tmp_path):
    model, variables, x = model_and_vars
    exported = export_orientation_model(
        "pointnet_pp_8dir",
        variables["params"],
        variables.get("batch_stats"),
        batch_size=B,
        num_points=N,
        platforms=("cpu", "tpu"),
    )
    assert exported.platforms == ("cpu", "tpu")
    path = str(tmp_path / "model.stablehlo")
    save_artifact(path, exported)
    assert os.path.getsize(path) > 0
    restored = load_artifact(path)
    assert restored.platforms == ("cpu", "tpu")
    direct = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(restored.call(x)), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_deterministic_without_sampling_rng(model_and_vars):
    """No 'sampling' collection => deterministic fallback => identical calls."""
    _, variables, x = model_and_vars
    exported = export_orientation_model(
        "pointnet_pp_8dir",
        variables["params"],
        variables.get("batch_stats"),
        batch_size=B,
        num_points=N,
        platforms=("cpu",),
    )
    a = np.asarray(exported.call(x))
    b = np.asarray(exported.call(x))
    np.testing.assert_array_equal(a, b)


def test_shape_polymorphic_batch(model_and_vars, tmp_path):
    """batch_size=None => one artifact serves any batch size."""
    model, variables, x = model_and_vars
    exported = export_orientation_model(
        "pointnet_pp_8dir",
        variables["params"],
        variables.get("batch_stats"),
        batch_size=None,
        num_points=N,
        platforms=("cpu",),
    )
    path = str(tmp_path / "poly.stablehlo")
    save_artifact(path, exported)
    restored = load_artifact(path)
    for b in (1, 2, 5):
        xb = jax.random.normal(jax.random.PRNGKey(b), (b, N, 3), jnp.float32)
        direct = model.apply(variables, xb, train=False)
        np.testing.assert_allclose(
            np.asarray(restored.call(xb)), np.asarray(direct),
            rtol=1e-5, atol=1e-5,
        )


def test_cli_from_orbax_checkpoint(model_and_vars, tmp_path):
    model, variables, x = model_and_vars
    import orbax.checkpoint as ocp

    ckpt_dir = str(tmp_path / "ckpt")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            ckpt_dir,
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
        )
    out = str(tmp_path / "cli.stablehlo")
    export_main(
        [
            ckpt_dir,
            out,
            "--model",
            "pointnet_pp_8dir",
            "--batch-size",
            str(B),
            "--num-points",
            str(N),
            "--platforms",
            "cpu",
        ]
    )
    restored = load_artifact(out)
    direct = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(restored.call(x)), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_export_under_approx_knn(model_and_vars):
    """PCOT_KNN=approx composes with export: jax.lax.approx_min_k lowers
    to the ApproxTopK custom call, which is on jax.export's
    guaranteed-stable list — the artifact stays multi-platform with no
    safety-check opt-out (unlike --pallas)."""
    from pointcloud_orientation_tpu.ops import set_knn_impl

    model, variables, x = model_and_vars
    set_knn_impl("approx", approx_min_n=1)  # N=256 must actually go approx
    try:
        exported = export_orientation_model(
            "pointnet_pp_8dir",
            variables["params"],
            variables.get("batch_stats"),
            batch_size=B,
            num_points=N,
        )
        assert exported.platforms == ("cpu", "tpu")
        assert np.asarray(exported.call(x)).shape == (B, 8)
    finally:
        set_knn_impl("exact", approx_min_n=4096)
