"""Training from a pre-rotated reference-layout tree with stored sidecar GT
(the reference's own data path), end to end through the offline tools."""

import numpy as np
import pytest

from pointcloud_orientation_tpu.data import OrientationDataset, offline, write_ply
from pointcloud_orientation_tpu.train import Trainer, preset


@pytest.fixture
def reference_style_tree(tmp_path, rng):
    canonical = tmp_path / "canonical"
    for cls in ["chair", "bottle"]:
        d = canonical / cls
        d.mkdir(parents=True)
        for i in range(8):
            write_ply(
                rng.normal(size=(200, 3)).astype(np.float32), d / f"{cls}_{i}.ply"
            )
    rotated = tmp_path / "rotated"
    offline.rotate_tree(str(canonical), str(rotated), mode="yaw", seed=1)
    offline.generate_8dir_gt(str(rotated))
    offline.generate_single_peak_gt(str(rotated))
    return rotated


def test_load_sidecars(reference_style_tree):
    ds = OrientationDataset.from_ply_tree(
        str(reference_style_tree), num_points=128, load_sidecars=True
    )
    assert ds.targets is not None
    assert ds.targets["axes"].shape == (16, 3, 3)
    assert ds.targets["probs_8dir"].shape == (16, 8)
    np.testing.assert_allclose(ds.targets["probs_8dir"].sum(-1), 1.0, rtol=1e-4)
    # bottle is a symmetric class: kappa 0, uniform 8-dir
    bottle = ds.labels == ds.class_names.index("bottle")
    np.testing.assert_allclose(ds.targets["vm_kappa"][bottle], 0.0, atol=1e-6)
    np.testing.assert_allclose(ds.targets["probs_8dir"][bottle], 0.125, atol=1e-5)
    chair = ~bottle
    np.testing.assert_allclose(ds.targets["vm_kappa"][chair], 8.0, atol=1e-5)
    # targets survive class selection and splitting
    sub = ds.select_classes(["chair"])
    assert sub.targets["axes"].shape[0] == 8
    tr, va, te = ds.split()
    assert tr.targets is not None and tr.targets["axes"].shape[0] == len(tr)


def test_train_on_stored_gt(reference_style_tree):
    ds = OrientationDataset.from_ply_tree(
        str(reference_style_tree), num_points=128, load_sidecars=True
    )
    cfg = preset("vm_kl", classes=("chair", "bottle")).replace(
        num_points=128, batch_size=8, epochs=2, rotation_mode="none"
    )
    tr = Trainer(cfg, ds)
    hist = tr.fit(log_every=0)
    assert np.isfinite(hist["train"][0]) and np.isfinite(hist["val"][0])


def test_stored_gt_matches_synthesized(reference_style_tree):
    """The stored sidecar mu must equal the on-device mu synthesized from
    the stored forward axis — the two GT paths are consistent."""
    import jax.numpy as jnp

    from pointcloud_orientation_tpu.ops import forward_to_mu

    ds = OrientationDataset.from_ply_tree(
        str(reference_style_tree), num_points=64, load_sidecars=True
    )
    fwd = jnp.asarray(ds.targets["axes"][:, 2])
    np.testing.assert_allclose(
        np.asarray(forward_to_mu(fwd)), ds.targets["vm_mu"], atol=1e-5
    )
