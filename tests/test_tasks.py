"""Task adapters: per-sample losses and angular-error decodes."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.train.config import TrainConfig
from pointcloud_orientation_tpu.train.tasks import TASKS

CFG = TrainConfig()


def _batch(**kw):
    base = {
        "axes": jnp.asarray(
            [[[-1, 0, 0], [0, 1, 0], [0, 0, -1.0]],
             [[0, 0, 1], [0, 1, 0], [-1, 0, 0.0]]]
        ),
        "forward": jnp.asarray([[0, 0, -1.0], [-1, 0, 0.0]]),
        "probs_8dir": jnp.asarray(
            [[1, 0, 0, 0, 0, 0, 0, 0.0], [0.125] * 8]
        ),
        "vm_mu": jnp.asarray([0.0, -math.pi / 2]),
        "vm_kappa": jnp.asarray([8.0, 0.0]),
        "mvm_mu": jnp.zeros((2, 4)),
        "mvm_kappa": jnp.asarray([[8.0, 0, 0, 0], [0.0, 0, 0, 0]]),
        "mvm_weight": jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
        "mvm_k": jnp.asarray([1, 1]),
        "labels": jnp.asarray([0, 1]),
    }
    base.update(kw)
    return base


def test_forward_mse_angular_decode():
    batch = _batch()
    outputs = batch["axes"][:, 2]  # perfect prediction
    ang = TASKS["forward_mse"].angular_error(outputs, batch, CFG)
    np.testing.assert_allclose(np.asarray(ang), 0.0, atol=1e-3)
    # orthogonal prediction -> 90 deg
    outputs = jnp.asarray([[1.0, 0, 0], [0, 0, 1.0]])
    ang = np.asarray(TASKS["forward_mse"].angular_error(outputs, batch, CFG))
    np.testing.assert_allclose(ang, 90.0, atol=1e-3)


def test_8dir_angular_uniform_is_nan():
    batch = _batch()
    logits = jnp.asarray([[10.0, 0, 0, 0, 0, 0, 0, 0], [0.0] * 8])
    ang = np.asarray(TASKS["8dir_kl"].angular_error(logits, batch, CFG))
    assert ang[0] == pytest.approx(0.0, abs=1e-3)  # forward bin == gt forward
    assert np.isnan(ang[1])  # uniform target -> undefined


def test_vm_angular_symmetric_is_nan():
    batch = _batch()
    outputs = (jnp.asarray([0.5, 0.0]), jnp.asarray([8.0, 8.0]))
    ang = np.asarray(TASKS["vm_kl"].angular_error(outputs, batch, CFG))
    assert ang[0] == pytest.approx(math.degrees(0.5), abs=1e-3)
    assert np.isnan(ang[1])  # kappa_gt = 0 (symmetric class)


def test_vm_angular_wraps():
    batch = _batch(vm_mu=jnp.asarray([math.pi - 0.1, 0.0]),
                   vm_kappa=jnp.asarray([8.0, 8.0]))
    outputs = (jnp.asarray([-math.pi + 0.1, 0.0]), jnp.asarray([8.0, 8.0]))
    ang = np.asarray(TASKS["vm_kl"].angular_error(outputs, batch, CFG))
    # wrapped distance is 0.2 rad, not ~2pi
    assert ang[0] == pytest.approx(math.degrees(0.2), abs=1e-2)


def test_mvm_angular_matched():
    batch = _batch()
    outputs = (
        jnp.asarray([[0.3, 0, 0, 0], [0.0] * 4]),
        jnp.asarray([[8.0, 1, 1, 1], [1.0] * 4]),
        jnp.asarray([[1.0, 0, 0, 0], [0.25] * 4]),
    )
    ang = np.asarray(TASKS["mvm"].angular_error(outputs, batch, CFG))
    assert ang[0] == pytest.approx(math.degrees(0.3), abs=1e-2)
    assert np.isnan(ang[1])  # kappa_gt all zero -> undefined


def test_axes_loss_and_angular():
    batch = _batch()
    vy, vz = batch["axes"][:, 1], batch["axes"][:, 2]
    per = np.asarray(TASKS["axes"].loss((vy, vz), batch, CFG))
    np.testing.assert_allclose(per, 0.0, atol=1e-6)
    ang = np.asarray(TASKS["axes"].angular_error((vy, vz), batch, CFG))
    np.testing.assert_allclose(ang, 0.0, atol=1e-3)
