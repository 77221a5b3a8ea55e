"""Objective functions vs independently-computed torch/NumPy references."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pointcloud_orientation_tpu import losses as L


def test_forward_mse(rng):
    pred = rng.normal(size=(8, 3)).astype(np.float32)
    tgt = rng.normal(size=(8, 3)).astype(np.float32)
    scalar, per = L.forward_mse_loss(jnp.asarray(pred), jnp.asarray(tgt))
    expect = F.mse_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).item()
    assert float(scalar) == pytest.approx(expect, rel=1e-5)
    assert per.shape == (8,)


def test_axes_orth_loss(rng):
    vy = rng.normal(size=(6, 3)).astype(np.float32)
    vz = rng.normal(size=(6, 3)).astype(np.float32)
    gy = rng.normal(size=(6, 3)).astype(np.float32)
    gz = rng.normal(size=(6, 3)).astype(np.float32)
    scalar, per = L.axes_orth_loss(*(jnp.asarray(a) for a in (vy, vz, gy, gz)), lam=0.1)
    # reference semantics: (MSE(vy,gy)+MSE(vz,gz))/2 + 0.1*mean((vy.vz)^2)
    t = lambda a: torch.from_numpy(a)
    pred_loss = (F.mse_loss(t(vy), t(gy)) + F.mse_loss(t(vz), t(gz))) / 2.0
    orth = ((t(vy) * t(vz)).sum(dim=1) ** 2).mean()
    expect = (pred_loss + 0.1 * orth).item()
    assert float(scalar) == pytest.approx(expect, rel=1e-5)


def test_softmax_mse_8dir(rng):
    logits = rng.normal(size=(5, 8)).astype(np.float32)
    probs = rng.dirichlet(np.ones(8), size=5).astype(np.float32)
    scalar, per = L.softmax_mse_8dir_loss(jnp.asarray(logits), jnp.asarray(probs))
    expect = F.mse_loss(
        torch.softmax(torch.from_numpy(logits), dim=1), torch.from_numpy(probs)
    ).item()
    assert float(scalar) == pytest.approx(expect, rel=1e-5)


def test_soft_label_kl_8dir(rng):
    logits = rng.normal(size=(5, 8)).astype(np.float32)
    probs = rng.dirichlet(np.ones(8), size=5).astype(np.float32)
    scalar, per = L.soft_label_kl_8dir(jnp.asarray(logits), jnp.asarray(probs))
    log_q = F.log_softmax(torch.from_numpy(logits), dim=1)
    expect_vec = -(torch.from_numpy(probs) * log_q).sum(dim=1)
    np.testing.assert_allclose(np.asarray(per), expect_vec.numpy(), rtol=1e-5)
    assert float(scalar) == pytest.approx(expect_vec.mean().item(), rel=1e-5)


def test_projected_probs_mse(rng):
    fwd = rng.normal(size=(4, 3)).astype(np.float32)
    probs = rng.dirichlet(np.ones(8), size=4).astype(np.float32)
    scalar, per = L.projected_probs_mse_loss(jnp.asarray(fwd), jnp.asarray(probs))
    assert np.isfinite(float(scalar)) and per.shape == (4,)


def test_single_peak_vm_kl_zero_for_match():
    mu = jnp.asarray([0.5, -1.0])
    kappa = jnp.asarray([8.0, 3.0])
    scalar, per = L.single_peak_vm_kl_loss(mu, kappa, mu, kappa)
    np.testing.assert_allclose(np.asarray(per), 0.0, atol=1e-5)


def test_nll_loss(rng):
    logp = np.log(rng.dirichlet(np.ones(10), size=6).astype(np.float32) + 1e-9)
    labels = rng.integers(0, 10, 6).astype(np.int32)
    scalar, per = L.nll_loss(jnp.asarray(logp), jnp.asarray(labels))
    expect = F.nll_loss(torch.from_numpy(logp), torch.from_numpy(labels).long()).item()
    assert float(scalar) == pytest.approx(expect, rel=1e-4)


def test_pointnet_cls_loss(rng):
    logp = np.log(rng.dirichlet(np.ones(4), size=3).astype(np.float32) + 1e-9)
    labels = rng.integers(0, 4, 3).astype(np.int32)
    trans = rng.normal(size=(3, 8, 8)).astype(np.float32)
    scalar, per = L.pointnet_cls_loss(
        jnp.asarray(logp), jnp.asarray(labels), jnp.asarray(trans)
    )
    # nll + 0.001 * mean ||T T^t - I||_F
    nll = F.nll_loss(torch.from_numpy(logp), torch.from_numpy(labels).long()).item()
    t = torch.from_numpy(trans)
    reg = torch.norm(
        torch.bmm(t, t.transpose(2, 1)) - torch.eye(8)[None], dim=(1, 2)
    ).mean().item()
    assert float(scalar) == pytest.approx(nll + 0.001 * reg, rel=1e-4)
