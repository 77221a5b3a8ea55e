"""Classic PointNet with input/feature spatial transformer networks.

Parity: `models/pointnet.py:6-129` and the demo classifier
(`PointNetDemo.py:139-172`). All modules take feature-last ``(B, N, C)``
tensors; the T-Net transforms are batched matmuls on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(train: bool, axis_name: Optional[str] = None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, axis_name=axis_name
    )


class STN3d(nn.Module):
    """Input transform net: predicts a 3x3 matrix (identity-residual).

    Parity: `models/pointnet.py:6-34`.
    """

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, N, C)
        h = x
        for ch in (64, 128, 1024):
            h = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(ch)(h)))
        h = jnp.max(h, axis=1)  # (B, 1024)
        for ch in (512, 256):
            h = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(ch)(h)))
        h = nn.Dense(9)(h)
        iden = jnp.eye(3, dtype=h.dtype).reshape(1, 9)
        return (h + iden).reshape(-1, 3, 3)


class STNkd(nn.Module):
    """Feature transform net: predicts a k x k matrix (identity-residual).

    Parity: `models/pointnet.py:36-65`.
    """

    k: int = 64
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        for ch in (64, 128, 1024):
            h = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(ch)(h)))
        h = jnp.max(h, axis=1)
        for ch in (512, 256):
            h = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(ch)(h)))
        h = nn.Dense(self.k * self.k)(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(1, self.k * self.k)
        return (h + iden).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """PointNet global-feature encoder with optional feature transform.

    Input ``(B, N, C)`` with C = 3 or 6 (extra channels pass around the input
    transform untouched). Returns ``(feat, trans, trans_feat)``.
    Parity: `models/pointnet.py:67-109`.
    """

    global_feat: bool = True
    feature_transform: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        B, N, C = x.shape
        trans = STN3d(bn_axis_name=self.bn_axis_name)(x, train=train)
        xyz = x[..., :3]
        xyz = jnp.einsum(
            "bnc,bcd->bnd", xyz, trans, precision=jax.lax.Precision.HIGHEST
        )
        if C > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz

        x = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(64)(x)))
        if self.feature_transform:
            trans_feat = STNkd(k=64, bn_axis_name=self.bn_axis_name)(x, train=train)
            x = jnp.einsum(
                "bnc,bcd->bnd", x, trans_feat, precision=jax.lax.Precision.HIGHEST
            )
        else:
            trans_feat = None
        point_feat = x
        x = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(128)(x)))
        x = _bn(train, self.bn_axis_name)(nn.Dense(1024)(x))
        x = jnp.max(x, axis=1)  # (B, 1024)
        if self.global_feat:
            return x, trans, trans_feat
        expanded = jnp.broadcast_to(x[:, None, :], (B, N, 1024))
        return jnp.concatenate([expanded, point_feat], axis=-1), trans, trans_feat


class PointNet(nn.Module):
    """Full PointNet regression model: encoder + fc head to a 3-vector.

    Parity: `models/pointnet.py:111-129` (dropout 0.4 between fc2 and bn2).
    """

    feature_transform: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feat, trans, trans_feat = PointNetEncoder(
            global_feat=True,
            feature_transform=self.feature_transform,
            bn_axis_name=self.bn_axis_name,
        )(x, train=train)
        h = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(512)(feat)))
        h = nn.Dense(256)(h)
        h = nn.Dropout(0.4)(h, deterministic=not train)
        h = nn.relu(_bn(train, self.bn_axis_name)(h))
        return nn.Dense(3)(h)


class PointNetCls(nn.Module):
    """PointNet ModelNet40 classifier with feature-transform regularization.

    Returns ``(log_probs, trans_feat)``. Parity: ``get_model`` in
    `PointNetDemo.py:139-161`.
    """

    num_classes: int = 40
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        feat, trans, trans_feat = PointNetEncoder(
            global_feat=True, feature_transform=True, bn_axis_name=self.bn_axis_name
        )(x, train=train)
        h = nn.relu(_bn(train, self.bn_axis_name)(nn.Dense(512)(feat)))
        h = nn.Dense(256)(h)
        h = nn.Dropout(0.4)(h, deterministic=not train)
        h = nn.relu(_bn(train, self.bn_axis_name)(h))
        logits = nn.Dense(self.num_classes)(h)
        return nn.log_softmax(logits, axis=-1), trans_feat


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """``mean ||T T^t - I||_F`` penalty for the feature transform.

    Parity: ``feature_transform_reguliarzer`` in `PointNetDemo.py:131-137`.
    """
    k = trans.shape[-1]
    eye = jnp.eye(k, dtype=trans.dtype)[None]
    prod = jnp.einsum(
        "bij,bkj->bik", trans, trans, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.mean(jnp.linalg.norm(prod - eye, axis=(1, 2)))
