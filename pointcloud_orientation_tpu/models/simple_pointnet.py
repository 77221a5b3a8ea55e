"""The small PointNet-style baseline from the reference's simplest script."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SimplePointNet(nn.Module):
    """Pointwise MLP 3 -> 64 -> 128 -> 256 (+BN+ReLU), global max-pool, then
    fc 256 -> 128 (+BN+ReLU+dropout 0.3) -> 3 raw forward vector.

    Parity: ``SimplePointNet`` in `simple_pointnet_train.py:86-113`. Takes
    ``(B, N, 3)``; torch's channel-first Conv1d layout is irrelevant here —
    the pointwise convs are dense layers over the feature axis.
    """

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def _bn():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name,
            )

        for ch in (64, 128, 256):
            x = nn.relu(_bn()(nn.Dense(ch)(x)))
        x = jnp.max(x, axis=1)  # (B, 256)
        x = nn.relu(_bn()(nn.Dense(128)(x)))
        x = nn.Dropout(0.3)(x, deterministic=not train)
        return nn.Dense(3)(x)
