"""PointNet++ classifier smoke demo — exercises true farthest-point sampling
and radius ball query (the reference demo's distinctive path,
`PointNet++Demo.py:249-279`).

    python demos/pointnet_pp_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointcloud_orientation_tpu.losses import nll_loss
from pointcloud_orientation_tpu.models import PointNetPPCls


def demo(batch=4, num_points=1024, num_classes=40, with_normals=True):
    model = PointNetPPCls(num_classes=num_classes)
    key = jax.random.PRNGKey(0)
    channels = 6 if with_normals else 3
    x = jax.random.normal(key, (batch, num_points, channels))
    labels = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, num_classes)

    rngs = {"params": key, "dropout": jax.random.PRNGKey(2),
            "sampling": jax.random.PRNGKey(3)}
    variables = model.init(rngs, x, train=False)
    log_probs = model.apply(
        variables, x, train=False, rngs={"sampling": jax.random.PRNGKey(4)}
    )
    loss, _ = nll_loss(log_probs, labels)
    print(f"input {x.shape} (FPS + radius ball-query SA) -> {log_probs.shape}")
    print(f"NLL (random weights): {float(loss):.4f}")


if __name__ == "__main__":
    demo()
