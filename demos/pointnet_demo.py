"""PointNet classifier smoke demo on random tensors.

Parity with the reference's pedagogy layer (`PointNetDemo.py:176-208`):
build the 40-way classifier with feature transforms, run a forward + loss on
random clouds, print shapes and the loss.

    python demos/pointnet_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointcloud_orientation_tpu.losses import pointnet_cls_loss
from pointcloud_orientation_tpu.models import PointNetCls


def demo(batch=8, num_points=1024, num_classes=40):
    model = PointNetCls(num_classes=num_classes)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, num_points, 3))
    labels = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, num_classes)

    variables = model.init(
        {"params": key, "dropout": jax.random.PRNGKey(2)}, x, train=False
    )
    log_probs, trans_feat = model.apply(variables, x, train=False)
    loss, _ = pointnet_cls_loss(log_probs, labels, trans_feat)
    print(f"input {x.shape} -> log_probs {log_probs.shape}, "
          f"trans_feat {trans_feat.shape}")
    print(f"classification loss (random weights): {float(loss):.4f} "
          f"(~ln {num_classes} = {jnp.log(num_classes):.4f})")


if __name__ == "__main__":
    demo()
