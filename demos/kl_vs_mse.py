"""Pedagogical comparison of MSE vs KL on probability distributions — the
runnable edition of the reference's `kl.ipynb`.

Shows why the 8-direction task uses a soft-label KL objective: MSE treats a
mass shift between adjacent and opposite compass bins the same, KL does not.

    python demos/kl_vs_mse.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pointcloud_orientation_tpu.losses import soft_label_kl_8dir


def main():
    target = jnp.asarray([[0.7, 0.3, 0, 0, 0, 0, 0, 0.0]])
    # two predictions with the SAME MSE to the target: mass moved to the
    # adjacent bin vs to the opposite bin
    adjacent = jnp.asarray([[0.5, 0.5, 0, 0, 0, 0, 0, 0.0]])
    opposite = jnp.asarray([[0.5, 0.3, 0, 0, 0.2, 0, 0, 0.0]])

    def mse(p):
        return float(jnp.mean((p - target) ** 2))

    def kl(p):
        # KL(P||Q) with the target as P (what the training objective uses,
        # modulo the constant entropy term)
        logits = jnp.log(jnp.maximum(p, 1e-9))
        _, per = soft_label_kl_8dir(logits, target)
        return float(per[0])

    print(f"{'prediction':<12} {'MSE':>10} {'CE=KL+H(P)':>12}")
    for name, p in [("adjacent", adjacent), ("opposite", opposite)]:
        print(f"{name:<12} {mse(p):>10.5f} {kl(p):>12.5f}")
    print("\nMSE barely distinguishes the two errors; the cross-entropy "
          "penalizes mass on bins the target gives zero probability.")


if __name__ == "__main__":
    main()
