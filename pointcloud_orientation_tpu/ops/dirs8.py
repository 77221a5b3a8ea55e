"""8-direction compass basis and projections.

Eight horizontal unit vectors at 45-degree steps, clockwise from the canonical
forward ``[0, 0, -1]``. Parity: ``DIRS_8`` in
`models/pointnet_pp_8dir.py:46-55` (duplicated at `models/pointnet_pp_Fwd.py:69-74`
and `data_process/2d_8dir_sample.py:8-17`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_S = 0.70710678
DIRS_8 = jnp.asarray(
    [
        [0.0, 0.0, -1.0],  # 0    (forward)
        [_S, 0.0, -_S],    # 45
        [1.0, 0.0, 0.0],   # 90
        [_S, 0.0, _S],     # 135
        [0.0, 0.0, 1.0],   # 180
        [-_S, 0.0, _S],    # 225
        [-1.0, 0.0, 0.0],  # 270
        [-_S, 0.0, -_S],   # 315
    ],
    dtype=jnp.float32,
)


def forward_to_8dir_probs(forward: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Project forward vectors ``(..., 3)`` to 8-direction probabilities.

    normalize -> dot with the 8 basis directions -> clamp at 0 -> renormalize;
    an all-zero response falls back to the uniform distribution. Parity with
    the GT synthesis (`data_process/2d_8dir_sample.py:29-39`) and the training
    projection ``target_probs`` (`train_8dir.py:26-29`).
    """
    v = forward / (jnp.linalg.norm(forward, axis=-1, keepdims=True) + eps)
    sims = jnp.matmul(v, DIRS_8.T, precision=jax.lax.Precision.HIGHEST)  # (..., 8)
    sims = jnp.maximum(sims, 0.0)
    total = jnp.sum(sims, axis=-1, keepdims=True)
    uniform = jnp.full_like(sims, 0.125)
    return jnp.where(total > 0, sims / jnp.where(total > 0, total, 1.0), uniform)
