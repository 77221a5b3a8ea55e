"""Device mesh construction and sharding helpers.

The reference has no distributed training at all (SURVEY.md §2.7); this
module supplies the TPU-native replacement: a ``jax.sharding.Mesh`` with a
``data`` axis (data parallelism over the batch dimension) and an optional
``model`` axis (sequence parallelism over the point axis for the
transformer, reserved for tensor parallelism). Everything runs through
``jax.jit`` with ``NamedSharding`` annotations — XLA inserts the gradient
``psum`` and any K/V ``all_gather`` over ICI; there is no hand-written
communication.

Works identically on real TPU slices and on the host-device-count-N virtual
CPU mesh used by the tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    With one axis, all devices go to it. With several, ``axis_sizes`` fixes
    the shape (one entry may be -1 to absorb the remainder).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        if len(axis_names) == 1:
            axis_sizes = (n,)
        else:
            axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    sizes = list(axis_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")
    # Topology-aware placement when using ALL devices: on a real multi-chip
    # slice, a naive enumeration-order reshape can make logically-adjacent
    # mesh neighbors physically non-adjacent, turning ppermute rings and
    # collectives into multi-hop ICI routes. mesh_utils consults the
    # physical coordinates; fall back to reshape for explicit device
    # subsets or backends it cannot handle (virtual CPU meshes are
    # topology-free, so the fallback is lossless there).
    if len(devices) == len(jax.devices()):
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                sizes, devices=np.asarray(devices))
            return Mesh(dev_array, tuple(axis_names))
        except Exception:  # pragma: no cover - odd shapes/backends
            pass
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place every array in a batch pytree with its leading dim sharded over
    ``axis`` (the DP equivalent of the reference's single-device
    ``.to(device)``, `train.py:178`)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_axis_size(mesh: Optional[Mesh], axis: str = "data") -> int:
    if mesh is None:
        return 1
    return mesh.shape[axis]
