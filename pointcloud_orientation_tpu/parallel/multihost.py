"""Multi-host (multi-process) scale-out: DCN×ICI meshes and per-host data.

The reference is strictly single-process/single-device (SURVEY.md §2.7).
On TPU pods, JAX runs one Python process per host, each seeing only its
local chips; scaling past one slice therefore needs three things the rest
of `parallel/` assumes away:

1. **runtime bootstrap** — :func:`initialize` wraps
   ``jax.distributed.initialize`` (coordinator discovery, no-op when
   single-process) so every entry point can call it unconditionally;
2. **topology-aware meshes** — :func:`make_hybrid_mesh` places mesh axes
   so collectives that need bandwidth (FSDP all-gathers, gradient
   reduce-scatters within a replica) ride ICI inside a slice while only
   the slow cross-slice hops (pure-DP gradient psum) cross DCN —
   the standard ordering from the scaling playbook: DCN axes outermost;
3. **per-host batches** — :func:`global_batch_from_local` assembles a
   globally-sharded batch array from each process's local shard
   (``jax.make_array_from_process_local_data``), and
   :func:`process_local_slice` gives the host its slice of the global
   batch so data loading is disjoint by construction.

Single-process (tests, the one-chip dev loop, the virtual CPU mesh) every
helper degenerates to the obvious local behavior, so the same training
script runs unmodified from 1 chip to a multi-slice pod.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Bootstrap the multi-process JAX runtime (idempotent).

    With no arguments, relies on the standard auto-detection environment
    (TPU pod metadata, or ``JAX_COORDINATOR_ADDRESS`` — the one coordinator
    env var jax itself reads; on clusters jax cannot auto-detect, pass
    ``num_processes``/``process_id`` EXPLICITLY as arguments). A no-op when
    the runtime is already initialized (here or by external code — checked
    via ``jax.distributed.is_initialized``) or when nothing indicates a
    multi-process launch — so entry points can call it unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    try:  # runtime may have been initialized by a launcher wrapper
        if jax.distributed.is_initialized():
            _INITIALIZED = True
            return
    except AttributeError:  # pragma: no cover - much older jax
        pass
    multiproc_hinted = (
        coordinator_address is not None
        # explicit process topology is as strong a hint as an address —
        # silently no-opping here would leave N hosts training as N
        # duplicate single-host jobs
        or num_processes is not None
        or process_id is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")  # TPU pod runtime env
    )
    if not multiproc_hinted:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _INITIALIZED = True


def make_hybrid_mesh(
    axis_names: Sequence[str],
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a DCN×ICI hybrid mesh with per-axis slice/cross-slice split.

    ``ici_shape[i] * dcn_shape[i]`` is the total size of ``axis_names[i]``.
    Axes with ``dcn_shape[i] > 1`` span slices (their collectives cross
    DCN); keep those to pure data parallelism and put model axes
    (tensor/sequence/expert) entirely in ``ici_shape``. One ICI entry may
    be ``-1`` to absorb the remaining per-slice devices.

    With every ``dcn_shape`` entry 1 (single slice / tests) this reduces to
    an ordinary ICI mesh over the local devices.
    """
    if len(axis_names) != len(ici_shape) or len(axis_names) != len(dcn_shape):
        raise ValueError(
            f"axis_names/ici_shape/dcn_shape lengths differ: "
            f"{len(axis_names)}/{len(ici_shape)}/{len(dcn_shape)}"
        )
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dcn = [int(d) for d in dcn_shape]
    ici = [int(s) for s in ici_shape]
    n_slices = int(np.prod(dcn))
    if -1 in ici:
        known = int(np.prod([s for s in ici if s != -1]))
        per_slice = n // n_slices
        ici[ici.index(-1)] = per_slice // known
    total = int(np.prod(ici)) * n_slices
    if total != n:
        raise ValueError(
            f"hybrid mesh ici={ici} x dcn={dcn} covers {total} devices, "
            f"have {n}"
        )
    if n_slices == 1:
        # topology-aware like make_mesh (multi-hop rings otherwise)
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                ici, devices=np.asarray(devices))
        except Exception:  # pragma: no cover - odd shapes/backends
            dev_array = np.asarray(devices).reshape(ici)
    else:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=devices
        )
    return Mesh(dev_array, tuple(axis_names))


def process_local_slice(
    global_batch: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """This host's ``(start, size)`` slice of a global batch.

    ``global_batch`` must divide evenly over processes — TPU-native data
    loading keeps shapes static; ragged hosts would force recompiles.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {pc} processes"
        )
    size = global_batch // pc
    return pi * size, size


def global_batch_from_local(
    mesh: Mesh, local_batch: np.ndarray, axis: str = "data"
) -> jax.Array:
    """Assemble the global batch-sharded array from per-process local data.

    Each process passes only its own rows (see :func:`process_local_slice`);
    the result is one global ``jax.Array`` sharded over ``axis`` whose
    global shape is ``(sum of local rows, *rest)``. Single-process this is
    exactly a sharded ``device_put`` of the whole batch.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)
