"""Multi-host helpers (``parallel/multihost.py``) on the virtual CPU mesh.

True multi-process can't run inside one pytest process; what CAN be pinned
is every piece of host-independent logic: hybrid-mesh construction and
axis layout, the single-process degeneration of the per-host batch
assembly (must equal a plain sharded device_put), the process-slice
arithmetic for arbitrary simulated process counts, and the bootstrap
being a safe no-op single-process.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pointcloud_orientation_tpu.parallel import (
    global_batch_from_local,
    initialize_multihost,
    make_hybrid_mesh,
    process_local_slice,
)


def test_initialize_is_noop_single_process(monkeypatch):
    # no coordinator hints in the environment => must not try to connect
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    initialize_multihost()  # must not raise nor block
    assert jax.process_count() == 1


def test_hybrid_mesh_single_slice_reduces_to_ici_mesh():
    mesh = make_hybrid_mesh(("data", "model"), ici_shape=(4, 2), dcn_shape=(1, 1))
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    assert sorted(d.id for d in mesh.devices.flat) == list(range(8))


def test_hybrid_mesh_absorbs_remainder():
    mesh = make_hybrid_mesh(("data", "model"), ici_shape=(-1, 2), dcn_shape=(1, 1))
    assert mesh.devices.shape == (4, 2)


def test_hybrid_mesh_rejects_bad_cover():
    with pytest.raises(ValueError):
        make_hybrid_mesh(("data",), ici_shape=(3,), dcn_shape=(1,))
    with pytest.raises(ValueError):
        make_hybrid_mesh(("data", "model"), ici_shape=(4,), dcn_shape=(1, 1))


@pytest.mark.parametrize("pc", [1, 2, 4, 8])
def test_process_local_slice_partitions_exactly(pc):
    covered = []
    for pi in range(pc):
        start, size = process_local_slice(64, process_index=pi, process_count=pc)
        assert size == 64 // pc
        covered.extend(range(start, start + size))
    assert covered == list(range(64))


def test_process_local_slice_rejects_ragged():
    with pytest.raises(ValueError):
        process_local_slice(10, process_index=0, process_count=4)


def test_global_batch_from_local_single_process_equals_device_put():
    mesh = make_hybrid_mesh(("data",), ici_shape=(8,), dcn_shape=(1,))
    batch = np.arange(16 * 5, dtype=np.float32).reshape(16, 5)
    arr = global_batch_from_local(mesh, batch, axis="data")
    assert arr.shape == (16, 5)
    assert arr.sharding == NamedSharding(mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(arr), batch)
    # and it is usable directly inside jit with the mesh sharding
    out = jax.jit(lambda x: jnp.sum(x, axis=1))(arr)
    np.testing.assert_allclose(np.asarray(out), batch.sum(1))
