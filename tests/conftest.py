"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set the platform flags before anything imports jax, so multi-chip
sharding tests (the fake-backend trick the reference lacks, SURVEY.md §4)
run anywhere.
"""

import os

# Force CPU even when a TPU plugin platform is preset in the environment —
# the suite needs the 8-device virtual mesh and hermetic numerics.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PCOT_JAX_CACHE"] = "0"  # no persistent AOT cache for CPU tests
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The runtime environment may pre-import jax with a TPU plugin backend before
# conftest runs; force the config + reset backends so the suite really runs
# on the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb  # noqa: E402

    _xb._clear_backends()
except Exception:  # pragma: no cover - best effort
    pass
assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
