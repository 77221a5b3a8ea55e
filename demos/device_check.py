"""Device availability smoke check (the reference's `test.py:1-4`,
TPU-native edition).

    python demos/device_check.py
"""

import jax

print("backend:", jax.default_backend())
print("devices:", jax.devices())
print("device count:", jax.device_count())
