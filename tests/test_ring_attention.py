"""Ring attention vs full attention on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_orientation_tpu.parallel import make_mesh
from pointcloud_orientation_tpu.parallel.ring_attention import make_ring_attention


def full_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_attention_matches_full(sp):
    B, H, N, D = 8, 2, 64, 16  # B divisible by every data-axis size
    mesh = make_mesh(("data", "model"), (8 // sp, sp))
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)

    ring = jax.jit(make_ring_attention(mesh))
    got = np.asarray(ring(q, k, v))
    expect = np.asarray(full_attention(q, k, v))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_ring_attention_gradients_match():
    B, H, N, D = 1, 1, 32, 8
    mesh = make_mesh(("data", "model"), (1, 8))
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)

    ring = make_ring_attention(mesh)
    g_ring = jax.grad(lambda a, b, c: jnp.sum(ring(a, b, c) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(lambda a, b, c: jnp.sum(full_attention(a, b, c) ** 2), argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), rtol=5e-4, atol=5e-5)


def test_ring_attention_bf16_close_to_full():
    """compute_dtype=bf16 ring attention (f32 accumulation + f32 LSE merge)
    stays close to full f32 attention — the multi-chip long-context
    mixed-precision option."""
    B, H, N, D = 4, 2, 64, 16
    mesh = make_mesh(("data", "model"), (2, 4))
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, N, D), jnp.float32)

    ring = jax.jit(make_ring_attention(mesh, compute_dtype=jnp.bfloat16))
    got = np.asarray(ring(q, k, v))
    assert got.dtype == np.float32
    expect = np.asarray(full_attention(q, k, v))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)
