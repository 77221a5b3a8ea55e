"""Point transformer: full self-attention over the point set.

Parity: `models/point_transformer.py:4-20` — ``Linear(3 -> 64)``, a 6-layer
4-head torch ``TransformerEncoder`` (post-norm, ReLU, feed-forward 2048,
dropout 0.1 — torch defaults), mean pool, ``Linear(64 -> 3)``.

TPU notes: attention over N points is O(N^2) and compiles to batched MXU
matmuls via XLA's dot-general fusion. For large N the point axis can be
sharded over a mesh axis (sequence parallelism) — see
:mod:`pointcloud_orientation_tpu.parallel`, which annotates the ``(B, N, C)``
activations with a named sharding and lets XLA insert the K/V all-gathers
over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _flash_attention_fn(query, key, value, bias=None, mask=None,
                        broadcast_dropout=True, dropout_rng=None,
                        dropout_rate=0.0, deterministic=False, dtype=None,
                        precision=None, **_):
    """Drop-in ``attention_fn`` for flax MHA backed by the Pallas TPU
    blockwise (flash) kernel: the O(N^2) score tensor lives only in VMEM
    tiles, never in HBM. Same q/k/v/out parameter tree as the default
    backend, so checkpoints/torch imports are interchangeable.

    Differences from the default backend (opt-in fast path, documented):
    attention-probability dropout is not applied (flash has no prob-dropout;
    residual/FFN dropout still apply), and bias/mask are unsupported (the
    point transformer uses neither).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    assert bias is None and mask is None, "flash path supports no bias/mask"
    if dropout_rate > 0.0 and not deterministic:
        import warnings

        warnings.warn(
            "flash attention backend does not apply attention-probability "
            "dropout (rate %.3g ignored; residual/FFN dropout still apply) "
            "— regularization differs from the torch reference "
            "TransformerEncoderLayer" % dropout_rate,
            stacklevel=2,
        )
    d = query.shape[-1]
    compute = dtype or query.dtype
    q = jnp.swapaxes(query, 1, 2).astype(compute)  # (B, H, N, D)
    k = jnp.swapaxes(key, 1, 2).astype(compute)
    v = jnp.swapaxes(value, 1, 2).astype(compute)
    out = flash_attention(q, k, v, sm_scale=1.0 / (d ** 0.5))
    return jnp.swapaxes(out, 1, 2).astype(compute)  # (B, N, H, D)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with torch-default structure:

    ``x = LN1(x + drop(SelfAttn(x)))``;
    ``x = LN2(x + drop(W2 drop(relu(W1 x))))``.

    ``dtype`` is the computation dtype (params stay f32): bf16 halves the
    HBM traffic of the O(N^2) score/attention tensors — the single-chip
    long-context bottleneck (RESULTS.md).
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    attention_impl: str = "xla"  # "flash" = Pallas TPU blockwise attention

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        attn_kwargs = {}
        if self.attention_impl == "flash":
            attn_kwargs["attention_fn"] = _flash_attention_fn
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
            **attn_kwargs,
        )(x, x)
        x = nn.LayerNorm(dtype=self.dtype)(
            x + nn.Dropout(self.dropout)(attn, deterministic=not train)
        )
        h = nn.relu(nn.Dense(self.ffn_dim, dtype=self.dtype)(x))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        x = nn.LayerNorm(dtype=self.dtype)(
            x + nn.Dropout(self.dropout)(h, deterministic=not train)
        )
        return x


class PointTransformer(nn.Module):
    """Embed points, run ``depth`` encoder layers, mean-pool, regress 3-vector."""

    in_dim: int = 3
    embed_dim: int = 64
    num_heads: int = 4
    depth: int = 6
    ffn_dim: int = 2048
    dropout: float = 0.1
    remat: bool = False  # rematerialize each layer: O(depth) -> O(1)
    # activation memory for the backward pass, enabling very large N
    dtype: Optional[jnp.dtype] = None  # computation dtype (params f32)
    attention_impl: str = "xla"  # "flash" = Pallas blockwise (TPU only)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(x)  # (B, N, E)
        layer_cls = (
            nn.remat(TransformerEncoderLayer, static_argnums=(2,))
            if self.remat
            else TransformerEncoderLayer
        )
        for i in range(self.depth):
            # explicit names keep the param tree identical with/without remat
            h = layer_cls(
                self.embed_dim, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, attention_impl=self.attention_impl,
                name=f"TransformerEncoderLayer_{i}",
            )(h, train)
        h = jnp.mean(h.astype(jnp.float32), axis=1)  # (B, E)
        return nn.Dense(3)(h)
