"""Expert parallelism: a mixture-of-experts FFN for the point transformer.

Completes the sharding portfolio (DP / SP / TP / PP / ring — see the other
modules in :mod:`pointcloud_orientation_tpu.parallel`): the transformer's
dense FFN is replaced by ``n_experts`` routed expert FFNs whose parameters
are stacked on a leading ``expert`` axis and sharded ``P('expert')`` — each
device owns ``n_experts / n_chips`` experts and computes only those; a
``psum`` over the ``expert`` axis combines the routed partial outputs.

Routing is top-1 softmax ("switch" routing) with the standard
load-balancing auxiliary loss (mean router prob × assignment fraction per
expert). Two dispatch formulations, selected by ``dispatch=``:

``"masked"`` (default) — every device runs its local experts over the FULL
token set and masks by the router's one-hot assignment. Be precise about
the cost: this is compute-redundant — each device spends
``n_experts / n_chips`` × the FLOPs of true routed dispatch, because
masked-out tokens are computed then zeroed — but it keeps static shapes
and MXU-shaped einsums with no gather/scatter.

``"capacity"`` — switch-style capacity-factor dispatch: each expert gets a
static buffer of ``C = ceil(T/K · capacity_factor)`` token slots (rounded
up to a lane multiple); tokens are placed by a cumsum-over-onehot position,
tokens past an expert's capacity are DROPPED (output zero — the standard
switch semantics; the transformer's residual connection carries them
through), and only ``K·C`` token-slots of FFN compute run instead of
``K·T``. At ``capacity_factor = n_experts`` no token can drop and the
result equals the masked form exactly. This removes the K× redundancy even
on a single chip; sharded, each device computes only its local experts'
slots and the partial outputs psum-combine as before (the compute fix; an
``all_to_all`` token exchange would additionally fix bandwidth in the LM
regime, where tokens are data-sharded rather than replicated).

Like TP/PP, this is a capability the torch reference does not have in any
form; it reproduces no reference lines. The dense path
(:class:`MoEFeedForward` without a mesh) is the numerical ground truth the
expert-parallel path is test-pinned against.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEFeedForward(nn.Module):
    """Top-1 routed MoE FFN: ``x (B, N, E) -> (y (B, N, E), aux_loss)``.

    Parameters are stacked per-expert — ``wi (n_experts, E, F)``,
    ``wo (n_experts, F, E)`` — so the same tree serves the dense path and
    the expert-sharded path (shard the leading axis ``P('expert')``).
    """

    embed_dim: int
    ffn_dim: int
    n_experts: int = 4
    dispatch: str = "masked"  # "masked" | "capacity"
    capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: jax.Array):
        E, F, K = self.embed_dim, self.ffn_dim, self.n_experts
        router = nn.Dense(K, name="router", use_bias=False)
        wi = self.param("wi", nn.initializers.lecun_normal(), (K, E, F))
        bi = self.param("bi", nn.initializers.zeros, (K, F))
        wo = self.param("wo", nn.initializers.lecun_normal(), (K, F, E))
        bo = self.param("bo", nn.initializers.zeros, (K, E))

        probs = jax.nn.softmax(router(x), axis=-1)  # (B, N, K)
        assign = jnp.argmax(probs, axis=-1)  # (B, N) top-1
        onehot = jax.nn.one_hot(assign, K, dtype=x.dtype)  # (B, N, K)
        gate = jnp.sum(probs * onehot, axis=-1)  # (B, N) chosen-expert prob

        # switch-style load-balance aux: K * mean(frac_tokens_e * mean_prob_e)
        frac = jnp.mean(onehot, axis=(0, 1))  # (K,)
        mean_prob = jnp.mean(probs, axis=(0, 1))  # (K,)
        aux = K * jnp.sum(frac * mean_prob)

        if self.dispatch == "capacity":
            cap = expert_capacity(x.shape[0] * x.shape[1], K,
                                  self.capacity_factor)
            y = _expert_compute_capacity(x, assign, wi, bi, wo, bo, cap)
        elif self.dispatch == "masked":
            y = _expert_compute(x, onehot, wi, bi, wo, bo)
        else:
            raise ValueError(f"unknown dispatch {self.dispatch!r}")
        return y * gate[..., None], aux


def _expert_compute(x, onehot, wi, bi, wo, bo):
    """Masked dense dispatch over the (possibly device-local) expert slice:
    h_e = relu(x @ wi_e + bi_e); y = Σ_e onehot_e · (h_e @ wo_e + bo_e)."""
    h = jnp.einsum("bne,kef->bnkf", x, wi) + bi  # (B, N, K, F)
    h = nn.relu(h)
    y = jnp.einsum("bnkf,kfe->bnke", h, wo) + bo  # (B, N, K, E)
    return jnp.einsum("bnke,bnk->bne", y, onehot)


def expert_capacity(n_tokens: int, n_experts: int,
                    capacity_factor: float) -> int:
    """Static per-expert slot count: ``ceil(T/K · factor)`` rounded up to a
    sublane multiple (8) so the (K, C, E) buffers tile cleanly. At
    ``factor >= n_experts`` this is ≥ T, so no token can ever drop."""
    cap = -(-n_tokens * capacity_factor // n_experts)  # ceil
    return int(-(-cap // 8) * 8)


def _expert_compute_capacity(x, assign, wi, bi, wo, bo, capacity,
                             first_expert=None, n_experts_global=None):
    """Switch-style gather dispatch: each of the (local) experts gets a
    static buffer of ``capacity`` token slots; tokens are placed in router
    order by a cumsum position and tokens past an expert's capacity are
    dropped (zero output — the caller's residual carries them).

    ``first_expert`` selects a contiguous local expert slice
    ``[first, first + wi.shape[0])`` out of the GLOBAL assignment — the
    shard_map path passes ``lax.axis_index * n_local``; ``None`` means the
    slice is the whole expert set. Positions are computed on the global
    one-hot, so slot layout is identical sharded and unsharded.

    FLOP accounting vs :func:`_expert_compute`: K·C token-slots of FFN work
    instead of K·T — at capacity_factor f that is f/K of the masked cost —
    plus O(T·K) integer cumsum and two (K·C, E) gather/scatters.
    """
    B, N, E = x.shape
    K_local = wi.shape[0]
    T = B * N
    xf = x.reshape(T, E)
    a = assign.reshape(T)

    # position of each token within its expert's buffer (global experts —
    # slot layout must be identical sharded and unsharded)
    onehot = jax.nn.one_hot(a, n_experts_global or K_local, dtype=jnp.int32)
    pos = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot, axis=-1)  # (T,)

    # slot -> token index map; sentinel row T marks empty/overflow slots.
    # Local experts are columns [first, first+K_local); tokens routed
    # elsewhere are clamped to an out-of-bounds row and dropped by mode.
    local_k = a if first_expert is None else a - first_expert
    local_k = jnp.where((local_k >= 0) & (local_k < K_local),
                        local_k, K_local)
    slot_tok = jnp.full((K_local, capacity), T, dtype=jnp.int32)
    slot_tok = slot_tok.at[local_k, pos].set(
        jnp.arange(T, dtype=jnp.int32), mode="drop")

    # gather -> per-expert FFN -> scatter-add; the sentinel row both feeds
    # zeros in and swallows the bias-only outputs of empty slots.
    x_pad = jnp.concatenate([xf, jnp.zeros((1, E), xf.dtype)], axis=0)
    xg = jnp.take(x_pad, slot_tok, axis=0)  # (K_local, C, E)
    h = nn.relu(jnp.einsum("kce,kef->kcf", xg, wi) + bi[:, None, :])
    yg = jnp.einsum("kcf,kfe->kce", h, wo) + bo[:, None, :]
    yf = jnp.zeros((T + 1, E), yg.dtype).at[slot_tok.reshape(-1)].add(
        yg.reshape(K_local * capacity, E))
    return yf[:T].reshape(B, N, E)


def make_ep_apply(module: MoEFeedForward, mesh: Mesh,
                  axis_name: str = "expert"):
    """Build ``apply(params, x) -> (y, aux)`` with experts sharded over
    ``axis_name``.

    ``params`` is the module's param dict with the stacked expert leaves
    (``wi/bi/wo/bo``) sharded ``P(axis_name)`` on their leading axis and the
    router replicated (:func:`place_ep_params`). Each device computes the
    router on the full token set (tiny), runs ONLY its local expert slice
    (honouring ``module.dispatch`` — the capacity form computes only that
    slice's C-slot buffers, the compute fix on top of the sharding), and
    the partial outputs psum-combine over the ``expert`` axis.
    """
    from jax import shard_map

    K = module.n_experts

    def local_apply(params, x):
        n_local = params["wi"].shape[0]
        first = lax.axis_index(axis_name) * n_local
        probs = jax.nn.softmax(
            x @ params["router"]["kernel"], axis=-1)  # (B, N, K) replicated
        assign = jnp.argmax(probs, axis=-1)
        onehot_full = jax.nn.one_hot(assign, K, dtype=x.dtype)
        gate = jnp.sum(probs * onehot_full, axis=-1)
        frac = jnp.mean(onehot_full, axis=(0, 1))
        aux = K * jnp.sum(frac * jnp.mean(probs, axis=(0, 1)))

        if module.dispatch == "capacity":
            cap = expert_capacity(x.shape[0] * x.shape[1], K,
                                  module.capacity_factor)
            y_local = _expert_compute_capacity(
                x, assign, params["wi"], params["bi"], params["wo"],
                params["bo"], cap, first_expert=first, n_experts_global=K)
        else:
            # local expert slice: mask columns [first, first + n_local)
            local_onehot = lax.dynamic_slice_in_dim(
                onehot_full, first, n_local, axis=-1)
            y_local = _expert_compute(x, local_onehot, params["wi"],
                                      params["bi"], params["wo"],
                                      params["bo"])
        y = lax.psum(y_local, axis_name)
        return y * gate[..., None], aux

    spec = {
        "router": {"kernel": P()},
        "wi": P(axis_name), "bi": P(axis_name),
        "wo": P(axis_name), "bo": P(axis_name),
    }
    return jax.jit(shard_map(
        local_apply, mesh=mesh, in_specs=(spec, P()), out_specs=(P(), P()),
    ))


def place_ep_params(params, mesh: Mesh, axis_name: str = "expert"):
    """Device-put MoE params: expert-stacked leaves sharded, router
    replicated."""

    def put(path, x):
        keys = [str(getattr(p, "key", "")) for p in path]
        sharded = keys[0] in ("wi", "bi", "wo", "bo")
        return jax.device_put(
            x, NamedSharding(mesh, P(axis_name) if sharded else P()))

    return jax.tree_util.tree_map_with_path(put, params)
