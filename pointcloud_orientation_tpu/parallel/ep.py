"""Expert parallelism: a mixture-of-experts FFN for the point transformer.

Completes the sharding portfolio (DP / SP / TP / PP / ring — see the other
modules in :mod:`pointcloud_orientation_tpu.parallel`): the transformer's
dense FFN is replaced by ``n_experts`` routed expert FFNs whose parameters
are stacked on a leading ``expert`` axis and sharded ``P('expert')`` — each
device owns ``n_experts / n_chips`` experts and computes only those; a
``psum`` over the ``expert`` axis combines the routed partial outputs.

Routing is top-1 softmax ("switch" routing) with the standard
load-balancing auxiliary loss (mean router prob × assignment fraction per
expert). Dispatch is the masked-einsum formulation — every device runs its
local experts over the FULL token set and masks by the router's one-hot
assignment. Be precise about the cost: this is compute-redundant — each
device spends ``n_experts / n_chips`` × the FLOPs of true routed dispatch,
because masked-out tokens are computed then zeroed. A capacity-factor
``all_to_all`` token exchange (send each token only to its expert's chip)
is therefore both the compute fix and the bandwidth fix in the LM regime;
at point-cloud token counts (N ≤ 65k/batch, tiny FFNs) the masked form is
deliberately chosen anyway because it keeps static shapes and MXU-shaped
einsums with no gather/scatter, and the redundant FLOPs are below the
dispatch overhead they would replace.

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

        y = _expert_compute(x, onehot, wi, bi, wo, bo)
        return y * gate[..., None], aux


def _expert_compute(x, onehot, wi, bi, wo, bo):
    """Masked dense dispatch over the (possibly device-local) expert slice:
    h_e = relu(x @ wi_e + bi_e); y = Σ_e onehot_e · (h_e @ wo_e + bo_e)."""
    h = jnp.einsum("bne,kef->bnkf", x, wi) + bi  # (B, N, K, F)
    h = nn.relu(h)
    y = jnp.einsum("bnkf,kfe->bnke", h, wo) + bo  # (B, N, K, E)
    return jnp.einsum("bnke,bnk->bne", y, onehot)


def make_ep_apply(module: MoEFeedForward, mesh: Mesh,
                  axis_name: str = "expert"):
    """Build ``apply(params, x) -> (y, aux)`` with experts sharded over
    ``axis_name``.

    ``params`` is the module's param dict with the stacked expert leaves
    (``wi/bi/wo/bo``) sharded ``P(axis_name)`` on their leading axis and the
    router replicated (:func:`place_ep_params`). Each device computes the
    router on the full token set (tiny), runs ONLY its local expert slice,
    and the partial outputs psum-combine over the ``expert`` axis.
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

        # local expert slice: mask columns [first, first + n_local)
        local_onehot = lax.dynamic_slice_in_dim(
            onehot_full, first, n_local, axis=-1)
        y_local = _expert_compute(x, local_onehot, params["wi"], params["bi"],
                                  params["wo"], params["bo"])
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
