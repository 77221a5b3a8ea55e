"""Von Mises distribution math, numerically hardened for TPU.

The reference computes ``torch.special.i0/i1`` directly and has to clamp
``kappa <= 500`` because raw ``I0`` overflows float32 around ``kappa ~ 88``
in log space (`train_multi_peaks_vonMises_KL.py:38-52`). Here everything is
expressed through the *exponentially scaled* Bessel functions
``i0e(k) = exp(-k) I0(k)`` / ``i1e`` so the math is stable for any kappa; the
reference's clamp is retained as an option for bit-level parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import i0e, i1e

TWO_PI = 2.0 * math.pi


def log_i0(kappa: jax.Array) -> jax.Array:
    """``log I0(kappa)`` computed stably as ``log(i0e) + kappa``."""
    return jnp.log(i0e(kappa)) + kappa


def bessel_ratio(kappa: jax.Array) -> jax.Array:
    """``A(kappa) = I1(kappa) / I0(kappa)`` via scaled Bessels."""
    return i1e(kappa) / i0e(kappa)


def inv_bessel_ratio(r: jax.Array, iters: int = 4) -> jax.Array:
    """Inverse of ``A(kappa) = I1/I0``: the ``kappa`` with ``A(kappa) = r``.

    Banerjee et al. (2005) closed-form seed ``r (2 - r^2) / (1 - r^2)``
    refined by ``iters`` Newton steps using ``A'(k) = 1 - A/k - A^2``
    (all through scaled Bessels, so stable at any resultant). Used to
    moment-match a view-averaged von Mises mixture back to a single vM
    (TTA for the distribution heads). ``r`` is clipped to ``[0, 1-1e-6]``;
    ``r = 0`` maps to ``kappa = 0`` (uniform)."""
    r = jnp.clip(r, 0.0, 1.0 - 1e-6)
    kappa = r * (2.0 - r * r) / jnp.maximum(1.0 - r * r, 1e-12)

    def newton(kappa, _):
        a = bessel_ratio(kappa)
        # at kappa -> 0: A ~ kappa/2 so A' -> 1/2; the maximum() guards the
        # kappa = 0 fixed point (where a - r = 0 anyway)
        da = jnp.maximum(1.0 - a / jnp.maximum(kappa, 1e-12) - a * a, 1e-6)
        return jnp.maximum(kappa - (a - r) / da, 0.0), None

    kappa, _ = jax.lax.scan(newton, kappa, None, length=iters)
    return kappa


def vm_mixture_moment_match(
    mu: jax.Array, kappa: jax.Array, weight: jax.Array | None = None,
    axis: int = -1,
):
    """Best single-von-Mises fit (by the first circular moment) to a
    mixture of von Mises components along ``axis``.

    The mixture's first moment is ``m1 = sum_k w_k A(kappa_k) e^{i mu_k}``;
    the matched vM takes ``mu* = arg m1`` and ``kappa* = A^{-1}(|m1|)``.
    ``weight=None`` means equal weights. This is the exact circular analogue
    of matching mean/variance for a Gaussian mixture."""
    a = bessel_ratio(kappa)
    if weight is None:
        weight = jnp.ones_like(mu) / mu.shape[axis]
    cr = jnp.sum(weight * a * jnp.cos(mu), axis=axis)
    sr = jnp.sum(weight * a * jnp.sin(mu), axis=axis)
    return jnp.arctan2(sr, cr), inv_bessel_ratio(jnp.hypot(cr, sr))


def wrap_angle(delta: jax.Array) -> jax.Array:
    """Wrap an angle difference to ``[-pi, pi]``.

    Parity: ``(delta + pi) % (2 pi) - pi`` in
    `train_multi_peaks_vonMises_KL.py:48-49`.
    """
    return jnp.mod(delta + math.pi, TWO_PI) - math.pi


def kl_von_mises(
    mu_p: jax.Array,
    kappa_p: jax.Array,
    mu_q: jax.Array,
    kappa_q: jax.Array,
    kappa_min: float = 1e-6,
    kappa_max: float = 500.0,
) -> jax.Array:
    """Analytic ``KL(vM(mu_p, kappa_p) || vM(mu_q, kappa_q))``.

    ``KL = log(I0(kq)/I0(kp)) + A(kp) * (kp - kq * cos(mu_p - mu_q))`` with
    kappa clamped and the mean difference wrapped, matching the hardened
    reference variant (`train_multi_peaks_vonMises_KL.py:38-52`) but computed
    through scaled Bessel functions so no intermediate overflows.
    """
    kappa_p = jnp.clip(kappa_p, kappa_min, kappa_max)
    kappa_q = jnp.clip(kappa_q, kappa_min, kappa_max)
    a_p = bessel_ratio(kappa_p)
    delta = wrap_angle(mu_p - mu_q)
    log_ratio = log_i0(kappa_q) - log_i0(kappa_p)
    return log_ratio + a_p * (kappa_p - kappa_q * jnp.cos(delta))


def von_mises_pdf(theta: jax.Array, mu: jax.Array, kappa: jax.Array) -> jax.Array:
    """``exp(kappa cos(theta - mu)) / (2 pi I0(kappa))``, stable for large kappa.

    ``kappa = 0`` reduces to the uniform density ``1/(2 pi)``. Parity:
    `visualization/visualization_MVM.py:18-22`.
    """
    return jnp.exp(kappa * (jnp.cos(theta - mu) - 1.0)) / (TWO_PI * i0e(kappa))


def mixture_von_mises_pdf(
    theta: jax.Array, mu: jax.Array, kappa: jax.Array, weight: jax.Array
) -> jax.Array:
    """Mixture density at ``theta (...,T)`` for components ``(..., K)``.

    Broadcasts components over a trailing grid axis. Parity:
    `visualization/visualization_MVM.py:24-28`.
    """
    vm = von_mises_pdf(theta[..., None, :], mu[..., :, None], kappa[..., :, None])
    return jnp.sum(weight[..., :, None] * vm, axis=-2)


def mvm_density_on_grid(
    mu: jax.Array, kappa: jax.Array, weight: jax.Array, num: int = 360
):
    """Mixture density sampled on ``num - 1`` angles covering ``[0, 2 pi)``.

    Returns ``(theta (num-1,), p (B, num-1))`` with ``p`` normalized to sum to
    one (plus the reference's ``1e-8`` guard). Parity:
    `models/pointnet_pp_mvM.py:130-144` (``linspace(0, 2 pi, num)[:-1]``).
    """
    theta = jnp.linspace(0.0, TWO_PI, num)[:-1]
    p = mixture_von_mises_pdf(theta[None, :], mu, kappa, weight)
    p = p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-8)
    return theta, p
