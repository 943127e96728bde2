"""Robust cost weighting (Huber / Tukey / none).

Counterpart of ``opt/robust_weighting.h:61-106``: rho(r) for cost evaluation
and w(r) = rho'(r)/r for IRLS-style weighting of squared residuals.
Defaults in the reference: colors Huber with parameter ``30*sqrt(5)/sqrt(2)``,
depth Tukey 0.02 (``opt/parameters.h:47-55``).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_rho(r, k):
    a = jnp.abs(r)
    return jnp.where(a <= k, 0.5 * r * r, k * (a - 0.5 * k))


def huber_weight(r, k):
    a = jnp.abs(r)
    return jnp.where(a <= k, 1.0, k / jnp.maximum(a, 1e-30))


def tukey_rho(r, k):
    k2 = k * k
    inner = 1.0 - (r / k) ** 2
    return jnp.where(jnp.abs(r) <= k, (k2 / 6.0) * (1.0 - inner**3), k2 / 6.0)


def tukey_weight(r, k):
    inner = 1.0 - (r / k) ** 2
    return jnp.where(jnp.abs(r) <= k, inner * inner, 0.0)


def none_rho(r, k=None):
    return 0.5 * r * r


def none_weight(r, k=None):
    return jnp.ones_like(r)


ROBUST = {
    "huber": (huber_rho, huber_weight),
    "tukey": (tukey_rho, tukey_weight),
    "none": (none_rho, none_weight),
}

# reference defaults (opt/parameters.h)
DEFAULT_COLOR_HUBER = 30.0 * (5.0 ** 0.5) / (2.0 ** 0.5)
DEFAULT_DEPTH_TUKEY = 0.02
