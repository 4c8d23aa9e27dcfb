"""Euclidean normal helpers: log densities and analytic KL.

The analytic Gaussian KL forms the reference's Euclidean baseline loss
(/root/reference/hyperbolic_vae/models/vae_euclidean.py:134) and the
``logmap0_analytic`` hyperbolic KL estimator (vae_one_b.py:215-222).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def normal_log_prob(x, loc, scale):
    var = scale * scale
    return -((x - loc) ** 2) / (2.0 * var) - jnp.log(scale) - 0.5 * _LOG_2PI


def kl_normal_normal(loc_p, scale_p, loc_q, scale_q):
    """KL(N(loc_p, scale_p) || N(loc_q, scale_q)), elementwise — the
    torch ``_kl_normal_normal`` formula quoted at vae_one_b.py:172-176."""
    var_ratio = (scale_p / scale_q) ** 2
    t1 = ((loc_p - loc_q) / scale_q) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def kl_std_normal_from_logvar(mu, log_var):
    """-0.5 * (1 + log_var - mu^2 - exp(log_var)), elementwise — the
    classic VAE KLD used by the Euclidean baseline (vae_euclidean.py:134)."""
    return -0.5 * (1.0 + log_var - mu * mu - jnp.exp(log_var))
