"""Negative-binomial count likelihood for RNA-seq reconstruction.

The reference *attempted* this and shipped it commented out
(/root/reference/hyperbolic_vae/models/vae_hyperbolic_rnaseq.py:85-88:
``NegativeBinomial(1_000_000, probs=x_hat)``). This is a working
jax-native version with torch's parameterization so the attempt can be
finished and golden-tested:

    p(k | r, probs) = C(k + r - 1, k) * (1 - probs)^r * probs^k

where ``r = total_count`` (>0, real-valued allowed) and ``probs`` is the
success probability of each trial (torch.distributions.NegativeBinomial
semantics: mean = r * probs / (1 - probs)).

All in log-space via lgamma; ``logits = log(probs / (1 - probs))`` is the
numerically preferred input (sigmoid/softplus identities, no clipping).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def negative_binomial_log_prob(
    value: jax.Array,
    total_count: jax.Array,
    logits: Optional[jax.Array] = None,
    probs: Optional[jax.Array] = None,
) -> jax.Array:
    """log p(value) under NB(total_count, probs), torch parameterization.

    log p(k) = lgamma(k + r) - lgamma(r) - lgamma(k + 1)
               + r * log(1 - probs) + k * log(probs)
    with log(probs) = -softplus(-logits), log(1-probs) = -softplus(logits).
    ``value`` may be real-valued (continuous relaxation via lgamma), as in
    torch with validate_args off.
    """
    if (logits is None) == (probs is None):
        raise ValueError("pass exactly one of logits/probs")
    if logits is None:
        probs = jnp.clip(probs, 1e-6, 1.0 - 1e-6)
        logits = jnp.log(probs) - jnp.log1p(-probs)
    k = jnp.asarray(value, jnp.float32)
    r = jnp.asarray(total_count, jnp.float32)
    log_probs = -jax.nn.softplus(-logits)
    log_1m_probs = -jax.nn.softplus(logits)
    return (
        gammaln(k + r)
        - gammaln(r)
        - gammaln(k + 1.0)
        + r * log_1m_probs
        + k * log_probs
    )


def nb_mean_dispersion_to_logits(mean: jax.Array, theta: jax.Array) -> jax.Array:
    """Convert (mean mu, inverse-dispersion theta) — the scvi-style NB
    parameterization — to torch-style (total_count=theta, logits).

    mean = theta * probs / (1 - probs)  =>  logits = log(mu) - log(theta).
    Var = mu + mu^2 / theta; theta -> inf recovers Poisson.
    """
    return jnp.log(jnp.maximum(mean, 1e-8)) - jnp.log(jnp.maximum(theta, 1e-8))
