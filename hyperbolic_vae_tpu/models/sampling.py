"""Latent-prior sampling shared by every VAE family's ``generate``.

The reference never shipped unconditional generation (its figures decode
a fixed latent GRID, vae_euclidean.py:176-219, rather than prior draws).
Standard VAE API completeness: z ~ p(z) then decode. The prior matches
each model's KL/IWAE prior exactly — WrappedNormal at the origin on the
Poincaré ball (the same truncated-chart rsample training uses) or
N(0, prior_scale²I) for Euclidean latents.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions import wrapped_normal_rsample

__all__ = ["prior_sample"]


def prior_sample(module, ball, n: int, latent_dim: int, prior_scale: float = 1.0):
    """(n, latent_dim) draws from the model's latent prior, using the
    module's 'sample' RNG stream. ``ball=None`` = Euclidean latent."""
    key = module.make_rng("sample")
    if ball is None:
        return prior_scale * jax.random.normal(key, (n, latent_dim), jnp.float32)
    zeros = jnp.zeros((n, latent_dim), jnp.float32)
    scale = jnp.full((n, latent_dim), prior_scale, jnp.float32)
    return wrapped_normal_rsample(key, ball, zeros, scale)
