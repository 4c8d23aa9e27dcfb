"""Importance-weighted (IWAE) marginal-likelihood bounds for every VAE
family.

The reference left this as a written TODO ("report importance-weighted
autoencoder loss for each model on test set",
/root/reference/hyperbolic_vae/models/vae_hyperbolic_gyroplane_decoder.py:37-40)
and only sketched it for the pvae replication (scripts/_9, broken).
Here every model exposes ``iwae(x, k)`` -> per-sample bound (B,):

    L_k(x) = logsumexp_K [log p(x|z_i) + log p(z_i) - log q(z_i|x)] - log K

which is a lower bound on log p(x), monotone non-decreasing in K in
expectation (Burda et al. 2016). ``Trainer.evaluate_iwae`` chunks over
both the split and K (exact logsumexp recombination) so K=5000 fits in
memory at any width.

Likelihood conventions per family (matching each model's training
objective, summed over features so the bound is a joint log-density):
flagship = RelaxedBernoulli(T=1, probs); hyperbolic-image mse /
RNA-seq mse / unified MSE = unit-scale Gaussian (training's sum-MSE up
to the 0.5*D*log(2pi) constant, which the bound must include);
hyperbolic-image bernoulli = RelaxedBernoulli(T=0.1, logits); RNA-seq
nb = NegativeBinomial; unified bce variants = Bernoulli.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions import (
    normal_log_prob,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
)

__all__ = [
    "latent_log_weights",
    "iwae_bound",
    "combine_chunked_bounds",
    "gaussian_loglik",
]


def gaussian_loglik(x_flat, xh, scale: float = 1.0):
    """Unit-scale-by-default Gaussian joint log-likelihood, summed over
    the trailing feature axis: x (B, D) vs xh (K, B, D) -> (K, B)."""
    d = x_flat.shape[-1]
    quad = -0.5 * jnp.sum((xh - x_flat[None]) ** 2, axis=-1) / (scale**2)
    return quad - 0.5 * d * math.log(2.0 * math.pi) - d * math.log(scale)


def latent_log_weights(module, ball, mu, scale, k, prior_scale, loglik_of_z):
    """(K, B) importance log-weights. ``ball=None`` = Euclidean latent
    (diagonal Gaussian q and prior); otherwise WrappedNormal on the ball.
    ``loglik_of_z((K*B, D_latent) flat z) -> (K, B)`` joint recon term."""
    key = module.make_rng("sample")
    d = mu.shape[-1]
    if ball is None:
        eps = jax.random.normal(key, (k,) + mu.shape, jnp.float32)
        z = mu[None] + scale[None] * eps
        log_q = jnp.sum(normal_log_prob(z, mu[None], scale[None]), axis=-1)
        log_p = jnp.sum(normal_log_prob(z, 0.0, prior_scale), axis=-1)
    else:
        z = wrapped_normal_rsample(key, ball, mu, scale, (k,))
        log_q = wrapped_normal_log_prob(ball, mu, scale, z)
        origin = jnp.zeros((d,), jnp.float32)
        log_p = wrapped_normal_log_prob(
            ball, origin, jnp.full((d,), prior_scale, jnp.float32), z
        )
    log_px = loglik_of_z(z.reshape(-1, d))
    return log_px + log_p - log_q


def iwae_bound(log_w) -> jax.Array:
    """(K, B) log-weights -> per-sample bound (B,)."""
    k = log_w.shape[0]
    return jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(float(k))


def combine_chunked_bounds(bounds, ks):
    """Exactly recombine per-chunk bounds computed on independent sample
    chunks: bound_i = lse(chunk_i) - log k_i  ->  lse(all) - log(sum k).
    ``bounds`` is a sequence of (B,) arrays, ``ks`` their sample counts."""
    ks = [float(k) for k in ks]
    stacked = jnp.stack(
        [b + jnp.log(k) for b, k in zip(bounds, ks)], axis=0
    )  # (n_chunks, B) of per-chunk logsumexps
    return jax.scipy.special.logsumexp(stacked, axis=0) - jnp.log(sum(ks))
