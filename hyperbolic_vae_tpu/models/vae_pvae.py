"""pvae-replication MLP VAE: WrappedNormal vs RiemannianNormal posteriors
+ IWAE evaluation.

The reference's replication scripts are broken scratch work
(/root/reference/scripts/_9_pvae_replicate.py has a bodyless ``def
train`` -> SyntaxError, :190-198) but they record the target config
(:5-30, :200-210): MNIST 784 -> 600 (ReLU) -> latent 2, batch 128,
lr 5e-4, 80 epochs, 5000-sample IWAE eval, Bernoulli likelihood,
gyroplane ("geodesic") decoder first layer; posterior grid WrappedNormal
vs RiemannianNormal (driver BASELINE.json config 4). This module makes
that config actually runnable — including the RiemannianNormal path the
reference never got working (old_pvae_riemannian_normal.py:13).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as fnn
import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions import (
    RiemannianNormal,
    WrappedNormal,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
)
from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.nn import GeodesicLayer


def _bernoulli_log_prob(logits, x):
    """Bernoulli log p(x | logits) = -BCE_with_logits (pvae's likelihood;
    see /root/reference/scripts/_9_pvae_replicate.py:79-85)."""
    return -(jnp.maximum(logits, 0) - logits * x + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class PvaeMLPVAE(fnn.Module):
    data_shape: Sequence[int] = (28, 28, 1)
    hidden_dim: int = 600
    latent_dim: int = 2
    manifold_curvature: float = 1.0
    posterior: str = "wrapped"  # "wrapped" | "riemannian"
    decoder_first: str = "geodesic"  # "geodesic" | "linear"
    prior_scale: float = 1.0
    beta: float = 1.0
    lr: float = 5e-4
    k_train: int = 1

    @property
    def ball(self) -> PoincareBall:
        return PoincareBall(c=self.manifold_curvature)

    @property
    def data_numel(self) -> int:
        return int(math.prod(self.data_shape))

    def setup(self):
        self.enc = fnn.Dense(self.hidden_dim, name="enc")
        self.mu_head = fnn.Dense(self.latent_dim, name="mu")
        self.scale_head = fnn.Dense(
            self.latent_dim if self.posterior == "wrapped" else 1, name="scale"
        )
        if self.decoder_first == "geodesic":
            self.dec_first = GeodesicLayer(
                self.latent_dim, self.hidden_dim, self.ball, name="dec_geodesic"
            )
        else:
            self.dec_first = fnn.Dense(self.hidden_dim, name="dec_first")
        self.dec_out = fnn.Dense(self.data_numel, name="dec_out")

    def encode(self, x):
        h = fnn.relu(self.enc(x.reshape(x.shape[0], -1)))
        mu = self.ball.expmap0(self.mu_head(h))
        scale = jnp.clip(fnn.softplus(self.scale_head(h)) + 1e-3, 1e-3, 10.0)  # floor+cap, see vae_gyroplane
        return mu, scale

    def posterior_dist(self, mu, scale):
        if self.posterior == "wrapped":
            return WrappedNormal(mu, scale, self.ball)
        if self.posterior == "riemannian":
            return RiemannianNormal(mu, scale, self.ball)
        raise ValueError(self.posterior)

    def decode(self, z):
        h = fnn.relu(self.dec_first(z))
        return self.dec_out(h)  # logits, flat

    def __call__(self, x):
        mu, scale = self.encode(x)
        q = self.posterior_dist(mu, scale)
        z = q.rsample(self.make_rng("sample"))
        logits = self.decode(z)
        return {"mu": mu, "scale": scale, "z": z, "x_hat": logits}

    def _prior_log_prob(self, z):
        origin = jnp.zeros((self.latent_dim,), jnp.float32)
        return wrapped_normal_log_prob(
            self.ball, origin, jnp.full((self.latent_dim,), self.prior_scale), z
        )

    def elbo_parts(self, x, k: int):
        """K-sample log weights log p(x|z) + log p(z) - log q(z|x),
        shape (K, B)."""
        mu, scale = self.encode(x)
        q = self.posterior_dist(mu, scale)
        z = q.rsample(self.make_rng("sample"), (k,))  # (K, B, D)
        zf = z.reshape(-1, self.latent_dim)
        logits = self.decode(zf).reshape(k, x.shape[0], -1)
        xf = x.reshape(1, x.shape[0], -1)
        log_px_z = jnp.sum(_bernoulli_log_prob(logits, xf), axis=-1)  # (K, B)
        log_pz = self._prior_log_prob(z)
        log_qz = q.log_prob(z)
        return log_px_z, log_pz, log_qz

    def loss(self, x):
        """beta-ELBO with k_train samples (pvae objective)."""
        log_px_z, log_pz, log_qz = self.elbo_parts(x, self.k_train)
        recon = -jnp.mean(log_px_z)
        kl = jnp.mean(log_qz - log_pz)
        return {
            "loss_total": recon + self.beta * kl,
            "loss_recon": recon,
            "loss_kl": kl,
            "elbo": -(recon + kl),
        }

    def iwae(self, x, k: int = 5000):
        """PER-SAMPLE importance-weighted bound (B,): logsumexp_K(log w)
        - log K (the reference's 5000-sample IWAE eval,
        _9_pvae_replicate.py:205). Per-sample (not pre-meaned) so the
        family-uniform ``Trainer.evaluate_iwae`` chunking recombines it
        exactly (models/iwae.py); callers mean over B for the headline
        number."""
        log_px_z, log_pz, log_qz = self.elbo_parts(x, k)
        log_w = log_px_z + log_pz - log_qz  # (K, B)
        return jax.scipy.special.logsumexp(log_w, axis=0) - jnp.log(float(k))

    def reconstruct(self, x):
        logits = self(x)["x_hat"]
        return fnn.sigmoid(logits).reshape((x.shape[0],) + tuple(self.data_shape))
