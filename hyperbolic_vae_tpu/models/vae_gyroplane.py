"""Flagship model: MLP VAE with Poincare latent + gyroplane decoder.

Re-design of VAEHyperbolicGyroplaneDecoder
(/root/reference/hyperbolic_vae/models/vae_hyperbolic_gyroplane_decoder.py:42-185),
the model behind the reference's flagship script _6 and the driver's
headline benchmark:

  encoder: flatten -> Linear(64) -> GELU -> Linear(16) -> GELU
  mu:      Linear(latent) -> expmap0        (onto the ball)
  scale:   Linear(latent) -> softplus
  z ~ WrappedNormal(mu, scale) (1 reparameterized sample)
  decoder: gyroplane distances (latent -> 16) -> GELU -> Linear(64)
           -> GELU -> Linear(data) -> sigmoid
  loss:    recon = -sum RelaxedBernoulli(T=1.0, probs=x_hat).log_prob(x)
           kl    = log q(z|x) - log p(z),  p = WrappedNormal(0, prior_scale)
           total = mean(recon + beta * kl)      (ref :104-152)

The whole forward + loss is a single fused XLA computation; the only
stochastic op is one (B, latent) normal draw.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as fnn
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions import (
    relaxed_bernoulli_log_prob,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
)
from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.nn import PoincareHyperplanes


class GyroplaneVAE(fnn.Module):
    data_shape: Sequence[int] = (28, 28, 1)
    latent_dim: int = 2
    manifold_curvature: float = 1.0
    beta: float = 1.0
    prior_scale: float = 1.0
    hidden_dims: Sequence[int] = (64, 16)
    lr: float = 1e-3

    @property
    def ball(self) -> PoincareBall:
        return PoincareBall(c=self.manifold_curvature)

    @property
    def data_numel(self) -> int:
        return int(math.prod(self.data_shape))

    def setup(self):
        self.enc_layers = [fnn.Dense(d, name=f"enc_{i}") for i, d in enumerate(self.hidden_dims)]
        self.mu_head = fnn.Dense(self.latent_dim, name="mu")
        self.scale_head = fnn.Dense(self.latent_dim, name="scale")
        self.gyroplanes = PoincareHyperplanes(
            plane_shape=self.latent_dim,
            num_planes=self.hidden_dims[-1],
            ball=self.ball,
            name="gyroplanes",
        )
        self.dec_layers = [
            fnn.Dense(d, name=f"dec_{i}") for i, d in enumerate(reversed(self.hidden_dims[:-1]))
        ]
        self.out_layer = fnn.Dense(self.data_numel, name="out")

    def encode(self, x):
        """Posterior means on the ball — the latent-scatter callback input
        (ref VisualizeEncodingsValidationSet, :188-193)."""
        h = x.reshape(x.shape[0], -1)
        for layer in self.enc_layers:
            h = fnn.gelu(layer(h))
        # scale floor+cap: with sigma -> 0 the f32 expmap/logmap roundtrip
        # noise makes log q(z) spuriously large-negative and the MC KL
        # rewards collapse (the reference hits the same NaNs,
        # vae_one_b.py:279-280); cap cf. RiemannianNormal's [0.1, 7] clamp
        scale = jnp.clip(fnn.softplus(self.scale_head(h)) + 1e-3, 1e-3, 10.0)
        return self.ball.expmap0(self.mu_head(h)), scale

    def decode(self, z):
        h = fnn.gelu(self.gyroplanes(z))
        for layer in self.dec_layers:
            h = fnn.gelu(layer(h))
        x_hat = fnn.sigmoid(self.out_layer(h))
        return x_hat.reshape((z.shape[0],) + tuple(self.data_shape))

    def __call__(self, x):
        mu, scale = self.encode(x)
        z = wrapped_normal_rsample(self.make_rng("sample"), self.ball, mu, scale)
        x_hat = self.decode(z)
        return {"mu": mu, "scale": scale, "z": z, "x_hat": x_hat}

    def loss(self, x):
        """The reference's metric dict {loss_total, recon_loss, kl_loss}
        (vae_hyperbolic_gyroplane_decoder.py:104-152)."""
        out = self(x)
        return self._loss_parts(x, out["mu"], out["scale"], out["z"], out["x_hat"])

    def loss_from_eps(self, x, eps):
        """Deterministic loss given the standard-normal draw — the parity
        hook for the fused Pallas step (ops/flagship_fused.py)."""
        from hyperbolic_vae_tpu.distributions import wrapped_normal_rsample_from_eps

        mu, scale = self.encode(x)
        z = wrapped_normal_rsample_from_eps(self.ball, mu, scale, eps)
        return self._loss_parts(x, mu, scale, z, self.decode(z))

    def _loss_parts(self, x, mu, scale, z, x_hat):
        ball = self.ball
        xf = x.reshape(x.shape[0], -1)
        xhf = x_hat.reshape(x.shape[0], -1)
        recon = -jnp.sum(relaxed_bernoulli_log_prob(xf, 1.0, probs=xhf), axis=-1)
        log_q = wrapped_normal_log_prob(ball, mu, scale, z)
        origin = jnp.zeros((self.latent_dim,), jnp.float32)
        log_p = wrapped_normal_log_prob(
            ball, origin, jnp.full((self.latent_dim,), self.prior_scale), z
        )
        kl = log_q - log_p
        total = jnp.mean(recon + self.beta * kl)
        return {
            "loss_total": total,
            "recon_loss": jnp.mean(recon),
            "kl_loss": jnp.mean(kl),
        }

    def iwae(self, x, k: int = 1000):
        """Per-sample K-importance-weighted log p(x) bound (B,) under the
        training likelihood (RelaxedBernoulli T=1 on probs) — the
        reference's written-but-never-implemented follow-up
        (vae_hyperbolic_gyroplane_decoder.py:37-40). models/iwae.py."""
        from hyperbolic_vae_tpu.models.iwae import iwae_bound, latent_log_weights

        xf = x.reshape(x.shape[0], -1)
        mu, scale = self.encode(x)

        def loglik(zf):
            xh = self.decode(zf).reshape(k, x.shape[0], -1)
            return jnp.sum(
                relaxed_bernoulli_log_prob(xf[None], 1.0, probs=xh), axis=-1
            )

        log_w = latent_log_weights(
            self, self.ball, mu, scale, k, self.prior_scale, loglik
        )
        return iwae_bound(log_w)

    def generate(self, n: int = 64):
        """Decode n prior draws z ~ WrappedNormal(0, prior_scale) — pixel
        probs in (0, 1) (models/sampling.py; the reference has no
        unconditional generation)."""
        from hyperbolic_vae_tpu.models.sampling import prior_sample

        z = prior_sample(self, self.ball, n, self.latent_dim, self.prior_scale)
        return self.decode(z)

    def reconstruct(self, x):
        return self(x)["x_hat"]
