"""Euclidean conv VAE — the control arm every hyperbolic result is
compared against (reference scripts _2/_3).

Re-design of VAEEuclidean/VAEEuclideanExperiment
(/root/reference/hyperbolic_vae/models/vae_euclidean.py:21-173):

  encoder: Conv(c,s2) -> Conv(c) -> Conv(2c,s2) -> Conv(2c) -> Conv(2c,s2)
           (GELU between) -> flatten at (H/8, W/8)
  heads:   mu / log_var Linear
  z = mu + eps * exp(0.5 log_var)
  decoder: Linear -> reshape (H/8, W/8, 2c) -> ConvT(2c,s2) -> Conv(2c)
           -> ConvT(c,s2) -> Conv(c) -> ConvT(data,s2) -> tanh
  loss:    SUM-reduction MSE + beta * analytic Gaussian KLD
           (both summed over batch AND features, ref :132-135)

Convs are NHWC (TPU-native layout); all matmuls/convs hit the MXU.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as fnn
import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions import kl_std_normal_from_logvar

# torch ConvTranspose2d(kernel_size=3, stride=2, padding=1, output_padding=1)
# pads the dilated input (1 low, 2 high) per spatial dim — the reference's
# upsampling geometry (vae_euclidean.py:60-68). flax 'SAME' would pad (2, 1),
# a one-pixel alignment flip; the explicit spec keeps torch-trained weights
# importable exactly (interop/torch_import.py).
CONVT_PADDING = ((1, 2), (1, 2))


class ConvEncoder(fnn.Module):
    hidden_size: int = 32
    dtype: str = "float32"  # "bfloat16" runs the convs on the MXU in bf16

    @fnn.compact
    def __call__(self, x):
        c = self.hidden_size
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        x = fnn.gelu(fnn.Conv(c, (3, 3), strides=2, padding=1, dtype=dt)(x))
        x = fnn.gelu(fnn.Conv(c, (3, 3), padding=1, dtype=dt)(x))
        x = fnn.gelu(fnn.Conv(2 * c, (3, 3), strides=2, padding=1, dtype=dt)(x))
        x = fnn.gelu(fnn.Conv(2 * c, (3, 3), padding=1, dtype=dt)(x))
        x = fnn.gelu(fnn.Conv(2 * c, (3, 3), strides=2, padding=1, dtype=dt)(x))
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


class ConvDecoder(fnn.Module):
    hidden_size: int = 32
    data_shape: Sequence[int] = (32, 32, 3)
    final_activation: str = "tanh"  # reference uses tanh (vae_euclidean.py:87)
    dtype: str = "float32"

    @fnn.compact
    def __call__(self, z):
        c = self.hidden_size
        dt = jnp.dtype(self.dtype)
        h8, w8 = self.data_shape[0] // 8, self.data_shape[1] // 8
        x = fnn.gelu(fnn.Dense(2 * c * h8 * w8, dtype=dt)(z.astype(dt)))
        x = x.reshape(z.shape[0], h8, w8, 2 * c)
        x = fnn.gelu(fnn.ConvTranspose(2 * c, (3, 3), strides=(2, 2), padding=CONVT_PADDING, dtype=dt)(x))
        x = fnn.gelu(fnn.Conv(2 * c, (3, 3), padding=1, dtype=dt)(x))
        x = fnn.gelu(fnn.ConvTranspose(c, (3, 3), strides=(2, 2), padding=CONVT_PADDING, dtype=dt)(x))
        x = fnn.gelu(fnn.Conv(c, (3, 3), padding=1, dtype=dt)(x))
        x = fnn.ConvTranspose(self.data_shape[2], (3, 3), strides=(2, 2), padding=CONVT_PADDING, dtype=dt)(x)
        x = x.astype(jnp.float32)
        if self.final_activation == "tanh":
            x = fnn.tanh(x)
        elif self.final_activation == "sigmoid":
            x = fnn.sigmoid(x)
        return x


class EuclideanVAE(fnn.Module):
    data_shape: Sequence[int] = (32, 32, 3)
    hidden_size: int = 32
    latent_dim: int = 2
    beta: float = 1.0
    lr: float = 1e-3
    compute_dtype: str = "float32"  # "bfloat16" for MXU-native convs

    def setup(self):
        self.encoder = ConvEncoder(self.hidden_size, dtype=self.compute_dtype)
        self.mu_head = fnn.Dense(self.latent_dim, name="mu")
        self.log_var_head = fnn.Dense(self.latent_dim, name="log_var")
        self.decoder = ConvDecoder(self.hidden_size, self.data_shape, dtype=self.compute_dtype)

    def encode(self, x):
        h = self.encoder(x)
        return self.mu_head(h), self.log_var_head(h)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x):
        mu, log_var = self.encode(x)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, jnp.float32)
        z = mu + eps * jnp.exp(0.5 * log_var)
        x_hat = self.decode(z)
        return {"mu": mu, "log_var": log_var, "z": z, "x_hat": x_hat}

    def loss(self, x):
        """{loss_total, loss_recon, loss_kld} with the reference's SUM
        reductions (vae_euclidean.py:128-140)."""
        out = self(x)
        loss_recon = jnp.sum((out["x_hat"] - x) ** 2)
        loss_kld = jnp.sum(kl_std_normal_from_logvar(out["mu"], out["log_var"]))
        return {
            "loss_total": loss_recon + self.beta * loss_kld,
            "loss_recon": loss_recon,
            "loss_kld": loss_kld,
        }

    def iwae(self, x, k: int = 256):
        """Per-sample K-importance-weighted log p(x) bound (B,):
        diagonal-Gaussian posterior/prior, unit-scale Gaussian likelihood
        (the sum-MSE training objective as a density; models/iwae.py)."""
        from hyperbolic_vae_tpu.models.iwae import (
            gaussian_loglik,
            iwae_bound,
            latent_log_weights,
        )

        xf = x.reshape(x.shape[0], -1)
        mu, log_var = self.encode(x)

        def loglik(zf):
            xh = self.decode(zf).reshape(k, x.shape[0], -1)
            return gaussian_loglik(xf, xh)

        log_w = latent_log_weights(
            self, None, mu, jnp.exp(0.5 * log_var), k, 1.0, loglik
        )
        return iwae_bound(log_w)

    def generate(self, n: int = 64):
        """Decode n prior draws z ~ N(0, I) (models/sampling.py)."""
        from hyperbolic_vae_tpu.models.sampling import prior_sample

        z = prior_sample(self, None, n, self.latent_dim)
        return self.decode(z)

    def reconstruct(self, x):
        return self(x)["x_hat"]
