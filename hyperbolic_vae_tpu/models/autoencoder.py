"""Plain (non-variational) conv autoencoder — reference script _1.

Re-design of Autoencoder/Encoder/Decoder
(/root/reference/hyperbolic_vae/models/autoencoder_nonvariational.py:8-151):
same conv trunk as the Euclidean VAE, a Linear latent bottleneck, tanh
output; loss = per-pixel-sum MSE averaged over the batch (ref :119-127);
Adam + ReduceLROnPlateau(0.2, 20, min 5e-5) (ref :129-136).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as fnn
import jax.numpy as jnp

from hyperbolic_vae_tpu.models.vae_euclidean import ConvDecoder, ConvEncoder


class Autoencoder(fnn.Module):
    data_shape: Sequence[int] = (32, 32, 3)
    base_channel_size: int = 32
    latent_dim: int = 128
    lr: float = 1e-3
    compute_dtype: str = "float32"

    def setup(self):
        self.encoder = ConvEncoder(self.base_channel_size, dtype=self.compute_dtype)
        self.latent = fnn.Dense(self.latent_dim, name="latent")
        self.decoder = ConvDecoder(self.base_channel_size, self.data_shape, dtype=self.compute_dtype)

    def encode(self, x):
        return self.latent(self.encoder(x))

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x):
        z = self.encode(x)
        x_hat = self.decode(z)
        return {"z": z, "x_hat": x_hat}

    def loss(self, x):
        out = self(x)
        per_sample = jnp.sum((out["x_hat"] - x) ** 2, axis=(1, 2, 3))
        loss = jnp.mean(per_sample)
        return {"loss_total": loss, "loss_recon": loss}

    def reconstruct(self, x):
        return self(x)["x_hat"]
