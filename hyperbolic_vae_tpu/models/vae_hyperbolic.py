"""Conv image VAE with Poincare latent and configurable manifold layers.

Re-design of ImageVAEHyperbolic/VAEHyperbolicExperiment
(/root/reference/hyperbolic_vae/models/vae_hyperbolic.py:38-295):

  encoder: Conv(16,s2) -> Conv(32,s2) -> Conv(32,s2) (GELU) -> flatten
  encoder last layer ("linear" Dense + expmap0 | "mobius" MobiusLayer)
  log_var head (zeroed under the bernoulli loss, ref :113-116)
  z ~ WrappedNormal(mu_on_ball, exp(0.5 log_var)), 1 sample
  decoder first layer ("linear" | "geodesic" | "mobius" |
                       "geoopt_gyroplane") (ref :76-89)
  conv-transpose stack back to the image; sigmoid under mse (ref :106-107)
  loss: MC KL summed over batch (ref :216) + recon (sum-MSE, or
        RelaxedBernoulli(T=0.1, logits) mean NLL, ref :218-227)

Requires H, W divisible by 8 (three stride-2 convs); MNIST experiments
pad 28->32 like the reference's declared image_shape (ref :135 — the
reference's 28-vs-32 inconsistency is resolved by explicit padding,
SURVEY section 2.5).
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
from hyperbolic_vae_tpu.models.vae_euclidean import CONVT_PADDING
from hyperbolic_vae_tpu.nn import GeodesicLayer, MobiusLayer, PoincareHyperplanes


class HyperbolicImageVAE(fnn.Module):
    data_shape: Sequence[int] = (32, 32, 1)
    latent_dim: int = 2
    manifold_curvature: float = 1.0
    encoder_last_layer_module: str = "linear"  # "linear" | "mobius"
    decoder_first_layer_module: str = "linear"  # +"geodesic"|"mobius"|"geoopt_gyroplane"
    beta: float = 1.0
    lr: float = 1e-3
    loss_recon: str = "mse"  # "mse" | "bernoulli" | "bernoulli_elbo"
    # "bernoulli" reproduces the reference's loss EXACTLY, including its
    # reduction imbalance (recon = per-ELEMENT mean, :225 .mean(); KL =
    # batch SUM, :216 .sum()): latent information costs ~B*H*W times
    # what it can pay back, so the posterior collapses — the reference's
    # own committed figure is collapsed, and a beta-warmup run pinned
    # the diagnosis (runs/figset_r4/hyp_conv_bernoulli_betawarmup).
    # "bernoulli_elbo" is the corrected option: the SAME RelaxedBernoulli
    # T=0.1 logit likelihood with a proper per-sample ELBO reduction
    # (recon summed over pixels, both terms meaned over the batch).
    compute_dtype: str = "float32"  # "bfloat16": conv stacks on the MXU in bf16
    # (manifold math, sampling and the loss stay f32 — repo convention)
    base_channels: int = 16  # conv widths are (m, 2m, 2m); 16 = the
    # reference's fixed architecture (vae_hyperbolic.py:60-66). Wider
    # values are the MXU lane-occupancy control arm of
    # benchmarks/conv_roofline.py (128-lane systolic array vs 16/32-wide
    # channel contractions).

    @property
    def loss_reduction(self) -> str:
        """Loss-dict reduction contract marker (CLAUDE.md conventions):
        the reference-parity "mse"/"bernoulli" modes return the
        reference's BATCH SUMS verbatim (ref vae_hyperbolic.py:216,219),
        which grad accumulation would silently rescale by 1/A — the
        Trainer refuses grad_accum_steps>1 for "batch_sum" models
        (round-4 VERDICT #4). "bernoulli_elbo" follows the repo's
        per-sample-mean contract throughout."""
        return (
            "per_sample_mean"
            if self.loss_recon == "bernoulli_elbo"
            else "batch_sum"
        )

    @property
    def ball(self) -> PoincareBall:
        return PoincareBall(c=self.manifold_curvature)

    @property
    def encoder_out_channels(self) -> int:
        h, w = self.data_shape[0], self.data_shape[1]
        return 2 * self.base_channels * (h // 8) * (w // 8)

    def setup(self):
        ball = self.ball
        dt = jnp.dtype(self.compute_dtype)
        m = self.base_channels
        self.conv1 = fnn.Conv(m, (3, 3), strides=2, padding=1, dtype=dt)
        self.conv2 = fnn.Conv(2 * m, (3, 3), strides=2, padding=1, dtype=dt)
        self.conv3 = fnn.Conv(2 * m, (3, 3), strides=2, padding=1, dtype=dt)
        if self.encoder_last_layer_module == "linear":
            self.mu_head = fnn.Dense(self.latent_dim, name="mu")
        elif self.encoder_last_layer_module == "mobius":
            self.mu_head = MobiusLayer(
                self.encoder_out_channels, self.latent_dim, ball, name="mu_mobius"
            )
        else:
            raise ValueError(self.encoder_last_layer_module)
        self.log_var_head = fnn.Dense(self.latent_dim, name="log_var")
        d = self.decoder_first_layer_module
        if d == "linear":
            self.dec_first = fnn.Dense(self.encoder_out_channels)
        elif d == "geodesic":
            self.dec_first = GeodesicLayer(self.latent_dim, self.encoder_out_channels, ball)
        elif d == "mobius":
            self.dec_first = MobiusLayer(self.latent_dim, self.encoder_out_channels, ball)
        elif d == "geoopt_gyroplane":
            self.dec_first = PoincareHyperplanes(
                plane_shape=self.latent_dim,
                num_planes=self.encoder_out_channels,
                ball=ball,
            )
        else:
            raise ValueError(d)
        self.deconv1 = fnn.ConvTranspose(2 * m, (3, 3), strides=(2, 2), padding=CONVT_PADDING, dtype=dt)
        self.conv4 = fnn.Conv(2 * m, (3, 3), padding=1, dtype=dt)
        self.deconv2 = fnn.ConvTranspose(m, (3, 3), strides=(2, 2), padding=CONVT_PADDING, dtype=dt)
        self.conv5 = fnn.Conv(m, (3, 3), padding=1, dtype=dt)
        self.deconv3 = fnn.ConvTranspose(
            self.data_shape[2], (3, 3), strides=(2, 2), padding=CONVT_PADDING, dtype=dt
        )

    def encode(self, x):
        """Returns (mu_on_manifold, scale)."""
        h = fnn.gelu(self.conv1(x.astype(jnp.dtype(self.compute_dtype))))
        h = fnn.gelu(self.conv2(h))
        h = fnn.gelu(self.conv3(h))
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        mu = self.mu_head(h)
        if self.encoder_last_layer_module == "linear":
            mu = self.ball.expmap0(mu)
        if self.loss_recon in ("bernoulli", "bernoulli_elbo"):
            log_var = jnp.zeros_like(mu)  # ref :113-116 (same arch, only
            # the loss reduction differs in the _elbo variant)
        else:
            log_var = self.log_var_head(h)
        return mu, jnp.clip(jnp.exp(0.5 * log_var), 1e-3, 10.0)  # scale floor+cap, see vae_gyroplane

    def decode(self, z):
        h8, w8 = self.data_shape[0] // 8, self.data_shape[1] // 8
        h = fnn.gelu(self.dec_first(z))  # manifold-facing layer stays f32
        h = h.reshape(
            z.shape[0], h8, w8, 2 * self.base_channels
        ).astype(jnp.dtype(self.compute_dtype))
        h = fnn.gelu(self.deconv1(h))
        h = fnn.gelu(self.conv4(h))
        h = fnn.gelu(self.deconv2(h))
        h = fnn.gelu(self.conv5(h))
        h = self.deconv3(h).astype(jnp.float32)
        if self.loss_recon == "mse":
            h = fnn.sigmoid(h)  # ref :106-107
        return h

    def __call__(self, x):
        mu, scale = self.encode(x)
        z = wrapped_normal_rsample(self.make_rng("sample"), self.ball, mu, scale)
        x_hat = self.decode(z)
        return {"mu": mu, "scale": scale, "z": z, "x_hat": x_hat}

    def loss(self, x):
        """{loss_total, loss_recon, loss_kl}: KL summed over the batch,
        recon per the configured likelihood (ref :177-233)."""
        ball = self.ball
        out = self(x)
        mu, scale, z, x_hat = out["mu"], out["scale"], out["z"], out["x_hat"]
        log_q = wrapped_normal_log_prob(ball, mu, scale, z)
        origin = jnp.zeros((self.latent_dim,), jnp.float32)
        log_p = wrapped_normal_log_prob(ball, origin, jnp.ones((self.latent_dim,)), z)
        loss_kl = jnp.sum(log_q - log_p)  # ref :216 (sum over batch)
        if self.loss_recon == "mse":
            loss_recon = jnp.sum((x_hat - x) ** 2)  # ref :219 reduction="sum"
        elif self.loss_recon == "bernoulli":
            xf = x.reshape(x.shape[0], -1)
            logits = x_hat.reshape(x.shape[0], -1)
            loss_recon = -jnp.mean(relaxed_bernoulli_log_prob(xf, 0.1, logits=logits))
        elif self.loss_recon == "bernoulli_elbo":
            # corrected reduction (see the attribute note): per-sample
            # pixel-summed log-likelihood + per-sample KL, both batch
            # means — a proper ELBO at the same likelihood
            xf = x.reshape(x.shape[0], -1)
            logits = x_hat.reshape(x.shape[0], -1)
            loss_recon = -jnp.mean(
                jnp.sum(relaxed_bernoulli_log_prob(xf, 0.1, logits=logits), axis=-1)
            )
            loss_kl = jnp.mean(log_q - log_p)
        else:
            raise ValueError(self.loss_recon)
        # metric-reduction note: the "mse"/"bernoulli" modes return the
        # reference's BATCH-SUM entries verbatim (ref :216,219 — a known
        # deviation from the repo's per-sample-mean loss-dict contract,
        # so grad_accum_steps>1 rescales their gradients/metrics by 1/A;
        # use the per-sample-mean families for accumulation). The
        # corrected bernoulli_elbo mode follows the contract throughout.
        per_sample = self.loss_recon == "bernoulli_elbo"
        sq = (x_hat - x) ** 2
        mse = (
            jnp.mean(jnp.sum(sq.reshape(x.shape[0], -1), axis=-1))
            if per_sample
            else jnp.sum(sq)  # test-time extra metric (ref :261-268)
        )
        return {
            "loss_total": loss_recon + self.beta * loss_kl,
            "loss_recon": loss_recon,
            "loss_kl": loss_kl,
            "mse": mse,
        }

    def iwae(self, x, k: int = 256):
        """Per-sample K-importance-weighted log p(x) bound (B,): wrapped
        posterior/prior on the ball; likelihood = unit Gaussian (mse mode,
        on the sigmoid output it trains against) or RelaxedBernoulli
        T=0.1 logits (bernoulli mode), summed over pixels. models/iwae.py."""
        from hyperbolic_vae_tpu.models.iwae import (
            gaussian_loglik,
            iwae_bound,
            latent_log_weights,
        )

        xf = x.reshape(x.shape[0], -1)
        mu, scale = self.encode(x)

        def loglik(zf):
            xh = self.decode(zf).reshape(k, x.shape[0], -1)
            if self.loss_recon == "mse":
                return gaussian_loglik(xf, xh)
            return jnp.sum(
                relaxed_bernoulli_log_prob(xf[None], 0.1, logits=xh), axis=-1
            )

        log_w = latent_log_weights(self, self.ball, mu, scale, k, 1.0, loglik)
        return iwae_bound(log_w)

    def generate(self, n: int = 64):
        """Decode n prior draws z ~ WrappedNormal(0, 1) on the ball
        (models/sampling.py)."""
        from hyperbolic_vae_tpu.models.sampling import prior_sample

        z = prior_sample(self, self.ball, n, self.latent_dim)
        return self.decode(z)

    def reconstruct(self, x):
        return self(x)["x_hat"]
