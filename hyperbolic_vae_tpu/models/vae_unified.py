"""Unified configurable VAE — the working realization of the reference's
"vae_one" design (re-design of vae_one_b.VAE,
/root/reference/hyperbolic_vae/models/vae_one_b.py:17-306).

Option space (all reference options preserved):
  * latent_curvature: None/0 -> Euclidean latent, else Poincare ball (ref :40)
  * posterior_scale: "learned" (Dense+softplus) | "fixed" (ones) (ref :58-66)
  * decoder first op: gyroplane distances on the ball, Dense otherwise (ref :116-129)
  * last_activation: "none" | "sigmoid" | "softplus" (ref :131-143)
  * loss_recon_method: "MSE" | "binary_cross_entropy" |
    "binary_cross_entropy_with_logits" | "relaxed bernoulli" (T=0.3) (ref :145-165)
  * kl_loss_method: "log_prob" | "logmap0_analytic" | "logmap0_log_prob"
    (ref :243-250); the estimators keep the reference's exp(log q)
    importance weighting (ref :211-213, :233-237).

Deviation from the reference (documented, deliberate): the reference's
``loss_kl_log_prob`` accidentally broadcasts every z against every loc
(an O(B^2) cross product, vae_one_b.py:210 via wrapped_normal.py:80-82);
here the estimator is the intended diagonal log q(z_i | x_i). SURVEY
section 7 "known defects not to reproduce".
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as fnn
import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions import (
    kl_normal_normal,
    normal_log_prob,
    relaxed_bernoulli_log_prob,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
)
from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.nn import PoincareHyperplanes

_ACTIVATIONS = {"gelu": fnn.gelu, "relu": fnn.relu}


def _bce(probs, x):
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    return -(x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p))


def _bce_with_logits(logits, x):
    return jnp.maximum(logits, 0) - logits * x + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class UnifiedVAE(fnn.Module):
    input_size: Sequence[int] = (28, 28, 1)
    hidden_layer_dim: int = 100
    latent_dim: int = 2
    latent_curvature: Optional[float] = 1.0
    prior_scale: float = 1.0
    posterior_scale: str = "learned"  # "learned" | "fixed"
    learning_rate: float = 1e-3
    beta: float = 1.0
    kl_loss_method: str = "logmap0_analytic"
    activation: str = "gelu"
    last_activation: str = "none"  # "none" | "sigmoid" | "softplus"
    loss_recon_method: str = "MSE"

    @property
    def ball(self) -> Optional[PoincareBall]:
        if self.latent_curvature:
            return PoincareBall(c=self.latent_curvature)
        return None

    @property
    def input_features(self) -> int:
        return int(math.prod(self.input_size))

    @property
    def lr(self) -> float:
        return self.learning_rate

    def setup(self):
        self.enc = fnn.Dense(self.hidden_layer_dim, name="enc")
        self.mu_head = fnn.Dense(self.latent_dim, name="mu")
        if self.posterior_scale == "learned":
            self.scale_head = fnn.Dense(self.latent_dim, name="scale")
        elif self.posterior_scale != "fixed":
            raise ValueError(self.posterior_scale)
        if self.ball is not None:
            self.dec_first = PoincareHyperplanes(
                plane_shape=self.latent_dim,
                num_planes=self.hidden_layer_dim,
                ball=self.ball,
                name="gyroplanes",
            )
        else:
            self.dec_first = fnn.Dense(self.hidden_layer_dim, name="dec_first")
        self.dec_out = fnn.Dense(self.input_features, name="dec_out")

    def _act(self, h):
        return _ACTIVATIONS[self.activation](h)

    def encode(self, x):
        h = self._act(self.enc(x.reshape(x.shape[0], -1)))
        mu = self.mu_head(h)
        if self.ball is not None:
            mu = self.ball.expmap0(mu)
        if self.posterior_scale == "learned":
            scale = jnp.clip(fnn.softplus(self.scale_head(h)) + 1e-3, 1e-3, 10.0)  # floor+cap, see vae_gyroplane
        else:
            scale = jnp.ones_like(mu)
        return mu, scale

    def decode(self, z):
        h = self._act(self.dec_first(z))
        out = self.dec_out(h)
        if self.last_activation == "sigmoid":
            out = fnn.sigmoid(out)
        elif self.last_activation == "softplus":
            out = fnn.softplus(out)
        elif self.last_activation != "none":
            raise ValueError(self.last_activation)
        return out.reshape((z.shape[0],) + tuple(self.input_size))

    def __call__(self, x):
        mu, scale = self.encode(x)
        key = self.make_rng("sample")
        if self.ball is not None:
            z = wrapped_normal_rsample(key, self.ball, mu, scale)
        else:
            z = mu + scale * jax.random.normal(key, mu.shape, jnp.float32)
        x_hat = self.decode(z)
        return {"mu": mu, "scale": scale, "z": z, "x_hat": x_hat}

    # ---- losses (ref :145-250) ----

    def loss_recon(self, x, output):
        m = self.loss_recon_method
        if m == "MSE":
            return jnp.mean((output - x) ** 2)
        if m == "binary_cross_entropy":
            return jnp.mean(_bce(output, x))
        if m == "binary_cross_entropy_with_logits":
            return jnp.mean(_bce_with_logits(output, x))
        if m == "relaxed bernoulli":
            xf = x.reshape(x.shape[0], -1)
            of = output.reshape(output.shape[0], -1)
            if self.last_activation == "none":
                lp = relaxed_bernoulli_log_prob(xf, 0.3, logits=of)
            elif self.last_activation == "sigmoid":
                lp = relaxed_bernoulli_log_prob(xf, 0.3, probs=of)
            else:
                raise ValueError(
                    f"last_activation {self.last_activation} not compatible with relaxed bernoulli"
                )
            return -jnp.mean(lp)
        raise ValueError(m)

    def loss_kl(self, mu, scale, z):
        method = self.kl_loss_method
        ball = self.ball
        if method == "logmap0_analytic":
            mu_t = ball.logmap0(mu) if ball is not None else mu
            return jnp.mean(kl_normal_normal(mu_t, scale, 0.0, self.prior_scale))
        if method == "log_prob":
            if ball is not None:
                lq = wrapped_normal_log_prob(ball, mu, scale, z)
                origin = jnp.zeros((self.latent_dim,), jnp.float32)
                lp = wrapped_normal_log_prob(
                    ball, origin, jnp.full((self.latent_dim,), self.prior_scale), z
                )
            else:
                lq = jnp.sum(normal_log_prob(z, mu, scale), -1)
                lp = jnp.sum(normal_log_prob(z, 0.0, self.prior_scale), -1)
            # reference's importance weighting exp(log q) (ref :211-213)
            return jnp.mean(jnp.exp(lq) * (lq - lp))
        if method == "logmap0_log_prob":
            mu_t = ball.logmap0(mu) if ball is not None else mu
            z_t = ball.logmap0(z) if ball is not None else z
            lq = jnp.sum(normal_log_prob(z_t, mu_t, scale), -1)
            lp = jnp.sum(normal_log_prob(z_t, 0.0, self.prior_scale), -1)
            return jnp.mean(jnp.exp(lq) * (lq - lp))
        raise ValueError(method)

    def loss(self, x):
        out = self(x)
        loss_recon = self.loss_recon(x, out["x_hat"])
        loss_kl = self.loss_kl(out["mu"], out["scale"], out["z"])
        return {
            "loss_total": loss_recon + self.beta * loss_kl,
            "loss_reconstruction": loss_recon,
            "loss_kl": loss_kl,
        }

    def transform_decoder_output(self, output):
        """Sigmoid for logit-space outputs when visualizing (ref :293-301)."""
        if self.last_activation == "none" and self.loss_recon_method in (
            "binary_cross_entropy",
            "binary_cross_entropy_with_logits",
            "relaxed bernoulli",
        ):
            return fnn.sigmoid(output)
        return output

    def iwae(self, x, k: int = 256):
        """Per-sample K-importance-weighted log p(x) bound (B,), over
        either latent geometry; likelihood per loss_recon_method (MSE =
        unit Gaussian, bce variants = Bernoulli, relaxed bernoulli =
        RelaxedBernoulli T=0.3), summed over features. models/iwae.py."""
        from hyperbolic_vae_tpu.models.iwae import (
            gaussian_loglik,
            iwae_bound,
            latent_log_weights,
        )

        xf = x.reshape(x.shape[0], -1)
        mu, scale = self.encode(x)
        m = self.loss_recon_method

        def loglik(zf):
            xh = self.decode(zf).reshape(k, x.shape[0], -1)
            if m == "MSE":
                return gaussian_loglik(xf, xh)
            if m in ("binary_cross_entropy", "binary_cross_entropy_with_logits"):
                # the SAME density training optimizes (loss_recon) — a
                # separate clip constant here would make the bound score
                # a slightly different likelihood at saturated outputs
                f = _bce if m == "binary_cross_entropy" else _bce_with_logits
                return -jnp.sum(f(xh, xf[None]), axis=-1)
            if m == "relaxed bernoulli":
                kw = {"logits": xh} if self.last_activation == "none" else {"probs": xh}
                return jnp.sum(
                    relaxed_bernoulli_log_prob(xf[None], 0.3, **kw), axis=-1
                )
            raise ValueError(m)

        log_w = latent_log_weights(
            self, self.ball, mu, scale, k, self.prior_scale, loglik
        )
        return iwae_bound(log_w)

    def generate(self, n: int = 64):
        """Decode n prior draws (WrappedNormal on the ball or N(0, I)
        per latent_curvature), through transform_decoder_output so
        logit-space decoders return probabilities (models/sampling.py)."""
        from hyperbolic_vae_tpu.models.sampling import prior_sample

        z = prior_sample(self, self.ball, n, self.latent_dim, self.prior_scale)
        return self.transform_decoder_output(self.decode(z))

    def reconstruct(self, x):
        return self.transform_decoder_output(self(x)["x_hat"])


# Reference-parity alias (models/vae_one_b.py class name)
VAE = UnifiedVAE
