"""Wrapped normal distribution on the Poincare ball.

TPU-native re-design of the reference's core novel math
(/root/reference/hyperbolic_vae/distributions/wrapped_normal.py:15-89):
a distribution obtained by sampling a Gaussian in the tangent space at
the origin, parallel-transporting to the tangent space at ``loc`` and
pushing through the exponential map.

    rsample:  eps ~ N(0, I);  v = scale * eps / lambda_0
              u = PT_{0->loc}(v);      z = exp_loc(u)
    log_prob: v = log_loc(x);  u = PT_{loc->0}(v) * lambda_0
              log N(u; 0, scale) - logdetexp(loc, x)

Differences from the reference, by design:
  * Pure functions + a small frozen dataclass instead of a
    torch.distributions class; PRNG keys are explicit (JAX discipline).
  * ``log_prob`` returns the per-event scalar density with shape =
    broadcast(batch shapes) — no trailing keepdim axis (the reference
    returns (..., 1) and sums later).
  * Reparameterized by construction: every op is differentiable jnp, so
    gradients flow through ``rsample`` exactly as the reference's
    ``has_rsample = True`` path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.manifolds.poincare import BOUNDARY_EPS


def max_chart_radius(ball: PoincareBall) -> float:
    """Geodesic distance from the origin to the projection boundary —
    the largest radius the f32 chart represents faithfully."""
    return 2.0 / ball.sqrt_c * math.atanh(1.0 - BOUNDARY_EPS)

_LOG_2PI = math.log(2.0 * math.pi)

# Max geodesic radius of a sample from its loc (Riemannian units).
# The f32 chart is only faithful inside the projection margin: a point
# farther than D_max = 2 artanh(sqrt(c)(1-BOUNDARY_EPS))/sqrt(c) from the
# ORIGIN is relocated by project(), so expmap/logmap stop being inverse
# bijections there — log_prob then scores a DIFFERENT point than the one
# sampled, and MC KL estimators actively exploit the mismatch (observed
# failure: posterior scale blows up, KL -> -1e5, exactly the NaN mode the
# torch reference logs warnings about). rsample therefore truncates the
# tangent draw to min(MAX_SAMPLE_RADIUS, D_max - dist0(loc)): samples
# never leave the faithful region, so log q(z) of own samples is exact.
# For healthy scales the truncated tail has probability ~0.
MAX_SAMPLE_RADIUS = 10.0


def normal_log_prob(x: jax.Array, loc, scale) -> jax.Array:
    """Elementwise N(loc, scale) log density (same as torch Normal.log_prob)."""
    var = scale * scale
    return -((x - loc) ** 2) / (2.0 * var) - jnp.log(scale) - 0.5 * _LOG_2PI


def wrapped_normal_rsample(
    key: jax.Array,
    ball: PoincareBall,
    loc: jax.Array,
    scale: jax.Array,
    sample_shape: Tuple[int, ...] = (),
) -> jax.Array:
    """Reparameterized sample; returns shape sample_shape + broadcast(loc, scale)."""
    loc, scale = jnp.broadcast_arrays(loc, scale)
    shape = tuple(sample_shape) + loc.shape
    eps = jax.random.normal(key, shape, dtype=jnp.float32)
    return wrapped_normal_rsample_from_eps(ball, loc, scale, eps)


def wrapped_normal_rsample_from_eps(
    ball: PoincareBall, loc: jax.Array, scale: jax.Array, eps: jax.Array
) -> jax.Array:
    """Deterministic rsample given the standard-normal draw (testing /
    fused-kernel parity hook)."""
    loc, scale = jnp.broadcast_arrays(loc, scale)
    v = scale * eps
    # truncate to the f32-faithful chart radius (see MAX_SAMPLE_RADIUS)
    r_allowed = jnp.maximum(
        max_chart_radius(ball) - ball.dist0(loc, keepdims=True), 1e-2
    )
    r_allowed = jnp.minimum(r_allowed, MAX_SAMPLE_RADIUS)
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v * jnp.minimum(1.0, r_allowed / jnp.maximum(v_norm, 1e-12))
    # lambda at the origin is exactly 2
    v = v / 2.0
    u = ball.transp0(loc, v)
    z = ball.expmap(loc, u)
    return z


def wrapped_normal_log_prob(
    ball: PoincareBall,
    loc: jax.Array,
    scale: jax.Array,
    x: jax.Array,
) -> jax.Array:
    """Log density at x; standard numpy broadcasting between loc/scale and x.

    Returns shape = broadcast(loc.shape[:-1], x.shape[:-1]).
    """
    v = ball.logmap(loc, x)
    v = ball.transp0back(loc, v)  # PT_{loc->0}
    u = v * 2.0  # * lambda_0
    norm_pdf = jnp.sum(normal_log_prob(u, 0.0, scale), axis=-1)
    ldexp = ball.logdetexp(loc, x, keepdims=False)
    return norm_pdf - ldexp


@dataclasses.dataclass(frozen=True)
class WrappedNormal:
    """Object wrapper with the reference's distribution API
    (loc/scale/manifold, rsample/log_prob/sample/mean)."""

    loc: jax.Array
    scale: jax.Array
    manifold: PoincareBall
    softplus: bool = False

    @property
    def _scale(self) -> jax.Array:
        return jax.nn.softplus(self.scale) if self.softplus else self.scale

    @property
    def mean(self) -> jax.Array:
        return self.loc

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(self.loc.shape, jnp.shape(self.scale))[:-1]

    @property
    def event_shape(self):
        return self.loc.shape[-1:]

    def rsample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        return wrapped_normal_rsample(key, self.manifold, self.loc, self._scale, sample_shape)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        return jax.lax.stop_gradient(self.rsample(key, sample_shape))

    def log_prob(self, x: jax.Array) -> jax.Array:
        return wrapped_normal_log_prob(self.manifold, self.loc, self._scale, x)
