"""Public pvae-parity distributions: HyperbolicRadius + HypersphericalUniform.

The reference's replication grid names these two pvae building blocks
(/root/reference/hyperbolic_vae/distributions/old_pvae_riemannian_normal.py:6-7,
31-32) and composes them into RiemannianNormal via
``expmap_polar(loc, alpha, radius)`` (ibid.:52). pvae's originals are
broken there ("fails", ibid.:66-72); these are working jax-native
re-implementations whose math is shared with
``distributions.riemannian_normal`` (closed-form log-normalizer, stable
inverse-CDF sampling) but exposed as first-class, individually testable
distributions.

Conventions (match pvae):
- ``HyperbolicRadius(dim, c, scale)``: ``dim`` is the BALL dimension d;
  the density is p(r) ∝ exp(-r²/2σ²) (sinh(√c r)/√c)^{d-1} on r ≥ 0.
- ``HypersphericalUniform(dim)``: uniform on the sphere S^dim embedded
  in R^{dim+1} (pvae passes ``event_shape[0] - 1``).

jax style: explicit PRNG keys, frozen dataclasses, static shapes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions.riemannian_normal import (
    _log_radius_density_unnorm,
    log_radius_normalizer,
    log_sphere_area,
    sample_radius,
)


@dataclasses.dataclass(frozen=True)
class HyperbolicRadius:
    """Radial part of the max-entropy normal on a curvature-c Poincare ball.

    p(r | sigma) = exp(-r^2 / 2 sigma^2) * (sinh(sqrt(c) r) / sqrt(c))^{dim-1} / Z_r(sigma)

    ``scale`` broadcasts; samples/log_probs have its shape. Differentiable
    w.r.t. ``scale`` both pathwise (rsample, through the grid CDF) and in
    log_prob (through the closed-form normalizer).
    """

    dim: int
    c: float
    scale: jax.Array

    def rsample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        scale = jnp.broadcast_to(
            jnp.asarray(self.scale, jnp.float32), tuple(sample_shape) + jnp.shape(self.scale)
        )
        return sample_radius(key, scale, self.c, self.dim)

    def log_prob(self, r: jax.Array) -> jax.Array:
        scale = jnp.asarray(self.scale, jnp.float32)
        logp = _log_radius_density_unnorm(jnp.asarray(r, jnp.float32), scale, self.c, self.dim)
        logp = logp - log_radius_normalizer(scale, self.c, self.dim)
        return jnp.where(r >= 0, logp, -jnp.inf)


@dataclasses.dataclass(frozen=True)
class HypersphericalUniform:
    """Uniform distribution on S^dim ⊂ R^{dim+1} (pvae convention).

    log_prob is the constant -log A(S^dim); entropy is log A(S^dim).
    """

    dim: int

    @property
    def _log_area(self) -> float:
        # A(S^dim) = area of the unit sphere in R^{dim+1}
        return log_sphere_area(self.dim + 1)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        g = jax.random.normal(key, tuple(sample_shape) + (self.dim + 1,), dtype=jnp.float32)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    # pvae's is non-reparameterized too; alias for API symmetry
    rsample = sample

    def log_prob(self, x: jax.Array) -> jax.Array:
        return jnp.full(jnp.shape(x)[:-1], -self._log_area, dtype=jnp.float32)

    def entropy(self) -> jax.Array:
        return jnp.asarray(self._log_area, dtype=jnp.float32)


def expmap_polar(manifold, loc: jax.Array, alpha: jax.Array, radius: jax.Array) -> jax.Array:
    """exp_loc(alpha * radius / lambda_loc): map a unit direction ``alpha`` in
    T_loc and a Riemannian distance ``radius`` to the ball.

    Parity with pvae's ``manifold.expmap_polar`` used by the reference's
    RiemannianNormal.rsample (old_pvae_riemannian_normal.py:52).
    """
    r = radius if radius.ndim == alpha.ndim else radius[..., None]
    u = alpha * r / manifold.lambda_x(loc)
    return manifold.expmap(loc, u)
