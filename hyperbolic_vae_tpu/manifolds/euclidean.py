"""Trivial Euclidean manifold — the c -> 0 limit of the Poincare ball.

Exists so models and the Riemannian optimizer can treat "flat latent
space" (the reference's ``latent_curvature in (0, None)`` branch,
/root/reference/hyperbolic_vae/models/vae_one_b.py:40) uniformly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Euclidean:
    def origin(self, shape, dtype=jnp.float32) -> jax.Array:
        if isinstance(shape, int):
            shape = (shape,)
        return jnp.zeros(shape, dtype=dtype)

    def project(self, x):
        return x

    def expmap(self, x, u):
        return x + u

    def expmap0(self, u):
        return u

    def logmap(self, x, y):
        return y - x

    def logmap0(self, y):
        return y

    def transp(self, x, y, v):
        return v

    def transp0(self, y, v):
        return v

    def dist(self, x, y, keepdims: bool = False):
        return jnp.linalg.norm(y - x, axis=-1, keepdims=keepdims)

    def egrad2rgrad(self, x, grad):
        return grad

    def component_inner(self, x, u, v: Optional[jax.Array] = None):
        if v is None:
            v = u
        return u * v

    def retr(self, x, u):
        return x + u

    def retr_transp(self, x, u, v):
        return x + u, v
