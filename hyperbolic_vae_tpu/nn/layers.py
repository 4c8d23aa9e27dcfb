"""Hyperbolic NN layers (flax.linen).

TPU-native re-design of /root/reference/hyperbolic_vae/layers.py. The
reference's layer semantics are preserved:

  * Riemannian parameterization (layers.py:35-76): a Euclidean weight
    living in T_0, a bias that is either a reparameterized point
    ``expmap0(weight * bias_scalar)`` or (over_param) a raw manifold
    point; the effective weight is the parallel transport of the T_0
    weight to T_bias.
  * GeodesicLayer (layers.py:79-121): out_features signed, optionally
    norm-scaled gyroplane distances.
  * MobiusLayer (layers.py:133-147): Mobius matrix-vector product.
  * ExpMap0 (layers.py:124-130).
  * Distance2PoincareHyperplanes (layers.py:150-228): num_planes learned
    manifold points; forward = dist2plane(x, p=points, a=points, signed)
    with optional squaring and a Euclidean bias; init places planes at
    expmap0(direction * radius), radius ~ N(0, std).

Manifold-valued parameters are tagged by NAME CONVENTION: any flax param
whose name starts with ``mp_`` is a point on the Poincare ball and gets
the Riemannian update path in ``hyperbolic_vae_tpu.optim.riemannian_adam``
(rescaled gradient, expmap retraction, momentum transport). Everything
else is Euclidean. This replaces geoopt's ``ManifoldParameter`` runtime
type dispatch with a static pytree labeling — free at trace time.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.manifolds import PoincareBall

MANIFOLD_PARAM_PREFIX = "mp_"


def kaiming_normal_a_sqrt5(key, shape, dtype=jnp.float32):
    """torch ``init.kaiming_normal_(w, a=sqrt(5))`` on an (out, in) matrix:
    std = sqrt(2 / (1 + a^2)) / sqrt(fan_in) = sqrt(1/3) / sqrt(fan_in)."""
    fan_in = shape[-1]
    std = math.sqrt(2.0 / (1.0 + 5.0)) / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std


class ExpMap0(fnn.Module):
    """Map Euclidean vectors onto the ball (reference layers.py:124-130)."""

    ball: PoincareBall

    @fnn.compact
    def __call__(self, x):
        return self.ball.expmap0(x)


class LogMap0(fnn.Module):
    """Inverse of ExpMap0 — convenience for logmap0-style decoders."""

    ball: PoincareBall

    @fnn.compact
    def __call__(self, x):
        return self.ball.logmap0(x)


class _RiemannianParams(fnn.Module):
    """Shared parameterization for Geodesic/Mobius layers
    (reference RiemannianLayer, layers.py:35-76)."""

    in_features: int
    out_features: int
    ball: PoincareBall
    over_param: bool = False
    weight_norm: bool = False

    def _params(self):
        w = self.param(
            "weight_t0",
            kaiming_normal_a_sqrt5,
            (self.out_features, self.in_features),
        )
        fan_in = self.in_features
        bound = 4.0 / math.sqrt(fan_in)
        if self.over_param:
            # raw manifold point: init uniform then expmap0 (layers.py:74-76)
            def init_bias(key, shape, dtype=jnp.float32):
                b = jax.random.uniform(key, shape, dtype, -bound, bound)
                return self.ball.expmap0(b)

            bias_point = self.param(
                "mp_bias", init_bias, (self.out_features, self.in_features)
            )
        else:
            bias_scalar = self.param(
                "bias_scalar",
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -bound, bound
                ),
                (self.out_features, 1),
            )
            bias_point = self.ball.expmap0(w * bias_scalar)  # layers.py:67
        weight = self.ball.transp0(bias_point, w)  # T_0 -> T_bias (layers.py:60)
        return weight, bias_point


class GeodesicLayer(_RiemannianParams):
    """out_features signed gyroplane distances (reference layers.py:79-121).

    NOTE the reference's (surprising but live) convention: the gyroplane
    passes through ``weight`` (a transported tangent vector used as a
    point) with normal ``bias`` (a manifold point used as a normal) —
    normdist2plane(x, a=bias, p=weight) at layers.py:103-110. Preserved
    for parity.
    """

    @fnn.compact
    def __call__(self, x):
        weight, bias_point = self._params()
        # x: (..., in) -> (..., out, in) against per-plane params
        x_exp = x[..., None, :]
        return self.ball.normdist2plane(
            x_exp, a=bias_point, p=weight, signed=True, norm=self.weight_norm
        )


class MobiusLayer(_RiemannianParams):
    """Mobius matrix-vector product layer (reference layers.py:133-147)."""

    @fnn.compact
    def __call__(self, x):
        weight, _ = self._params()
        return self.ball.mobius_matvec(weight, x)


class PoincareHyperplanes(fnn.Module):
    """Gyroplane distance layer: ``num_planes`` learned manifold points,
    forward = dist2plane(x, p=points, a=points, signed) + bias.

    Covers both the reference's own Distance2PoincareHyperplanes
    (layers.py:150-228) and the geoopt Distance2StereographicHyperplanes
    it mirrors (used by the flagship script _6 decoder,
    vae_hyperbolic_gyroplane_decoder.py:70-74).

    The distance over many planes is the decoder's hot op; the analytic
    MXU formulation (one matmul + fused epilogue) lives in
    hyperbolic_vae_tpu.ops.gyroplane, alongside an opt-in Pallas kernel
    (measured slower at this framework's shapes — GYRO_DISPATCH.json).
    """

    plane_shape: int
    num_planes: int
    ball: PoincareBall
    signed: bool = True
    squared: bool = False
    use_bias: bool = True
    std: float = 1.0

    @fnn.compact
    def __call__(self, x):
        def init_points(key, shape, dtype=jnp.float32):
            # direction uniform on the sphere, radius ~ N(0, std)
            k1, k2 = jax.random.split(key)
            direction = jax.random.normal(k1, shape, dtype)
            direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
            distance = jax.random.normal(k2, shape[:-1] + (1,), dtype) * self.std
            return self.ball.expmap0(direction * distance)

        points = self.param(
            "mp_points", init_points, (self.num_planes, self.plane_shape)
        )
        # fused formulation: one MXU matmul instead of a (..., P, D)
        # Mobius-difference intermediate; the XLA-fused jnp epilogue is
        # the measured-fastest dispatch at every shape (ops/gyroplane.py
        # dispatch note, benchmarks/GYRO_DISPATCH.json)
        from hyperbolic_vae_tpu.ops.gyroplane import (
            gyroplane_distances,
            gyroplane_distances_fast,
        )

        if (
            x.ndim == 2
            and isinstance(self.ball.c, (int, float))
            and x.dtype != jnp.float64
        ):
            distance = gyroplane_distances_fast(x, points, self.ball.c, self.signed, None)
        else:
            # traced curvature (hparam-lane sweeps), batched ranks, or the
            # f64 drift-anchor leg (__graft_entry__): the pure-jnp path
            # (the Pallas fast path needs a concrete c and computes f32)
            distance = gyroplane_distances(x, points, self.ball.c, signed=self.signed)
        if self.squared and self.signed:
            distance = jnp.sign(distance) * distance * distance
        elif self.squared:
            distance = distance * distance
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -1.0, 1.0
                ),
                (self.num_planes,),
            )
            distance = distance + bias
        return distance


# geoopt-parity aliases
Distance2PoincareHyperplanes = PoincareHyperplanes
Distance2StereographicHyperplanes = PoincareHyperplanes


def is_manifold_param(path_tuple) -> bool:
    """True if a flax param path (tuple of str keys) names a manifold point."""
    leaf_name = path_tuple[-1] if path_tuple else ""
    return str(leaf_name).startswith(MANIFOLD_PARAM_PREFIX)
