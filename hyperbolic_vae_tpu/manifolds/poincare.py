"""Poincare-ball manifold math as pure, jit/vmap-clean jnp functions.

This module is the TPU-native replacement for everything the reference
repo outsources to the third-party ``geoopt`` library (see
/root/reference/hyperbolic_vae/manifolds.py and geoopt pin in
/root/reference/pyproject.toml:27), plus the reference's own
``logdetexp`` (manifolds.py:25-35) and ``normdist2plane``
(manifolds.py:41-65).

Design notes (TPU-first):
  * Every function operates on the trailing axis as the coordinate axis
    and broadcasts over leading axes, so they are `vmap`-free by
    construction and fuse into surrounding XLA computations.
  * Curvature ``c`` is a Python float held in the :class:`PoincareBall`
    dataclass -> static under jit, so XLA constant-folds ``sqrt(c)`` etc.
  * All math is done in float32 (or the input dtype if wider); bf16
    inputs are upcast at entry and downcast on exit, because ``artanh``
    near the boundary and the ``1 - c*|x|^2`` conformal denominators are
    catastrophically unstable in bf16.
  * Boundary handling: points are clamped to radius (1-BOUNDARY_EPS)/sqrt(c)
    (`project`), norms clamped by MIN_NORM = 1e-15 — mirroring the
    reference's MIN_NORM (manifolds.py:38) and geoopt's projection eps.
  * ``logdetexp`` is computed in log-space via a numerically-stable
    log(sinh(t)/t) helper, following the reference's deliberate log-space
    form (manifolds.py:35) but additionally stable at t -> 0.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

MIN_NORM = 1e-15
# Max tanh argument before f32 saturates; artanh input clamp.
TANH_CLAMP = 15.0
# Projection margin: points are clamped to radius (1-eps)/sqrt(c).
# geoopt uses 4e-3 for float32 (1e-5 only for float64) — the reference
# trained under exactly this margin. With a 1e-5 margin the conformal
# factor reaches ~1e5 at the boundary and f32 gradients overflow
# (observed: posterior means migrate to the boundary late in training).
BOUNDARY_EPS = 4e-3


def _upcast(x):
    """bf16/f16 -> f32 for stable manifold math."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32)
    return x


def artanh(x: jax.Array) -> jax.Array:
    """Numerically-safe arctanh: clamps |x| <= 1 - eps before arctanh."""
    eps = jnp.finfo(x.dtype).eps
    x = jnp.clip(x, -1.0 + eps, 1.0 - eps)
    return jnp.arctanh(x)


def arsinh(x: jax.Array) -> jax.Array:
    return jnp.arcsinh(x)


def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(jnp.clip(x, -TANH_CLAMP, TANH_CLAMP))


def log_sinh_ratio(t: jax.Array) -> jax.Array:
    """log(sinh(t)/t), stable for all t >= 0.

    For t >= 0.2 uses log sinh(t) - log t with
    log sinh(t) = t + log1p(-exp(-2t)) - log 2 (no overflow for large t).
    For t < 0.2 the log-space form cancels catastrophically in f32, so we
    use the series log(sinh(t)/t) = t^2/6 - t^4/180 + t^6/2835 + O(t^8)
    (truncation error < 1e-9 at t = 0.2).
    """
    # The big branch is only selected for t >= 0.2, but jnp.where evaluates
    # (and differentiates) BOTH branches: clamp its input well away from 0,
    # where exp(-2t) rounds to 1.0 in TPU f32 and log1p(-1) = -inf would
    # poison gradients through the where.
    t_safe = jnp.maximum(t, 0.1)
    big = t_safe + jnp.log1p(-jnp.exp(-2.0 * t_safe)) - math.log(2.0) - jnp.log(t_safe)
    t2 = t * t
    small = t2 / 6.0 - t2 * t2 / 180.0 + t2 * t2 * t2 / 2835.0
    return jnp.where(t < 0.2, small, big)


def _sq_norm(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sum(x * x, axis=-1, keepdims=keepdims)


def _norm(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sqrt(jnp.maximum(_sq_norm(x, keepdims), MIN_NORM**2))


@dataclasses.dataclass(frozen=True)
class PoincareBall:
    """Poincare ball of curvature ``c`` (> 0), radius 1/sqrt(c).

    Functional equivalent of ``geoopt.PoincareBall`` (the reference's
    manifold object, /root/reference/hyperbolic_vae/manifolds.py:12) with
    the reference's extra functions attached as methods. ``c`` is static
    under jit.
    """

    c: float = 1.0

    # ---- basic geometry -------------------------------------------------

    @property
    def sqrt_c(self):
        """sqrt(c). Stays a Python float for static curvature (plot
        ranges etc. rely on that); becomes a jnp scalar when ``c`` is a
        traced value (hyperparameter-lane sweeps vmap over curvature —
        train/ensemble.py fit_lane_sweep)."""
        if isinstance(self.c, (int, float)):
            return math.sqrt(self.c)
        return jnp.sqrt(self.c)

    @property
    def radius(self):
        return 1.0 / self.sqrt_c

    def origin(self, shape, dtype=jnp.float32) -> jax.Array:
        """Origin of the ball; matches geoopt ``PoincareBall.origin``."""
        if isinstance(shape, int):
            shape = (shape,)
        return jnp.zeros(shape, dtype=dtype)

    def project(self, x: jax.Array) -> jax.Array:
        """Clamp points into the open ball: |x| <= (1-eps)/sqrt(c).

        Equivalent of geoopt's ``projx`` used throughout the reference's
        training path to keep iterates on-manifold.
        """
        x = _upcast(x)
        max_norm = (1.0 - BOUNDARY_EPS) / self.sqrt_c
        norm = _norm(x)
        scale = jnp.minimum(max_norm / norm, 1.0)
        return x * scale

    def lambda_x(self, x: jax.Array, keepdims: bool = True) -> jax.Array:
        """Conformal factor lambda_x = 2 / (1 - c|x|^2)."""
        x = _upcast(x)
        denom = jnp.maximum(1.0 - self.c * _sq_norm(x, keepdims), MIN_NORM)
        return 2.0 / denom

    # ---- Mobius operations ----------------------------------------------

    def mobius_add(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Mobius addition x (+) y on the c-ball."""
        x, y = _upcast(x), _upcast(y)
        c = self.c
        x2 = _sq_norm(x)
        y2 = _sq_norm(y)
        xy = jnp.sum(x * y, axis=-1, keepdims=True)
        num = (1.0 + 2.0 * c * xy + c * y2) * x + (1.0 - c * x2) * y
        denom = 1.0 + 2.0 * c * xy + c * c * x2 * y2
        return num / jnp.maximum(denom, MIN_NORM)

    def mobius_neg(self, x: jax.Array) -> jax.Array:
        return -x

    def gyration(self, u: jax.Array, v: jax.Array, w: jax.Array) -> jax.Array:
        """Gyration operator gyr[u, v] w = -(u (+) v) (+) (u (+) (v (+) w))."""
        return self.mobius_add(
            -self.mobius_add(u, v), self.mobius_add(u, self.mobius_add(v, w))
        )

    def mobius_matvec(self, m: jax.Array, x: jax.Array) -> jax.Array:
        """Mobius matrix-vector product M (x) x.

        M is an (out, in) weight matrix; x has trailing dim ``in``.
        M (x) x = tanh(|Mx|/|x| * artanh(sqrt(c)|x|)) * Mx / (sqrt(c)|Mx|).
        Hits the MXU via a plain matmul (preferred f32 accumulation) with
        the Mobius rescaling fused around it; replaces geoopt's
        ``mobius_matvec`` used by the reference's MobiusLayer
        (/root/reference/hyperbolic_vae/layers.py:146).
        """
        x = _upcast(x)
        m = _upcast(m)
        sqrt_c = self.sqrt_c
        x_norm = _norm(x)
        mx = jnp.matmul(
            x, m.T,
            preferred_element_type=jnp.promote_types(jnp.float32, x.dtype),
        )
        mx_norm = _norm(mx)
        res = (
            tanh(mx_norm / x_norm * artanh(sqrt_c * x_norm))
            * mx
            / (mx_norm * sqrt_c)
        )
        # Mx == 0 -> result is the origin.
        zero_mask = jnp.all(mx == 0.0, axis=-1, keepdims=True)
        res = jnp.where(zero_mask, jnp.zeros_like(res), res)
        return self.project(res)

    def mobius_scalar_mul(self, r, x: jax.Array) -> jax.Array:
        """r (x) x = tanh(r * artanh(sqrt(c)|x|)) x / (sqrt(c)|x|)."""
        x = _upcast(x)
        sqrt_c = self.sqrt_c
        x_norm = _norm(x)
        res = tanh(r * artanh(sqrt_c * x_norm)) * x / (x_norm * sqrt_c)
        return self.project(res)

    # ---- exp / log maps ---------------------------------------------------

    def expmap(self, x: jax.Array, u: jax.Array) -> jax.Array:
        """Exponential map exp_x(u)."""
        x, u = _upcast(x), _upcast(u)
        sqrt_c = self.sqrt_c
        u_norm = _norm(u)
        lam = self.lambda_x(x)
        second = tanh(sqrt_c * lam * u_norm / 2.0) * u / (sqrt_c * u_norm)
        return self.project(self.mobius_add(x, second))

    def expmap0(self, u: jax.Array) -> jax.Array:
        """exp_0(u) = tanh(sqrt(c)|u|) u / (sqrt(c)|u|)."""
        u = _upcast(u)
        sqrt_c = self.sqrt_c
        u_norm = _norm(u)
        return self.project(tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm))

    def logmap(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Log map log_x(y)."""
        x, y = _upcast(x), _upcast(y)
        sqrt_c = self.sqrt_c
        sub = self.mobius_add(-x, y)
        sub_norm = _norm(sub)
        lam = self.lambda_x(x)
        return 2.0 / (sqrt_c * lam) * artanh(sqrt_c * sub_norm) * sub / sub_norm

    def logmap0(self, y: jax.Array) -> jax.Array:
        """log_0(y) = artanh(sqrt(c)|y|) y / (sqrt(c)|y|)."""
        y = _upcast(y)
        sqrt_c = self.sqrt_c
        y_norm = _norm(y)
        return artanh(sqrt_c * y_norm) * y / (sqrt_c * y_norm)

    # ---- transport --------------------------------------------------------

    def transp(self, x: jax.Array, y: jax.Array, v: jax.Array) -> jax.Array:
        """Parallel transport of v in T_x to T_y: gyr[y, -x] v * lam_x/lam_y."""
        x, y, v = _upcast(x), _upcast(y), _upcast(v)
        return self.gyration(y, -x, v) * self.lambda_x(x) / self.lambda_x(y)

    def transp0(self, y: jax.Array, v: jax.Array) -> jax.Array:
        """Transport from the origin to y: v * (1 - c|y|^2) (gyration = id)."""
        y, v = _upcast(y), _upcast(v)
        return v * jnp.maximum(1.0 - self.c * _sq_norm(y), MIN_NORM)

    def transp0back(self, y: jax.Array, v: jax.Array) -> jax.Array:
        """Transport from y back to the origin: v * lam_y / 2."""
        y, v = _upcast(y), _upcast(v)
        return v * self.lambda_x(y) / 2.0

    # ---- distances ---------------------------------------------------------

    def dist(self, x: jax.Array, y: jax.Array, keepdims: bool = False) -> jax.Array:
        """Geodesic distance d(x, y) = (2/sqrt(c)) artanh(sqrt(c) |(-x) (+) y|)."""
        x, y = _upcast(x), _upcast(y)
        sqrt_c = self.sqrt_c
        sub_norm = _norm(self.mobius_add(-x, y), keepdims=keepdims)
        return 2.0 / sqrt_c * artanh(sqrt_c * sub_norm)

    def dist0(self, x: jax.Array, keepdims: bool = False) -> jax.Array:
        x = _upcast(x)
        sqrt_c = self.sqrt_c
        return 2.0 / sqrt_c * artanh(sqrt_c * _norm(x, keepdims=keepdims))

    def dist2plane(
        self,
        x: jax.Array,
        p: jax.Array,
        a: jax.Array,
        signed: bool = False,
        scaled: bool = False,
        keepdims: bool = False,
    ) -> jax.Array:
        """Distance from x to the gyroplane through p with tangent normal a.

        dist = arsinh( 2 sqrt(c) <(-p)(+)x, a> / ((1 - c|(-p)(+)x|^2) |a|) ) / sqrt(c)

        Equivalent of geoopt ``PoincareBall.dist2plane`` (used by the
        reference's Distance2PoincareHyperplanes, layers.py:200) and, with
        ``scaled=True``, of the reference's ``normdist2plane(norm=True)``
        (manifolds.py:63-64) which multiplies by |a|.
        """
        x, p, a = _upcast(x), _upcast(p), _upcast(a)
        c = self.c
        sqrt_c = self.sqrt_c
        diff = self.mobius_add(-p, x)
        diff_norm2 = jnp.maximum(_sq_norm(diff, keepdims=keepdims), MIN_NORM)
        sc_diff_a = jnp.sum(diff * a, axis=-1, keepdims=keepdims)
        if not signed:
            sc_diff_a = jnp.abs(sc_diff_a)
        a_norm = jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=keepdims), MIN_NORM**2))
        num = 2.0 * sqrt_c * sc_diff_a
        denom = jnp.maximum((1.0 - c * diff_norm2) * a_norm, MIN_NORM)
        res = arsinh(num / denom) / sqrt_c
        if scaled:
            res = res * a_norm
        return res

    # ---- Riemannian structure (for the optimizer) ---------------------------

    def egrad2rgrad(self, x: jax.Array, grad: jax.Array) -> jax.Array:
        """Euclidean -> Riemannian gradient: grad / lambda_x^2."""
        lam = self.lambda_x(x)
        return grad / (lam * lam)

    def component_inner(self, x: jax.Array, u: jax.Array, v: Optional[jax.Array] = None) -> jax.Array:
        """Per-component metric inner product lambda_x^2 * u * v.

        Matches geoopt's ``component_inner`` used by RiemannianAdam's
        second-moment accumulator.
        """
        if v is None:
            v = u
        lam = self.lambda_x(x)
        return (lam * lam) * u * v

    def inner(self, x: jax.Array, u: jax.Array, v: Optional[jax.Array] = None, keepdims: bool = False) -> jax.Array:
        if v is None:
            v = u
        lam = self.lambda_x(x, keepdims=keepdims)
        return (lam * lam) * jnp.sum(u * v, axis=-1, keepdims=keepdims)

    def retr(self, x: jax.Array, u: jax.Array) -> jax.Array:
        """Retraction = exact exponential map (geoopt PoincareBall does the same)."""
        return self.expmap(x, u)

    def retr_transp(self, x: jax.Array, u: jax.Array, v: jax.Array):
        """Retract x along u and transport v to the new point."""
        y = self.expmap(x, u)
        return y, self.transp(x, y, v)

    # ---- reference extras ---------------------------------------------------

    def logdetexp(self, x: jax.Array, y: jax.Array, keepdims: bool = False) -> jax.Array:
        """log|det d(exp_x)| at log_x(y): the volume-change term of the
        wrapped normal density.

        (d-1) * log( sinh(sqrt(c) d(x,y)) / (sqrt(c) d(x,y)) ),
        computed via the stable log(sinh(t)/t) helper. Mirrors the
        reference's log-space form (manifolds.py:35) and is additionally
        exact at d(x,y) -> 0 (the reference's form is 0*log(0) there).
        """
        d = self.dist(x, y, keepdims=keepdims)
        dim = x.shape[-1]
        t = self.sqrt_c * d
        return (dim - 1) * log_sinh_ratio(t)

    def normdist2plane(
        self,
        x: jax.Array,
        a: jax.Array,
        p: jax.Array,
        signed: bool = False,
        norm: bool = False,
        keepdims: bool = False,
    ) -> jax.Array:
        """Reference-compatible signature (manifolds.py:41-65): distance
        from x to the gyroplane through ``p`` with normal ``a``; with
        ``norm=True`` multiplies by |a| (the GeodesicLayer scaling)."""
        return self.dist2plane(x, p, a, signed=signed, scaled=norm, keepdims=keepdims)

    def check_point_on_manifold(self, x: jax.Array, atol: float = 1e-5) -> jax.Array:
        """|x|^2 * c < 1 (+ atol). Returns a boolean array (one per point)."""
        return self.c * _sq_norm(x, keepdims=False) <= 1.0 + atol

    # ---- sampling helpers ----------------------------------------------------

    def wrapped_normal(self, key: jax.Array, shape, mean: jax.Array, std=1.0) -> jax.Array:
        """Sample from a wrapped normal centred at ``mean`` (convenience;
        delegates to distributions.wrapped_normal so the tangent draw is
        scaled by lambda at the ORIGIN (=2) and chart-truncated exactly
        like the distribution's rsample/log_prob pair)."""
        from hyperbolic_vae_tpu.distributions.wrapped_normal import (
            wrapped_normal_rsample_from_eps,
        )

        eps = jax.random.normal(key, shape, dtype=jnp.float32)
        std = jnp.broadcast_to(jnp.asarray(std, jnp.float32), shape)
        return wrapped_normal_rsample_from_eps(self, mean, std, eps)


# Reference-parity alias (/root/reference/hyperbolic_vae/manifolds.py:12).
PoincareBallWithExtras = PoincareBall


def logdetexp(ball: PoincareBall, x: jax.Array, y: jax.Array, keepdims: bool = False) -> jax.Array:
    """Free-function form matching the reference manifolds.logdetexp."""
    return ball.logdetexp(x, y, keepdims=keepdims)


def normdist2plane(ball: PoincareBall, x, a, p, signed=False, norm=False, keepdims=False):
    """Free-function form matching the reference manifolds.normdist2plane."""
    return ball.normdist2plane(x, a, p, signed=signed, norm=norm, keepdims=keepdims)
