"""Fused gyroplane-distance ops: the decoder's hot path.

Naive dist2plane over P planes (reference layers.py:193-210 via geoopt)
materializes the (B, P, D) Mobius difference ``(-p) (+) x`` and reduces
it on the VPU. But for a = p (the gyroplane layer's convention) every
term of the distance depends only on |x|^2 (B,), |p|^2 (P,) and <x, p>
(B, P) — one MXU matmul:

  den   = 1 - 2c<p,x> + c^2 |p|^2 |x|^2
  alpha = (1 - 2c<p,x> + c|x|^2) / den       (coefficient of -p)
  beta  = (1 - c|p|^2) / den                 (coefficient of  x)
  <diff, p> = -alpha |p|^2 + beta <x, p>
  |diff|^2  = alpha^2 |p|^2 - 2 alpha beta <p,x> + beta^2 |x|^2
  dist = arsinh(2 sqrt(c) <diff,p> / ((1 - c|diff|^2) |p|)) / sqrt(c)

This turns an O(B P D)-memory VPU computation into a (B,D)x(D,P) matmul
plus O(B P) elementwise — the MXU formulation. Two implementations:

  * ``gyroplane_distances``: pure jnp (XLA fuses the elementwise tail
    into the matmul epilogue). Default everywhere — measured faster
    than the kernel at every (B, P) at this framework's small D
    (benchmarks/GYRO_DISPATCH.json; see the dispatch note below).
  * ``gyroplane_distances_pallas``: a tiled Pallas TPU kernel that
    keeps the |x|^2 / |p|^2 row/col stats in VMEM and fuses the
    epilogue explicitly. Falls back to interpret mode off-TPU. Kept as
    an explicitly-requested option (HVT_GYRO_PALLAS_MIN_WORK).

Both match the reference formula (manifolds.py:41-65 with a = p) to
float tolerance; see tests/test_ops.py.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.manifolds import MIN_NORM

def _interpret_mode() -> bool:
    """True when Pallas must run in interpret mode (no TPU backend).

    Resolved per call and keyed on the CURRENT default backend — a
    process that flips jax_platforms after first touching this op (the
    HVAE_FORCE_CPU path) must re-dispatch, so no once-forever cache
    (round-1 VERDICT weak #6). jax.default_backend() is itself cached by
    JAX per backend configuration, so this costs nothing under tracing.
    """
    return jax.default_backend() != "tpu"


def _arsinh_pallas(y):
    """arsinh for Pallas TPU (asinh has no Mosaic lowering):
    sign(y) * log(|y| + sqrt(y^2 + 1)), switching to log(2|y|) for large
    |y| where y^2 would overflow f32."""
    a = jnp.abs(y)
    a_small = jnp.minimum(a, 1e10)
    small = jnp.log(a_small + jnp.sqrt(a_small * a_small + 1.0))
    big = jnp.log(jnp.maximum(a, 1e-30)) + math.log(2.0)
    return jnp.sign(y) * jnp.where(a > 1e10, big, small)


def _epilogue(xp, x2, p2, c: float, signed: bool, bias=None, arsinh=jnp.arcsinh):
    """Shared elementwise tail: xp (B, P), x2 (B, 1), p2 (1, P) -> (B, P).

    ``c`` may be a traced scalar (hyperparameter-lane sweeps vmap over
    curvature); only the jnp path supports that — the Pallas dispatch
    requires a concrete float (custom_vjp nondiff argnums)."""
    sqrt_c = math.sqrt(c) if isinstance(c, (int, float)) else jnp.sqrt(c)
    den = jnp.maximum(1.0 - 2.0 * c * xp + c * c * p2 * x2, MIN_NORM)
    alpha = (1.0 - 2.0 * c * xp + c * x2) / den
    beta = (1.0 - c * p2) / den
    sc_diff_a = -alpha * p2 + beta * xp
    # the true Mobius difference lies inside the ball: |diff|^2 < 1/c.
    # The analytic form cancels in f32 for near-boundary x, p — clamp
    # into the open ball so the (1 - c|diff|^2) factor keeps its sign.
    max_d2 = (1.0 - 1e-4) ** 2 / c
    diff_norm2 = jnp.clip(
        alpha * alpha * p2 - 2.0 * alpha * beta * xp + beta * beta * x2,
        MIN_NORM,
        max_d2,
    )
    if not signed:
        sc_diff_a = jnp.abs(sc_diff_a)
    p_norm = jnp.sqrt(jnp.maximum(p2, MIN_NORM**2))
    num = 2.0 * sqrt_c * sc_diff_a
    denom = jnp.maximum((1.0 - c * diff_norm2) * p_norm, MIN_NORM)
    out = arsinh(num / denom) / sqrt_c
    if bias is not None:
        out = out + bias
    return out


def gyroplane_distances(
    x: jax.Array, points: jax.Array, c: float, signed: bool = True, bias=None
) -> jax.Array:
    """Signed distances from x (..., D) to the gyroplanes through
    ``points`` (P, D) with normals = points. Returns (..., P)."""
    # at LEAST f32 (bf16 upcasts, f32 no-op); f64 inputs keep full width
    # for the multichip-drift anchor leg (__graft_entry__)
    dt = jnp.promote_types(jnp.float32, jnp.promote_types(x.dtype, points.dtype))
    x = x.astype(dt)
    points = points.astype(dt)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (..., 1)
    p2 = jnp.sum(points * points, axis=-1)  # (P,)
    xp = jnp.matmul(x, points.T, preferred_element_type=dt)  # (..., P)
    return _epilogue(xp, x2, p2[None, :] if x.ndim > 1 else p2, c, signed, bias)


# ---------------------------------------------------------------------- #
# Differentiable dispatch. Default: the jnp analytic epilogue at EVERY
# shape — measured on the real chip (benchmarks/GYRO_DISPATCH.json,
# round 4), the Pallas forward loses everywhere at the small D this
# framework uses (latent_dim 2-10): full RNASeqVAE train step 32.3 vs
# 31.0 ms/epoch, full conv-VAE step 42.9 vs 30.2 ms/epoch
# (CONV_ROOFLINE.json), and the standalone-op gap WIDENS with size
# (B=8192, P=2048, D=2: fwd 66.6 ms Pallas vs 33.3 ms jnp). The op is
# epilogue/bandwidth-bound at small D: XLA fuses the jnp epilogue into
# neighboring kernels, while the Pallas call is a fusion barrier plus
# its own dispatch. The kernel stays available (tests force it via
# _PALLAS_MIN_WORK; HVT_GYRO_PALLAS_MIN_WORK=<B*P> re-enables the old
# auto-dispatch for future hardware where the trade flips). The
# backward is always jnp: two matmuls + the epilogue VJP, which XLA
# fuses well on its own (Pallas kernels have no automatic VJP).

_PALLAS_MIN_WORK = int(
    os.environ.get("HVT_GYRO_PALLAS_MIN_WORK", 1 << 62)  # default: never
)


def _dist_from_stats(x, points, c, signed, bias):
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    p2 = jnp.sum(points * points, axis=-1)[None, :]
    xp = jnp.matmul(x, points.T, preferred_element_type=jnp.float32)
    return _epilogue(xp, x2, p2, c, signed, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gyroplane_distances_fast(x, points, c: float, signed: bool = True, bias=None):
    """Like gyroplane_distances for 2-D x, with a custom VJP (the
    backward never re-materializes the forward's intermediates). The
    forward lowers to the Pallas kernel only when B*P >= the
    HVT_GYRO_PALLAS_MIN_WORK opt-in threshold (default: never — the
    XLA-fused jnp epilogue measured faster at every shape at small D,
    benchmarks/GYRO_DISPATCH.json)."""
    B, P = x.shape[0], points.shape[0]
    if B * P >= _PALLAS_MIN_WORK and not _interpret_mode():
        return gyroplane_distances_pallas(x, points, c, signed=signed, bias=bias)
    return _dist_from_stats(
        x.astype(jnp.float32), points.astype(jnp.float32), c, signed,
        None if bias is None else bias[None, :],
    )


def _gdf_fwd(x, points, c, signed, bias=None):
    out = gyroplane_distances_fast(x, points, c, signed, bias)
    return out, (x, points, bias)


def _gdf_bwd(c, signed, residuals, g):
    x, points, bias = residuals
    x = x.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if bias is None:
        _, vjp = jax.vjp(
            lambda xx, pp: _dist_from_stats(xx, pp, c, signed, None), x, points
        )
        dx, dp = vjp(g)
        return dx, dp, None
    _, vjp = jax.vjp(
        lambda xx, pp, bb: _dist_from_stats(xx, pp, c, signed, bb[None, :]),
        x, points, bias,
    )
    return vjp(g)


gyroplane_distances_fast.defvjp(_gdf_fwd, _gdf_bwd)


# ---------------------------------------------------------------------- #
# Pallas kernel: tiles (B, P), full D contraction per tile.


def _gyroplane_kernel(x_ref, pt_ref, bias_ref, out_ref, *, c: float, signed: bool):
    x = x_ref[:]  # (TB, D)
    p = pt_ref[:]  # (TP, D)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (TB, 1)
    p2 = jnp.sum(p * p, axis=-1)[None, :]  # (1, TP)
    xp = jax.lax.dot_general(
        x, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TB, TP)
    out_ref[:] = _epilogue(
        xp, x2, p2, c, signed, bias_ref[:], arsinh=_arsinh_pallas
    )


def gyroplane_distances_pallas(
    x: jax.Array,
    points: jax.Array,
    c: float,
    signed: bool = True,
    bias=None,
    block_b: int = 256,
    block_p: int = 256,
) -> jax.Array:
    """Tiled Pallas version for 2-D x (B, D). Requires B % block_b == 0
    and P % block_p == 0 after clamping blocks to the array sizes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert x.ndim == 2, "pallas path expects (B, D)"
    B, D = x.shape
    P = points.shape[0]
    if bias is None:
        bias = jnp.zeros((P,), jnp.float32)
    block_b = min(block_b, B)
    block_p = min(block_p, P)
    grid = (pl.cdiv(B, block_b), pl.cdiv(P, block_p))
    kernel = functools.partial(_gyroplane_kernel, c=c, signed=signed)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, P), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            # bias carried as (1, P): Mosaic rejects 1-D blocked operands
            pl.BlockSpec((1, block_p), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_p), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret_mode(),
    )(
        x.astype(jnp.float32),
        points.astype(jnp.float32),
        jnp.asarray(bias, jnp.float32).reshape(1, -1),
    )
