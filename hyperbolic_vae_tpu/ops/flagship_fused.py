"""Fully-fused forward+loss for the flagship GyroplaneVAE step.

The flagship model is tiny (784 -> 64 -> 16 -> 2 -> 16 -> 64 -> 784), so
a training step on TPU is latency-bound on ~15-20 small kernel launches,
not FLOPs. This module collapses the ENTIRE forward + ELBO loss into a
single Pallas kernel (weights + a full batch fit comfortably in VMEM),
with gradients supplied by a custom VJP that re-runs a pure-jnp mirror
of the same math (recompute backward — the residuals are just the
inputs).

Three pieces:
  * ``flagship_forward_jnp``: pure-jnp mirror of GyroplaneVAE.loss given
    raw parameter arrays. This is the semantic ground truth — tests
    assert it matches ``model.apply(..., method='loss')`` bit-for-bit
    (same ops, same order), and the backward differentiates it.
  * ``_flagship_kernel``: the Pallas TPU kernel (manual artanh/arsinh —
    no Mosaic lowerings exist), one grid cell per batch tile.
  * ``fused_flagship_loss``: custom_vjp dispatcher (Pallas forward on
    TPU, mirror elsewhere) + ``make_fused_loss_fn(model)`` which adapts
    a GyroplaneVAE's param pytree.

Supported config = the flagship defaults: hidden_dims (64, 16), any
latent/data sizes, c/beta/prior_scale free. make_fused_loss_fn validates.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.distributions.wrapped_normal import (
    MAX_SAMPLE_RADIUS,
    max_chart_radius,
)
from hyperbolic_vae_tpu.manifolds import MIN_NORM
from hyperbolic_vae_tpu.manifolds.poincare import BOUNDARY_EPS, TANH_CLAMP

_LOG_2PI = math.log(2.0 * math.pi)


def _params_tuple(params) -> tuple:
    """Flatten the GyroplaneVAE param pytree into a fixed tuple."""
    g = params["gyroplanes"]
    return (
        params["enc_0"]["kernel"], params["enc_0"]["bias"],
        params["enc_1"]["kernel"], params["enc_1"]["bias"],
        params["mu"]["kernel"], params["mu"]["bias"],
        params["scale"]["kernel"], params["scale"]["bias"],
        g["mp_points"], g["bias"],
        params["dec_0"]["kernel"], params["dec_0"]["bias"],
        params["out"]["kernel"], params["out"]["bias"],
    )


# ---------------------------------------------------------------------- #
# Shared math, written with only Pallas-lowerable primitives (manual
# artanh/arsinh; tanh/log/exp/sqrt/erf-free gelu are all supported).


def _artanh(x):
    x = jnp.clip(x, -1.0 + 1.19e-7, 1.0 - 1.19e-7)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def _arsinh(y):
    a = jnp.abs(y)
    a_small = jnp.minimum(a, 1e10)
    small = jnp.log(a_small + jnp.sqrt(a_small * a_small + 1.0))
    big = jnp.log(jnp.maximum(a, 1e-30)) + math.log(2.0)
    return jnp.sign(y) * jnp.where(a > 1e10, big, small)


def _tanh(x):
    return jnp.tanh(jnp.clip(x, -TANH_CLAMP, TANH_CLAMP))


def _gelu(x):
    # jax.nn.gelu(approximate=True): tanh-based, matches flax fnn.gelu
    c0 = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c0 * (x + 0.044715 * x * x * x)))


def _norm(v):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), MIN_NORM**2))


def _log_sinh_ratio(t):
    t_safe = jnp.maximum(t, 0.1)
    big = t_safe + jnp.log1p(-jnp.exp(-2.0 * t_safe)) - math.log(2.0) - jnp.log(t_safe)
    t2 = t * t
    small = t2 / 6.0 - t2 * t2 / 180.0 + t2 * t2 * t2 / 2835.0
    return jnp.where(t < 0.2, small, big)


def _body(x, eps, p, *, c, beta, prior_scale, latent_dim, data_numel, dot,
          bcast=None):
    """Forward + loss, parameterized by the dot primitive so the same
    code serves the jnp mirror and the Pallas kernel. ``bcast`` lifts a
    (1, k) row to (B, k): numpy broadcasting in the mirror, an
    ones(B,1) @ row matmul in the kernel — Mosaic cannot lower the
    axis-0 (sublane) reductions that AD's transpose of a plain broadcast
    would otherwise emit for the bias gradients."""
    (w1, b1, w2, b2, wm, bm, ws, bs, pts, pb, w4, b4, w5, b5) = p
    if bcast is None:
        bcast = lambda row: row
    sqrt_c = math.sqrt(c)
    max_norm = (1.0 - BOUNDARY_EPS) / sqrt_c
    d_max = 2.0 / sqrt_c * math.atanh(1.0 - BOUNDARY_EPS)

    xf = x.reshape(x.shape[0], -1)
    h = _gelu(dot(xf, w1) + bcast(b1))
    h = _gelu(dot(h, w2) + bcast(b2))
    mu_e = dot(h, wm) + bcast(bm)
    # expmap0 + project
    mu_n = _norm(mu_e)
    mu = _tanh(sqrt_c * mu_n) * mu_e / (sqrt_c * mu_n)
    mu = mu * jnp.minimum(max_norm / _norm(mu), 1.0)
    scale = jnp.clip(jax.nn.softplus(dot(h, ws) + bcast(bs)) + 1e-3, 1e-3, 10.0)

    # wrapped normal rsample (truncated tangent draw)
    mu2 = jnp.sum(mu * mu, axis=-1, keepdims=True)
    dist0_mu = 2.0 / sqrt_c * _artanh(sqrt_c * jnp.sqrt(jnp.maximum(mu2, MIN_NORM**2)))
    r_allowed = jnp.minimum(jnp.maximum(d_max - dist0_mu, 1e-2), MAX_SAMPLE_RADIUS)
    v = scale * eps
    v_norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-24))
    v = v * jnp.minimum(1.0, r_allowed / v_norm)
    v = v / 2.0
    lam_mu = 2.0 / jnp.maximum(1.0 - c * mu2, MIN_NORM)
    u = v * jnp.maximum(1.0 - c * mu2, MIN_NORM)  # transp0
    # expmap(mu, u)
    u_n = _norm(u)
    second = _tanh(sqrt_c * lam_mu * u_n / 2.0) * u / (sqrt_c * u_n)
    z = _mobius_add(mu, second, c)
    z = z * jnp.minimum(max_norm / _norm(z), 1.0)

    # gyroplane distances (analytic epilogue) -> decoder
    z2 = jnp.sum(z * z, axis=-1, keepdims=True)
    p2 = bcast(jnp.sum(pts * pts, axis=-1)[None, :])
    zp = dot(z, pts.T)
    den = jnp.maximum(1.0 - 2.0 * c * zp + c * c * p2 * z2, MIN_NORM)
    alpha = (1.0 - 2.0 * c * zp + c * z2) / den
    betaa = (1.0 - c * p2) / den
    sc_diff = -alpha * p2 + betaa * zp
    max_d2 = (1.0 - 1e-4) ** 2 / c
    dn2 = jnp.clip(alpha * alpha * p2 - 2.0 * alpha * betaa * zp + betaa * betaa * z2,
                   MIN_NORM, max_d2)
    p_norm = jnp.sqrt(jnp.maximum(p2, MIN_NORM**2))
    dists = _arsinh(2.0 * sqrt_c * sc_diff / jnp.maximum((1.0 - c * dn2) * p_norm, MIN_NORM)) / sqrt_c
    hd = _gelu(dists + bcast(pb))
    hd = _gelu(dot(hd, w4) + bcast(b4))
    xhat = jax.nn.sigmoid(dot(hd, w5) + bcast(b5))

    # recon: RelaxedBernoulli(T=1, probs=xhat).log_prob(x)
    pclip = jnp.clip(xhat, 1e-7, 1.0 - 1e-7)
    logits = jnp.log(pclip) - jnp.log1p(-pclip)
    tiny = 1.1754944e-38
    epsf = 1.1920929e-7
    xc = jnp.clip(xf, tiny, 1.0 - epsf)
    y = jnp.log(xc) - jnp.log1p(-xc)
    diff = logits - y
    base = diff - 2.0 * jax.nn.softplus(diff)
    lp = base - jnp.log(xc) - jnp.log1p(-xc)
    recon = -jnp.sum(lp, axis=-1, keepdims=True)  # (B, 1)

    # log q(z | mu, scale) and log p(z | 0, prior_scale); all (B, 1)
    def wn_log_prob(loc, loc2, sc, zz):
        sub = _mobius_add(-loc, zz, c)
        sub_n = _norm(sub)
        lam = 2.0 / jnp.maximum(1.0 - c * loc2, MIN_NORM)
        vv = 2.0 / (sqrt_c * lam) * _artanh(sqrt_c * sub_n) * sub / sub_n
        uu = vv * lam  # transp0back * 2
        npdf = jnp.sum(
            -(uu * uu) / (2.0 * sc * sc) - jnp.log(sc) - 0.5 * _LOG_2PI,
            axis=-1, keepdims=True,
        )
        dist = 2.0 / sqrt_c * _artanh(sqrt_c * sub_n)
        ld = (latent_dim - 1) * _log_sinh_ratio(sqrt_c * dist)
        return npdf - ld

    log_q = wn_log_prob(mu, mu2, scale, z)
    zeros = jnp.zeros_like(mu)
    log_p = wn_log_prob(zeros, jnp.zeros_like(mu2), jnp.full_like(scale, prior_scale), z)
    kl = log_q - log_p
    loss_total = jnp.mean(recon + beta * kl)
    return loss_total, jnp.mean(recon), jnp.mean(kl)


def _mobius_add(a, b, c):
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = jnp.sum(a * b, axis=-1, keepdims=True)
    num = (1.0 + 2.0 * c * ab + c * b2) * a + (1.0 - c * a2) * b
    den = 1.0 + 2.0 * c * ab + c * c * a2 * b2
    return num / jnp.maximum(den, MIN_NORM)


def flagship_forward_jnp(params_tuple, x, eps, *, c, beta, prior_scale, latent_dim, data_numel):
    """Pure-jnp mirror (ground truth for tests and the backward pass)."""
    dot = lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32)
    return _body(
        x, eps, params_tuple, c=c, beta=beta, prior_scale=prior_scale,
        latent_dim=latent_dim, data_numel=data_numel, dot=dot,
    )


# ---------------------------------------------------------------------- #
# Pallas kernel: one grid cell per batch tile; all weights replicated.


def _flagship_kernel(*refs, c, beta, prior_scale, latent_dim, data_numel, n_params):
    x_ref, eps_ref = refs[0], refs[1]
    p = tuple(r[:] for r in refs[2 : 2 + n_params])
    out_ref = refs[2 + n_params]
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    lt, rm, km = _body(
        x_ref[:], eps_ref[:], p, c=c, beta=beta, prior_scale=prior_scale,
        latent_dim=latent_dim, data_numel=data_numel, dot=dot,
    )
    out_ref[:] = jnp.stack([lt, rm, km]).reshape(1, 3)


def _fused_pallas(params_tuple, x, eps, *, c, beta, prior_scale, latent_dim, data_numel):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x.shape[0]
    xf = x.reshape(B, -1).astype(jnp.float32)
    n_params = len(params_tuple)
    kernel = functools.partial(
        _flagship_kernel, c=c, beta=beta, prior_scale=prior_scale,
        latent_dim=latent_dim, data_numel=data_numel, n_params=n_params,
    )
    # gyroplane bias (P,) and 1-D biases must be 2-D for Mosaic
    p2d = tuple(a if a.ndim >= 2 else a[None, :] for a in params_tuple)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + n_params),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.devices()[0].platform not in ("tpu",),
    )(xf, eps.astype(jnp.float32), *p2d)
    return out[0, 0], out[0, 1], out[0, 2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_flagship_loss(params_tuple, x, eps, c, beta, prior_scale, latent_dim, data_numel):
    return _fused_pallas(
        params_tuple, x, eps, c=c, beta=beta, prior_scale=prior_scale,
        latent_dim=latent_dim, data_numel=data_numel,
    )


def _ffl_fwd(params_tuple, x, eps, c, beta, prior_scale, latent_dim, data_numel):
    out = fused_flagship_loss(params_tuple, x, eps, c, beta, prior_scale, latent_dim, data_numel)
    return out, (params_tuple, x, eps)


def _ffl_bwd(c, beta, prior_scale, latent_dim, data_numel, residuals, g):
    params_tuple, x, eps = residuals
    _, vjp = jax.vjp(
        lambda p, xx: flagship_forward_jnp(
            p, xx, eps, c=c, beta=beta, prior_scale=prior_scale,
            latent_dim=latent_dim, data_numel=data_numel,
        ),
        params_tuple, x,
    )
    dp, dx = vjp(g)
    return dp, dx, jnp.zeros_like(eps)


fused_flagship_loss.defvjp(_ffl_fwd, _ffl_bwd)


def supports_fused(model) -> bool:
    """The kernel handles the flagship architecture exactly."""
    return (
        type(model).__name__ == "GyroplaneVAE"
        and tuple(model.hidden_dims) == (64, 16)
    )


def make_fused_loss_fn(model):
    """Returns fn(params, batch, sample_key) -> metrics dict, a drop-in
    replacement for model.apply(method='loss') on supported models."""
    assert supports_fused(model), "fused path supports the flagship GyroplaneVAE"
    cfg = dict(
        c=float(model.manifold_curvature),
        beta=float(model.beta),
        prior_scale=float(model.prior_scale),
        latent_dim=int(model.latent_dim),
        data_numel=int(model.data_numel),
    )

    def loss_fn(params, batch, sample_key):
        eps = jax.random.normal(
            sample_key, (batch.shape[0], cfg["latent_dim"]), jnp.float32
        )
        lt, rm, km = fused_flagship_loss(
            _params_tuple(params), batch, eps,
            cfg["c"], cfg["beta"], cfg["prior_scale"],
            cfg["latent_dim"], cfg["data_numel"],
        )
        return {"loss_total": lt, "recon_loss": rm, "kl_loss": km}

    return loss_fn


# ---------------------------------------------------------------------- #
# Fully-fused TRAIN STEP: forward + backward + (Riemannian) Adam in ONE
# Pallas kernel. The trick: jax.value_and_grad is applied INSIDE the
# kernel function — autodiff happens at trace time and emits only
# Pallas-lowerable elementwise/matmul/reduce ops, so no gradients are
# derived by hand and no extra kernel launches exist per step.

_MP_POINTS_IDX = 8  # position of gyroplanes/mp_points in _params_tuple
_N_PARAMS = 14


def _tuple_to_params(t) -> dict:
    """Inverse of _params_tuple (restores 1-D biases)."""
    def b(a):  # biases travel as (1, k)
        return a.reshape(-1)

    return {
        "enc_0": {"kernel": t[0], "bias": b(t[1])},
        "enc_1": {"kernel": t[2], "bias": b(t[3])},
        "mu": {"kernel": t[4], "bias": b(t[5])},
        "scale": {"kernel": t[6], "bias": b(t[7])},
        "gyroplanes": {"mp_points": t[8], "bias": b(t[9])},
        "dec_0": {"kernel": t[10], "bias": b(t[11])},
        "out": {"kernel": t[12], "bias": b(t[13])},
    }


def _riemannian_adam_update_inline(p, g, m, v, lr, bc1, bc2, is_manifold, *, c,
                                   b1=0.9, b2=0.999, adam_eps=1e-8):
    """One optax-riemannian_adam-equivalent leaf update, pure jnp
    (mirrors optim/riemannian_adam.py leaf_update)."""
    sqrt_c = math.sqrt(c)
    if is_manifold:
        p2 = jnp.sum(p * p, axis=-1, keepdims=True)
        lam = 2.0 / jnp.maximum(1.0 - c * p2, MIN_NORM)
        g_r = g / (lam * lam)
        new_m = b1 * m + (1.0 - b1) * g_r
        new_v = b2 * v + (1.0 - b2) * (lam * lam) * g_r * g_r
        direction = (new_m / bc1) / (jnp.sqrt(new_v / bc2) + adam_eps)
        u = -lr * direction
        # expmap(p, u)
        u_n = _norm(u)
        second = _tanh(sqrt_c * lam * u_n / 2.0) * u / (sqrt_c * u_n)
        new_p = _mobius_add(p, second, c)
        max_norm = (1.0 - BOUNDARY_EPS) / sqrt_c
        new_p = new_p * jnp.minimum(max_norm / _norm(new_p), 1.0)
        # transport new_m from p to new_p: gyr[new_p, -p] m * lam_p/lam_new
        gyr = _mobius_add(
            -_mobius_add(new_p, -p, c),
            _mobius_add(new_p, _mobius_add(-p, new_m, c), c),
            c,
        )
        np2 = jnp.sum(new_p * new_p, axis=-1, keepdims=True)
        lam_new = 2.0 / jnp.maximum(1.0 - c * np2, MIN_NORM)
        new_m = gyr * lam / lam_new
        return new_p, new_m, new_v
    new_m = b1 * m + (1.0 - b1) * g
    new_v = b2 * v + (1.0 - b2) * g * g
    new_p = p - lr * (new_m / bc1) / (jnp.sqrt(new_v / bc2) + adam_eps)
    return new_p, new_m, new_v


def _train_kernel(scal_ref, x_ref, eps_ref, *refs, c, beta, prior_scale,
                  latent_dim, data_numel):
    n = _N_PARAMS
    p = tuple(r[:] for r in refs[:n])
    m = tuple(r[:] for r in refs[n : 2 * n])
    v = tuple(r[:] for r in refs[2 * n : 3 * n])
    out_metrics = refs[3 * n]
    out_p = refs[3 * n + 1 : 3 * n + 1 + n]
    out_m = refs[3 * n + 1 + n : 3 * n + 1 + 2 * n]
    out_v = refs[3 * n + 1 + 2 * n : 3 * n + 1 + 3 * n]
    lr = scal_ref[0, 0]
    bc1 = scal_ref[0, 1]
    bc2 = scal_ref[0, 2]

    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    B = x_ref.shape[0]
    ones_b1 = jnp.ones((B, 1), jnp.float32)
    bcast = lambda row: dot(ones_b1, row)

    def loss_fn(pt):
        lt, rm, km = _body(
            x_ref[:], eps_ref[:], pt, c=c, beta=beta, prior_scale=prior_scale,
            latent_dim=latent_dim, data_numel=data_numel, dot=dot, bcast=bcast,
        )
        return lt, (rm, km)

    # AD at trace time: the backward lowers into this same kernel.
    (lt, (rm, km)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)

    gnorm2 = sum(jnp.sum(g * g) for g in grads)
    ok = jnp.isfinite(lt) & jnp.isfinite(gnorm2)
    okf = ok.astype(jnp.float32)

    for i in range(n):
        new_p, new_m, new_v = _riemannian_adam_update_inline(
            p[i], grads[i], m[i], v[i], lr, bc1, bc2,
            is_manifold=(i == _MP_POINTS_IDX), c=c,
        )
        out_p[i][:] = jnp.where(ok, new_p, p[i])
        out_m[i][:] = jnp.where(ok, new_m, m[i])
        out_v[i][:] = jnp.where(ok, new_v, v[i])
    out_metrics[:] = jnp.stack([lt, rm, km, 1.0 - okf]).reshape(1, 4)


def make_fused_train_step(model, b1: float = 0.9, b2: float = 0.999):
    """Returns step(params, opt_state, batch, key) -> (params, opt_state,
    metrics) running the WHOLE training step as one Pallas kernel.
    opt_state must be the Trainer's inject_hyperparams(riemannian_adam)
    state; semantics match the optax path (tested)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert supports_fused(model)
    cfg = dict(
        c=float(model.manifold_curvature), beta=float(model.beta),
        prior_scale=float(model.prior_scale), latent_dim=int(model.latent_dim),
        data_numel=int(model.data_numel),
    )
    kernel = functools.partial(_flagship_train_kernel_entry, cfg=cfg)

    def step(params, opt_state, batch, key):
        inner = opt_state.inner_state
        count = inner.count + 1
        cf = count.astype(jnp.float32)
        lr = opt_state.hyperparams["learning_rate"]
        bc1 = 1.0 - jnp.power(b1, cf)
        bc2 = 1.0 - jnp.power(b2, cf)
        scal = jnp.stack([lr, bc1, bc2, 0.0]).reshape(1, 4).astype(jnp.float32)
        eps = jax.random.normal(key, (batch.shape[0], cfg["latent_dim"]), jnp.float32)
        xf = batch.reshape(batch.shape[0], -1).astype(jnp.float32)

        def two_d(a):
            return a if a.ndim >= 2 else a[None, :]

        p_t = tuple(two_d(a) for a in _params_tuple(params))
        m_t = tuple(two_d(a) for a in _params_tuple(inner.exp_avg))
        v_t = tuple(two_d(a) for a in _params_tuple(inner.exp_avg_sq))
        n = _N_PARAMS
        out_shapes = (
            [jax.ShapeDtypeStruct((1, 4), jnp.float32)]
            + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in p_t] * 3
        )
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + 3 * n),
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 3 * n)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=jax.devices()[0].platform not in ("tpu",),
        )(scal, xf, eps, *p_t, *m_t, *v_t)
        metrics_arr = outs[0]
        new_p = _tuple_to_params(outs[1 : 1 + n])
        new_m = _tuple_to_params(outs[1 + n : 1 + 2 * n])
        new_v = _tuple_to_params(outs[1 + 2 * n : 1 + 3 * n])
        new_inner = inner._replace(count=count, exp_avg=new_m, exp_avg_sq=new_v)
        new_opt_state = opt_state._replace(inner_state=new_inner)
        metrics = {
            "loss_total": metrics_arr[0, 0],
            "recon_loss": metrics_arr[0, 1],
            "kl_loss": metrics_arr[0, 2],
            "skipped_steps": metrics_arr[0, 3],
        }
        return new_p, new_opt_state, metrics

    return step


def _flagship_train_kernel_entry(*refs, cfg):
    _train_kernel(*refs, **cfg)
