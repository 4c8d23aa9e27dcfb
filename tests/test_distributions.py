"""Tests for manifold distributions.

Replaces the reference's pvae-dependent smoke scripts (tests/test_kld.py,
tests/test_hyperbolic_radius_dist.py) with quantitative checks:
  * wrapped normal density integrates to 1 over the ball (2-D quadrature
    against the Riemannian volume element)
  * Euclidean limit (c -> 0) recovers the Gaussian for both rsample and
    log_prob
  * MC KL against the analytic Gaussian KL in the Euclidean limit
  * RiemannianNormal: closed-form normalizer validated by quadrature;
    sampler validated against density moments (the reference's version
    is documented broken, old_pvae_riemannian_normal.py:13)
  * RelaxedBernoulli golden values against torch.distributions
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.distributions import (
    RiemannianNormal,
    WrappedNormal,
    kl_normal_normal,
    normal_log_prob,
    relaxed_bernoulli_log_prob,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
)
from hyperbolic_vae_tpu.manifolds import PoincareBall


def _ball_quadrature(ball, f, n=400):
    """Integrate f(z) over the 2-D ball against the Riemannian volume
    dM = lambda_z^2 dz (2-D conformal factor squared)."""
    r = (1.0 - 1e-4) / ball.sqrt_c
    xs = np.linspace(-r, r, n)
    dx = xs[1] - xs[0]
    gx, gy = np.meshgrid(xs, xs)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    inside = (pts**2).sum(-1) < (r - dx) ** 2
    pts_j = jnp.asarray(pts[inside], dtype=jnp.float32)
    vals = np.asarray(f(pts_j))
    lam = np.asarray(ball.lambda_x(pts_j, keepdims=False))
    return float(np.sum(vals * lam**2) * dx * dx)


def test_wrapped_normal_density_integrates_to_one():
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([0.3, -0.2]))
    scale = jnp.array([0.6, 0.8])
    total = _ball_quadrature(
        ball, lambda z: jnp.exp(wrapped_normal_log_prob(ball, loc, scale, z))
    )
    assert abs(total - 1.0) < 2e-2, total


def test_wrapped_normal_euclidean_limit_log_prob():
    """As c -> 0 the metric is still conformal with lambda -> 2, so the
    wrapped normal's ``scale`` is in RIEMANNIAN units: the tangent
    displacement is u = 2*(x - loc) and log_prob is the density w.r.t.
    the Riemannian measure (logdetexp -> 0)."""
    c = 1e-8
    ball = PoincareBall(c=c)
    loc = jnp.array([0.3, -0.2])
    scale = jnp.array([0.5, 0.7])
    x = jnp.array([[0.1, 0.1], [-0.2, 0.4], [0.0, 0.0]])
    lp = wrapped_normal_log_prob(ball, loc, scale, x)
    expected = jnp.sum(normal_log_prob(2.0 * (x - loc), 0.0, scale), axis=-1)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(expected), rtol=1e-3, atol=1e-4)


def test_wrapped_normal_euclidean_limit_rsample():
    """Coordinate std in the flat limit is scale/2 (Riemannian units)."""
    c = 1e-9
    ball = PoincareBall(c=c)
    loc = jnp.array([0.3, -0.2])
    scale = jnp.array([0.5, 0.7])
    key = jax.random.PRNGKey(0)
    z = wrapped_normal_rsample(key, ball, loc, scale, (20000,))
    z = np.asarray(z)
    np.testing.assert_allclose(z.mean(0), np.asarray(loc), atol=2e-2)
    np.testing.assert_allclose(z.std(0), np.asarray(scale) / 2.0, rtol=5e-2)


def test_wrapped_normal_rsample_on_manifold():
    ball = PoincareBall(c=1.4)
    loc = ball.expmap0(jnp.ones((8, 3)) * 0.3)
    scale = jnp.full((8, 3), 1.5)
    z = wrapped_normal_rsample(jax.random.PRNGKey(1), ball, loc, scale, (64,))
    assert bool(jnp.all(ball.check_point_on_manifold(z)))


def test_wrapped_normal_mc_kl_matches_analytic_in_euclidean_limit():
    """The intent of the reference's tests/test_kld.py, made quantitative."""
    c = 1e-8
    ball = PoincareBall(c=c)
    loc = jnp.array([0.4, -0.1])
    scale = jnp.array([0.6, 0.9])
    q = WrappedNormal(loc, scale, ball)
    p = WrappedNormal(jnp.zeros(2), jnp.ones(2), ball)
    z = q.rsample(jax.random.PRNGKey(2), (50000,))
    mc_kl = float(jnp.mean(q.log_prob(z) - p.log_prob(z)))
    # In the flat limit u = 2z ~ N(2*loc, scale) under q, N(0, 1) under p
    # (scale in Riemannian units; KL is measure-invariant).
    analytic = float(jnp.sum(kl_normal_normal(2.0 * loc, scale, 0.0, 1.0)))
    assert abs(mc_kl - analytic) < 0.05, (mc_kl, analytic)


def test_wrapped_normal_log_prob_consistency_mc_entropy():
    """Self-consistency on a curved ball: E_q[exp(log q - log q)] == 1 trivially;
    instead check E_z~q[1{lp finite}] and that the density is higher at the
    mean than far away."""
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([0.5, 0.5]))
    scale = jnp.array([0.4, 0.4])
    q = WrappedNormal(loc, scale, ball)
    z = q.rsample(jax.random.PRNGKey(3), (1000,))
    lp = q.log_prob(z)
    assert bool(jnp.all(jnp.isfinite(lp)))
    far = ball.expmap0(jnp.array([-3.0, -3.0]))
    assert float(q.log_prob(loc[None])[0]) > float(q.log_prob(far[None])[0])


def test_wrapped_normal_sample_shape_semantics():
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.zeros((16, 2)))
    scale = jnp.ones((16, 2))
    q = WrappedNormal(loc, scale, ball)
    z = q.rsample(jax.random.PRNGKey(4), (1,))
    assert z.shape == (1, 16, 2)
    lp = q.log_prob(z)
    assert lp.shape == (1, 16)


# ---------------- RiemannianNormal ----------------


def test_riemannian_normal_integrates_to_one():
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([0.2, 0.1]))
    scale = jnp.array([0.8])
    rn = RiemannianNormal(loc, scale, ball)
    total = _ball_quadrature(ball, lambda z: jnp.exp(rn.log_prob(z)))
    assert abs(total - 1.0) < 2e-2, total


@pytest.mark.slow
def test_riemannian_normal_sampler_matches_density():
    """Mean geodesic distance from loc of samples == quadrature expectation."""
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([0.2, -0.3]))
    scale = jnp.array([0.7])
    rn = RiemannianNormal(loc, scale, ball)
    z = rn.rsample(jax.random.PRNGKey(5), (20000,))
    assert bool(jnp.all(ball.check_point_on_manifold(z)))
    mean_dist_mc = float(jnp.mean(ball.dist(loc, z)))
    mean_dist_quad = _ball_quadrature(
        ball, lambda pts: ball.dist(loc, pts) * jnp.exp(rn.log_prob(pts))
    )
    assert abs(mean_dist_mc - mean_dist_quad) < 0.03, (mean_dist_mc, mean_dist_quad)


@pytest.mark.slow
def test_riemannian_normal_scale_clamped():
    ball = PoincareBall(c=1.0)
    loc = jnp.zeros((1, 2))
    rn_small = RiemannianNormal(loc, jnp.array([[1e-4]]), ball)
    rn_big = RiemannianNormal(loc, jnp.array([[100.0]]), ball)
    z1 = rn_small.rsample(jax.random.PRNGKey(6), (10,))
    z2 = rn_big.rsample(jax.random.PRNGKey(7), (10,))
    assert bool(jnp.all(jnp.isfinite(z1))) and bool(jnp.all(jnp.isfinite(z2)))
    assert bool(jnp.all(jnp.isfinite(rn_big.log_prob(z2))))


@pytest.mark.slow
def test_riemannian_normal_grad_wrt_scale_finite():
    ball = PoincareBall(c=1.0)

    def f(s):
        rn = RiemannianNormal(jnp.zeros((4, 2)), jnp.full((4, 1), 1.0) * s, ball)
        z = rn.rsample(jax.random.PRNGKey(8), ())
        return jnp.sum(rn.log_prob(z))

    g = jax.grad(f)(0.8)
    assert np.isfinite(float(g))


# ---------------- RelaxedBernoulli ----------------


def test_relaxed_bernoulli_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.array([0.0, 0.2, 0.5, 0.8, 1.0], dtype=np.float32)
    logits = np.array([-1.0, 0.5, 0.0, 2.0, -0.3], dtype=np.float32)
    for temp in (0.1, 0.3, 1.0):
        d = torch.distributions.RelaxedBernoulli(
            temperature=torch.tensor(temp), logits=torch.tensor(logits)
        )
        expected = d.log_prob(torch.tensor(x)).numpy()
        got = np.asarray(
            relaxed_bernoulli_log_prob(jnp.asarray(x), temp, logits=jnp.asarray(logits))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_relaxed_bernoulli_probs_vs_logits():
    probs = jnp.array([0.2, 0.7, 0.99])
    logits = jnp.log(probs) - jnp.log1p(-probs)
    x = jnp.array([0.3, 0.3, 0.3])
    a = relaxed_bernoulli_log_prob(x, 0.5, probs=probs)
    b = relaxed_bernoulli_log_prob(x, 0.5, logits=logits)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_rsample_stays_in_faithful_chart():
    """Regression for the MC-KL chart exploit: samples must never cross
    the f32 projection boundary, even with absurd scales and boundary
    locs — otherwise log_prob scores a relocated point."""
    from hyperbolic_vae_tpu.distributions.wrapped_normal import max_chart_radius

    ball = PoincareBall(c=1.0)
    d_max = max_chart_radius(ball)
    loc = ball.project(jnp.array([[0.9999, 0.0], [0.0, 0.0], [0.5, 0.5]]))
    scale = jnp.full((3, 2), 50.0)  # absurd
    z = wrapped_normal_rsample(jax.random.PRNGKey(0), ball, loc, scale, (256,))
    d0 = ball.dist0(z)
    assert float(d0.max()) <= d_max + 1e-3, float(d0.max())


def test_mc_kl_nonnegative_under_extreme_scales():
    """E_q[log q - log p] must stay >= ~0 (it's a KL) even in the regime
    that used to be exploitable (boundary loc + huge/tiny mixed scales)."""
    ball = PoincareBall(c=1.0)
    loc = ball.project(jnp.array([[0.9959, 0.0]]))
    scale = jnp.array([[1e-3, 10.0]])
    q = WrappedNormal(loc, scale, ball)
    z = q.rsample(jax.random.PRNGKey(1), (4096,))
    kl = float(jnp.mean(q.log_prob(z) - wrapped_normal_log_prob(ball, jnp.zeros(2), jnp.ones(2), z)))
    assert kl > -1.0, kl  # small MC slack; the broken version gave -1e5


def test_rsample_log_prob_roundtrip_consistency():
    """log_prob of own samples must match the forward tangent draw."""
    from hyperbolic_vae_tpu.distributions.wrapped_normal import normal_log_prob as _nlp

    ball = PoincareBall(c=1.0)
    loc = ball.project(jnp.array([[0.9, 0.3]]) * 0.9)
    scale = jnp.array([[0.5, 0.7]])
    key = jax.random.PRNGKey(2)
    z = wrapped_normal_rsample(key, ball, loc, scale, (512,))
    # reverse-engineer u and check |u| is plausible for N(0, scale)
    v = ball.logmap(loc, z)
    u = ball.transp0back(loc, v) * 2.0
    stds = np.asarray(u).std(axis=0)[0]
    np.testing.assert_allclose(stds, np.asarray(scale)[0], rtol=0.15)


def test_manifold_wrapped_normal_helper_matches_distribution():
    """PoincareBall.wrapped_normal must be the SAME sampler as
    distributions.wrapped_normal (round-1 ADVICE: it used to divide by
    lambda_x(mean) instead of lambda at the origin)."""
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([0.4, -0.2]))
    key = jax.random.PRNGKey(11)
    z_helper = ball.wrapped_normal(key, (512, 2), loc, std=0.3)
    z_dist = wrapped_normal_rsample(
        key, ball, loc, 0.3 * jnp.ones(2), sample_shape=(512,)
    )
    np.testing.assert_allclose(np.asarray(z_helper), np.asarray(z_dist), atol=1e-6)
