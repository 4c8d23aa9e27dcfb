"""Public pvae-parity distributions (HyperbolicRadius, HypersphericalUniform)
and pathwise-gradient correctness for RiemannianNormal.

Closes round-1 VERDICT "Missing #3" (public API + radius histogram vs
density) and "Next #8" (finite-difference gradient check for the
inverse-CDF sampler's claimed pathwise gradients). The reference's
equivalents are pvae's broken originals
(old_pvae_riemannian_normal.py:66-72 documents the failure).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.distributions import (
    HyperbolicRadius,
    HypersphericalUniform,
    RiemannianNormal,
    expmap_polar,
)
from hyperbolic_vae_tpu.manifolds import PoincareBall

# ---------------- HyperbolicRadius ----------------


def test_hyperbolic_radius_log_prob_integrates_to_one():
    for dim, c, s in [(2, 1.0, 0.7), (5, 1.0, 0.5), (3, 2.5, 1.2), (2, 1.0, 7.0)]:
        d = HyperbolicRadius(dim=dim, c=c, scale=jnp.asarray(s))
        r_max = (dim - 1) * math.sqrt(c) * s * s + 10.0 * s + 1.0
        r = jnp.linspace(1e-4, r_max, 200001)
        p = jnp.exp(d.log_prob(r))
        total = float(jnp.trapezoid(p, r))
        assert abs(total - 1.0) < 5e-3, (dim, c, s, total)


@pytest.mark.slow
def test_hyperbolic_radius_histogram_matches_density():
    """Sampler histogram vs the closed-form density (the check the pvae
    original fails before it even samples)."""
    dim, c, s = 3, 1.0, 0.8
    d = HyperbolicRadius(dim=dim, c=c, scale=jnp.asarray(s))
    r = d.rsample(jax.random.PRNGKey(0), (200000,))
    assert bool(jnp.all(r >= 0))
    hist, edges = np.histogram(np.asarray(r), bins=60, range=(0.0, 6.0), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    dens = np.asarray(jnp.exp(d.log_prob(jnp.asarray(centers, jnp.float32))))
    mask = dens > 1e-3  # compare where the density is non-negligible
    np.testing.assert_allclose(hist[mask], dens[mask], rtol=0.12, atol=0.015)


@pytest.mark.slow
def test_hyperbolic_radius_moments_match_quadrature():
    dim, c, s = 4, 1.0, 0.6
    d = HyperbolicRadius(dim=dim, c=c, scale=jnp.asarray(s))
    samples = d.rsample(jax.random.PRNGKey(1), (100000,))
    r = jnp.linspace(1e-4, 40.0, 100001)
    p = jnp.exp(d.log_prob(r))
    mean_quad = float(jnp.trapezoid(r * p, r))
    var_quad = float(jnp.trapezoid((r - mean_quad) ** 2 * p, r))
    assert abs(float(samples.mean()) - mean_quad) < 0.01
    assert abs(float(samples.var()) - var_quad) < 0.01


def test_hyperbolic_radius_broadcast_and_negative_support():
    d = HyperbolicRadius(dim=2, c=1.0, scale=jnp.array([0.3, 1.0, 2.0]))
    r = d.rsample(jax.random.PRNGKey(2), (8,))
    assert r.shape == (8, 3)
    assert bool(jnp.all(d.log_prob(jnp.asarray(-0.1)) == -np.inf))


# ---------------- HypersphericalUniform ----------------


def test_hyperspherical_uniform_samples_on_sphere_and_uniform():
    d = HypersphericalUniform(dim=2)  # S^2 in R^3
    x = d.sample(jax.random.PRNGKey(3), (50000,))
    assert x.shape == (50000, 3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(x, axis=-1)), 1.0, atol=1e-5)
    # uniformity: mean 0, covariance I/3
    np.testing.assert_allclose(np.asarray(x.mean(0)), 0.0, atol=0.01)
    cov = np.cov(np.asarray(x).T)
    np.testing.assert_allclose(cov, np.eye(3) / 3.0, atol=0.01)


def test_hyperspherical_uniform_log_prob_entropy():
    # A(S^1) = 2 pi, A(S^2) = 4 pi
    d1 = HypersphericalUniform(dim=1)
    d2 = HypersphericalUniform(dim=2)
    x = d2.sample(jax.random.PRNGKey(4), (5,))
    np.testing.assert_allclose(np.asarray(d2.log_prob(x)), -math.log(4 * math.pi), rtol=1e-6)
    np.testing.assert_allclose(float(d1.entropy()), math.log(2 * math.pi), rtol=1e-6)
    np.testing.assert_allclose(float(d2.entropy()), math.log(4 * math.pi), rtol=1e-6)


def test_expmap_polar_composition_matches_riemannian_normal_rsample():
    """RiemannianNormal.rsample == direction ~ HypersphericalUniform,
    radius ~ HyperbolicRadius, z = expmap_polar(loc, alpha, r) — the exact
    composition the reference uses (old_pvae_riemannian_normal.py:45-53)."""
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([[0.3, -0.1, 0.2]]))
    scale = jnp.array([[0.9]])
    rn = RiemannianNormal(loc, scale, ball)
    z = rn.rsample(jax.random.PRNGKey(5), (20000,))
    # Same marginal via the public pieces
    k_dir, k_rad = jax.random.split(jax.random.PRNGKey(6))
    alpha = HypersphericalUniform(dim=2).sample(k_dir, (20000, 1))
    r = HyperbolicRadius(dim=3, c=1.0, scale=scale[..., 0]).rsample(k_rad, (20000,))
    z2 = expmap_polar(ball, loc, alpha, r)
    d1, d2 = ball.dist(loc, z), ball.dist(loc, z2)
    assert abs(float(d1.mean()) - float(d2.mean())) < 0.02
    assert abs(float(d1.std()) - float(d2.std())) < 0.02


# ---------------- RiemannianNormal pathwise gradients (VERDICT #8) ----------------


def _mean_f_of_sample(mu_x: float, sigma: float, key, n=4096):
    """E[f(z)] with f(z) = dist0(z)^2, z ~ RiemannianNormal(loc(mu_x), sigma).
    Common random numbers: the key is fixed across evaluations."""
    ball = PoincareBall(c=1.0)
    loc = ball.expmap0(jnp.array([mu_x, 0.15]))
    rn = RiemannianNormal(loc[None], jnp.array([[1.0]]) * sigma, ball)
    z = rn.rsample(key, (n,))
    d0 = ball.dist0(z)
    return jnp.mean(d0 * d0)


def test_riemannian_normal_pathwise_grad_sigma_matches_fd():
    key = jax.random.PRNGKey(7)
    f = lambda s: _mean_f_of_sample(0.4, s, key)
    g_auto = float(jax.grad(f)(0.8))
    eps = 1e-3
    g_fd = (float(f(0.8 + eps)) - float(f(0.8 - eps))) / (2 * eps)
    # same randomness on both sides -> FD is low-variance; compare tightly
    assert abs(g_auto - g_fd) < 0.05 * max(1.0, abs(g_fd)), (g_auto, g_fd)
    assert g_auto > 0  # larger sigma spreads mass outward from loc near origin


def test_riemannian_normal_pathwise_grad_mu_matches_fd():
    key = jax.random.PRNGKey(8)
    f = lambda m: _mean_f_of_sample(m, 0.7, key)
    g_auto = float(jax.grad(f)(0.4))
    eps = 1e-3
    g_fd = (float(f(0.4 + eps)) - float(f(0.4 - eps))) / (2 * eps)
    assert abs(g_auto - g_fd) < 0.05 * max(1.0, abs(g_fd)), (g_auto, g_fd)
    assert g_auto > 0  # moving loc outward increases E[dist0^2]


@pytest.mark.slow
def test_riemannian_normal_grad_estimator_unbiased_vs_population():
    """Autodiff-through-sampler gradient, averaged over keys, must agree
    with the finite-difference of the POPULATION expectation computed by
    quadrature — i.e. the pathwise estimator is estimating the right thing,
    not just differentiating consistently."""
    ball = PoincareBall(c=1.0)
    dim = 2

    def expected_d2(sigma):
        # E[dist(loc,z)^2] depends only on the radial law
        d = HyperbolicRadius(dim=dim, c=1.0, scale=jnp.asarray(sigma))
        r = jnp.linspace(1e-4, 40.0, 100001)
        p = jnp.exp(d.log_prob(r))
        return float(jnp.trapezoid(r * r * p, r))

    eps = 1e-3
    g_pop = (expected_d2(0.8 + eps) - expected_d2(0.8 - eps)) / (2 * eps)

    loc = ball.expmap0(jnp.array([0.3, 0.0]))

    def mc(s, key):
        rn = RiemannianNormal(loc[None], jnp.array([[1.0]]) * s, ball)
        z = rn.rsample(key, (8192,))
        d = ball.dist(loc[None], z)
        return jnp.mean(d * d)

    grads = [float(jax.grad(mc)(0.8, jax.random.PRNGKey(k))) for k in range(8)]
    g_mc = float(np.mean(grads))
    assert abs(g_mc - g_pop) < 0.08 * max(1.0, abs(g_pop)), (g_mc, g_pop)


# ---------------- radius normalizer stability (round-3 regression) ----------


def test_radius_normalizer_quadrature_matches_closed_form_where_stable():
    """The production quadrature normalizer equals the closed form in its
    stable region (d<=5); at d=10 the closed form itself cancels in f32
    (verified against a float64 reference), so only quadrature is used."""
    from hyperbolic_vae_tpu.distributions.riemannian_normal import (
        log_radius_normalizer, log_radius_normalizer_closed_form)

    for dim in (2, 3, 5):
        sig = jnp.asarray(np.linspace(0.1, 7.0, 500), jnp.float32)
        q = log_radius_normalizer(sig, 1.0, dim)
        cf = log_radius_normalizer_closed_form(sig, 1.0, dim)
        np.testing.assert_allclose(np.asarray(q), np.asarray(cf), rtol=1e-4, atol=1e-4)


def test_radius_normalizer_gradients_finite_high_dim():
    """Round-3 bug: the alternating-binomial closed form had NaN
    GRADIENTS at isolated sigma (0.588, 0.753, 1.047, ~5.25 at d=10 c=1)
    from f32 cancellation — every training step of the riemannian d=10
    pvae grid cells was skipped by the non-finite guard. The quadrature
    form must be grad-finite on a dense sweep and match finite
    differences."""
    from hyperbolic_vae_tpu.distributions.riemannian_normal import log_radius_normalizer

    for dim in (2, 5, 10, 20):
        sig = jnp.asarray(np.linspace(0.1, 7.0, 2000), jnp.float32)
        g = jax.grad(lambda s: jnp.sum(log_radius_normalizer(s, 1.0, dim)))(sig)
        assert bool(jnp.all(jnp.isfinite(g))), f"NaN grad at dim={dim}"
    for s0 in (0.588, 1.047, 5.247):  # the poison sigmas at d=10
        f = lambda s: float(log_radius_normalizer(jnp.asarray([s], jnp.float32), 1.0, 10)[0])
        h = 1e-3
        fd = (f(s0 + h) - f(s0 - h)) / (2 * h)
        an = float(jax.grad(
            lambda s: log_radius_normalizer(s, 1.0, 10).sum()
        )(jnp.asarray([s0], jnp.float32))[0])
        assert abs(fd - an) / max(abs(fd), 1.0) < 1e-3, (s0, fd, an)


def test_pvae_riemannian_d10_grads_finite():
    """End-to-end regression: the d=10 riemannian PvaeMLPVAE must produce
    finite loss gradients (it silently skipped 100% of steps before)."""
    from hyperbolic_vae_tpu.models import PvaeMLPVAE

    model = PvaeMLPVAE(data_shape=(28, 28, 1), latent_dim=10,
                       manifold_curvature=1.0, posterior="riemannian")
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 28, 28, 1)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]

    def loss(p):
        return model.apply({"params": p}, x, method="loss",
                           rngs={"sample": jax.random.PRNGKey(2)})["loss_total"]

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
