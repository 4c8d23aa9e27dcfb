"""Fréchet means / variance / geodesics on the ball (manifolds/stats.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.manifolds import (
    PoincareBall,
    class_means,
    frechet_mean,
    frechet_variance,
    geodesic,
)


def _points(n=12, d=2, seed=0, max_radius=0.6):
    """Points comfortably inside the ball: Mobius ops near the boundary
    clamp through artanh (documented f32 behavior) and would turn these
    exact-identity tests into boundary-precision tests."""
    ball = PoincareBall(c=1.0)
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, d))
    r = max_radius * np.tanh(np.linalg.norm(v, axis=-1, keepdims=True))
    x = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9) * r
    return ball, jnp.asarray(x, jnp.float32)


def test_two_point_mean_is_geodesic_midpoint():
    ball, x = _points(2)
    m = frechet_mean(ball, x)
    mid = geodesic(ball, x[0], x[1], 0.5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mid), atol=1e-5)
    # equidistant from both endpoints
    np.testing.assert_allclose(
        float(ball.dist(m, x[0])), float(ball.dist(m, x[1])), rtol=1e-5
    )


@pytest.mark.parametrize("c", [0.5, 1.0, 1.4])
def test_mean_minimizes_objective_vs_gradient_descent(c):
    """The Karcher iterate matches direct Riemannian gradient descent on
    F(m) = mean_i d(m, x_i)^2 — and attains an equal-or-lower objective
    than any nearby perturbation."""
    ball = PoincareBall(c=c)
    rng = np.random.default_rng(1)
    x = ball.project(jnp.asarray(rng.normal(size=(20, 3)) * 0.35, jnp.float32))

    m = frechet_mean(ball, x, num_iters=64)

    def objective(p):
        return jnp.mean(ball.dist(p[None, :], x) ** 2)

    # Riemannian gradient descent from the origin
    p = jnp.zeros(3)
    for _ in range(300):
        g = jax.grad(objective)(p)
        p = ball.project(ball.expmap(p, -0.05 * ball.egrad2rgrad(p, g)))
    np.testing.assert_allclose(np.asarray(m), np.asarray(p), atol=1e-4)
    # both sit at the optimum up to f32 evaluation noise (~1e-5 on an
    # objective of ~3): equality within that noise, not strict dominance
    assert float(objective(m)) <= float(objective(p)) + 5e-5


def test_mean_commutes_with_isometry():
    """Left gyro-translation is an isometry: mean(a + x) == a + mean(x)."""
    ball, x = _points(15, seed=2)
    a = jnp.asarray([0.3, -0.2], jnp.float32)
    tx = ball.mobius_add(a[None, :], x)
    m1 = ball.mobius_add(a, frechet_mean(ball, x, num_iters=64))
    m2 = frechet_mean(ball, tx, num_iters=64)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-5)


def test_weighted_mean_ignores_zero_weight_padding():
    ball, x = _points(8, seed=3)
    pad = jnp.concatenate([x, jnp.full((4, 2), 0.9)], axis=0)
    w = jnp.concatenate([jnp.ones(8), jnp.zeros(4)])
    np.testing.assert_allclose(
        np.asarray(frechet_mean(ball, pad, weights=w)),
        np.asarray(frechet_mean(ball, x)),
        atol=1e-6,
    )


def test_euclidean_limit():
    """c -> 0: the Fréchet mean degenerates to the arithmetic mean."""
    ball = PoincareBall(c=1e-6)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(10, 2)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(frechet_mean(ball, x)), np.asarray(jnp.mean(x, axis=0)), atol=1e-4
    )


def test_variance_and_class_means():
    ball, x = _points(30, seed=5)
    labels = jnp.asarray(np.random.default_rng(5).integers(0, 3, size=30))
    cm = class_means(ball, x, labels, num_classes=4)
    assert cm.shape == (4, 2)
    for k in range(3):
        mask = np.asarray(labels) == k
        direct = frechet_mean(ball, x[np.where(mask)[0]])
        np.testing.assert_allclose(np.asarray(cm[k]), np.asarray(direct), atol=1e-5)
    # class 3 has no members -> origin
    np.testing.assert_array_equal(np.asarray(cm[3]), np.zeros(2))

    v = frechet_variance(ball, x)
    d2 = np.asarray(ball.dist(frechet_mean(ball, x)[None, :], x)) ** 2
    np.testing.assert_allclose(float(v), d2.mean(), rtol=1e-5)


def test_geodesic_constant_speed_and_endpoints():
    ball, x = _points(2, seed=6)
    a, b = x[0], x[1]
    ts = jnp.linspace(0.0, 1.0, 5)
    g = geodesic(ball, a, b, ts)
    assert g.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[-1]), np.asarray(b), atol=1e-5)
    total = float(ball.dist(a, b))
    for i, t in enumerate(np.asarray(ts)):
        np.testing.assert_allclose(
            float(ball.dist(a, g[i])), t * total, atol=1e-5
        )


def test_jit_and_vmap_compatible():
    ball, x = _points(16, seed=7)
    fm = jax.jit(lambda pts: frechet_mean(ball, pts))
    np.testing.assert_allclose(
        np.asarray(fm(x)), np.asarray(frechet_mean(ball, x)), atol=1e-6
    )
    batched = jnp.stack([x, x[::-1]])  # (2, 16, 2)
    out = jax.vmap(lambda pts: frechet_mean(ball, pts))(batched)
    # reversed point order only reorders f32 reductions
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-5)
