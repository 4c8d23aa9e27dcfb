"""Unit tests for the Poincare-ball manifold core.

Replaces the reference's import-time smoke scripts (tests/test_poincare_dist.py,
tests/test_dist2plane.py) with assert-based invariant + golden-value tests,
per SURVEY.md section 4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.manifolds import PoincareBall, log_sinh_ratio

BALLS = [PoincareBall(c=1.0), PoincareBall(c=0.5), PoincareBall(c=1.4)]


def random_points(key, n, d, ball, scale=0.7):
    """Random points strictly inside the ball."""
    u = jax.random.normal(key, (n, d))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    r = jax.random.uniform(jax.random.fold_in(key, 1), (n, 1)) * scale * ball.radius
    return u * r


@pytest.mark.parametrize("ball", BALLS)
def test_expmap0_logmap0_roundtrip(ball):
    key = jax.random.PRNGKey(0)
    x = random_points(key, 32, 4, ball)
    u = ball.logmap0(x)
    x2 = ball.expmap0(u)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("ball", BALLS)
def test_expmap_logmap_roundtrip(ball):
    key = jax.random.PRNGKey(1)
    x = random_points(key, 16, 3, ball)
    y = random_points(jax.random.PRNGKey(2), 16, 3, ball)
    v = ball.logmap(x, y)
    y2 = ball.expmap(x, v)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-5)


@pytest.mark.parametrize("ball", BALLS)
def test_mobius_add_identities(ball):
    key = jax.random.PRNGKey(3)
    x = random_points(key, 8, 5, ball)
    zero = jnp.zeros_like(x)
    np.testing.assert_allclose(np.asarray(ball.mobius_add(x, zero)), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ball.mobius_add(zero, x)), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ball.mobius_add(-x, x)), 0.0, atol=1e-6)


def test_mobius_add_euclidean_limit():
    ball = PoincareBall(c=1e-8)
    x = jnp.array([[0.1, -0.2, 0.3]])
    y = jnp.array([[0.05, 0.07, -0.01]])
    np.testing.assert_allclose(
        np.asarray(ball.mobius_add(x, y)), np.asarray(x + y), atol=1e-6
    )


@pytest.mark.parametrize("ball", BALLS)
def test_dist_properties(ball):
    x = random_points(jax.random.PRNGKey(4), 16, 3, ball)
    y = random_points(jax.random.PRNGKey(5), 16, 3, ball)
    d_xy = ball.dist(x, y)
    d_yx = ball.dist(y, x)
    np.testing.assert_allclose(np.asarray(d_xy), np.asarray(d_yx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ball.dist(x, x)), 0.0, atol=1e-4)
    assert np.all(np.asarray(d_xy) >= 0)


def test_dist_golden_value():
    # c=1, collinear points on the first axis: d = |2 artanh(r2) - 2 artanh(r1)|
    ball = PoincareBall(c=1.0)
    x = jnp.array([0.3, 0.0])
    y = jnp.array([0.6, 0.0])
    expected = 2 * (np.arctanh(0.6) - np.arctanh(0.3))
    np.testing.assert_allclose(float(ball.dist(x, y)), expected, rtol=1e-5)


@pytest.mark.parametrize("ball", BALLS)
def test_lambda_origin(ball):
    zero = jnp.zeros((1, 3))
    np.testing.assert_allclose(np.asarray(ball.lambda_x(zero)), 2.0, rtol=1e-6)


@pytest.mark.parametrize("ball", BALLS)
def test_transp_preserves_inner(ball):
    x = random_points(jax.random.PRNGKey(6), 8, 3, ball)
    y = random_points(jax.random.PRNGKey(7), 8, 3, ball)
    v = jax.random.normal(jax.random.PRNGKey(8), (8, 3)) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(9), (8, 3)) * 0.3
    vt = ball.transp(x, y, v)
    wt = ball.transp(x, y, w)
    np.testing.assert_allclose(
        np.asarray(ball.inner(x, v, w)), np.asarray(ball.inner(y, vt, wt)), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("ball", BALLS)
def test_transp0_roundtrip(ball):
    y = random_points(jax.random.PRNGKey(10), 8, 4, ball)
    v = jax.random.normal(jax.random.PRNGKey(11), (8, 4))
    vt = ball.transp0(y, v)
    v2 = ball.transp0back(y, vt)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-5)
    # transp0 must agree with general transp from the origin
    zero = jnp.zeros_like(y)
    np.testing.assert_allclose(
        np.asarray(ball.transp(zero, y, v)), np.asarray(vt), atol=1e-5
    )


def test_mobius_matvec_identity():
    ball = PoincareBall(c=1.0)
    x = random_points(jax.random.PRNGKey(12), 8, 4, ball)
    eye = jnp.eye(4)
    np.testing.assert_allclose(np.asarray(ball.mobius_matvec(eye, x)), np.asarray(x), atol=1e-5)


def test_mobius_matvec_euclidean_limit():
    ball = PoincareBall(c=1e-9)
    m = jax.random.normal(jax.random.PRNGKey(13), (3, 4))
    x = jax.random.normal(jax.random.PRNGKey(14), (5, 4)) * 0.1
    np.testing.assert_allclose(
        np.asarray(ball.mobius_matvec(m, x)), np.asarray(x @ m.T), rtol=1e-3, atol=1e-6
    )


def test_dist2plane_golden():
    # Plane through the origin with normal e1; point at radius r along e1:
    # dist2plane == distance to origin == 2 artanh(r) (c=1).
    ball = PoincareBall(c=1.0)
    x = jnp.array([[0.4, 0.0]])
    p = jnp.zeros((1, 2))
    a = jnp.array([[1.0, 0.0]])
    d = ball.dist2plane(x, p, a, signed=True)
    np.testing.assert_allclose(np.asarray(d), 2 * np.arctanh(0.4), rtol=1e-5)
    # signedness
    d_neg = ball.dist2plane(-x, p, a, signed=True)
    np.testing.assert_allclose(np.asarray(d_neg), -2 * np.arctanh(0.4), rtol=1e-5)
    d_abs = ball.dist2plane(-x, p, a, signed=False)
    np.testing.assert_allclose(np.asarray(d_abs), 2 * np.arctanh(0.4), rtol=1e-5)


def test_dist2plane_matches_reference_formula():
    """Cross-check against a literal numpy transcription of the math in
    /root/reference/hyperbolic_vae/manifolds.py:41-65."""
    ball = PoincareBall(c=1.4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 3)) * 0.2
    p = rng.normal(size=(6, 3)) * 0.2
    a = rng.normal(size=(6, 3))
    c = 1.4
    sqrt_c = np.sqrt(c)
    diff = np.asarray(ball.mobius_add(jnp.asarray(-p), jnp.asarray(x)))
    diff_norm2 = np.maximum((diff**2).sum(-1), 1e-15)
    sc_diff_a = (diff * a).sum(-1)
    a_norm = np.maximum(np.linalg.norm(a, axis=-1), 1e-15)
    expected = np.arcsinh(2 * sqrt_c * sc_diff_a / ((1 - c * diff_norm2) * a_norm)) / sqrt_c
    got = np.asarray(ball.dist2plane(jnp.asarray(x), jnp.asarray(p), jnp.asarray(a), signed=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_logdetexp_golden():
    # c=1, d-dim: logdetexp(x,y) = (d-1) log(sinh(t)/t), t = dist(x,y)
    ball = PoincareBall(c=1.0)
    x = jnp.zeros((1, 3))
    y = jnp.array([[0.5, 0.0, 0.0]])
    t = 2 * np.arctanh(0.5)
    expected = 2 * np.log(np.sinh(t) / t)
    np.testing.assert_allclose(np.asarray(ball.logdetexp(x, y)), expected, rtol=1e-5)


def test_logdetexp_zero_at_coincident_points():
    ball = PoincareBall(c=1.0)
    x = jnp.array([[0.3, 0.1]])
    v = np.asarray(ball.logdetexp(x, x))
    np.testing.assert_allclose(v, 0.0, atol=1e-5)
    assert np.all(np.isfinite(v))


def test_log_sinh_ratio_stable():
    t = jnp.array([0.0, 1e-6, 1e-4, 1e-2, 0.5, 5.0, 50.0])
    v = np.asarray(log_sinh_ratio(t))
    assert np.all(np.isfinite(v))
    t64 = np.asarray(t, dtype=np.float64)
    t64_safe = np.maximum(t64, 1e-12)
    expected = np.log(np.sinh(t64_safe) / t64_safe)
    expected[0] = 0.0
    np.testing.assert_allclose(v, expected, rtol=1e-4, atol=1e-8)


def test_project_clamps_to_ball():
    ball = PoincareBall(c=1.0)
    x = jnp.array([[2.0, 0.0], [0.0, 0.5]])
    p = np.asarray(ball.project(x))
    assert np.linalg.norm(p[0]) < 1.0
    np.testing.assert_allclose(p[1], [0.0, 0.5], atol=1e-7)


def test_gradients_finite_near_boundary():
    ball = PoincareBall(c=1.0)

    def f(x):
        y = jnp.array([0.1, -0.2])
        return jnp.sum(ball.dist(ball.project(x), y))

    x = jnp.array([0.999995, 0.0])
    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))

    def f2(u):
        return jnp.sum(ball.logmap0(ball.expmap0(u)))

    g2 = jax.grad(f2)(jnp.array([8.0, 0.0]))  # expmap0 lands ~boundary
    assert np.all(np.isfinite(np.asarray(g2)))


def test_bf16_inputs_upcast():
    ball = PoincareBall(c=1.0)
    x = jnp.array([[0.3, 0.4]], dtype=jnp.bfloat16)
    y = jnp.array([[0.1, -0.2]], dtype=jnp.bfloat16)
    d = ball.dist(x, y)
    assert d.dtype == jnp.float32
    assert np.isfinite(float(d[0]))


def test_jit_and_vmap_clean():
    ball = PoincareBall(c=1.0)
    f = jax.jit(lambda x, y: ball.dist(x, y))
    x = random_points(jax.random.PRNGKey(20), 4, 2, ball)
    y = random_points(jax.random.PRNGKey(21), 4, 2, ball)
    d1 = f(x, y)
    d2 = jax.vmap(lambda a, b: ball.dist(a, b))(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_logdetexp_grad_finite_at_coincident_points():
    """Regression: the log-space branch of log(sinh(t)/t) used to produce
    -inf in the un-taken jnp.where branch at t -> 0, which poisons the
    backward pass (0 * inf = NaN) — only visible on TPU where exp(-2t)
    rounds to 1.0 earlier than on CPU."""
    ball = PoincareBall(c=1.0)
    y = jnp.array([0.3, 0.1])

    def f(x):
        return jnp.sum(ball.logdetexp(x[None], y[None] + x[None] * 0.0))

    g = jax.grad(f)(jnp.array([0.3, 0.1]))  # x == y: dist == 0
    assert np.all(np.isfinite(np.asarray(g))), g

    def f2(t):
        from hyperbolic_vae_tpu.manifolds import log_sinh_ratio
        return jnp.sum(log_sinh_ratio(t))

    g2 = jax.grad(f2)(jnp.array([0.0, 1e-10, 1e-7, 0.05, 0.5, 5.0]))
    assert np.all(np.isfinite(np.asarray(g2))), g2


def test_bf16_boundary_stability():
    """bf16 inputs near the projection boundary: all core ops upcast and
    stay finite (driver BASELINE.json names boundary-stability explicitly)."""
    ball = PoincareBall(c=1.0)
    r = 1.0 - 4e-3
    x = jnp.array([[r, 0.0], [0.0, -r], [r / 2, r / 2]], dtype=jnp.bfloat16)
    y = jnp.array([[0.1, 0.2]], dtype=jnp.bfloat16)
    for val in (
        ball.dist(x, y),
        ball.logdetexp(x, y),
        ball.logmap(x, jnp.broadcast_to(y, x.shape)),
        ball.dist2plane(x, y, y, signed=True),
        ball.lambda_x(x),
        ball.expmap(x, ball.logmap(x, jnp.broadcast_to(y, x.shape))),
    ):
        assert val.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(val))), val
