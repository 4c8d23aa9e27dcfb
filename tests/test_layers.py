"""Layer-level tests: Riemannian parameterization options and init
schemes (reference layers.py:35-76, 215-228)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.nn import (
    ExpMap0,
    GeodesicLayer,
    LogMap0,
    MobiusLayer,
    PoincareHyperplanes,
    is_manifold_param,
)

BALL = PoincareBall(c=1.0)


def _init_and_run(layer, x):
    variables = layer.init(jax.random.PRNGKey(0), x)
    params = variables.get("params", {})
    out = layer.apply({"params": params}, x)
    return params, out


def test_expmap0_logmap0_modules():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    _, on_ball = _init_and_run(ExpMap0(BALL), x)
    assert bool(jnp.all(BALL.check_point_on_manifold(on_ball)))
    _, back = _init_and_run(LogMap0(BALL), on_ball)
    np.testing.assert_allclose(np.asarray(back), np.asarray(BALL.logmap0(on_ball)), atol=1e-6)


@pytest.mark.parametrize("over_param", [False, True])
def test_geodesic_layer_param_modes(over_param):
    layer = GeodesicLayer(4, 8, BALL, over_param=over_param)
    x = BALL.expmap0(jax.random.normal(jax.random.PRNGKey(2), (6, 4)) * 0.3)
    params, out = _init_and_run(layer, x)
    assert out.shape == (6, 8)
    assert bool(jnp.all(jnp.isfinite(out)))
    names = set(params.keys())
    if over_param:
        # raw manifold point bias -> Riemannian-updated param
        assert "mp_bias" in names
        norms = np.linalg.norm(np.asarray(params["mp_bias"]), axis=-1)
        assert np.all(norms < 1.0)
    else:
        assert "bias_scalar" in names


def test_geodesic_layer_weight_norm_scales():
    x = BALL.expmap0(jax.random.normal(jax.random.PRNGKey(3), (5, 3)) * 0.3)
    plain = GeodesicLayer(3, 4, BALL, weight_norm=False)
    scaled = GeodesicLayer(3, 4, BALL, weight_norm=True)
    p1, o1 = _init_and_run(plain, x)
    o2 = scaled.apply({"params": p1}, x)
    # norm=True multiplies by |a| (the bias-point norm), ref manifolds.py:63-64
    ratio = np.asarray(o2 / o1)
    assert np.allclose(ratio, ratio[0:1], rtol=1e-3)  # constant per plane


def test_mobius_layer_output_on_ball():
    layer = MobiusLayer(6, 3, BALL)
    x = BALL.expmap0(jax.random.normal(jax.random.PRNGKey(4), (7, 6)) * 0.3)
    _, out = _init_and_run(layer, x)
    assert bool(jnp.all(BALL.check_point_on_manifold(out)))


def test_hyperplanes_squared_options():
    x = BALL.expmap0(jax.random.normal(jax.random.PRNGKey(5), (4, 2)) * 0.3)
    base = PoincareHyperplanes(plane_shape=2, num_planes=3, ball=BALL, use_bias=False)
    params, d = _init_and_run(base, x)
    sq_signed = PoincareHyperplanes(
        plane_shape=2, num_planes=3, ball=BALL, use_bias=False, squared=True, signed=True
    )
    d_sq = sq_signed.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(d_sq), np.sign(np.asarray(d)) * np.asarray(d) ** 2, rtol=1e-4
    )
    sq_abs = PoincareHyperplanes(
        plane_shape=2, num_planes=3, ball=BALL, use_bias=False, squared=True, signed=False
    )
    d_abs = sq_abs.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(d_abs), np.asarray(d) ** 2, rtol=1e-4)


def test_hyperplanes_init_distribution():
    """Init places planes at expmap0(direction * N(0, std)) (ref :215-228)."""
    layer = PoincareHyperplanes(plane_shape=16, num_planes=512, ball=BALL, std=0.5)
    x = BALL.expmap0(jnp.zeros((1, 16)))
    params = layer.init(jax.random.PRNGKey(6), x)["params"]
    pts = np.asarray(params["mp_points"])
    assert np.all(np.linalg.norm(pts, axis=-1) < 1.0)
    radii = np.arctanh(np.clip(np.linalg.norm(pts, axis=-1), 0, 1 - 1e-6))
    # |N(0, 0.5)| has mean 0.5*sqrt(2/pi) ~ 0.4
    assert 0.25 < radii.mean() < 0.55, radii.mean()


def test_is_manifold_param():
    assert is_manifold_param(("layer", "mp_points"))
    assert not is_manifold_param(("layer", "kernel"))
    assert not is_manifold_param(())
