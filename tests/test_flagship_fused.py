"""Fused flagship step: the jnp mirror must match the flax model exactly
(same eps), the Pallas path (interpret mode here) must match the mirror,
and the custom-VJP gradients must match autodiff through the model."""

import jax
import jax.numpy as jnp
import numpy as np

from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.ops.flagship_fused import (
    _params_tuple,
    flagship_forward_jnp,
    fused_flagship_loss,
    make_fused_loss_fn,
    supports_fused,
)

import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (fast tier)


def _setup(latent=2, c=1.0, beta=1.0, prior=1.0, B=32, data=(28, 28, 1)):
    model = GyroplaneVAE(
        data_shape=data, latent_dim=latent, manifold_curvature=c,
        beta=beta, prior_scale=prior,
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B,) + data), jnp.float32
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, x)["params"]
    eps = jax.random.normal(jax.random.PRNGKey(2), (B, latent))
    return model, params, x, eps


def test_mirror_matches_model():
    model, params, x, eps = _setup()
    m = model.apply({"params": params}, x, eps, method="loss_from_eps")
    lt, rm, km = flagship_forward_jnp(
        _params_tuple(params), x, eps,
        c=1.0, beta=1.0, prior_scale=1.0, latent_dim=2, data_numel=784,
    )
    np.testing.assert_allclose(float(lt), float(m["loss_total"]), rtol=2e-4)
    np.testing.assert_allclose(float(rm), float(m["recon_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(km), float(m["kl_loss"]), rtol=2e-3, atol=1e-3)


def test_mirror_matches_model_nondefault_config():
    model, params, x, eps = _setup(latent=3, c=1.4, beta=0.5, prior=2.0, B=16)
    m = model.apply({"params": params}, x, eps, method="loss_from_eps")
    lt, _, km = flagship_forward_jnp(
        _params_tuple(params), x, eps,
        c=1.4, beta=0.5, prior_scale=2.0, latent_dim=3, data_numel=784,
    )
    np.testing.assert_allclose(float(lt), float(m["loss_total"]), rtol=2e-4)


def test_fused_op_matches_mirror():
    model, params, x, eps = _setup()
    pt = _params_tuple(params)
    lt1, rm1, km1 = fused_flagship_loss(pt, x, eps, 1.0, 1.0, 1.0, 2, 784)
    lt2, rm2, km2 = flagship_forward_jnp(
        pt, x, eps, c=1.0, beta=1.0, prior_scale=1.0, latent_dim=2, data_numel=784
    )
    np.testing.assert_allclose(float(lt1), float(lt2), rtol=1e-5)
    np.testing.assert_allclose(float(rm1), float(rm2), rtol=1e-5)
    np.testing.assert_allclose(float(km1), float(km2), rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_model_autodiff():
    model, params, x, eps = _setup()

    def fused_loss(p):
        lt, _, _ = fused_flagship_loss(_params_tuple(p), x, eps, 1.0, 1.0, 1.0, 2, 784)
        return lt

    def model_loss(p):
        return model.apply({"params": p}, x, eps, method="loss_from_eps")["loss_total"]

    g1 = jax.grad(fused_loss)(params)
    g2 = jax.grad(model_loss)(params)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1), jax.tree_util.tree_leaves_with_path(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=str(p1),
        )


def test_make_fused_loss_fn_end_to_end():
    model, params, x, _ = _setup()
    assert supports_fused(model)
    loss_fn = make_fused_loss_fn(model)
    m = loss_fn(params, x, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss_total"]))
    g = jax.grad(lambda p: loss_fn(p, x, jax.random.PRNGKey(5))["loss_total"])(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))
