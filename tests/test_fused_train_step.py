"""The single-kernel train step must match the optax/autodiff step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.ops.flagship_fused import make_fused_train_step
from hyperbolic_vae_tpu.train import Trainer
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (fast tier)


def _setup(B=32):
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
    trainer = Trainer(model, max_epochs=1, early_stopping_patience=None)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, 28, 28, 1)), jnp.float32
    )
    params = trainer.init_params(x)
    opt_state = trainer._optimizer.init(params)
    return model, trainer, params, opt_state, x


def _reference_step(model, trainer, params, opt_state, x, eps):
    def loss_fn(p):
        m = model.apply({"params": p}, x, eps, method="loss_from_eps")
        return m["loss_total"], m

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, new_opt_state = trainer._optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, metrics


def test_fused_step_matches_reference_one_step():
    model, trainer, params, opt_state, x = _setup()
    step = make_fused_train_step(model)
    key = jax.random.PRNGKey(3)
    p1, s1, m1 = step(params, opt_state, x, key)
    eps = jax.random.normal(key, (x.shape[0], 2), jnp.float32)
    p2, s2, m2 = _reference_step(model, trainer, params, opt_state, x, eps)
    np.testing.assert_allclose(float(m1["loss_total"]), float(m2["loss_total"]), rtol=2e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p1), jax.tree_util.tree_leaves_with_path(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-4, err_msg=str(path)
        )
    assert int(s1.inner_state.count) == int(s2.inner_state.count)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.inner_state.exp_avg),
        jax.tree_util.tree_leaves_with_path(s2.inner_state.exp_avg),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-4, err_msg=str(path)
        )


def test_fused_step_multi_step_trajectory():
    """5 fused steps track 5 reference steps (same eps draws)."""
    model, trainer, params, opt_state, x = _setup(B=16)
    step = make_fused_train_step(model)
    p_f, s_f = params, opt_state
    p_r, s_r = params, opt_state
    key = jax.random.PRNGKey(7)
    for i in range(5):
        key, k = jax.random.split(key)
        p_f, s_f, m_f = step(p_f, s_f, x, k)
        eps = jax.random.normal(k, (x.shape[0], 2), jnp.float32)
        p_r, s_r, m_r = _reference_step(model, trainer, p_r, s_r, x, eps)
    np.testing.assert_allclose(
        float(m_f["loss_total"]), float(m_r["loss_total"]), rtol=5e-3
    )
    pts_f = np.asarray(p_f["gyroplanes"]["mp_points"])
    pts_r = np.asarray(p_r["gyroplanes"]["mp_points"])
    np.testing.assert_allclose(pts_f, pts_r, rtol=2e-2, atol=1e-3)
    assert np.all(np.linalg.norm(pts_f, axis=-1) < 1.0)


def test_fused_step_under_jit_and_scan():
    """The production shape: fused step inside a jitted lax.scan."""
    model, trainer, params, opt_state, x = _setup(B=16)
    step = make_fused_train_step(model)

    @jax.jit
    def epoch(params, opt_state, key):
        def body(carry, _):
            p, s, k = carry
            k, sk = jax.random.split(k)
            p, s, m = step(p, s, x, sk)
            return (p, s, k), m["loss_total"]

        (p, s, _), losses = jax.lax.scan(body, (params, opt_state, key), None, length=8)
        return p, s, losses

    p, s, losses = epoch(params, opt_state, jax.random.PRNGKey(0))
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
