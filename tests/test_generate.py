"""Unconditional generation: generate(n) decodes latent-prior draws
(models/sampling.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.models import (
    EuclideanVAE,
    GyroplaneVAE,
    HyperbolicImageVAE,
    RNASeqVAE,
    UnifiedVAE,
)


def _gen(model, x, n, seed=0):
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    return np.asarray(
        model.apply(
            {"params": params}, n, method="generate",
            rngs={"sample": jax.random.PRNGKey(seed)},
        )
    )


def test_generate_all_families_finite():
    rng = np.random.default_rng(0)
    x_img = jnp.asarray(rng.uniform(0.1, 0.9, (4, 8, 8, 1)), jnp.float32)
    x_vec = jnp.asarray(rng.uniform(0.1, 0.9, (4, 12)), jnp.float32)
    cases = [
        (GyroplaneVAE(data_shape=(8, 8, 1), latent_dim=2), x_img),
        (HyperbolicImageVAE(data_shape=(8, 8, 1), latent_dim=2), x_img),
        (EuclideanVAE(data_shape=(8, 8, 1), hidden_size=2, latent_dim=2), x_img),
        (RNASeqVAE(in_features=12, hidden_dim=6, latent_dim=2), x_vec),
        (
            UnifiedVAE(
                input_size=(12,), hidden_layer_dim=6, latent_dim=2,
                latent_curvature=None,
                loss_recon_method="binary_cross_entropy_with_logits",
            ),
            x_vec,
        ),
    ]
    for model, x in cases:
        out = _gen(model, x, n=5)
        assert out.shape[0] == 5 and np.all(np.isfinite(out)), type(model).__name__


def test_generate_prior_matches_kl_prior():
    """The sampled z's must live inside the ball (truncated chart) and be
    seed-deterministic; different seeds differ."""
    model = GyroplaneVAE(data_shape=(8, 8, 1), latent_dim=2)
    x = jnp.zeros((2, 8, 8, 1), jnp.float32)
    a = _gen(model, x, n=8, seed=3)
    b = _gen(model, x, n=8, seed=3)
    c = _gen(model, x, n=8, seed=4)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6

    from hyperbolic_vae_tpu.models.sampling import prior_sample

    # direct prior draws live strictly inside the ball
    import flax.linen as fnn

    class Probe(fnn.Module):
        @fnn.compact
        def __call__(self, n):
            return prior_sample(self, model.ball, n, 2, 1.0)

    probe = Probe()
    z = probe.apply(
        probe.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, 4),
        256,
        rngs={"sample": jax.random.PRNGKey(7)},
    )
    norms = np.linalg.norm(np.asarray(z), axis=-1)
    assert np.all(norms < model.ball.radius), norms.max()
