"""IWAE marginal-likelihood bounds across model families (models/iwae.py,
Trainer.evaluate_iwae)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperbolic_vae_tpu.models import (
    EuclideanVAE,
    GyroplaneVAE,
    HyperbolicImageVAE,
    RNASeqVAE,
    UnifiedVAE,
)
from hyperbolic_vae_tpu.models.iwae import combine_chunked_bounds, iwae_bound


def _zero_params(model, x):
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    return jax.tree.map(jnp.zeros_like, params)


def _iwae(model, params, x, k, seed=0):
    return np.asarray(
        model.apply(
            {"params": params}, x, k, method="iwae",
            rngs={"sample": jax.random.PRNGKey(seed)},
        )
    )


def test_combine_chunked_bounds_exact():
    """Recombining chunked bounds is EXACT logsumexp algebra, not an
    approximation: splitting the same log-weights must reproduce the
    unchunked bound bitwise-tight."""
    rng = np.random.default_rng(0)
    log_w = jnp.asarray(rng.normal(size=(48, 5)), jnp.float32)
    full = iwae_bound(log_w)
    parts = [iwae_bound(log_w[:16]), iwae_bound(log_w[16:40]), iwae_bound(log_w[40:])]
    combined = combine_chunked_bounds(parts, [16, 24, 8])
    np.testing.assert_allclose(np.asarray(combined), np.asarray(full), atol=1e-5)


@pytest.mark.parametrize("family", ["gyroplane", "euclidean", "rnaseq"])
def test_zero_decoder_recovers_constant_loglik(family):
    """With ALL params zero the decoder output is constant, so
    log p(x) = log p(x | z_const) exactly; the K-sample bound must
    converge there (importance ratios p(z)/q(z) average to 1)."""
    rng = np.random.default_rng(1)
    if family == "gyroplane":
        model = GyroplaneVAE(data_shape=(8, 8, 1), latent_dim=2)
        x = jnp.asarray(rng.uniform(0.05, 0.95, (6, 8, 8, 1)), jnp.float32)
    elif family == "euclidean":
        model = EuclideanVAE(data_shape=(16, 16, 1), hidden_size=2, latent_dim=2)
        x = jnp.asarray(rng.uniform(0.05, 0.95, (6, 16, 16, 1)), jnp.float32)
    else:
        model = RNASeqVAE(in_features=12, hidden_dim=6, latent_dim=2)
        x = jnp.asarray(rng.uniform(0.05, 0.95, (6, 12)), jnp.float32)
    params = _zero_params(model, x)

    bound = _iwae(model, params, x, k=4096)

    # the exact conditional at any z (the decoder ignores z): reuse the
    # model's own likelihood via a k=1 bound with q == p cancelled out —
    # compute log p(x|z) directly from decode + the same likelihood
    zf = jnp.zeros((x.shape[0], 2), jnp.float32)
    xh = np.asarray(model.apply({"params": params}, zf, method="decode"))
    if family == "euclidean":
        from hyperbolic_vae_tpu.models.iwae import gaussian_loglik

        direct = np.asarray(
            gaussian_loglik(
                x.reshape(x.shape[0], -1),
                jnp.asarray(xh.reshape(1, x.shape[0], -1)),
            )
        )[0]
    elif family == "rnaseq":
        from hyperbolic_vae_tpu.models.iwae import gaussian_loglik

        direct = np.asarray(
            gaussian_loglik(x, jnp.asarray(xh.reshape(1, x.shape[0], -1)))
        )[0]
    else:
        from hyperbolic_vae_tpu.distributions import relaxed_bernoulli_log_prob

        direct = np.asarray(
            jnp.sum(
                relaxed_bernoulli_log_prob(
                    x.reshape(x.shape[0], -1),
                    1.0,
                    probs=jnp.asarray(xh.reshape(x.shape[0], -1)),
                ),
                axis=-1,
            )
        )
    # MC error of log-mean-exp at K=4096 with 2-D latent ratios
    np.testing.assert_allclose(bound, direct, atol=0.05)


def test_bound_monotone_in_k():
    """E[L_k] is non-decreasing in k (Burda et al.); check with enough
    samples that MC noise can't flip the comparison."""
    model = GyroplaneVAE(data_shape=(8, 8, 1), latent_dim=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0.05, 0.95, (32, 8, 8, 1)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)}, x
    )["params"]
    b1 = np.concatenate([_iwae(model, params, x, 1, seed=s) for s in range(16)])
    b64 = _iwae(model, params, x, 64, seed=99)
    assert b64.mean() >= b1.mean() - 0.05


@pytest.mark.parametrize("setup", ["himage_bernoulli", "unified_euclidean_bce"])
def test_other_families_finite(setup):
    rng = np.random.default_rng(5)
    if setup == "himage_bernoulli":
        model = HyperbolicImageVAE(
            data_shape=(16, 16, 1), latent_dim=2, loss_recon="bernoulli"
        )
        x = jnp.asarray(rng.uniform(0.05, 0.95, (4, 16, 16, 1)), jnp.float32)
    else:
        model = UnifiedVAE(
            input_size=(10,), hidden_layer_dim=6, latent_dim=2,
            latent_curvature=None,
            loss_recon_method="binary_cross_entropy_with_logits",
        )
        x = jnp.asarray(rng.uniform(0.05, 0.95, (4, 10)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(6), "sample": jax.random.PRNGKey(7)}, x
    )["params"]
    b = _iwae(model, params, x, 32)
    assert b.shape == (4,) and np.all(np.isfinite(b))


def test_trainer_evaluate_iwae_chunked():
    """evaluate_iwae: both-axis chunking runs and lands in the same range
    as a single-shot bound (different RNG streams, same distribution)."""
    from hyperbolic_vae_tpu.data import mnist
    from hyperbolic_vae_tpu.train import Trainer

    dm = mnist.make_data_module(batch_size=32, synthetic=True, n_train=128, n_test=48)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=2, early_stopping_patience=None,
                      check_finite=False)
    res = trainer.fit(dm)
    v = trainer.evaluate_iwae(dm, res.best_params, k=96, batch_chunk=20, k_chunk=40)
    assert np.isfinite(v)
    single = _iwae(model, res.best_params, jnp.asarray(dm.x_test[:48]), 96).mean()
    assert abs(v - float(single)) < 25.0  # same scale, independent RNG


def test_rnaseq_nb_iwae_poisons_negative_inputs():
    """NB is a density over counts: iwae on (z-scored) negative inputs
    must go NaN loudly, mirroring loss() (vae_rnaseq.py), never report
    finite garbage."""
    model = RNASeqVAE(in_features=8, hidden_dim=4, latent_dim=2, recon="nb")
    x_ok = jnp.asarray(np.abs(np.random.default_rng(0).poisson(3.0, (4, 8))), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x_ok
    )["params"]
    good = _iwae(model, params, x_ok, k=8)
    assert np.all(np.isfinite(good))
    x_bad = x_ok.at[1, 3].set(-0.5)
    bad = _iwae(model, params, x_bad, k=8)
    assert np.isnan(bad[1]) and np.isfinite(bad[[0, 2, 3]]).all()


def test_pvae_family_uniform_iwae_api():
    """PvaeMLPVAE.iwae is per-sample (B,) like every other family, so
    Trainer.evaluate_iwae's exact chunk recombination applies to it too."""
    from hyperbolic_vae_tpu.data import mnist
    from hyperbolic_vae_tpu.models import PvaeMLPVAE
    from hyperbolic_vae_tpu.train import Trainer

    dm = mnist.make_data_module(batch_size=32, synthetic=True, n_train=96, n_test=32)
    model = PvaeMLPVAE(data_shape=dm.input_shape, latent_dim=2)
    x = jnp.asarray(dm.x_test[:8])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    b = _iwae(model, params, x, k=16)
    assert b.shape == (8,) and np.all(np.isfinite(b))
    trainer = Trainer(model, max_epochs=1)
    v = trainer.evaluate_iwae(dm, params, k=64, batch_chunk=16, k_chunk=32)
    assert np.isfinite(v)
