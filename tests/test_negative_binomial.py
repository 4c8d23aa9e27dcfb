"""Negative-binomial recon likelihood (the reference's commented-out attempt,
vae_hyperbolic_rnaseq.py:85-88, finished here): torch-golden log_prob,
mean/dispersion conversion, and an RNASeqVAE(recon="nb") training check."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hyperbolic_vae_tpu.distributions import (
    nb_mean_dispersion_to_logits,
    negative_binomial_log_prob,
)
from hyperbolic_vae_tpu.models import RNASeqVAE


def test_nb_log_prob_matches_torch_golden():
    torch = pytest.importorskip("torch")
    k = np.array([0.0, 1.0, 3.0, 10.0, 100.0], dtype=np.float32)
    r = np.array([0.5, 1.0, 2.0, 5.0, 20.0], dtype=np.float32)
    logits = np.array([-2.0, -0.5, 0.0, 1.0, 3.0], dtype=np.float32)
    d = torch.distributions.NegativeBinomial(
        total_count=torch.tensor(r), logits=torch.tensor(logits)
    )
    expected = d.log_prob(torch.tensor(k)).numpy()
    got = np.asarray(
        negative_binomial_log_prob(jnp.asarray(k), jnp.asarray(r), logits=jnp.asarray(logits))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_nb_probs_vs_logits_paths_agree():
    probs = jnp.array([0.1, 0.5, 0.9])
    logits = jnp.log(probs) - jnp.log1p(-probs)
    k = jnp.array([2.0, 2.0, 2.0])
    r = jnp.array([3.0, 3.0, 3.0])
    a = negative_binomial_log_prob(k, r, probs=probs)
    b = negative_binomial_log_prob(k, r, logits=logits)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    with pytest.raises(ValueError):
        negative_binomial_log_prob(k, r)


def test_nb_mean_dispersion_conversion():
    """NB(theta, logits=log mu - log theta) must have mean mu and
    variance mu + mu^2/theta (scvi parameterization round-trip)."""
    mu, theta = 7.0, 3.0
    logits = nb_mean_dispersion_to_logits(jnp.asarray(mu), jnp.asarray(theta))
    k = jnp.arange(0, 600, dtype=jnp.float32)
    p = jnp.exp(negative_binomial_log_prob(k, theta, logits=logits))
    assert abs(float(p.sum()) - 1.0) < 1e-5
    mean = float((k * p).sum())
    var = float(((k - mean) ** 2 * p).sum())
    np.testing.assert_allclose(mean, mu, rtol=1e-4)
    np.testing.assert_allclose(var, mu + mu * mu / theta, rtol=1e-3)


def test_rnaseq_vae_nb_recon_trains():
    """recon='nb' must produce finite loss/grads and improve over a few
    Adam steps on synthetic counts (the thing the reference never got
    working)."""
    rng = np.random.default_rng(0)
    # synthetic counts: theta=2 NB around per-gene means
    mu = rng.uniform(0.5, 20.0, size=(200,))
    x = rng.negative_binomial(n=2.0, p=2.0 / (2.0 + mu), size=(32, 200)).astype(np.float32)
    x = jnp.asarray(x)
    model = RNASeqVAE(in_features=200, hidden_dim=32, latent_dim=2, recon="nb")
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, x)["params"]
    assert "nb_log_theta" in params
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            m = model.apply({"params": p}, x, method="loss", rngs={"sample": key})
            return m["loss_total"], m

        (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 10.0, (losses[0], losses[-1])


def test_rnaseq_vae_invalid_recon_rejected():
    x = jnp.zeros((2, 50))
    model = RNASeqVAE(in_features=50, hidden_dim=8, latent_dim=2, recon="poisson")
    with pytest.raises(ValueError):
        model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)


def test_nb_recon_poisons_on_negative_inputs():
    """recon='nb' on negative (e.g. z-scored) inputs is a config error:
    the loss must go NaN so the Trainer's guards surface it, instead of
    silently optimizing an invalid likelihood."""
    model = RNASeqVAE(in_features=50, hidden_dim=8, latent_dim=2, recon="nb")
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    x_counts = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (4, 50))) * 5
    params = model.init(rngs, x_counts)["params"]
    m_ok = model.apply({"params": params}, x_counts, method="loss",
                       rngs={"sample": jax.random.PRNGKey(3)})
    assert np.isfinite(float(m_ok["loss_total"]))
    x_z = x_counts - 3.0  # z-score-like: some negatives
    m_bad = model.apply({"params": params}, x_z, method="loss",
                        rngs={"sample": jax.random.PRNGKey(3)})
    assert np.isnan(float(m_bad["loss_total"]))
