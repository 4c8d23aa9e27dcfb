"""pvae-replication model: both posteriors train, IWAE >= nothing-weird."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.models import PvaeMLPVAE

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (fast tier)


@pytest.mark.parametrize("posterior", ["wrapped", "riemannian"])
def test_pvae_model_one_step(posterior):
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (8, 28, 28, 1)) > 0.5, jnp.float32
    )
    model = PvaeMLPVAE(data_shape=(28, 28, 1), hidden_dim=64, latent_dim=2, posterior=posterior)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, x)["params"]

    def loss_fn(p):
        m = model.apply({"params": p}, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)})
        return m["loss_total"], m

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(float(metrics["elbo"]))


def test_iwae_bound_tighter_than_elbo():
    """IWAE_K >= ELBO (monotone in K), a classic sanity check."""
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (16, 28, 28, 1)) > 0.5, jnp.float32
    )
    model = PvaeMLPVAE(data_shape=(28, 28, 1), hidden_dim=32, latent_dim=2)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, x)["params"]
    elbo = float(
        model.apply({"params": params}, x, method="loss", rngs={"sample": jax.random.PRNGKey(3)})["elbo"]
    )
    iwae = float(
        jnp.mean(
            model.apply({"params": params}, x, 256, method="iwae",
                        rngs={"sample": jax.random.PRNGKey(3)})
        )
    )
    assert iwae >= elbo - 0.5, (iwae, elbo)  # allow MC slack
