"""Visualization callbacks produce image artifacts."""

from pathlib import Path

import numpy as np

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import (
    GenerateCallback,
    LatentGridCallback,
    LatentInterpolationCallback,
    LatentScatterCallback,
    Trainer,
)

import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (fast tier)


def test_callbacks_write_pngs(tmp_path):
    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model,
        max_epochs=2,
        early_stopping_patience=None,
        log_dir=str(tmp_path),
        callbacks=[
            GenerateCallback(every_n_epochs=2),
            LatentScatterCallback(every_n_epochs=2),
            LatentGridCallback(every_n_epochs=2),
            LatentInterpolationCallback(every_n_epochs=2, n_pairs=4, steps=8),
        ],
    )
    trainer.fit(dm)
    pngs = list(Path(tmp_path).glob("*.png"))
    names = {p.name.rsplit("_", 1)[0] for p in pngs}
    assert "reconstructions" in names, pngs
    assert "posterior_means" in names, pngs
    assert "latent_grid" in names, pngs
    assert "latent_interpolation" in names, pngs
    # metrics JSONL also written
    assert (Path(tmp_path) / "metrics.jsonl").exists()


def test_interpolation_geodesic_endpoints(tmp_path):
    """The interpolation path's endpoints must decode the pair's own
    posterior means: t=0 / t=1 frames equal direct decode(encode(x))."""
    import jax
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.manifolds import geodesic

    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    x = jnp.asarray(dm.x_val[:2])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    mu = model.apply({"params": params}, x, method="encode")[0]
    t = jnp.linspace(0.0, 1.0, 7)
    path = geodesic(model.ball, mu[0], mu[1], t)
    np.testing.assert_allclose(np.asarray(path[0]), np.asarray(mu[0]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(path[-1]), np.asarray(mu[1]), atol=2e-6)
    # constant speed: successive hyperbolic distances are equal
    d = np.asarray(model.ball.dist(path[:-1], path[1:]))
    np.testing.assert_allclose(d, d.mean(), rtol=1e-3)


def test_latent_scatter_higher_dim(tmp_path):
    """latent_dim > 2: the scatter plots the first two posterior-mean
    coordinates (reference vae_euclidean.py:246-255 does the same for any
    latent width) instead of silently skipping."""
    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=5)
    trainer = Trainer(
        model,
        max_epochs=1,
        early_stopping_patience=None,
        log_dir=str(tmp_path),
        callbacks=[LatentScatterCallback(every_n_epochs=1)],
    )
    trainer.fit(dm)
    assert list(Path(tmp_path).glob("posterior_means_*.png")), "no scatter written"


def test_latent_scatter_1d_skips(tmp_path):
    """latent_dim == 1: no plane to scatter on — the callback must skip
    (not crash the fit) exactly like the pre-round-4 non-2-D early return."""
    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=1)
    trainer = Trainer(
        model,
        max_epochs=1,
        early_stopping_patience=None,
        log_dir=str(tmp_path),
        callbacks=[LatentScatterCallback(every_n_epochs=1)],
    )
    trainer.fit(dm)  # must complete without IndexError
    assert not list(Path(tmp_path).glob("posterior_means_*.png"))
