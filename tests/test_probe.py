"""Latent-space probes (probe.py): kNN + nearest-Fréchet-mean accuracy
under the manifold metric."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.probe import (
    knn_accuracy,
    nearest_mean_accuracy,
    pairwise_dist,
)


@pytest.fixture(scope="module")
def ball():
    return PoincareBall(c=1.0)


def _clusters(ball, n_per=60, seed=0):
    """Three well-separated clusters ON the ball: tangent Gaussians
    exp-mapped around distinct anchors."""
    rng = np.random.default_rng(seed)
    anchors = np.asarray([[0.55, 0.0], [-0.3, 0.45], [-0.25, -0.5]], np.float32)
    zs, ys = [], []
    for i, a in enumerate(anchors):
        v = rng.normal(0, 0.08, (n_per, 2)).astype(np.float32)
        z = ball.expmap(jnp.asarray(np.tile(a, (n_per, 1))), jnp.asarray(v))
        zs.append(np.asarray(z))
        ys.append(np.full(n_per, i * 3 + 1))  # non-contiguous labels: 1, 4, 7
    return np.concatenate(zs), np.concatenate(ys)


def test_pairwise_dist_euclidean_matches_direct():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(7, 3)).astype(np.float32)
    b = rng.normal(size=(5, 3)).astype(np.float32)
    d = np.asarray(pairwise_dist(None, a, b))
    want = np.linalg.norm(a[:, None] - b[None], axis=-1)
    np.testing.assert_allclose(d, want, atol=1e-5)


def test_pairwise_dist_ball_matches_scalar(ball):
    z, _ = _clusters(ball, n_per=4)
    d = np.asarray(pairwise_dist(ball, z[:3], z[3:6]))
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(
                d[i, j], float(ball.dist(z[i], z[3 + j])), rtol=1e-5
            )


def test_probes_separate_clusters(ball):
    z, y = _clusters(ball, n_per=60)
    zq, yq = _clusters(ball, n_per=20, seed=9)
    assert knn_accuracy(z, y, zq, yq, ball=ball, k=5) >= 0.95
    assert nearest_mean_accuracy(z, y, zq, yq, ball=ball) >= 0.95
    # Euclidean metric on the same points also separates these (sanity:
    # both code paths run; geodesic vs chordal ordering differs near the
    # boundary but not for these clusters)
    assert knn_accuracy(z, y, zq, yq, ball=None, k=5) >= 0.9


def test_knn_chunked_matches_unchunked(ball):
    z, y = _clusters(ball, n_per=40)
    zq, yq = _clusters(ball, n_per=30, seed=3)
    a = knn_accuracy(z, y, zq, yq, ball=ball, k=7, chunk=16)
    b = knn_accuracy(z, y, zq, yq, ball=ball, k=7, chunk=4096)
    assert a == b


def test_unseen_test_label_excluded(ball):
    z, y = _clusters(ball, n_per=30)
    zq, yq = _clusters(ball, n_per=10, seed=5)
    yq = yq.copy()
    yq[:5] = 999  # label never seen in train: dropped from the score
    acc_full = knn_accuracy(z, y, zq, np.asarray(yq), ball=ball, k=5)
    assert 0.0 <= acc_full <= 1.0
    # all-unseen -> degenerate 0-denominator guard
    assert knn_accuracy(z, y, zq[:5], np.full(5, 999), ball=ball, k=5) == 0.0


def test_trainer_evaluate_probe_end_to_end():
    from hyperbolic_vae_tpu.data.mnist import make_data_module
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer

    dm = make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=3, early_stopping_patience=None,
                      check_finite=False)
    res = trainer.fit(dm)
    ms = trainer.evaluate_probe(dm, res.best_params, k=5)
    assert set(ms) == {"test/probe_knn5_acc", "test/probe_nearest_mean_acc"}
    for v in ms.values():
        assert 0.0 <= v <= 1.0
    # synthetic MNIST classes are pixel-structured: a 3-epoch embedding
    # must already beat the 1/10 chance floor
    assert ms["test/probe_knn5_acc"] > 0.15
