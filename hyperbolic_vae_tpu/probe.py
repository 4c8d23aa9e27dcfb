"""Latent-space probes: embedding quality as classification accuracy
under the manifold metric.

The reference's headline claim is qualitative — classes/lineages
separate on the Poincaré disk (its latent scatter figures,
vae_euclidean.py:237-303 and the RNA-seq plots). These probes make it
quantitative, the standard representation-learning protocol:

  * ``knn_accuracy``: k-nearest-neighbour vote with GEODESIC distances
    (Euclidean for flat latents) — non-parametric, measures local
    structure.
  * ``nearest_mean_accuracy``: classify by nearest per-class Fréchet
    mean (manifolds/stats.py class_means) — one prototype per class,
    measures global cluster separation.

Both are jit-compiled and chunked over query rows, so a 60k-point MNIST
probe runs as a handful of MXU-shaped distance blocks. Labels may be
arbitrary ints; they are reindexed to a contiguous range on the host.
``Trainer.evaluate_probe`` wires them to a trained model via the padded
``encode_split`` path; ``eval_checkpoints.py --probe K`` reports them
for any checkpoint.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hyperbolic_vae_tpu.manifolds import PoincareBall, class_means

__all__ = ["pairwise_dist", "knn_accuracy", "nearest_mean_accuracy"]


def pairwise_dist(ball: Optional[PoincareBall], a, b) -> jax.Array:
    """(m, d) × (n, d) -> (m, n) geodesic (or Euclidean) distances."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if ball is None:
        # |a-b|^2 expanded for one MXU matmul instead of an (m, n, d) cube
        sq = (
            jnp.sum(a * a, -1)[:, None]
            - 2.0 * (a @ b.T)
            + jnp.sum(b * b, -1)[None, :]
        )
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    return ball.dist(a[:, None, :], b[None, :, :])


def _contiguous_labels(y_train, y_test):
    classes, y_tr = np.unique(np.asarray(y_train), return_inverse=True)
    lut = {int(c): i for i, c in enumerate(classes)}
    y_te = np.asarray([lut.get(int(v), -1) for v in np.asarray(y_test)])
    return len(classes), y_tr.astype(np.int32), y_te.astype(np.int32)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _knn_chunk(n_classes, z_train, y_train, zq, ball_c, k, euclidean):
    ball = None if euclidean else PoincareBall(c=ball_c)
    d = pairwise_dist(ball, zq, z_train)
    _, idx = jax.lax.top_k(-d, k)
    # mode="clip": default fill-gather miscompiles on the axon backend
    # (CLAUDE.md platform trap #1)
    lab = jnp.take(y_train, idx, axis=0, mode="clip")  # (q, k)
    votes = jnp.sum(jax.nn.one_hot(lab, n_classes, dtype=jnp.float32), axis=1)
    return jnp.argmax(votes, axis=-1)


def knn_accuracy(z_train, y_train, z_test, y_test,
                 ball: Optional[PoincareBall] = None, k: int = 10,
                 chunk: int = 2048) -> float:
    """Accuracy of a k-NN majority vote under the latent metric. Ties
    break toward the smaller class index (argmax), deterministically."""
    n_classes, y_tr, y_te = _contiguous_labels(y_train, y_test)
    k = min(int(k), len(np.asarray(z_train)))
    z_train = jnp.asarray(z_train, jnp.float32)
    y_tr_j = jnp.asarray(y_tr)
    c = float(ball.c) if ball is not None else 1.0
    correct = total = 0
    z_test = np.asarray(z_test, np.float32)
    for start in range(0, len(z_test), chunk):
        zq = z_test[start : start + chunk]
        rows = len(zq)
        if rows < chunk:  # pad the tail: ONE compiled shape per probe
            zq = np.concatenate([zq, np.zeros((chunk - rows,) + zq.shape[1:], np.float32)])
        pred = np.asarray(
            _knn_chunk(n_classes, z_train, y_tr_j, jnp.asarray(zq), c, k, ball is None)
        )[:rows]
        yq = y_te[start : start + chunk]
        keep = yq >= 0  # test labels unseen in train don't count
        correct += int((pred[keep] == yq[keep]).sum())
        total += int(keep.sum())
    return correct / max(total, 1)


def nearest_mean_accuracy(z_train, y_train, z_test, y_test,
                          ball: Optional[PoincareBall] = None) -> float:
    """Accuracy of nearest-class-prototype classification; prototypes are
    per-class Fréchet (Karcher) means on the ball, arithmetic means for
    flat latents."""
    n_classes, y_tr, y_te = _contiguous_labels(y_train, y_test)
    z_tr = jnp.asarray(z_train, jnp.float32)
    if ball is not None:
        means = class_means(ball, z_tr, jnp.asarray(y_tr), n_classes)
    else:
        onehot = jax.nn.one_hot(jnp.asarray(y_tr), n_classes, dtype=jnp.float32)
        counts = jnp.maximum(jnp.sum(onehot, 0), 1.0)
        means = (onehot.T @ z_tr) / counts[:, None]
    d = pairwise_dist(ball, jnp.asarray(z_test, jnp.float32), means)
    pred = np.asarray(jnp.argmin(d, axis=-1))
    keep = y_te >= 0
    return float((pred[keep] == y_te[keep]).mean()) if keep.any() else 0.0
