"""Per-epoch visualization callbacks.

TPU-native equivalents of the reference's figure machinery:
  * GenerateCallback (training/generate_callback.py:6-35): reconstruction
    grid of 8 fixed train inputs every n epochs.
  * LatentScatterCallback (models/vae_euclidean.py:222-303 and its
    hyperbolic subclasses): scatter of val-set posterior means colored by
    label, with plot range +-c^-0.5 (the ball radius! trainer_mnist.py:31-33)
    for hyperbolic models — these produce the repo's headline figures.
  * LatentGridCallback (models/vae_euclidean.py:176-219): decode a 2-D
    latent grid into an image mosaic.

matplotlib replaces plotly+kaleido (not in this image); PNGs land in the
trainer's log_dir and TensorBoard when available.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _to_grid(images: np.ndarray, nrow: int) -> np.ndarray:
    """(N, H, W, C) -> tiled (rows*H, nrow*W, C) grid in [0, 1]."""
    n, h, w, c = images.shape
    rows = -(-n // nrow)
    pad = rows * nrow - n
    if pad:
        images = np.concatenate([images, np.zeros((pad, h, w, c), images.dtype)])
    grid = images.reshape(rows, nrow, h, w, c).transpose(0, 2, 1, 3, 4)
    return grid.reshape(rows * h, nrow * w, c)


class GenerateCallback:
    """Reconstruction grid: row 1 inputs, row 2 reconstructions."""

    def __init__(self, inputs: Optional[np.ndarray] = None, every_n_epochs: int = 10, n: int = 8):
        self.inputs = inputs
        self.every_n_epochs = every_n_epochs
        self.n = n

    def on_fit_start(self, trainer, dm):
        if self.inputs is None:
            self.inputs = np.asarray(dm.x_train[: self.n])

    def on_epoch_end(self, trainer, epoch, params, metrics):
        if (epoch + 1) % self.every_n_epochs:
            return
        x = jnp.asarray(self.inputs)
        recon = trainer.model.apply(
            {"params": params},
            x,
            method="reconstruct",
            rngs={"sample": jax.random.PRNGKey(epoch)},
        )
        recon = np.asarray(recon)
        x_np = np.asarray(x)
        if x_np.ndim == 2:  # flat vectors — render as 1xN strips
            side = int(np.sqrt(x_np.shape[1]))
            if side * side != x_np.shape[1]:
                return
            x_np = x_np.reshape(-1, side, side, 1)
            recon = recon.reshape(-1, side, side, 1)
        lo, hi = x_np.min(), x_np.max()
        norm = lambda a: (a - lo) / max(hi - lo, 1e-9)
        grid = _to_grid(np.concatenate([norm(x_np), norm(recon)]), nrow=len(x_np))
        trainer.metric_logger.log_image(epoch, "reconstructions", grid)


class LatentScatterCallback:
    """Scatter of val-set posterior means, range +-c^-0.5 on the ball.

    ``annotate_means=True`` marks each class's Fréchet (Karcher) mean —
    the geometrically correct per-cluster centroid on the ball
    (manifolds/stats.py) — as a labeled X."""

    def __init__(self, every_n_epochs: int = 10, range_xy: Optional[float] = None,
                 max_points: int = 2000, annotate_means: bool = True):
        self.every_n_epochs = every_n_epochs
        self.range_xy = range_xy
        self.max_points = max_points
        self.annotate_means = annotate_means
        self._dm = None

    def on_fit_start(self, trainer, dm):
        self._dm = dm

    def on_epoch_end(self, trainer, epoch, params, metrics):
        if (epoch + 1) % self.every_n_epochs or self._dm is None:
            return
        latent_dim = getattr(trainer.model, "latent_dim", 2)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        mu, labels = trainer.encode_split(self._dm, params, "val")
        if mu.shape[-1] < 2:  # a 1-D latent has no plane to scatter on
            return
        # latent_dim > 2: scatter the first two posterior-mean coordinates,
        # exactly like the reference callback (vae_euclidean.py:246-255 plots
        # (mu_0, mu_1) whatever the latent width). A coordinate slice of a
        # ball point still lies inside the disk, so the c^-0.5 range holds.
        mu, labels = mu[: self.max_points, :2], labels[: self.max_points]
        ball = getattr(trainer.model, "ball", None)
        r = self.range_xy or (ball.radius if ball is not None else 4.0)
        fig, ax = plt.subplots(figsize=(6, 6))
        names = self._dm.label_names
        for lab in np.unique(labels):
            m = labels == lab
            ax.scatter(mu[m, 0], mu[m, 1], s=4, label=str(names[lab]) if names else str(lab))
        if ball is not None:
            circle = plt.Circle((0, 0), ball.radius, fill=False, ls="--", color="gray")
            ax.add_patch(circle)
            if self.annotate_means and len(mu) and latent_dim == 2:
                from hyperbolic_vae_tpu.manifolds import class_means

                uniq = np.unique(labels)
                lut = {int(lab): i for i, lab in enumerate(uniq)}
                idx = np.asarray([lut[int(lab)] for lab in labels])
                cm = np.asarray(class_means(ball, mu, idx, len(uniq)))
                ax.scatter(cm[:, 0], cm[:, 1], marker="x", s=60, c="black",
                           linewidths=1.5, zorder=5)
        ax.set_xlim(-r, r)
        ax.set_ylim(-r, r)
        ax.set_title("Latent space encoding of validation set")
        ax.legend(markerscale=3, fontsize=7, loc="upper right")
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        plt.close(fig)
        trainer.metric_logger.log_image(epoch, "posterior_means", img.astype(np.uint8))


class LatentGridCallback:
    """Decode a 2-D latent grid to an image mosaic
    (ref VisualizeVAEEuclideanLatentSpace, vae_euclidean.py:176-219)."""

    def __init__(self, every_n_epochs: int = 20, range_lim: float = 5.0, steps: int = 11):
        self.every_n_epochs = every_n_epochs
        self.range_lim = range_lim
        self.steps = steps

    def on_epoch_end(self, trainer, epoch, params, metrics):
        if (epoch + 1) % self.every_n_epochs:
            return
        model = trainer.model
        if getattr(model, "latent_dim", None) != 2:
            return
        lin = np.linspace(-self.range_lim, self.range_lim, self.steps)
        zz = np.stack(np.meshgrid(lin, lin), -1).reshape(-1, 2).astype(np.float32)
        ball = getattr(model, "ball", None)
        if ball is not None:
            zz = np.asarray(ball.project(jnp.asarray(zz)))
        imgs = model.apply({"params": params}, jnp.asarray(zz), method="decode")
        imgs = np.asarray(imgs)
        if imgs.ndim == 2:
            side = int(np.sqrt(imgs.shape[1]))
            if side * side != imgs.shape[1]:
                return
            imgs = imgs.reshape(-1, side, side, 1)
        imgs = (imgs - imgs.min()) / max(imgs.max() - imgs.min(), 1e-9)
        grid = _to_grid(imgs, nrow=self.steps)
        trainer.metric_logger.log_image(epoch, "latent_grid", grid)


class LatentInterpolationCallback:
    """Decode along latent-space geodesics between encoded pairs.

    Beyond the reference's figure set: each row interpolates between two
    validation examples — constant-speed gyro-geodesics on the Poincaré
    ball (manifolds/stats.py geodesic; the geometrically correct path,
    NOT a chord through the disk) or straight lines for Euclidean
    latents — and decodes every waypoint. With labels present the pairs
    walk consecutive distinct classes, so the mosaic shows how the
    decoder morphs one class into the next through latent space. Works
    at any latent dimension (no 2-D restriction)."""

    def __init__(self, every_n_epochs: int = 20, n_pairs: int = 6, steps: int = 12):
        self.every_n_epochs = every_n_epochs
        self.n_pairs = n_pairs
        self.steps = steps
        self._x = None  # (n_pairs, 2, ...) endpoint inputs

    def on_fit_start(self, trainer, dm):
        x, y = np.asarray(dm.x_val), np.asarray(dm.y_val)
        if len(x) < 2:
            return
        if (y >= 0).any():
            classes = np.unique(y[y >= 0])[: self.n_pairs + 1]
            firsts = [x[y == c][0] for c in classes]
            if len(firsts) >= 2:
                ends = [(firsts[i], firsts[i + 1]) for i in range(len(firsts) - 1)]
            else:  # single labeled class — fall back to row pairs
                ends = list(zip(x[0::2], x[1::2]))[: self.n_pairs]
        else:
            ends = list(zip(x[0::2], x[1::2]))[: self.n_pairs]
        self._x = np.stack([np.stack(e) for e in ends])

    def on_epoch_end(self, trainer, epoch, params, metrics):
        if (epoch + 1) % self.every_n_epochs or self._x is None:
            return
        model = trainer.model
        p, t = len(self._x), np.linspace(0.0, 1.0, self.steps, dtype=np.float32)
        flat_ends = jnp.asarray(self._x.reshape((2 * p,) + self._x.shape[2:]))
        mu = model.apply({"params": params}, flat_ends, method="encode")[0]
        mu = mu.reshape(p, 2, -1)
        ball = getattr(model, "ball", None)
        if ball is not None:
            from hyperbolic_vae_tpu.manifolds import geodesic

            z = jax.vmap(lambda a, b: geodesic(ball, a, b, jnp.asarray(t)))(
                mu[:, 0], mu[:, 1]
            )  # (P, T, D)
        else:
            tt = jnp.asarray(t)[None, :, None]
            z = mu[:, 0][:, None] * (1.0 - tt) + mu[:, 1][:, None] * tt
        imgs = model.apply(
            {"params": params}, z.reshape(p * self.steps, -1), method="decode"
        )
        if hasattr(model, "transform_decoder_output"):
            imgs = model.transform_decoder_output(imgs)
        imgs = np.asarray(imgs)
        if imgs.ndim == 2:
            side = int(np.sqrt(imgs.shape[1]))
            if side * side != imgs.shape[1]:
                return
            imgs = imgs.reshape(-1, side, side, 1)
        imgs = (imgs - imgs.min()) / max(imgs.max() - imgs.min(), 1e-9)
        grid = _to_grid(imgs, nrow=self.steps)
        trainer.metric_logger.log_image(epoch, "latent_interpolation", grid)
