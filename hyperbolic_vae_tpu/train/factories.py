"""Trainer factory with the reference's canonical MNIST configuration.

Equivalent of make_trainer_hyperbolic(curvature)
(/root/reference/hyperbolic_vae/training/trainer_mnist.py:14-39):
max 300 epochs, best+last checkpointing on val/loss_total,
reconstruction-grid callback, latent scatter with plot range +-c^-0.5
(the ball radius), early stopping patience 10.
"""

from __future__ import annotations

from typing import Optional

from hyperbolic_vae_tpu.train.callbacks import GenerateCallback, LatentScatterCallback
from hyperbolic_vae_tpu.train.trainer import Trainer


def make_trainer_hyperbolic(
    model,
    curvature: float = 1.0,
    max_epochs: int = 300,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    **kwargs,
) -> Trainer:
    range_xy = curvature ** -0.5  # ball radius (ref trainer_mnist.py:31-33)
    return Trainer(
        model,
        max_epochs=max_epochs,
        monitor="val/loss_total",
        early_stopping_patience=kwargs.pop("early_stopping_patience", 10),
        log_dir=log_dir,
        checkpoint_dir=checkpoint_dir,
        callbacks=[
            GenerateCallback(every_n_epochs=10),
            LatentScatterCallback(every_n_epochs=10, range_xy=range_xy),
        ],
        **kwargs,
    )
