"""Training-control utilities: ReduceLROnPlateau and EarlyStopping.

Re-implements the Lightning/torch semantics the reference relies on:
  * torch ReduceLROnPlateau(mode="min", factor=0.2, patience=20,
    min_lr=5e-5) monitoring val/loss_total
    (/root/reference/hyperbolic_vae/models/vae_hyperbolic.py:236-243).
  * Lightning EarlyStopping(monitor="val/loss_total", patience=10)
    (/root/reference/hyperbolic_vae/training/trainer_mnist.py:34).

These are host-side (per-epoch, not per-step) controllers: plain Python
dataclasses mutated between jitted epochs, with their scalar output (the
lr) fed into the jitted step as an argument — so no recompilation on lr
change.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch-semantics plateau scheduler (mode='min', default threshold
    semantics: rel threshold 1e-4).

    Arithmetic is done in float32 so this host-side controller is
    bit-identical to the in-graph controller the chunked trainer compiles
    (train/trainer.py _chunk_fn) — K=1 and K>1 histories match exactly
    even across LR drops."""

    lr: float
    factor: float = 0.2
    patience: int = 20
    min_lr: float = 5e-5
    threshold: float = 1e-4
    best: float = math.inf
    num_bad_epochs: int = 0

    def __post_init__(self):
        # the whole controller pipeline is f32 (bit parity with the
        # in-graph mirror): quantize the starting lr too, so recorded
        # histories agree from epoch 0, not only after the first drop
        self.lr = float(np.float32(self.lr))

    def step(self, metric: float) -> float:
        if np.float32(metric) < np.float32(self.best) * (
            np.float32(1.0) - np.float32(self.threshold)
        ):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = float(
                np.maximum(
                    np.float32(self.lr) * np.float32(self.factor),
                    np.float32(self.min_lr),
                )
            )
            # torch only APPLIES a reduction (old - new > eps): an lr
            # already below min_lr (e.g. a per-lane lr sweep point) must
            # never be raised to min_lr
            if new_lr < self.lr:
                self.lr = new_lr
            self.num_bad_epochs = 0
        return self.lr


@dataclasses.dataclass
class EarlyStopping:
    """Lightning-semantics early stopping (mode='min', min_delta=0)."""

    patience: int = 10
    min_delta: float = 0.0
    best: float = math.inf
    wait: int = 0
    stopped: bool = False

    def step(self, metric: float) -> bool:
        """Returns True if training should stop."""
        if np.float32(metric) < np.float32(self.best) - np.float32(self.min_delta):
            self.best = metric
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped
