"""Training control: ReduceLROnPlateau, EarlyStopping, LR schedules.

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

``cosine_schedule``/``exponential_schedule`` are beyond-reference
DETERMINISTIC epoch-indexed schedules (the reference only ships
plateau). They return jnp-traceable callables in pure f32, so the same
function evaluates on the host (K=1 loop) and inside the chunked
in-graph program (Trainer(lr_schedule=...)).
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


def cosine_schedule(base_lr: float, total_epochs: int, warmup_epochs: int = 0,
                    min_lr: float = 0.0):
    """Linear warmup (epochs 0..warmup-1 ramp to base_lr) then cosine
    decay to min_lr at total_epochs; constant min_lr after. Returns an
    f32 jnp-traceable ``fn(epoch) -> lr`` for Trainer(lr_schedule=...)."""
    import jax.numpy as jnp

    base, lo = jnp.float32(base_lr), jnp.float32(min_lr)
    w, total = jnp.float32(warmup_epochs), jnp.float32(total_epochs)

    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        warm = base * (e + 1.0) / jnp.maximum(w, 1.0)
        t = jnp.clip((e - w) / jnp.maximum(total - w, 1.0), 0.0, 1.0)
        cos = lo + 0.5 * (base - lo) * (1.0 + jnp.cos(jnp.float32(math.pi) * t))
        return jnp.where(e < w, warm, cos).astype(jnp.float32)

    return fn


def beta_warmup_schedule(beta_end: float, warmup_epochs: int,
                         beta_start: float = 0.0):
    """KL-annealing schedule: beta ramps linearly from ``beta_start`` to
    ``beta_end`` over ``warmup_epochs`` epochs, then stays at beta_end.

    The standard cure for VAE posterior collapse (Bowman et al. 2016):
    the reference's RelaxedBernoulli conv-hyperbolic, gyroplane-MNIST
    and Jerby-Arnon headline figures are all posterior-collapsed at
    constant beta (/root/reference/figures/, see figures/README.md) —
    warming the KL weight in lets the decoder latch onto the latent
    before the prior term can zero it out. f32 jnp-traceable
    ``fn(epoch) -> beta`` for Trainer(beta_schedule=...): the SAME
    callable evaluates host-side (K=1) and in-graph (chunked), so
    any epochs_per_dispatch is bit-identical to K=1."""
    import jax.numpy as jnp

    b0, b1 = jnp.float32(beta_start), jnp.float32(beta_end)
    w = jnp.float32(warmup_epochs)

    if warmup_epochs <= 0:
        # a zero-length ramp means CONSTANT beta_end from epoch 0 — the
        # max(w, 1) guard below would silently make it a 1-epoch anneal
        return lambda epoch: jnp.full((), b1, jnp.float32)

    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        t = jnp.clip(e / jnp.maximum(w, 1.0), 0.0, 1.0)
        return (b0 + (b1 - b0) * t).astype(jnp.float32)

    return fn


def exponential_schedule(base_lr: float, gamma: float, min_lr: float = 0.0,
                         warmup_epochs: int = 0):
    """Linear warmup then base_lr * gamma^(epoch - warmup), floored at
    min_lr. f32 jnp-traceable (see cosine_schedule)."""
    import jax.numpy as jnp

    base, lo = jnp.float32(base_lr), jnp.float32(min_lr)
    w, g = jnp.float32(warmup_epochs), jnp.float32(gamma)

    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        warm = base * (e + 1.0) / jnp.maximum(w, 1.0)
        dec = jnp.maximum(base * g ** (e - w), lo)
        return jnp.where(e < w, warm, dec).astype(jnp.float32)

    return fn
