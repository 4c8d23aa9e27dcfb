"""Global-norm gradient clipping (Trainer(grad_clip_norm=c)) — torch
clip_grad_norm_ / Lightning gradient_clip_val semantics: one shared
scale min(1, c/||g||) applied to the Euclidean grads before
riemannian_adam (so manifold params see the same uniform scaling)."""

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def dm():
    return make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)


def _fit(dm, clip, accum=1, k=1, max_epochs=3):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=max_epochs, early_stopping_patience=None,
        plateau_patience=1000, grad_clip_norm=clip, grad_accum_steps=accum,
        epochs_per_dispatch=k, check_finite=False,
    )
    return trainer.fit(dm)


def test_huge_clip_is_identity(dm):
    """A never-binding threshold multiplies grads by exactly 1.0; the
    trajectory matches the unclipped run up to XLA fusion-induced f32
    reassociation (the extra multiply changes how XLA fuses the update
    epilogue, so bitwise equality is not guaranteed — measured ~2e-6
    rel drift by epoch 3 on CPU)."""
    r0 = _fit(dm, clip=None)
    r1 = _fit(dm, clip=1e9)
    np.testing.assert_allclose(
        [h["train/loss_total"] for h in r0.history],
        [h["train/loss_total"] for h in r1.history],
        rtol=1e-5,
    )


def test_tight_clip_changes_and_stays_finite(dm):
    """A binding threshold must actually alter the trajectory and keep
    training healthy (steps applied, nothing skipped)."""
    r0 = _fit(dm, clip=None)
    r1 = _fit(dm, clip=1e-2)
    l0 = [h["train/loss_total"] for h in r0.history]
    l1 = [h["train/loss_total"] for h in r1.history]
    assert l0 != l1
    assert all(np.isfinite(l1))
    assert max(h["train/skipped_steps"] for h in r1.history) == 0.0


def test_clip_composes_with_accum_and_chunks(dm):
    """Clip applies to the ACCUMULATED grad, inside the shared epoch
    body — K>1 must bit-match K=1 at the same (clip, accum)."""
    r1 = _fit(dm, clip=0.5, accum=2, k=1, max_epochs=4)
    r2 = _fit(dm, clip=0.5, accum=2, k=2, max_epochs=4)
    np.testing.assert_allclose(
        [h["val/loss_total"] for h in r1.history],
        [h["val/loss_total"] for h in r2.history],
        rtol=0, atol=0,
    )


def test_clip_rejects_train_step_fn(dm):
    with pytest.raises(ValueError, match="train_step_fn"):
        Trainer(
            GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2),
            grad_clip_norm=1.0,
            train_step_fn=lambda p, o, b, k: (p, o, {}),
        )
