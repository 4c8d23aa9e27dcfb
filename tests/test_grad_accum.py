"""Gradient accumulation (Trainer(grad_accum_steps=A)) correctness.

Grad accumulation exists for configs whose FULL effective batch of
activations does not fit HBM (e.g. wide RNA-seq encoders at large
batch): each optimizer step scans A microbatches of batch_size/A rows,
accumulating grads in the scan carry — activation high-water mark is one
microbatch, optimizer semantics are the full batch's. For deterministic
per-sample-mean losses the accumulated grad equals the full-batch grad
exactly (up to f32 reduction order), which these tests pin; MC losses
draw one sample key per microbatch (agreement in distribution only).
"""

import numpy as np
import pytest

import jax

from hyperbolic_vae_tpu.data.core import ArrayDataModule
from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import Autoencoder, GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def image_dm():
    rng = np.random.default_rng(0)

    def imgs(n):
        return rng.normal(0.0, 0.5, (n, 32, 32, 1)).astype(np.float32)

    return ArrayDataModule(
        x_train=imgs(64), y_train=np.zeros(64, np.int32),
        x_val=imgs(32), y_val=np.zeros(32, np.int32),
        x_test=imgs(32), y_test=np.zeros(32, np.int32),
        batch_size=16,
    )


def _fit_ae(dm, grad_accum, k=1, max_epochs=3):
    model = Autoencoder(data_shape=(32, 32, 1), base_channel_size=4, latent_dim=8)
    trainer = Trainer(
        model, max_epochs=max_epochs, early_stopping_patience=None,
        plateau_patience=1000, grad_accum_steps=grad_accum,
        epochs_per_dispatch=k, check_finite=False,
    )
    return trainer.fit(dm)


def test_grad_accum_matches_full_batch_deterministic(image_dm):
    """The AE loss is a per-sample mean with no MC sampling, so the
    A-microbatch accumulated grad equals the full-batch grad and whole
    training trajectories must agree to f32 reduction-order noise."""
    r1 = _fit_ae(image_dm, grad_accum=1)
    for a in (2, 4):
        ra = _fit_ae(image_dm, grad_accum=a)
        np.testing.assert_allclose(
            [h["train/loss_total"] for h in r1.history],
            [h["train/loss_total"] for h in ra.history],
            rtol=3e-5,
        )
        for p1, pa in zip(jax.tree.leaves(r1.params), jax.tree.leaves(ra.params)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(pa), rtol=2e-4, atol=2e-5
            )


def test_grad_accum_chunked_bitmatch(image_dm):
    """grad accumulation lives inside the shared train-epoch body, so the
    K-epochs-per-dispatch program must reproduce the K=1 loop bit-for-bit
    at the same A."""
    r1 = _fit_ae(image_dm, grad_accum=2, k=1, max_epochs=4)
    r2 = _fit_ae(image_dm, grad_accum=2, k=2, max_epochs=4)
    np.testing.assert_allclose(
        [h["val/loss_total"] for h in r1.history],
        [h["val/loss_total"] for h in r2.history],
        rtol=0, atol=0,
    )
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_vae_trains():
    """MC losses: per-microbatch sample keys mean no bitwise parity with
    A=1, but training must stay finite and improve."""
    dm = make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=5, early_stopping_patience=None,
        plateau_patience=1000, grad_accum_steps=2, check_finite=True,
    )
    r = trainer.fit(dm)
    losses = [h["train/loss_total"] for h in r.history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert max(h["train/skipped_steps"] for h in r.history) == 0.0


def test_grad_accum_composes_with_dp_mesh(image_dm):
    """Under a data mesh the gathered batch is sharded over its leading
    axis; the microbatch reshape must still produce the full-batch
    optimizer step (XLA inserts any resharding). Compare dp+accum vs
    dp-plain on the deterministic AE."""
    from hyperbolic_vae_tpu.parallel import make_mesh

    def fit(accum):
        model = Autoencoder(data_shape=(32, 32, 1), base_channel_size=4, latent_dim=8)
        trainer = Trainer(
            model, max_epochs=3, early_stopping_patience=None,
            plateau_patience=1000, grad_accum_steps=accum,
            mesh=make_mesh(n_data=4), check_finite=False,
        )
        return trainer.fit(image_dm)

    r1, r2 = fit(1), fit(2)
    np.testing.assert_allclose(
        [h["train/loss_total"] for h in r1.history],
        [h["train/loss_total"] for h in r2.history],
        rtol=1e-4,
    )


def test_grad_accum_requires_divisible_batch(image_dm):
    with pytest.raises(ValueError, match="not divisible"):
        _fit_ae(image_dm, grad_accum=3)  # batch 16 % 3 != 0


def test_grad_accum_rejects_train_step_fn():
    with pytest.raises(ValueError, match="train_step_fn"):
        Trainer(
            Autoencoder(data_shape=(32, 32, 1)),
            grad_accum_steps=2,
            train_step_fn=lambda p, o, b, k: (p, o, {}),
        )


def test_grad_accum_rejects_batch_sum_loss_modes():
    """The loss-dict per-sample-mean contract is enforced at runtime
    (round-4 VERDICT #4): HyperbolicImageVAE's reference-parity
    "mse"/"bernoulli" modes return batch SUMS, which the accumulation
    scan would silently rescale by 1/A — composing them must raise."""
    from hyperbolic_vae_tpu.models import HyperbolicImageVAE

    for mode in ("mse", "bernoulli"):
        with pytest.raises(ValueError, match="batch"):
            Trainer(
                HyperbolicImageVAE(data_shape=(32, 32, 1), loss_recon=mode),
                grad_accum_steps=2,
            )
    # the corrected per-sample-mean mode composes fine
    t = Trainer(
        HyperbolicImageVAE(data_shape=(32, 32, 1), loss_recon="bernoulli_elbo"),
        grad_accum_steps=2,
    )
    assert t.grad_accum_steps == 2
