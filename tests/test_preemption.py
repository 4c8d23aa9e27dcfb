"""Preemption-safe training (train/preemption.py + Trainer graceful
stops): SIGTERM-style signals and wall-clock budgets must end fit()
cleanly at an epoch/chunk boundary with full resume state saved, and
fit(resume=True) must continue the run as if never interrupted."""

import os
import signal

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer
from hyperbolic_vae_tpu.train.preemption import GracefulShutdown


@pytest.fixture(scope="module")
def dm():
    return make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)


def _trainer(dm, ckpt=None, **kw):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    kw.setdefault("max_epochs", 5)
    return Trainer(
        model, early_stopping_patience=None, plateau_patience=1000,
        check_finite=False, checkpoint_dir=ckpt, **kw,
    )


def test_graceful_shutdown_flag_and_restore():
    """The handler sets a flag instead of killing the process, and the
    previous handler is restored on exit."""
    prev = signal.getsignal(signal.SIGUSR1)
    with GracefulShutdown((signal.SIGUSR1,)) as g:
        assert not g.triggered
        os.kill(os.getpid(), signal.SIGUSR1)  # delivered synchronously in-thread
        assert g.triggered
        assert g.signum == signal.SIGUSR1
    assert signal.getsignal(signal.SIGUSR1) is prev


def test_wall_budget_stops_and_resumes(dm, tmp_path):
    """max_wall_seconds=0 stops after the first epoch with resume state
    saved; restarted fits (simulating a slot reclaimed every epoch)
    reconstruct the uninterrupted history."""
    ref = _trainer(dm).fit(dm).history

    ckpt = str(tmp_path / "ckpt")
    r = _trainer(dm, ckpt, max_wall_seconds=0).fit(dm)
    assert r.interrupted and "wall-clock" in r.stop_reason
    assert r.epochs_run == 1 and len(r.history) == 1

    history = list(r.history)
    for _ in range(10):  # bounded; finishes in 4 restarts
        r = _trainer(dm, ckpt, max_wall_seconds=0).fit(dm, resume=True)
        history += r.history
        if not r.interrupted:
            break
    assert not r.interrupted and r.stop_reason is None
    assert [h["epoch"] for h in history] == [h["epoch"] for h in ref]
    np.testing.assert_allclose(
        [h["val/loss_total"] for h in history],
        [h["val/loss_total"] for h in ref],
        rtol=1e-6,
    )


def test_wall_budget_chunked(dm, tmp_path):
    """Chunked fits stop at chunk granularity (a dispatch is never
    abandoned) and resume through the chunked path."""
    ref = _trainer(dm, max_epochs=6).fit(dm).history

    ckpt = str(tmp_path / "ckpt")
    r = _trainer(
        dm, ckpt, max_epochs=6, epochs_per_dispatch=2, max_wall_seconds=0
    ).fit(dm)
    assert r.interrupted and r.epochs_run == 2  # one whole chunk ran

    r2 = _trainer(dm, ckpt, max_epochs=6, epochs_per_dispatch=2).fit(dm, resume=True)
    assert not r2.interrupted
    history = r.history + r2.history
    assert [h["epoch"] for h in history] == [0, 1, 2, 3, 4, 5]
    np.testing.assert_allclose(
        [h["val/loss_total"] for h in history],
        [h["val/loss_total"] for h in ref],
        rtol=1e-6,
    )


def test_preempt_signal_midfit(dm):
    """A preemption signal arriving during training stops fit() at the
    next epoch boundary; the handler is active only inside fit()."""

    class KillAt:
        def __init__(self, epoch):
            self.epoch = epoch

        def on_epoch_end(self, trainer, epoch, params, metrics):
            if epoch == self.epoch:
                os.kill(os.getpid(), signal.SIGUSR1)

    prev = signal.getsignal(signal.SIGUSR1)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=10, early_stopping_patience=None,
        plateau_patience=1000, check_finite=False,
        preempt_signals=(signal.SIGUSR1,), callbacks=[KillAt(1)],
    )
    r = trainer.fit(dm)
    assert r.interrupted and "SIGUSR1" in r.stop_reason
    assert r.epochs_run == 2  # stopped right after the signal's epoch
    assert signal.getsignal(signal.SIGUSR1) is prev  # handler uninstalled


def test_uninterrupted_result_flags(dm):
    r = _trainer(dm, max_epochs=2).fit(dm)
    assert not r.interrupted and r.stop_reason is None
