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


# ---- ensemble / lane-sweep preemption (round 5, VERDICT r4 #1): the
# multi-seed path is where the hours-long grid jobs live — a killed
# sweep must resume from its last chunk bit-identically.


def test_ensemble_wall_budget_stops_and_resumes(dm, tmp_path):
    """max_wall_seconds=0 stops the sweep after each chunk with the
    stacked resume state saved; restarted fit_ensemble(resume=True)
    reconstructs the uninterrupted per-seed histories and params
    BIT-exactly."""
    seeds = [0, 1]
    ref = _trainer(dm, max_epochs=6).fit_ensemble(dm, seeds, epochs_per_dispatch=2)

    ckpt = str(tmp_path / "ck")
    r = _trainer(dm, ckpt, max_epochs=6, max_wall_seconds=0).fit_ensemble(
        dm, seeds, epochs_per_dispatch=2
    )
    assert all(x.interrupted and "wall-clock" in x.stop_reason for x in r)
    assert [x.epochs_run for x in r] == [2, 2]  # one whole chunk ran

    hist = [list(x.history) for x in r]
    for _ in range(10):  # bounded; finishes in 2 more restarts
        r = _trainer(dm, ckpt, max_epochs=6, max_wall_seconds=0).fit_ensemble(
            dm, seeds, epochs_per_dispatch=2, resume=True
        )
        for s in range(len(seeds)):
            hist[s] += r[s].history
        if not r[0].interrupted:
            break
    assert not r[0].interrupted and r[0].stop_reason is None
    import jax

    for s in range(len(seeds)):
        assert [h["epoch"] for h in hist[s]] == [h["epoch"] for h in ref[s].history]
        np.testing.assert_allclose(
            [h["val/loss_total"] for h in hist[s]],
            [h["val/loss_total"] for h in ref[s].history],
            rtol=0, atol=0,  # bit-identical continuation
        )
        assert r[s].best_metric == ref[s].best_metric
        for a, b in zip(jax.tree.leaves(ref[s].params), jax.tree.leaves(r[s].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(ref[s].best_params), jax.tree.leaves(r[s].best_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lane_sweep_resume_bitmatch(dm, tmp_path):
    """Hyperparameter-lane sweeps (the _7/_9 grid workloads) resume
    through the same stacked-state unit; hp lanes are rebuilt from the
    caller's lane dicts."""
    from hyperbolic_vae_tpu.models import GyroplaneVAE

    def hp_fn(hp):
        return GyroplaneVAE(
            data_shape=dm.input_shape, latent_dim=2,
            manifold_curvature=hp["manifold_curvature"],
        )

    lanes = [{"manifold_curvature": 0.5}, {"manifold_curvature": 1.4}]

    def sweep_trainer(ckpt=None, **kw):
        return Trainer(
            hp_fn(lanes[0]), hp_model_fn=hp_fn, max_epochs=4,
            early_stopping_patience=None, plateau_patience=1000,
            check_finite=False, checkpoint_dir=ckpt, **kw,
        )

    ref = sweep_trainer().fit_lane_sweep(dm, lanes, epochs_per_dispatch=2)
    ckpt = str(tmp_path / "ck")
    r = sweep_trainer(ckpt, max_wall_seconds=0).fit_lane_sweep(
        dm, lanes, epochs_per_dispatch=2
    )
    assert all(x.interrupted for x in r) and [x.epochs_run for x in r] == [2, 2]
    hist = [list(x.history) for x in r]
    r = sweep_trainer(ckpt).fit_lane_sweep(
        dm, lanes, epochs_per_dispatch=2, resume=True
    )
    assert not r[0].interrupted
    for s in range(len(lanes)):
        hist[s] += r[s].history
        assert [h["epoch"] for h in hist[s]] == [0, 1, 2, 3]
        np.testing.assert_allclose(
            [h["val/loss_total"] for h in hist[s]],
            [h["val/loss_total"] for h in ref[s].history],
            rtol=0, atol=0,
        )


def test_lane_sweep_resume_grid_mismatch_raises(dm, tmp_path):
    """A CHANGED hyperparameter grid must not silently resume the old
    grid's stacked state: fit_lane_sweep defaults every lane's seed to
    trainer.seed, so the seeds-only resume check is vacuous for grids —
    the lane hparams themselves are fingerprinted in the resume
    metadata (round-5 review finding)."""
    from hyperbolic_vae_tpu.models import GyroplaneVAE

    def hp_fn(hp):
        return GyroplaneVAE(
            data_shape=dm.input_shape, latent_dim=2,
            manifold_curvature=hp["manifold_curvature"],
        )

    def sweep_trainer(**kw):
        return Trainer(
            hp_fn({"manifold_curvature": 1.0}), hp_model_fn=hp_fn,
            max_epochs=4, early_stopping_patience=None,
            plateau_patience=1000, check_finite=False,
            checkpoint_dir=str(tmp_path / "ck"), **kw,
        )

    grid_a = [{"manifold_curvature": 0.5}, {"manifold_curvature": 1.4}]
    grid_b = [{"manifold_curvature": 2.0}, {"manifold_curvature": 3.0}]
    sweep_trainer(max_wall_seconds=0).fit_lane_sweep(
        dm, grid_a, epochs_per_dispatch=2
    )
    with pytest.raises(ValueError, match="lane hparams"):
        sweep_trainer().fit_lane_sweep(
            dm, grid_b, epochs_per_dispatch=2, resume=True
        )
    # per-lane lr is part of the fingerprint too
    with pytest.raises(ValueError, match="lane hparams"):
        sweep_trainer().fit_lane_sweep(
            dm, [dict(l, lr=9e-4) for l in grid_a],
            epochs_per_dispatch=2, resume=True,
        )
    # the unchanged grid still resumes
    r = sweep_trainer().fit_lane_sweep(
        dm, grid_a, epochs_per_dispatch=2, resume=True
    )
    assert [x.epochs_run for x in r] == [4, 4]


def test_ensemble_resume_seed_mismatch_raises(dm, tmp_path):
    ckpt = str(tmp_path / "ck")
    _trainer(dm, ckpt, max_epochs=4, max_wall_seconds=0).fit_ensemble(
        dm, [0, 1], epochs_per_dispatch=2
    )
    with pytest.raises(ValueError, match="saved seeds"):
        _trainer(dm, ckpt, max_epochs=4).fit_ensemble(
            dm, [2, 3], epochs_per_dispatch=2, resume=True
        )


def test_ensemble_preempt_signal(dm, tmp_path):
    """A preemption signal arriving during the sweep stops it at the next
    chunk boundary with resume state saved."""
    ckpt = str(tmp_path / "ck")
    trainer = _trainer(
        dm, ckpt, max_epochs=50, preempt_signals=(signal.SIGUSR1,),
    )
    # deliver the signal while the sweep runs (the handler is installed
    # only inside fit_ensemble — a timer thread raises it mid-run; with
    # 1-epoch chunks the loop checks the flag after every epoch)
    import threading

    threading.Timer(0.5, os.kill, (os.getpid(), signal.SIGUSR1)).start()
    r = trainer.fit_ensemble(dm, [0, 1], epochs_per_dispatch=1)
    assert all(x.interrupted and "SIGUSR1" in x.stop_reason for x in r)
    assert all(x.epochs_run < 50 for x in r)


def test_state_every_n_epochs_cadence(dm, tmp_path):
    """state_every_n_epochs throttles full-resume-state saves on the
    single-engine (chunked) fit path: saves land only when a chunk
    crosses the cadence, plus unconditionally at stops and completion
    (round-5 session-3 review: the engine collapse had made the cadence
    a silent no-op, writing params+opt_state every epoch)."""
    saved = []
    t = _trainer(dm, str(tmp_path / "c1"), state_every_n_epochs=3)
    orig = t._save_resume_state
    t._save_resume_state = lambda *a: (saved.append(a[3]), orig(*a))[1]
    t.fit(dm)
    # max_epochs=5, K=1: cadence crossing after epoch 2 (3 epochs run),
    # completion save after epoch 4 — NOT one save per epoch
    assert saved == [2, 4]

    saved_k = []
    t2 = _trainer(dm, str(tmp_path / "c2"), state_every_n_epochs=3,
                  epochs_per_dispatch=2)
    orig2 = t2._save_resume_state
    t2._save_resume_state = lambda *a: (saved_k.append(a[3]), orig2(*a))[1]
    t2.fit(dm)
    # chunks end after epochs 1/3/4 (0-based): the 2nd chunk (epochs 2-3)
    # crosses the cadence; completion still saves
    assert saved_k == [3, 4]
