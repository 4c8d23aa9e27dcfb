"""Deterministic LR schedules (optim/schedules.py cosine/exponential,
Trainer(lr_schedule=...)): in-graph chunked path == K=1 host loop."""

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.optim.schedules import cosine_schedule, exponential_schedule
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def dm():
    return make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)


def test_cosine_values():
    f = cosine_schedule(1e-3, total_epochs=10, warmup_epochs=2, min_lr=1e-5)
    lrs = [float(f(e)) for e in range(12)]
    assert lrs[0] == pytest.approx(5e-4, rel=1e-6)  # warmup ramp
    assert lrs[1] == pytest.approx(1e-3, rel=1e-6)  # warmup done
    assert all(a >= b for a, b in zip(lrs[1:], lrs[2:]))  # monotone decay
    assert lrs[10] == lrs[11] == pytest.approx(1e-5, rel=1e-6)  # floor


def test_exponential_values():
    f = exponential_schedule(1e-3, gamma=0.5, min_lr=1e-4)
    lrs = [float(f(e)) for e in range(6)]
    np.testing.assert_allclose(lrs[:4], [1e-3, 5e-4, 2.5e-4, 1.25e-4], rtol=1e-6)
    assert lrs[4] == lrs[5] == pytest.approx(1e-4, rel=1e-6)


def _fit(dm, k, sched, max_epochs=6):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model,
        max_epochs=max_epochs,
        early_stopping_patience=None,
        epochs_per_dispatch=k,
        check_finite=False,
        lr_schedule=sched,
    )
    return trainer.fit(dm)


def test_chunked_matches_unchunked_with_schedule(dm):
    """The schedule evaluates in-graph for K>1 and host-side for K=1; on
    one backend the histories must be bit-identical (the same f32 fn)."""
    sched = cosine_schedule(1e-3, total_epochs=6, warmup_epochs=2, min_lr=1e-5)
    r1 = _fit(dm, k=1, sched=sched)
    r3 = _fit(dm, k=3, sched=sched)
    h1 = [h["val/loss_total"] for h in r1.history]
    h3 = [h["val/loss_total"] for h in r3.history]
    assert len(h1) == len(h3) == 6
    np.testing.assert_allclose(h1, h3, rtol=0, atol=0)
    np.testing.assert_allclose(
        [h["lr"] for h in r1.history], [h["lr"] for h in r3.history], rtol=0, atol=0
    )


def test_history_lr_follows_schedule(dm):
    sched = exponential_schedule(1e-3, gamma=0.5)
    r = _fit(dm, k=1, sched=sched, max_epochs=4)
    want = [float(sched(e)) for e in range(4)]
    np.testing.assert_allclose([h["lr"] for h in r.history], want, rtol=0, atol=0)


def test_schedule_bypasses_plateau(dm):
    """With a schedule set, a plateauing monitor must NOT trigger plateau
    LR drops — the recorded lr stays on the schedule."""
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    sched = cosine_schedule(1e-3, total_epochs=5)
    trainer = Trainer(
        model,
        max_epochs=5,
        early_stopping_patience=None,
        plateau_patience=0,  # would drop LR every epoch if consulted
        epochs_per_dispatch=1,
        check_finite=False,
        lr_schedule=sched,
    )
    r = trainer.fit(dm)
    want = [float(sched(e)) for e in range(5)]
    np.testing.assert_allclose([h["lr"] for h in r.history], want, rtol=0, atol=0)


def test_lane_lr_sweep_conflict_raises(dm):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model,
        max_epochs=2,
        hp_model_fn=lambda hp: model,
        lr_schedule=cosine_schedule(1e-3, 2),
    )
    with pytest.raises(ValueError, match="lane"):
        trainer.fit_lane_sweep(dm, [{"lr": 1e-3}, {"lr": 1e-4}])
