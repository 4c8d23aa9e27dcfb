"""epochs_per_dispatch (K epochs per device dispatch) correctness.

The chunked fit path exists because on dispatch-latency-heavy backends
(axon: ~25-30 ms per round trip) per-epoch host syncs dominate small-model
epochs; scanning K epochs in one compiled program took the flagship from
1.4M to 3.9M samples/sec on the chip. These tests pin its semantics:

  * K>1 reproduces the K=1 loss history bit-for-bit for ANY K — the
    plateau-LR and early-stopping controllers run IN-GRAPH inside the
    chunk program with the exact host semantics (f32-aligned), so this
    holds across LR drops and early stops, not just constant-LR runs,
  * in-graph best-params tracking selects the same best epoch,
  * early stopping fires at the SAME epoch as K=1 (epochs after the stop
    are skipped in-graph — round 5: via the masked-skip body, whose
    values are bit-identical to the scalar-cond body it replaced;
    TRAINER_OVERHEAD_AB2.json measured the cond at +5.0 ms/epoch),
  * the tail chunk is compiled at the trimmed length, so training never
    runs past max_epochs (final params bit-match K=1),
  * the in-graph eval tail fold matches the host-side fold when
    n_val % batch != 0.
"""

import numpy as np
import pytest

import jax

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def dm():
    # n_test=96 -> n_val 96 with batch 64 exercises the eval tail fold
    return make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)


def _fit(dm, k, max_epochs=6, patience=None):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model,
        max_epochs=max_epochs,
        early_stopping_patience=patience,
        plateau_patience=1000,  # keep LR constant: chunked parity is exact
        epochs_per_dispatch=k,
        check_finite=False,
    )
    return trainer.fit(dm)


def test_chunked_matches_unchunked_history(dm):
    r1 = _fit(dm, k=1)
    r3 = _fit(dm, k=3)
    h1 = [h["val/loss_total"] for h in r1.history]
    h3 = [h["val/loss_total"] for h in r3.history]
    assert len(h1) == len(h3) == 6
    np.testing.assert_allclose(h1, h3, rtol=0, atol=0)  # bit-identical
    t1 = [h["train/loss_total"] for h in r1.history]
    t3 = [h["train/loss_total"] for h in r3.history]
    np.testing.assert_allclose(t1, t3, rtol=0, atol=0)
    assert r1.best_metric == r3.best_metric
    for a, b in zip(jax.tree.leaves(r1.best_params), jax.tree.leaves(r3.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_tail_chunk_trims(dm):
    """max_epochs not a multiple of K: the tail chunk must be compiled at
    the trimmed length — final params AND best_params bit-match the K=1
    run (round-2 advisor finding: the untrimmed chunk trained 8 epochs
    when max_epochs=6 and leaked 8-epoch params)."""
    r1 = _fit(dm, k=1, max_epochs=6)
    r4 = _fit(dm, k=4, max_epochs=6)
    assert r4.epochs_run == 6
    assert len(r4.history) == 6
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r4.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r1.best_params), jax.tree.leaves(r4.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_matches_unchunked_across_lr_drops(dm):
    """The in-graph ReduceLROnPlateau must drop the LR at the same epoch,
    to the same f32 value, as the K=1 host controller — histories
    (including the recorded per-epoch lr) are bit-identical."""

    def fit(k):
        # tiny lr + patience=0: training barely moves, so the monitor
        # fluctuates with only sampling noise and the first non-improving
        # epoch (deterministic given the fixed PRNG stream) trips the
        # plateau and REDUCES the lr (1e-6 -> 5e-7) — a guaranteed
        # in-run LR change, unlike a converging run that may improve
        # every epoch. (lr=0 no longer works as the trigger: torch-
        # faithful plateau never RAISES an lr to min_lr.)
        model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
        trainer = Trainer(
            model, lr=1e-6, max_epochs=12, early_stopping_patience=None,
            plateau_patience=0, plateau_factor=0.5, plateau_min_lr=1e-8,
            epochs_per_dispatch=k, check_finite=False,
        )
        return trainer.fit(dm)

    r1, r3 = fit(1), fit(3)
    lrs1 = [h["lr"] for h in r1.history]
    lrs3 = [h["lr"] for h in r3.history]
    assert lrs1 == lrs3
    assert len(set(lrs1)) > 1, lrs1  # the run actually exercised an LR change
    np.testing.assert_allclose(
        [h["val/loss_total"] for h in r1.history],
        [h["val/loss_total"] for h in r3.history],
        rtol=0, atol=0,
    )


def test_chunked_early_stop_same_epoch(dm):
    """In-graph early stopping fires at the SAME epoch as the K=1 loop
    (no chunk-granularity lag), and epochs after the stop inside the
    chunk are skipped — params match the K=1 stop-epoch params."""

    def fit(k):
        model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
        trainer = Trainer(
            model, lr=0.0, max_epochs=40, early_stopping_patience=2,
            plateau_patience=1000, epochs_per_dispatch=k, check_finite=False,
        )
        return trainer.fit(dm)

    r1, r5 = fit(1), fit(5)
    assert r1.epochs_run == r5.epochs_run
    assert len(r1.history) == len(r5.history)
    np.testing.assert_allclose(
        [h["val/loss_total"] for h in r1.history],
        [h["val/loss_total"] for h in r5.history],
        rtol=0, atol=0,
    )
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r5.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_early_stopping_fires(dm):
    # lr=0: the monitor never improves after epoch 0, so patience-2
    # early stopping must fire deterministically (at chunk granularity)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, lr=0.0, max_epochs=40, early_stopping_patience=2,
        plateau_patience=1000, epochs_per_dispatch=2, check_finite=False,
    )
    r = trainer.fit(dm)
    assert r.epochs_run < 40
    # stop decision uses per-epoch metrics: monitored history exists
    assert len(r.history) == r.epochs_run


def test_chunked_best_params_is_best_epoch(dm):
    """best_params (tracked in-graph) must evaluate to the best recorded
    monitor value, not the chunk-end value."""
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=6, early_stopping_patience=None,
        plateau_patience=1000, epochs_per_dispatch=3, check_finite=False,
    )
    r = trainer.fit(dm)
    best_hist = min(h["val/loss_total"] for h in r.history)
    assert r.best_metric == best_hist


def test_train_monitor_resident_fit(dm, tmp_path):
    """monitor='train/...' worked in the pre-round-5 K=1 host loop (it
    read the combined metric dict); the chunk program must keep it:
    in-graph controllers/best tracking read the TRAIN metric fold, K>1
    bit-matches K=1, and the best checkpoint label agrees with the host
    scan (the _fit_chunked assertion runs when a checkpoint_dir is set)."""

    def fit(k):
        model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
        trainer = Trainer(
            model, max_epochs=6, monitor="train/loss_total",
            epochs_per_dispatch=k, early_stopping_patience=4,
            plateau_patience=2, check_finite=False,
            checkpoint_dir=str(tmp_path / f"k{k}"),
        )
        return trainer.fit(dm)

    r1, r3 = fit(1), fit(3)
    for r in (r1, r3):
        assert r.best_metric == min(h["train/loss_total"] for h in r.history)
    np.testing.assert_allclose(
        [h["train/loss_total"] for h in r1.history],
        [h["train/loss_total"] for h in r3.history],
        rtol=0, atol=0,
    )
    assert [h["lr"] for h in r1.history] == [h["lr"] for h in r3.history]


def test_monitor_must_name_an_in_graph_fold(dm):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=2, monitor="test/loss_total",
        early_stopping_patience=None,
    )
    with pytest.raises(ValueError, match="val/|train/"):
        trainer.fit(dm)


def test_chunked_skips_nonfinite_steps(dm):
    """SURVEY 5.2 failure containment through the chunk program: a NaN
    row in the training data poisons some steps; the in-graph isfinite
    guard must skip them (skipped_steps > 0) and keep params finite."""
    import jax

    x_bad = dm.x_train.copy()
    x_bad[5] = np.nan
    from hyperbolic_vae_tpu.data.core import ArrayDataModule

    dm_bad = ArrayDataModule(
        x_train=x_bad, y_train=dm.y_train, x_val=dm.x_val, y_val=dm.y_val,
        x_test=dm.x_test, y_test=dm.y_test, batch_size=dm.batch_size,
    )
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=4, early_stopping_patience=None,
        plateau_patience=1000, epochs_per_dispatch=2, check_finite=True,
    )
    r = trainer.fit(dm_bad)
    skipped = [h["train/skipped_steps"] for h in r.history]
    assert max(skipped) > 0  # the poisoned batch was skipped, not applied
    for leaf in jax.tree.leaves(r.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_finite_guard_off_bitmatches_when_finite(dm):
    """Trainer(finite_guard=False) removes the per-step isfinite
    skip-guard (measured 2.5 ms/epoch on the flagship,
    TRAINER_OVERHEAD_AB.json). While training stays finite the guard's
    where-selects pick the updated values, so histories and params must
    be BIT-identical with the guard on or off — at K=1 and K>1."""
    for k in (1, 3):
        runs = {}
        for guard in (True, False):
            model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
            trainer = Trainer(
                model, max_epochs=4, early_stopping_patience=None,
                plateau_patience=1000, epochs_per_dispatch=k,
                finite_guard=guard,
            )
            runs[guard] = trainer.fit(dm)
        for ha, hb in zip(runs[True].history, runs[False].history):
            assert ha["train/loss_total"] == hb["train/loss_total"]
            assert ha["val/loss_total"] == hb["val/loss_total"]
            assert hb["train/skipped_steps"] == 0.0
        for a, b in zip(
            jax.tree.leaves(runs[True].params), jax.tree.leaves(runs[False].params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finite_guard_off_really_removes_the_guard(dm):
    """Negative contract: with finite_guard=False a poisoned batch is NOT
    skipped — the NaN propagates into params (torch/Lightning default
    behavior, the documented trade for the 2.5 ms/epoch)."""
    x_bad = dm.x_train.copy()
    x_bad[5] = np.nan
    from hyperbolic_vae_tpu.data.core import ArrayDataModule

    dm_bad = ArrayDataModule(
        x_train=x_bad, y_train=dm.y_train, x_val=dm.x_val, y_val=dm.y_val,
        x_test=dm.x_test, y_test=dm.y_test, batch_size=dm.batch_size,
    )
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=2, early_stopping_patience=None,
        plateau_patience=1000, check_finite=False, finite_guard=False,
        shuffle="row",  # every sample visited -> the NaN row is hit
    )
    r = trainer.fit(dm_bad)
    finite = all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(r.params)
    )
    assert not finite  # the guard is really gone
