"""fit_ensemble (vmapped multi-seed training) correctness.

The ensemble path trains S independent seeds in ONE compiled program
(train/ensemble.py). Its contract: every per-seed result is EXACTLY what
a sequential ``fit(seed=s)`` produces — same per-epoch metric history,
same LR schedule, same early-stop epoch, same best metric — because each
lane carries its own RNG stream (fit()'s exact key path) and its own
in-graph controller state.
"""

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer

SEEDS = [42, 7, 3]


@pytest.fixture(scope="module")
def dm():
    # n_test=96 with batch 64 exercises the eval tail fold in-lane too
    return make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)


def _histories(result):
    return (
        [h["val/loss_total"] for h in result.history],
        [h["train/loss_total"] for h in result.history],
        [h["lr"] for h in result.history],
    )


def test_ensemble_matches_sequential(dm):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=7, early_stopping_patience=4, plateau_patience=2,
        epochs_per_dispatch=3, check_finite=False,
    )
    seq = []
    for s in SEEDS:
        trainer.seed = s
        seq.append(trainer.fit(dm))
    ens = trainer.fit_ensemble(dm, SEEDS)
    assert len(ens) == len(SEEDS)
    for a, b in zip(seq, ens):
        va, ta, la = _histories(a)
        vb, tb, lb = _histories(b)
        assert len(va) == len(vb)
        np.testing.assert_allclose(va, vb, rtol=0, atol=0)  # bit-identical
        np.testing.assert_allclose(ta, tb, rtol=0, atol=0)
        assert la == lb  # per-seed in-graph LR schedule
        assert a.best_metric == b.best_metric
        # final + best params match the sequential run
        import jax

        for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=0, atol=0)
        for pa, pb in zip(jax.tree.leaves(a.best_params), jax.tree.leaves(b.best_params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=0, atol=0)


@pytest.mark.slow
def test_ensemble_per_seed_early_stop(dm):
    """lr=0: the monitor fluctuates only via the eval sampling RNG, so
    patience-2 early stopping fires deterministically — at a DIFFERENT
    epoch per seed (per-lane RNG streams). Each lane must stop exactly
    where its sequential counterpart does."""
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, lr=0.0, max_epochs=30, early_stopping_patience=2,
        plateau_patience=1000, epochs_per_dispatch=4, check_finite=False,
    )
    seq_epochs = []
    for s in SEEDS:
        trainer.seed = s
        seq_epochs.append(trainer.fit(dm).epochs_run)
    ens = trainer.fit_ensemble(dm, SEEDS)
    ens_epochs = [r.epochs_run for r in ens]
    assert ens_epochs == seq_epochs
    assert any(e < 30 for e in ens_epochs)  # stopping actually fired


def test_seed_mesh_ensemble_matches_unsharded(dm):
    """Sharding the seed axis over devices must not change ANY number:
    lanes are embarrassingly parallel, so the partitioned program leaves
    every within-lane reduction order intact — bit-identical histories
    and params vs the single-device ensemble."""
    import jax

    from hyperbolic_vae_tpu.parallel import make_seed_mesh

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    seeds = [42, 7, 3, 11]
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=6, early_stopping_patience=4, plateau_patience=2,
        epochs_per_dispatch=3, check_finite=False,
    )
    plain = trainer.fit_ensemble(dm, seeds)
    mesh = make_seed_mesh(4)
    sharded = trainer.fit_ensemble(dm, seeds, seed_mesh=mesh)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(*map(np.asarray, (_histories(a), _histories(b))),
                                   rtol=0, atol=0)
        assert a.epochs_run == b.epochs_run
        assert a.best_metric == b.best_metric
        for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=0, atol=0)


def test_seed_mesh_ensemble_two_lanes_per_device(dm):
    """S > n_devices: each device carries S/N lanes."""
    import jax

    from hyperbolic_vae_tpu.parallel import make_seed_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    seeds = [0, 1, 2, 3]
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=4, early_stopping_patience=None, plateau_patience=50,
        epochs_per_dispatch=2, check_finite=False,
    )
    plain = trainer.fit_ensemble(dm, seeds)
    sharded = trainer.fit_ensemble(dm, seeds, seed_mesh=make_seed_mesh(2))
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(*map(np.asarray, (_histories(a), _histories(b))),
                                   rtol=0, atol=0)


def test_single_dispatch_sweep_reports_throughput(dm):
    """max_epochs <= K: the whole sweep runs inside the compile dispatch;
    samples_per_sec must come from a timed replay, not report 0.0
    (round-3 review finding)."""
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=3, early_stopping_patience=None, plateau_patience=50,
        epochs_per_dispatch=8, check_finite=False,
    )
    results = trainer.fit_ensemble(dm, [0, 1])
    assert all(r.epochs_run == 3 for r in results)
    assert results[0].samples_per_sec > 0


def test_ensemble_writes_per_seed_metrics(dm, tmp_path):
    """--seeds mode must not leave the run_dir without metric files."""
    import json

    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=2, early_stopping_patience=None, plateau_patience=50,
        epochs_per_dispatch=2, check_finite=False, log_dir=str(tmp_path),
    )
    results = trainer.fit_ensemble(dm, [5, 6])
    for seed, r in zip([5, 6], results):
        f = tmp_path / f"seed_{seed}" / "metrics.jsonl"
        assert f.exists()
        rows = [json.loads(line) for line in f.read_text().splitlines()]
        assert len(rows) == r.epochs_run
        hist_vals = [h["val/loss_total"] for h in r.history]
        assert [row["val/loss_total"] for row in rows] == hist_vals


def test_seed_mesh_rejects_uneven_shard(dm):
    import jax

    from hyperbolic_vae_tpu.parallel import make_seed_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=2, check_finite=False)
    with pytest.raises(ValueError, match="shard evenly"):
        trainer.fit_ensemble(dm, [0, 1, 2], seed_mesh=make_seed_mesh(2))


def _gyroplane_hp_fn(hp):
    return GyroplaneVAE(
        data_shape=(28, 28, 1), latent_dim=2,
        manifold_curvature=hp["manifold_curvature"], beta=hp["beta"],
    )


def test_lane_sweep_matches_sequential(dm):
    """Hyperparameter lanes (curvature x beta x lr grid cells) trained as
    ONE vmapped program must match per-cell sequential fits. Tolerance is
    loose-tight (2e-4): traced-vs-constant curvature changes XLA constant
    folding, so bitwise equality is not expected — but the trajectories
    must agree to f32 drift, not modeling error."""
    import jax

    lanes = [
        {"seed": 42, "manifold_curvature": 0.5, "beta": 1.0, "lr": 1e-3},
        {"seed": 7, "manifold_curvature": 0.5, "beta": 3.0, "lr": 1e-3},
        {"seed": 42, "manifold_curvature": 1.4, "beta": 1.0, "lr": 3e-3},
    ]
    rep = _gyroplane_hp_fn({"manifold_curvature": 1.0, "beta": 1.0})
    sweep_tr = Trainer(
        rep, hp_model_fn=_gyroplane_hp_fn, max_epochs=4, epochs_per_dispatch=2,
        early_stopping_patience=None, plateau_patience=50, check_finite=False,
    )
    sweep = sweep_tr.fit_lane_sweep(dm, lanes)
    assert sweep[0].samples_per_sec > 0
    for lane, r in zip(lanes, sweep):
        m = _gyroplane_hp_fn(lane)
        t = Trainer(
            m, lr=lane["lr"], max_epochs=4, epochs_per_dispatch=2,
            seed=lane["seed"], early_stopping_patience=None,
            plateau_patience=50, check_finite=False,
        )
        seq = t.fit(dm)
        np.testing.assert_allclose(
            [h["val/loss_total"] for h in r.history],
            [h["val/loss_total"] for h in seq.history],
            rtol=2e-4,
        )
        assert [h["lr"] for h in r.history] == [h["lr"] for h in seq.history]
        np.testing.assert_allclose(r.best_metric, seq.best_metric, rtol=2e-4)
        # NOTE: final params are deliberately not compared element-wise —
        # traced-vs-constant curvature gives ~1e-6 per-step drift that
        # optimization amplifies chaotically (observed 0.3% on isolated
        # near-zero weights after 4 epochs at lr 3e-3). The per-epoch
        # loss/LR histories above are the semantic contract.


def test_lane_sweep_composes_with_seed_mesh(dm):
    import jax

    from hyperbolic_vae_tpu.parallel import make_seed_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    lanes = [
        {"manifold_curvature": c, "beta": b}
        for c in (0.5, 1.4) for b in (1.0, 3.0)
    ]
    rep = _gyroplane_hp_fn(lanes[0])
    tr = Trainer(
        rep, hp_model_fn=_gyroplane_hp_fn, max_epochs=4, epochs_per_dispatch=2,
        early_stopping_patience=None, plateau_patience=50, check_finite=False,
    )
    plain = tr.fit_lane_sweep(dm, lanes)
    sharded = tr.fit_lane_sweep(dm, lanes, seed_mesh=make_seed_mesh(2))
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(
            *map(np.asarray, (_histories(a), _histories(b))), rtol=0, atol=0
        )


def test_lane_sweep_riemannian_posterior(dm):
    """Traced curvature must flow through the RiemannianNormal stack too
    (quadrature radius normalizer + inverse-CDF sampler) — the _9
    replication grid's riemannian cells as lanes."""
    from hyperbolic_vae_tpu.models import PvaeMLPVAE
    from hyperbolic_vae_tpu.train.ensemble import evaluate_lanes

    def model_fn(hp):
        return PvaeMLPVAE(
            data_shape=(28, 28, 1), hidden_dim=64, posterior="riemannian",
            latent_dim=2, manifold_curvature=hp["manifold_curvature"],
        )

    lanes = [{"manifold_curvature": 0.5}, {"manifold_curvature": 1.4}]
    tr = Trainer(
        model_fn(lanes[0]), hp_model_fn=model_fn, max_epochs=2,
        epochs_per_dispatch=2, early_stopping_patience=None,
        plateau_patience=50, check_finite=False,
    )
    sweep = tr.fit_lane_sweep(dm, lanes)
    for r in sweep:
        vals = [h["val/loss_total"] for h in r.history]
        assert all(np.isfinite(vals)), vals
    # one vmapped eval program for all lanes == per-lane concrete evals
    tests = evaluate_lanes(tr, dm, sweep, lanes, "test")
    for lane, r, test in zip(lanes, sweep, tests):
        ev = Trainer(model_fn(lane), max_epochs=1, check_finite=False, seed=tr.seed)
        direct = ev.evaluate(dm, r.best_params, "test")
        np.testing.assert_allclose(
            test["test/loss_total"], direct["test/loss_total"], rtol=1e-4
        )


def test_hp_trainer_guards(dm):
    rep = _gyroplane_hp_fn({"manifold_curvature": 1.0, "beta": 1.0})
    tr = Trainer(rep, hp_model_fn=_gyroplane_hp_fn, max_epochs=2, check_finite=False)
    with pytest.raises(ValueError, match="fit_lane_sweep"):
        tr.fit(dm)
    with pytest.raises(ValueError, match="lane_hparams"):
        tr.fit_ensemble(dm, [0, 1])
    with pytest.raises(ValueError, match="same hparam keys"):
        tr.fit_lane_sweep(dm, [{"manifold_curvature": 1.0, "beta": 1.0},
                               {"manifold_curvature": 1.0}])
    plain = Trainer(rep, max_epochs=2, check_finite=False)
    with pytest.raises(ValueError, match="hp_model_fn"):
        plain.fit_lane_sweep(dm, [{"manifold_curvature": 1.0}])


def test_ensemble_rejects_unsupported_modes(dm):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    # checkpointing is SUPPORTED since round 5 (stacked resume state at
    # chunk boundaries) — callbacks and the data/model mesh still raise
    t = Trainer(model, max_epochs=2, callbacks=[object()])
    with pytest.raises(ValueError, match="callbacks"):
        t.fit_ensemble(dm, [0, 1])
    t = Trainer(model, max_epochs=2, use_mesh=True)
    with pytest.raises(ValueError, match="mesh"):
        t.fit_ensemble(dm, [0, 1])


def test_ensemble_hbm_preflight_raises(dm):
    """fit_ensemble stages S stacked lanes of params+moments+best — the
    highest-memory fit path — so it must run the HBM preflight too and
    fail fast with the actionable message (round-5 review finding; the
    original preflight only covered _fit_impl)."""
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    t = Trainer(
        model, max_epochs=2, check_finite=False,
        hbm_limit_bytes=2 * 2**20,  # the 320x1024-f32 split alone exceeds it
    )
    with pytest.raises(RuntimeError, match="fit_streamed"):
        t.fit_ensemble(dm, [0, 1])
    t = Trainer(
        model, max_epochs=2, check_finite=False,
        hbm_limit_bytes=16 * 2**30,
    )
    r = t.fit_ensemble(dm, [0, 1])
    assert len(r) == 2


def test_masked_skip_body_bitmatches_cond_body(dm):
    """The vmapped ensemble uses build_chunk_body(masked_skip=True)
    (unconditional epoch + where-masking) instead of the single-seed
    chunk's lax.cond epoch skip, because a batched-predicate cond cannot
    lower to a real branch and measured ~5x the bodies it guards on chip
    (benchmarks/ENSEMBLE_LAYOUT_AB.json). Contract: EVERY output —
    params, opt state, best params, controller state, carry keys, and
    the full (K,) metric/lr rows INCLUDING the NaN rows past a lane's
    stop (which fit_ensemble's host loop never reads) — is bit-identical
    to the cond body, with lanes pre-stopped and stopping mid-chunk."""
    import jax
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.train.chunk_program import build_chunk_body
    from hyperbolic_vae_tpu.train.ensemble import _stack

    K = 4
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model, max_epochs=K, early_stopping_patience=2, plateau_patience=1,
        epochs_per_dispatch=K, check_finite=False,
    )
    n_train, n_val = int(dm.x_train.shape[0]), int(dm.x_val.shape[0])
    trainer._epoch_fns(n_train, dm.batch_size, n_val)
    train_body, eval_full = trainer._body_fns_cache[(n_train, dm.batch_size, n_val)]
    bodies = {
        skip: build_chunk_body(trainer, train_body, eval_full, K, masked_skip=skip)
        for skip in (False, True)
    }

    params_l, opt_l, ctrl_l, key_l = [], [], [], []
    for s in SEEDS:
        key = jax.random.PRNGKey(s)
        key, init_key = jax.random.split(key)
        p = trainer.init_params(dm.x_train, init_key)
        params_l.append(p)
        opt_l.append(trainer._optimizer.init(p))
        key_l.append(key)
        ctrl_l.append(trainer._init_ctrl())
    ctrl = _stack(ctrl_l)
    # lane 0: already stopped; lane 1: es_best=-inf with wait at the
    # brink, so it stops after its FIRST epoch of this chunk (mid-chunk
    # stop); lane 2 runs all K epochs
    ctrl["stopped"] = jnp.asarray([True, False, False])
    ctrl["es_best"] = ctrl["es_best"].at[1].set(-jnp.inf)
    ctrl["es_wait"] = ctrl["es_wait"].at[1].set(1)
    args = (
        _stack(params_l), _stack(opt_l),
        jax.tree.map(jnp.copy, _stack(params_l)), ctrl,
        trainer._stage(dm.x_train), trainer._stage(dm.x_val),
        jnp.stack(key_l), None,
    )
    outs = {
        skip: jax.device_get(
            jax.jit(jax.vmap(body, in_axes=(0, 0, 0, 0, None, None, 0, None)))(*args)
        )
        for skip, body in bodies.items()
    }
    ctrl_cond = outs[False][3]
    assert list(np.asarray(ctrl_cond["stopped"])) == [True, True, False]
    assert list(np.asarray(ctrl_cond["epoch"])) == [0, 1, K]
    # skipped-lane metric rows really are the NaN fill both ways
    assert np.isnan(np.asarray(outs[False][5]["loss_total"][0])).all()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs[False], outs[True],
    )


def test_ensemble_ema_matches_sequential(dm):
    """Trainer(ema_decay=...) through fit_ensemble: each lane's EMA is
    returned and equals the sequential fit's (review finding: it used to
    be silently dropped)."""
    import jax

    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(model, max_epochs=3, early_stopping_patience=None,
                      epochs_per_dispatch=3, check_finite=False,
                      ema_decay=0.9)
    seq = []
    for s in SEEDS[:2]:
        trainer.seed = s
        seq.append(trainer.fit(dm))
    ens = trainer.fit_ensemble(dm, SEEDS[:2])
    for a, b in zip(seq, ens):
        assert b.ema_params is not None
        for la, lb in zip(jax.tree.leaves(a.ema_params),
                          jax.tree.leaves(b.ema_params)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
