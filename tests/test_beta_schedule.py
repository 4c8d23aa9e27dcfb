"""KL annealing (Trainer(beta_schedule=...)) correctness.

The reference trains every family at constant beta and its
RelaxedBernoulli conv-hyperbolic / gyroplane / Jerby-Arnon headline
figures are posterior-collapsed (figures/README.md). beta warmup is the
standard cure; these tests pin the framework's implementation:

  * the schedule itself (linear ramp, clamp at beta_end),
  * beta=0 at epoch 0 => loss_total == loss_recon exactly (the KL term
    contributes nothing before the ramp starts),
  * the in-graph chunked evaluation (epochs_per_dispatch>1) reproduces
    the K=1 host loop bit-for-bit — the same f32 schedule callable runs
    both places,
  * the sugar's guards (needs a beta attribute; mutually exclusive with
    the generic hp_model_fn+hp_schedule form; no streamed fits).
"""

import numpy as np
import pytest

import jax

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.optim import beta_warmup_schedule
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def dm():
    # n_test=96 with batch 64 exercises the eval tail fold under hp
    return make_data_module(batch_size=64, synthetic=True, n_train=320, n_test=96)


def test_beta_warmup_values():
    fn = beta_warmup_schedule(1.0, warmup_epochs=4)
    vals = [float(fn(e)) for e in range(7)]
    np.testing.assert_allclose(vals, [0.0, 0.25, 0.5, 0.75, 1.0, 1.0, 1.0])
    fn2 = beta_warmup_schedule(2.0, warmup_epochs=2, beta_start=1.0)
    np.testing.assert_allclose([float(fn2(e)) for e in range(4)], [1.0, 1.5, 2.0, 2.0])


def _fit(dm, k, warmup=4, max_epochs=6):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    trainer = Trainer(
        model,
        max_epochs=max_epochs,
        early_stopping_patience=None,
        plateau_patience=1000,
        epochs_per_dispatch=k,
        check_finite=False,
        beta_schedule=beta_warmup_schedule(1.0, warmup_epochs=warmup),
    )
    return trainer.fit(dm)


def test_beta_zero_epoch_total_equals_recon(dm):
    r = _fit(dm, k=1)
    h0 = r.history[0]
    # epoch 0: beta = 0 -> the KL term contributes nothing. Not bitwise:
    # XLA fuses mean(recon + 0*kl) and mean(recon) into different
    # reduction plans (observed 2-ulp val difference), so ulp-scale rtol.
    np.testing.assert_allclose(
        h0["train/loss_total"], h0["train/recon_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        h0["val/loss_total"], h0["val/recon_loss"], rtol=1e-6
    )
    # after the ramp the KL weight is live again
    h_end = r.history[-1]
    assert h_end["train/loss_total"] > h_end["train/recon_loss"]
    assert all(np.isfinite(h["val/loss_total"]) for h in r.history)


def test_chunked_beta_matches_unchunked(dm):
    """epochs_per_dispatch>1 evaluates the schedule IN-GRAPH from the
    absolute epoch counter; histories must be bit-identical to K=1
    (including a chunk boundary mid-ramp: warmup 4, K=4, 6 epochs)."""
    r1 = _fit(dm, k=1)
    r4 = _fit(dm, k=4)
    for key in ("train/loss_total", "val/loss_total", "train/kl_loss"):
        h1 = [h[key] for h in r1.history]
        h4 = [h[key] for h in r4.history]
        np.testing.assert_allclose(h1, h4, rtol=0, atol=0)  # bit-identical
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r4.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ensemble_composes_with_beta_schedule(dm):
    """Seed-vmapped ensembles merge the schedule in-graph per lane; each
    lane must bit-match a sequential fit of the same seed."""
    def make_trainer():
        model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
        return Trainer(
            model, max_epochs=4, early_stopping_patience=None,
            plateau_patience=1000, check_finite=False,
            beta_schedule=beta_warmup_schedule(1.0, warmup_epochs=3),
        )

    t = make_trainer()
    r_ens = t.fit_ensemble(dm, seeds=[0, 1], epochs_per_dispatch=2)
    for seed, r in zip([0, 1], r_ens):
        t_seq = make_trainer()
        t_seq.seed = seed
        r_seq = t_seq.fit(dm)
        h_e = [h["val/loss_total"] for h in r.history]
        h_s = [h["val/loss_total"] for h in r_seq.history]
        np.testing.assert_allclose(h_e, h_s, rtol=0, atol=0)  # bit-identical


def test_resume_mid_ramp_matches_uninterrupted(dm, tmp_path):
    """A fit interrupted INSIDE the warmup and resumed must reproduce the
    uninterrupted history: the schedule is indexed by ABSOLUTE epoch, so
    resume at epoch 3 of a 4-epoch ramp continues at beta(3), not
    beta(0)."""
    sched = beta_warmup_schedule(1.0, warmup_epochs=4)

    def make_trainer(ckpt):
        model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
        return Trainer(
            model, max_epochs=6, early_stopping_patience=None,
            plateau_patience=1000, check_finite=False,
            beta_schedule=sched, checkpoint_dir=ckpt,
        )

    r_full = make_trainer(str(tmp_path / "full")).fit(dm)

    t1 = make_trainer(str(tmp_path / "resumed"))
    t1.max_epochs = 3  # stop mid-ramp
    t1.fit(dm)
    t2 = make_trainer(str(tmp_path / "resumed"))
    r2 = t2.fit(dm, resume=True)

    h_full = [h["val/loss_total"] for h in r_full.history]
    h_res = [h["val/loss_total"] for h in r2.history]
    np.testing.assert_allclose(h_full[3:], h_res, rtol=0, atol=0)


def test_lane_sweep_composes_with_hp_schedule(dm):
    """A curvature lane sweep under a beta schedule: the scheduled key
    overrides each lane's static placeholder in-graph; every lane must
    match a sequential beta_schedule fit of the concrete model to f32
    ulp (not bitwise: the lane arm traces curvature as a device scalar,
    the sequential arm bakes it as a Python constant — different
    compiled arithmetic). Lanes carry a beta placeholder because
    hp_model_fn also builds the INIT model host-side from the raw lane
    dict."""
    from hyperbolic_vae_tpu.train.ensemble import fit_lane_sweep

    sched = beta_warmup_schedule(1.0, warmup_epochs=3)

    def model_for(c, beta=1.0):
        return GyroplaneVAE(
            data_shape=dm.input_shape, latent_dim=2,
            manifold_curvature=c, beta=beta,
        )

    t = Trainer(
        model_for(1.0), max_epochs=4, early_stopping_patience=None,
        plateau_patience=1000, check_finite=False,
        hp_model_fn=lambda hp: model_for(hp["manifold_curvature"], hp["beta"]),
        hp_schedule=lambda e: {"beta": sched(e)},
    )
    lanes = [{"manifold_curvature": 0.5, "beta": 1.0, "seed": 0},
             {"manifold_curvature": 1.4, "beta": 1.0, "seed": 1}]
    r_lanes = fit_lane_sweep(t, dm, lanes, epochs_per_dispatch=2)

    for lane, r in zip(lanes, r_lanes):
        t_seq = Trainer(
            model_for(lane["manifold_curvature"]), max_epochs=4,
            early_stopping_patience=None, plateau_patience=1000,
            check_finite=False, seed=lane["seed"], beta_schedule=sched,
        )
        r_seq = t_seq.fit(dm)
        h_l = [h["val/loss_total"] for h in r.history]
        h_s = [h["val/loss_total"] for h in r_seq.history]
        # few-ulp per-step drift compounds over the 4 epochs
        np.testing.assert_allclose(h_l, h_s, rtol=1e-5)


def test_beta_schedule_guards(dm):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    sched = beta_warmup_schedule(1.0, 4)
    with pytest.raises(ValueError, match="sugar"):
        Trainer(
            model,
            beta_schedule=sched,
            hp_model_fn=lambda hp: model.clone(beta=hp["beta"]),
        )
    with pytest.raises(ValueError, match="hp_model_fn"):
        Trainer(model, hp_schedule=lambda e: {"beta": sched(e)})

    class NoBeta:
        pass

    with pytest.raises(ValueError, match="beta attribute"):
        Trainer(NoBeta(), beta_schedule=sched)

    with pytest.raises(ValueError, match="LANES"):
        # generic hp_model_fn+hp_schedule is lane composition only —
        # plain fit would KeyError on the missing per-lane keys
        Trainer(
            model,
            hp_model_fn=lambda hp: model.clone(beta=hp["beta"]),
            hp_schedule=lambda e: {"beta": sched(e)},
        ).fit(dm)


def test_streamed_composes_with_beta_schedule(dm):
    """fit_streamed threads the schedule's hp through the block programs;
    with block_rows == n_train it reduces to fit() bit-for-bit."""
    sched = beta_warmup_schedule(1.0, warmup_epochs=3)

    def make_trainer():
        model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
        return Trainer(
            model, max_epochs=4, early_stopping_patience=None,
            plateau_patience=1000, check_finite=False, beta_schedule=sched,
        )

    n = int(dm.x_train.shape[0])
    r_fit = make_trainer().fit(dm)
    r_one = make_trainer().fit_streamed(dm, block_rows=n)
    h_f = [h["train/loss_total"] for h in r_fit.history]
    h_1 = [h["train/loss_total"] for h in r_one.history]
    np.testing.assert_allclose(h_f, h_1, rtol=0, atol=0)  # bit-identical
    # J > 1 blocks: smoke — finite, ramp visible (beta 0 at epoch 0)
    r_j = make_trainer().fit_streamed(dm, block_rows=n // 2)
    h0 = r_j.history[0]
    np.testing.assert_allclose(
        h0["train/loss_total"], h0["train/recon_loss"], rtol=1e-6
    )
    assert all(np.isfinite(h["train/loss_total"]) for h in r_j.history)
