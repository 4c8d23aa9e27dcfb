"""Multi-device tests on the 8-device virtual CPU mesh: DP training
equivalence and the dp x tp dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE, RNASeqVAE
from hyperbolic_vae_tpu.parallel import make_mesh
from hyperbolic_vae_tpu.parallel.sharding_rules import tp_param_shardings
from hyperbolic_vae_tpu.train import Trainer

pytestmark = [
    pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices"),
    pytest.mark.slow,  # deselect with -m 'not slow' (fast tier)
]


def test_dp_training_matches_single_device():
    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)

    t1 = Trainer(model, max_epochs=2, early_stopping_patience=None, seed=7)
    r1 = t1.fit(dm)
    t8 = Trainer(
        model, max_epochs=2, early_stopping_patience=None, seed=7,
        mesh=make_mesh(n_data=8),
    )
    r8 = t8.fit(dm)
    # same jitted program, same PRNG stream -> numerically very close
    l1 = [h["train/loss_total"] for h in r1.history]
    l8 = [h["train/loss_total"] for h in r8.history]
    np.testing.assert_allclose(l1, l8, rtol=1e-3)


def test_tp_sharding_rules_cover_wide_layers():
    model = RNASeqVAE(in_features=128, hidden_dim=16, latent_dim=2)
    x = jnp.ones((8, 128))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = tp_param_shardings(params, mesh)
    spec = shardings["enc"]["kernel"].spec
    assert "model" in str(spec)
    spec_pts = shardings["gyroplanes"]["mp_points"].spec
    assert "model" in str(spec_pts)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_trainer_fit_with_tensor_parallelism():
    """Full Trainer.fit under a (data=4, model=2) mesh with the RNA-seq TP
    rules — params sharded over 'model', batch over 'data', XLA inserts
    the collectives; losses must match the single-device run closely."""
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (512, 256)).astype(np.float32)
    y = np.zeros(512, np.int32)
    dm = ArrayDataModule(
        x_train=x, y_train=y, x_val=x[:128], y_val=y[:128],
        x_test=x[:128], y_test=y[:128], batch_size=64,
    )
    model = RNASeqVAE(in_features=256, hidden_dim=32, latent_dim=2)

    t1 = Trainer(model, max_epochs=2, early_stopping_patience=None, seed=5)
    r1 = t1.fit(dm)
    t_tp = Trainer(
        model, max_epochs=2, early_stopping_patience=None, seed=5,
        mesh=make_mesh(n_data=4, n_model=2),
        param_sharding_fn=tp_param_shardings,
    )
    r2 = t_tp.fit(dm)
    l1 = [h["train/loss_total"] for h in r1.history]
    l2 = [h["train/loss_total"] for h in r2.history]
    np.testing.assert_allclose(l1, l2, rtol=1e-3)


def test_chunked_fit_on_mesh_matches_single_device():
    """epochs_per_dispatch composes with data-parallel sharding: the
    chunk program (scan of train+eval epochs) runs over the 8-device
    mesh and reproduces the single-device loss history."""
    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)

    t1 = Trainer(
        model, max_epochs=4, early_stopping_patience=None, seed=7,
        plateau_patience=1000,
    )
    r1 = t1.fit(dm)
    t8 = Trainer(
        model, max_epochs=4, early_stopping_patience=None, seed=7,
        plateau_patience=1000, mesh=make_mesh(n_data=8),
        epochs_per_dispatch=2,
    )
    r8 = t8.fit(dm)
    l1 = [h["train/loss_total"] for h in r1.history]
    l8 = [h["train/loss_total"] for h in r8.history]
    np.testing.assert_allclose(l1, l8, rtol=1e-3)
    v1 = [h["val/loss_total"] for h in r1.history]
    v8 = [h["val/loss_total"] for h in r8.history]
    np.testing.assert_allclose(v1, v8, rtol=1e-3)


def test_chunked_fit_with_tensor_parallelism():
    """epochs_per_dispatch composes with dp4 x tp2: the chunk program runs
    with 'model'-sharded wide params + 'data'-sharded batches and matches
    the single-device histories."""
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (512, 256)).astype(np.float32)
    y = np.zeros(512, np.int32)
    dm = ArrayDataModule(
        x_train=x, y_train=y, x_val=x[:128], y_val=y[:128],
        x_test=x[:128], y_test=y[:128], batch_size=64,
    )
    model = RNASeqVAE(in_features=256, hidden_dim=32, latent_dim=2)

    t1 = Trainer(model, max_epochs=4, early_stopping_patience=None, seed=5,
                 plateau_patience=1000)
    r1 = t1.fit(dm)
    t_tp = Trainer(
        model, max_epochs=4, early_stopping_patience=None, seed=5,
        plateau_patience=1000, mesh=make_mesh(n_data=4, n_model=2),
        param_sharding_fn=tp_param_shardings, epochs_per_dispatch=2,
    )
    r2 = t_tp.fit(dm)
    for k in ("train/loss_total", "val/loss_total"):
        l1 = [h[k] for h in r1.history]
        l2 = [h[k] for h in r2.history]
        np.testing.assert_allclose(l1, l2, rtol=1e-3)


def test_fsdp_rules_shard_large_leaves_only():
    from jax.sharding import PartitionSpec as P

    from hyperbolic_vae_tpu.parallel.sharding_rules import (
        fsdp_param_shardings,
        fsdp_tp_param_shardings,
    )

    model = RNASeqVAE(in_features=512, hidden_dim=64, latent_dim=2)
    x = jnp.ones((8, 512))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    mesh = make_mesh(n_data=8)
    sh = fsdp_param_shardings(params, mesh)
    # big kernel: largest axis (512 genes) sharded over 'data'
    assert sh["enc"]["kernel"].spec == P("data", None)
    # small bias: replicated
    assert sh["enc"]["bias"].spec == P()

    # combined fsdp+tp on a (data=4, model=2) mesh: 'model' per the TP
    # rules plus the remaining free axis over 'data'
    mesh2 = make_mesh(n_data=4, n_model=2)
    sh2 = fsdp_tp_param_shardings(params, mesh2)
    assert sh2["enc"]["kernel"].spec == P("data", "model")
    assert sh2["dec_out"]["kernel"].spec == P("model", "data")


def test_opt_state_shardings_mirror_params():
    from hyperbolic_vae_tpu.optim import riemannian_adam
    from hyperbolic_vae_tpu.parallel.sharding_rules import (
        fsdp_param_shardings,
        opt_state_shardings,
    )

    model = RNASeqVAE(in_features=512, hidden_dim=64, latent_dim=2)
    x = jnp.ones((8, 512))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )["params"]
    mesh = make_mesh(n_data=8)
    params = jax.device_put(params, fsdp_param_shardings(params, mesh))
    opt = riemannian_adam(learning_rate=1e-3)
    st = opt.init(params)
    sh = opt_state_shardings(opt, st, params, mesh)
    # moments inherit the param's FSDP sharding; count is replicated
    assert sh.exp_avg["enc"]["kernel"] == params["enc"]["kernel"].sharding
    assert sh.count.spec == jax.sharding.PartitionSpec()


def test_trainer_fit_with_fsdp():
    """Full Trainer.fit with ZeRO-3-style param+moment sharding over the
    8-device 'data' mesh: histories match single-device, and the big
    kernels are actually n_data-way sharded (per-device state ~1/8)."""
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.parallel.sharding_rules import fsdp_param_shardings

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (512, 512)).astype(np.float32)
    y = np.zeros(512, np.int32)
    dm = ArrayDataModule(
        x_train=x, y_train=y, x_val=x[:128], y_val=y[:128],
        x_test=x[:128], y_test=y[:128], batch_size=64,
    )
    model = RNASeqVAE(in_features=512, hidden_dim=64, latent_dim=2)

    t1 = Trainer(model, max_epochs=2, early_stopping_patience=None, seed=5,
                 plateau_patience=1000)
    r1 = t1.fit(dm)
    t_fsdp = Trainer(
        model, max_epochs=2, early_stopping_patience=None, seed=5,
        plateau_patience=1000, mesh=make_mesh(n_data=8),
        param_sharding_fn=fsdp_param_shardings,
    )
    r2 = t_fsdp.fit(dm)
    l1 = [h["train/loss_total"] for h in r1.history]
    l2 = [h["train/loss_total"] for h in r2.history]
    np.testing.assert_allclose(l1, l2, rtol=1e-3)
    # trained params kept the FSDP sharding through the donated jit chain
    k = r2.params["enc"]["kernel"]
    assert k.sharding.shard_shape(k.shape)[0] == k.shape[0] // 8


def test_chunked_fit_with_fsdp_tp():
    """epochs_per_dispatch composes with the 2-D (fsdp x tp) weight
    sharding: dp4 x tp2 mesh, kernels sharded over BOTH axes."""
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.parallel.sharding_rules import fsdp_tp_param_shardings

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (512, 512)).astype(np.float32)
    y = np.zeros(512, np.int32)
    dm = ArrayDataModule(
        x_train=x, y_train=y, x_val=x[:128], y_val=y[:128],
        x_test=x[:128], y_test=y[:128], batch_size=64,
    )
    model = RNASeqVAE(in_features=512, hidden_dim=64, latent_dim=2)

    t1 = Trainer(model, max_epochs=4, early_stopping_patience=None, seed=5,
                 plateau_patience=1000)
    r1 = t1.fit(dm)
    t2 = Trainer(
        model, max_epochs=4, early_stopping_patience=None, seed=5,
        plateau_patience=1000, mesh=make_mesh(n_data=4, n_model=2),
        param_sharding_fn=fsdp_tp_param_shardings, epochs_per_dispatch=2,
    )
    r2 = t2.fit(dm)
    for key in ("train/loss_total", "val/loss_total"):
        l1 = [h[key] for h in r1.history]
        l2 = [h[key] for h in r2.history]
        np.testing.assert_allclose(l1, l2, rtol=1e-3)
    k = r2.params["enc"]["kernel"]
    assert k.sharding.shard_shape(k.shape) == (k.shape[0] // 4, k.shape[1] // 2)


def test_elastic_resume_across_topologies(tmp_path):
    """Elastic resharding through checkpoints: a run saved on ONE device
    resumes FSDP-sharded over the 8-device mesh (orbax restores into the
    target's shardings), and an FSDP-sharded save resumes single-device.
    Both resumed histories must match the uninterrupted plain run."""
    import shutil

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.parallel.sharding_rules import fsdp_param_shardings

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (256, 512)).astype(np.float32)
    y = np.zeros(256, np.int32)
    dm = ArrayDataModule(
        x_train=x, y_train=y, x_val=x[:64], y_val=y[:64],
        x_test=x[:64], y_test=y[:64], batch_size=64,
    )
    model = RNASeqVAE(in_features=512, hidden_dim=64, latent_dim=2)

    def mk(max_epochs, ckpt, mesh=None, fsdp=False):
        return Trainer(
            model, max_epochs=max_epochs, early_stopping_patience=None,
            seed=5, plateau_patience=1000, checkpoint_dir=str(ckpt),
            mesh=mesh, param_sharding_fn=fsdp_param_shardings if fsdp else None,
        )

    # the uninterrupted 4-epoch plain run is the ground truth
    ref = mk(4, tmp_path / "ref").fit(dm)
    ref_losses = [h["train/loss_total"] for h in ref.history]

    # save at epoch 2 on one device
    mk(2, tmp_path / "a").fit(dm)
    shutil.copytree(tmp_path / "a", tmp_path / "a2")
    # plain -> FSDP over dp8
    r_up = mk(4, tmp_path / "a", mesh=make_mesh(n_data=8), fsdp=True).fit(
        dm, resume=True
    )
    assert [h["epoch"] for h in r_up.history] == [2, 3]
    k = r_up.params["enc"]["kernel"]
    assert k.sharding.shard_shape(k.shape)[0] == k.shape[0] // 8
    # plain -> plain control for the same tail
    r_ctl = mk(4, tmp_path / "a2").fit(dm, resume=True)
    np.testing.assert_allclose(
        [h["train/loss_total"] for h in r_up.history],
        [h["train/loss_total"] for h in r_ctl.history], rtol=1e-3,
    )
    np.testing.assert_allclose(
        [h["train/loss_total"] for h in r_ctl.history], ref_losses[2:], rtol=1e-6
    )

    # save at epoch 2 FSDP-sharded -> resume on one device
    mk(2, tmp_path / "b", mesh=make_mesh(n_data=8), fsdp=True).fit(dm)
    r_down = mk(4, tmp_path / "b").fit(dm, resume=True)
    assert [h["epoch"] for h in r_down.history] == [2, 3]
    np.testing.assert_allclose(
        [h["train/loss_total"] for h in r_down.history], ref_losses[2:], rtol=1e-3
    )
