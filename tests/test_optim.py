"""RiemannianAdam: golden single-step checks and invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.optim import manifold_label_tree, riemannian_adam


def test_euclidean_leaf_matches_optax_adam():
    import optax

    params = {"dense": {"kernel": jnp.array([1.0, -2.0, 3.0])}}
    grads = {"dense": {"kernel": jnp.array([0.1, 0.2, -0.3])}}
    ra = riemannian_adam(1e-2)
    adam = optax.adam(1e-2)
    s1, s2 = ra.init(params), adam.init(params)
    p1, p2 = params, params
    for _ in range(3):
        u1, s1 = ra.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = adam.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    np.testing.assert_allclose(
        np.asarray(p1["dense"]["kernel"]), np.asarray(p2["dense"]["kernel"]), rtol=1e-6
    )


def test_manifold_leaf_first_step_golden():
    """Hand-computed first step for a single ball point:
    m1 = (1-b1) g_r, v1 = (1-b2) lam^2 g_r^2, with bias correction the
    direction is m1/(1-b1) / (sqrt(v1/(1-b2)) + eps) = g_r/(lam |g_r|+eps')
    -> new point = expmap_x(-lr * direction)."""
    ball = PoincareBall(c=1.0)
    x = jnp.array([0.3, 0.0])
    g = jnp.array([0.5, -0.2])
    params = {"layer": {"mp_points": x}}
    grads = {"layer": {"mp_points": g}}
    lr, eps = 1e-2, 1e-8
    ra = riemannian_adam(lr, eps=eps, ball=ball)
    state = ra.init(params)
    updates, _ = ra.update(grads, state, params)
    new_p = params["layer"]["mp_points"] + updates["layer"]["mp_points"]

    lam = float(ball.lambda_x(x[None], keepdims=False)[0])
    g_r = np.asarray(g) / lam**2
    direction = g_r / (np.sqrt(lam**2 * g_r**2) + eps)
    expected = ball.expmap(x, jnp.asarray(-lr * direction, jnp.float32))
    expected = ball.project(expected)
    np.testing.assert_allclose(np.asarray(new_p), np.asarray(expected), rtol=1e-5, atol=1e-7)


def test_manifold_point_stays_in_ball_under_huge_grads():
    ball = PoincareBall(c=1.0)
    params = {"g": {"mp_points": jnp.array([[0.9, 0.0], [0.0, -0.9]])}}
    ra = riemannian_adam(1.0, ball=ball)  # absurd lr
    state = ra.init(params)
    import optax

    p = params
    for i in range(20):
        grads = {"g": {"mp_points": jnp.full((2, 2), 100.0 * (-1.0) ** i)}}
        u, state = ra.update(grads, state, p)
        p = optax.apply_updates(p, u)
    norms = np.linalg.norm(np.asarray(p["g"]["mp_points"]), axis=-1)
    assert np.all(norms < 1.0), norms


def test_momentum_is_transported():
    """After a step, exp_avg must live in the NEW tangent space: its
    Riemannian norm is preserved by transport."""
    ball = PoincareBall(c=1.0)
    x = jnp.array([0.4, 0.1])
    params = {"g": {"mp_points": x}}
    grads = {"g": {"mp_points": jnp.array([1.0, 2.0])}}
    ra = riemannian_adam(0.1, ball=ball)
    state = ra.init(params)
    updates, new_state = ra.update(grads, state, params)
    import optax

    new_p = optax.apply_updates(params, updates)["g"]["mp_points"]
    g_r = ball.egrad2rgrad(x, grads["g"]["mp_points"])
    m_at_x = 0.1 * g_r  # (1-b1) g_r
    norm_before = float(ball.inner(x[None], m_at_x[None], keepdims=False)[0])
    m_after = new_state.exp_avg["g"]["mp_points"]
    norm_after = float(ball.inner(new_p[None], m_after[None], keepdims=False)[0])
    np.testing.assert_allclose(norm_after, norm_before, rtol=1e-4)


def test_manifold_label_tree():
    params = {
        "a": {"kernel": jnp.zeros(3), "mp_points": jnp.zeros((2, 3))},
        "b": {"bias": jnp.zeros(1)},
    }
    labels = manifold_label_tree(params)
    assert labels["a"]["mp_points"] is True
    assert labels["a"]["kernel"] is False
    assert labels["b"]["bias"] is False


def test_torch_baseline_riemannian_adam_matches_jax():
    """The parity baseline's from-scratch torch Riemannian Adam must take
    the SAME manifold steps as optim.riemannian_adam (else parity diffs
    measure optimizer mismatch, not framework correctness)."""
    import optax
    import torch
    from benchmarks.torch_baseline import TorchBall, TorchRiemannianAdam

    ball = PoincareBall(c=1.0)
    rng = np.random.default_rng(0)
    raw = rng.normal(0, 0.3, (5, 2)).astype(np.float32)
    p0 = np.asarray(ball.expmap0(jnp.array(raw)))
    g0 = rng.normal(0, 1, (5, 2)).astype(np.float32)

    params = {"mp_points": jnp.array(p0)}
    opt = riemannian_adam(1e-2, ball=ball)
    st = opt.init(params)
    for _ in range(5):
        up, st = opt.update({"mp_points": jnp.array(g0)}, st, params)
        params = optax.apply_updates(params, up)

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = TorchRiemannianAdam([("mp_points", tp)], TorchBall(1.0), lr=1e-2)
    for _ in range(5):
        tp.grad = torch.tensor(g0)
        topt.step()
    np.testing.assert_allclose(
        tp.detach().numpy(), np.asarray(params["mp_points"]), atol=1e-6
    )


def test_torch_baseline_stays_on_faithful_chart():
    """Regression: the torch parity arm diverged on every seed because its
    expmap/expmap0 never projected onto the 4e-3 boundary margin — mu
    reached |mu| -> 1 where f32 logmap noise is amplified by
    lambda ~ 1/(1-|mu|^2) and log q exploded to -1e7. Train a few epochs
    and assert every posterior mean / sample / manifold param stays inside
    the projection margin and the loss stays sane."""
    import torch
    from benchmarks.torch_baseline import TorchGyroplaneVAE, TorchRiemannianAdam

    torch.manual_seed(0)
    model = TorchGyroplaneVAE(data_numel=64)
    opt = TorchRiemannianAdam(model.named_parameters(), model.ball, lr=1e-2)
    x = torch.rand(128, 64)
    for _ in range(30):  # enough steps to push mu outward pre-fix
        opt.zero_grad()
        loss = model.loss(x)
        loss.backward()
        opt.step()
    with torch.no_grad():
        mu, scale, z, x_hat = model(x)
        final = model.loss(x)
    max_norm = (1.0 - 4e-3) / model.ball.sqrt_c + 1e-6
    assert float(mu.norm(dim=-1).max()) <= max_norm
    assert float(z.norm(dim=-1).max()) <= max_norm
    assert float(model.mp_points.norm(dim=-1).max()) <= max_norm
    assert torch.isfinite(final)
    # the pre-fix failure mode was loss < -1e5 within a few epochs
    assert float(final) > -1e4


def test_bf16_storage_leaves_update_in_f32():
    """bf16-STORED leaves (HBM-halving for the wide RNA-seq kernels):
    moments/updates must compute in f32 and cast back — dtypes preserved,
    values finite, and a same-value f32 run must agree to bf16 precision."""
    import jax
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.optim import riemannian_adam

    tx = riemannian_adam(1e-2)
    g32 = jnp.linspace(-1, 1, 8, dtype=jnp.float32)
    p32 = jnp.linspace(0.5, 1.5, 8, dtype=jnp.float32)
    params = {"w16": p32.astype(jnp.bfloat16), "w32": p32}
    grads = {"w16": g32.astype(jnp.bfloat16), "w32": g32}
    state = tx.init(params)
    assert state.exp_avg["w16"].dtype == jnp.bfloat16
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    assert params["w16"].dtype == jnp.bfloat16
    assert state.exp_avg_sq["w16"].dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(params["w16"], np.float32)))
    # bf16 arm tracks the f32 arm within bf16 resolution
    np.testing.assert_allclose(
        np.asarray(params["w16"], np.float32), np.asarray(params["w32"]),
        rtol=2e-2, atol=2e-2,
    )


def test_rnaseq_bf16_param_storage_trains():
    """RNASeqVAE(param_dtype='bfloat16'): wide kernels stored bf16, one
    Trainer epoch stays finite and the loss decreases."""
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.models import RNASeqVAE
    from hyperbolic_vae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (256, 512)).astype(np.float32)
    y = np.zeros(256, np.int32)
    dm = ArrayDataModule(x_train=x, y_train=y, x_val=x[:64], y_val=y[:64],
                         x_test=x[:64], y_test=y[:64], batch_size=64)
    model = RNASeqVAE(in_features=512, hidden_dim=32, latent_dim=2,
                      param_dtype="bfloat16")
    trainer = Trainer(model, max_epochs=4, early_stopping_patience=None,
                      check_finite=False)
    r = trainer.fit(dm)
    import jax.numpy as jnp

    assert r.params["enc"]["kernel"].dtype == jnp.bfloat16
    losses = [h["train/loss_total"] for h in r.history]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_moment_dtype_bf16_with_f32_params():
    """riemannian_adam(moment_dtype='bfloat16') with f32 params: moments
    stored bf16 (halving the moment HBM stream), params stay f32 master
    weights, updates computed in f32 track the all-f32 run to bf16
    resolution — for Euclidean AND manifold (mp_) leaves."""
    import jax
    import jax.numpy as jnp

    from hyperbolic_vae_tpu.optim import riemannian_adam

    g = jnp.linspace(-1, 1, 8, dtype=jnp.float32)
    p_euc = jnp.linspace(0.5, 1.5, 8, dtype=jnp.float32)
    p_man = (jnp.linspace(-0.4, 0.4, 8, dtype=jnp.float32)).reshape(4, 2)
    g_man = jnp.full((4, 2), 0.3, jnp.float32)

    def run(moment_dtype):
        tx = riemannian_adam(1e-2, moment_dtype=moment_dtype)
        params = {"w": p_euc, "mp_pts": p_man}
        grads = {"w": g, "mp_pts": g_man}
        state = tx.init(params)
        for _ in range(5):
            updates, state = tx.update(grads, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, state

    params16, state16 = run("bfloat16")
    params32, state32 = run(None)
    for leaf in ("w", "mp_pts"):
        assert state16.exp_avg[leaf].dtype == jnp.bfloat16
        assert state16.exp_avg_sq[leaf].dtype == jnp.bfloat16
        assert state32.exp_avg[leaf].dtype == jnp.float32
        assert params16[leaf].dtype == jnp.float32  # master weights untouched
        np.testing.assert_allclose(
            np.asarray(params16[leaf]), np.asarray(params32[leaf]),
            rtol=2e-2, atol=2e-2,
        )


def test_trainer_moment_dtype_plumbs_through():
    """Trainer(moment_dtype='bfloat16') trains with bf16 moments and a
    finite decreasing loss at f32 params (the f32-master + narrow-moment
    middle point of the storage-dtype space)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperbolic_vae_tpu.data.core import ArrayDataModule
    from hyperbolic_vae_tpu.models import RNASeqVAE
    from hyperbolic_vae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (256, 512)).astype(np.float32)
    y = np.zeros(256, np.int32)
    dm = ArrayDataModule(x_train=x, y_train=y, x_val=x[:64], y_val=y[:64],
                         x_test=x[:64], y_test=y[:64], batch_size=64)
    model = RNASeqVAE(in_features=512, hidden_dim=32, latent_dim=2)
    trainer = Trainer(model, max_epochs=4, early_stopping_patience=None,
                      check_finite=False, moment_dtype="bfloat16")
    params = trainer.init_params(x[:64])
    opt_state = trainer._optimizer.init(params)
    moment_leaves = jax.tree.leaves(opt_state.inner_state.exp_avg)
    assert all(l.dtype == jnp.bfloat16 for l in moment_leaves)
    r = trainer.fit(dm)
    assert r.params["enc"]["kernel"].dtype == jnp.float32
    losses = [h["train/loss_total"] for h in r.history]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_plateau_never_raises_lr():
    """torch ReduceLROnPlateau applies a new lr only when it is a
    REDUCTION — an lr already below min_lr (per-lane lr sweep points)
    must survive a plateau trip unchanged."""
    from hyperbolic_vae_tpu.optim import ReduceLROnPlateau

    pl = ReduceLROnPlateau(lr=1e-5, factor=0.2, patience=0, min_lr=5e-5)
    pl.step(1.0)  # sets best
    lr = pl.step(2.0)  # non-improving -> trips
    # NOT raised to min_lr (the controller f32-quantizes lr at init for
    # bit parity with the in-graph chunk controller, hence np.float32)
    import numpy as np

    assert lr == np.float32(1e-5)
    pl2 = ReduceLROnPlateau(lr=1e-3, factor=0.2, patience=0, min_lr=5e-5)
    pl2.step(1.0)
    assert abs(pl2.step(2.0) - 2e-4) < 1e-9  # normal reduction still applies (f32)


# --------------------------------------------------------------------- #
# parameter EMA (Polyak averaging) tracked in the optimizer state


def test_ema_euclidean_matches_hand_lerp():
    import optax

    from hyperbolic_vae_tpu.optim import ema_params

    params = {"dense": {"kernel": jnp.array([1.0, -2.0, 3.0])}}
    d = 0.9
    ra = riemannian_adam(1e-2, ema_decay=d)
    state = ra.init(params)
    p = params
    expected = np.asarray(params["dense"]["kernel"])
    rng = np.random.default_rng(0)
    for _ in range(5):
        grads = {"dense": {"kernel": jnp.asarray(rng.normal(size=3), jnp.float32)}}
        u, state = ra.update(grads, state, p)
        p = optax.apply_updates(p, u)
        expected = d * expected + (1 - d) * np.asarray(p["dense"]["kernel"])
    got = ema_params(state)["dense"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_ema_manifold_tangent_space_golden_and_in_ball():
    """Manifold leaves average in T_0: after one step
    ema = expmap0(d*logmap0(p0) + (1-d)*logmap0(p1)) — and the EMA stays
    strictly inside the ball under many large steps."""
    import optax

    from hyperbolic_vae_tpu.optim import ema_params

    ball = PoincareBall(c=1.0)
    p0 = jnp.array([0.3, 0.1])
    params = {"g": {"mp_points": p0}}
    d = 0.8
    ra = riemannian_adam(5e-2, ball=ball, ema_decay=d)
    state = ra.init(params)
    u, state = ra.update({"g": {"mp_points": jnp.array([0.5, -0.2])}}, state, params)
    p1 = optax.apply_updates(params, u)["g"]["mp_points"]
    expected = ball.expmap0(d * ball.logmap0(p0) + (1 - d) * ball.logmap0(p1))
    got = ema_params(state)["g"]["mp_points"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-7)

    # boundary stress: huge alternating grads, EMA must stay in the ball
    p = {"g": {"mp_points": jnp.array([[0.9, 0.0], [0.0, -0.9]])}}
    ra = riemannian_adam(1.0, ball=ball, ema_decay=0.99)
    state = ra.init(p)
    for i in range(20):
        grads = {"g": {"mp_points": jnp.full((2, 2), 100.0 * (-1.0) ** i)}}
        u, state = ra.update(grads, state, p)
        p = optax.apply_updates(p, u)
    norms = np.linalg.norm(np.asarray(ema_params(state)["g"]["mp_points"]), axis=-1)
    assert np.all(norms < 1.0), norms


def test_ema_decay_zero_tracks_params_exactly():
    import optax

    from hyperbolic_vae_tpu.optim import ema_params

    params = {"dense": {"kernel": jnp.array([1.0, -2.0])},
              "g": {"mp_points": jnp.array([0.2, 0.4])}}
    ra = riemannian_adam(1e-2, ema_decay=0.0)
    state = ra.init(params)
    p = params
    for _ in range(3):
        grads = jax.tree.map(jnp.ones_like, p)
        u, state = ra.update(grads, state, p)
        p = optax.apply_updates(p, u)
    # d=0 -> ema is exactly the current point (tangent roundtrip for the
    # manifold leaf is identity up to f32 transcendentals)
    e = ema_params(state)
    np.testing.assert_allclose(np.asarray(e["dense"]["kernel"]),
                               np.asarray(p["dense"]["kernel"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e["g"]["mp_points"]),
                               np.asarray(p["g"]["mp_points"]), rtol=1e-5, atol=1e-7)


def test_ema_absent_raises():
    import pytest

    from hyperbolic_vae_tpu.optim import ema_params

    ra = riemannian_adam(1e-2)
    state = ra.init({"w": jnp.zeros(3)})
    with pytest.raises(ValueError, match="no parameter EMA"):
        ema_params(state)


def test_trainer_ema_end_to_end_and_chunk_parity(tmp_path):
    """Trainer(ema_decay=...): result.ema_params usable for evaluation,
    manifold leaves in the ball, the chunked (K>1) program yields the
    SAME EMA as K=1 (it lives in opt_state, which the chunk scans), and
    the 'ema' checkpoint restores to the returned EMA."""
    from hyperbolic_vae_tpu.data.mnist import make_data_module
    from hyperbolic_vae_tpu.models import GyroplaneVAE
    from hyperbolic_vae_tpu.train import Trainer
    from hyperbolic_vae_tpu.train.checkpoint import restore_model

    dm = make_data_module(batch_size=64, synthetic=True, n_train=256, n_test=64)
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)

    def run(k, ckpt=None):
        tr = Trainer(model, max_epochs=4, early_stopping_patience=None,
                     check_finite=False, ema_decay=0.9, epochs_per_dispatch=k,
                     checkpoint_dir=ckpt)
        return tr, tr.fit(dm)

    tr1, r1 = run(1, ckpt=str(tmp_path / "ck"))
    _, rk = run(4)
    # the self-describing 'ema' checkpoint restores the exact EMA
    _, ema_restored, meta = restore_model(str(tmp_path / "ck"), "ema")
    assert meta["ema_decay"] == 0.9
    for a, b in zip(jax.tree.leaves(ema_restored), jax.tree.leaves(r1.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert r1.ema_params is not None
    for l1, lk in zip(jax.tree.leaves(r1.ema_params), jax.tree.leaves(rk.ema_params)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(lk))
    saw_manifold = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(r1.ema_params)[0]:
        if any(str(getattr(k, "key", k)).startswith("mp_") for k in path):
            saw_manifold = True
            assert np.all(np.linalg.norm(np.asarray(leaf), axis=-1) < 1.0)
    assert saw_manifold
    m = tr1.evaluate(dm, r1.ema_params, split="val")
    assert np.isfinite(m["val/loss_total"])


def test_ema_bf16_params_master_f32_does_not_freeze():
    """EMA storage is f32 regardless of param dtype: with bf16 params and
    a high decay, a bf16-stored EMA increment would round to zero every
    step and freeze at init (review finding)."""
    import optax

    from hyperbolic_vae_tpu.optim import ema_params

    params = {"w": jnp.full((8,), 1.0, jnp.bfloat16)}
    ra = riemannian_adam(1e-2, ema_decay=0.999)
    state = ra.init(params)
    assert state.ema["w"].dtype == jnp.float32
    p = params
    for _ in range(10):
        u, state = ra.update({"w": jnp.ones(8, jnp.bfloat16)}, state, p)
        p = optax.apply_updates(p, u)
    drift = np.abs(np.asarray(ema_params(state)["w"]) - 1.0)
    # ~10 steps of (1-d)*step drift; must be visibly nonzero in f32
    assert np.all(drift > 1e-5), drift


def test_ema_params_on_bare_array_tree():
    from hyperbolic_vae_tpu.optim import ema_params

    ra = riemannian_adam(1e-2, ema_decay=0.9)
    state = ra.init(jnp.zeros(3))
    np.testing.assert_array_equal(np.asarray(ema_params(state)), np.zeros(3))
