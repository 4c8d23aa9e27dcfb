"""fit_streamed: host-resident training data in double-buffered blocks.

The stage-once design (data/core.py) assumes the training split fits in
device HBM — true for every reference dataset, false for production-scale
scRNA-seq (1M cells x 20k genes = 80 GB f32). fit_streamed removes the
ceiling: `dm.x_train` stays on the host (numpy or np.memmap) and streams
through the device in equal blocks, the next block's transfer enqueued
while the current one computes. These tests pin:

  * block_rows == n_train reduces BIT-IDENTICALLY to the resident fit
    (same compiled program, same key path),
  * multi-block training is finite and converges,
  * 'rows' reshuffle (full host permutation per epoch) works,
  * np.memmap-backed datasets train without loading the split,
  * composes with the data-parallel mesh.
"""

import numpy as np
import pytest

from hyperbolic_vae_tpu.data.mnist import make_data_module
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.train import Trainer


@pytest.fixture(scope="module")
def dm():
    return make_data_module(batch_size=64, synthetic=True, n_train=512, n_test=128)


def _trainer(dm, **kw):
    model = GyroplaneVAE(data_shape=dm.input_shape, latent_dim=2)
    kw.setdefault("max_epochs", 4)
    kw.setdefault("early_stopping_patience", None)
    kw.setdefault("check_finite", False)
    return Trainer(model, **kw)


def test_single_block_bitmatches_resident_fit(dm):
    r_res = _trainer(dm).fit(dm)
    r_str = _trainer(dm).fit_streamed(dm, block_rows=len(dm.x_train))
    for k in ("train/loss_total", "val/loss_total"):
        a = [h[k] for h in r_res.history]
        b = [h[k] for h in r_str.history]
        np.testing.assert_allclose(a, b, rtol=0, atol=0)  # bit-identical
    assert r_res.best_metric == r_str.best_metric


def test_multi_block_trains(dm):
    r = _trainer(dm).fit_streamed(dm, block_rows=128)  # J = 4 blocks
    assert len(r.history) == 4
    losses = [h["train/loss_total"] for h in r.history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # steps/epoch accounting: 4 blocks x (128 // 64) steps
    assert r.epochs_run == 4


def test_rows_reshuffle_mixes_all_rows(dm):
    r = _trainer(dm).fit_streamed(dm, block_rows=128, reshuffle="rows")
    losses = [h["train/loss_total"] for h in r.history]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_memmap_backed_split(tmp_path, dm):
    path = tmp_path / "x_train.f32"
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=dm.x_train.shape)
    mm[:] = dm.x_train
    mm.flush()
    import dataclasses

    dm2 = dataclasses.replace(
        dm, x_train=np.memmap(path, dtype=np.float32, mode="r", shape=dm.x_train.shape)
    )
    r_mm = _trainer(dm2).fit_streamed(dm2, block_rows=128)
    r_np = _trainer(dm).fit_streamed(dm, block_rows=128)
    a = [h["train/loss_total"] for h in r_mm.history]
    b = [h["train/loss_total"] for h in r_np.history]
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_streamed_with_data_mesh(dm):
    from hyperbolic_vae_tpu.parallel import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices on the 'data' axis
    r = _trainer(dm, mesh=mesh).fit_streamed(dm, block_rows=128)
    losses = [h["train/loss_total"] for h in r.history]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_streamed_evaluate_matches_resident_weighting(dm):
    tr = _trainer(dm, max_epochs=2)
    r = tr.fit(dm)
    res = tr.evaluate(dm, r.best_params, "test")
    # blocks of 48 over 128 test rows: 2 full + 1 partial (32) block —
    # exercises the tail-weighting path. Sample-RNG streams differ, so
    # agreement is statistical, not bitwise.
    st = tr.evaluate(dm, r.best_params, "test", stream_block_rows=48)
    for k in res:
        assert np.isfinite(st[k])
        np.testing.assert_allclose(st[k], res[k], rtol=0.05)


def test_block_order_tail_exclusion_warns(dm, caplog):
    import logging

    # 461 train rows, 128-row blocks -> 77-row tail never trained in
    # block_order mode: must be said out loud
    with caplog.at_level(logging.WARNING, logger="hyperbolic_vae_tpu.train.trainer"):
        _trainer(dm, max_epochs=1).fit_streamed(dm, block_rows=128)
    assert any("excluded from every epoch" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="hyperbolic_vae_tpu.train.trainer"):
        _trainer(dm, max_epochs=1).fit_streamed(dm, block_rows=128, reshuffle="rows")
    assert not any("excluded from every epoch" in r.message for r in caplog.records)


def test_streamed_schedule_depends_on_start_epoch(dm):
    """A resumed run must replay the uninterrupted run's block schedule:
    the per-epoch shuffle RNG is seeded with the absolute epoch number,
    so two closures starting at different epochs draw different orders."""
    tr = _trainer(dm, max_epochs=1)
    e0 = tr._make_streamed_epoch(dm, 128, len(dm.x_val), start_epoch=0)
    e2 = tr._make_streamed_epoch(dm, 128, len(dm.x_val), start_epoch=2)
    tr2 = _trainer(dm, max_epochs=3)
    ref = tr2._make_streamed_epoch(dm, 128, len(dm.x_val), start_epoch=0)

    import jax

    import jax.numpy as jnp

    params = tr.init_params(dm.x_train)
    opt = tr._optimizer.init(params)
    key = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree.map(jnp.copy, t)
    # drive the reference closure to absolute epoch 2, then compare one
    # epoch against the start_epoch=2 closure from the SAME state/key
    # (copies per call: the block program donates params/opt buffers)
    p_r, o_r = copy(params), copy(opt)
    for _ in range(2):
        p_r, o_r, _ = ref(p_r, o_r, None, key)
    _, _, ms_resumed = e2(copy(p_r), copy(o_r), None, key)
    _, _, ms_ref = ref(copy(p_r), copy(o_r), None, key)
    np.testing.assert_allclose(
        float(ms_resumed["loss_total"]), float(ms_ref["loss_total"]), rtol=0, atol=0
    )
    # while the epoch-0 schedule differs from the epoch-2 one
    # (deterministic: rng((42, 0x5EED, 0)).permutation(3) = [1,2,0] vs
    #  rng((42, 0x5EED, 2)).permutation(3) = [1,0,2])
    _, _, ms_wrong = e0(copy(p_r), copy(o_r), None, key)
    assert float(ms_wrong["loss_total"]) != float(ms_ref["loss_total"])


def test_streamed_rejects_bad_config(dm):
    with pytest.raises(ValueError, match="< batch_size"):
        _trainer(dm).fit_streamed(dm, block_rows=32)
    with pytest.raises(ValueError, match="epochs_per_dispatch"):
        _trainer(dm, epochs_per_dispatch=2).fit_streamed(dm, block_rows=128)
    with pytest.raises(ValueError, match="> n_train"):
        _trainer(dm).fit_streamed(dm, block_rows=1024)


def test_streamed_with_fsdp_mesh(dm):
    """Host-resident blocks compose with ZeRO-3 weight sharding: the big
    kernels stay data-axis-sharded through the streamed epoch loop and
    the run matches the plain streamed run."""
    from hyperbolic_vae_tpu.parallel import make_mesh
    from hyperbolic_vae_tpu.parallel.sharding_rules import fsdp_param_shardings

    r_plain = _trainer(dm).fit_streamed(dm, block_rows=128)
    r = _trainer(
        dm, mesh=make_mesh(), param_sharding_fn=fsdp_param_shardings
    ).fit_streamed(dm, block_rows=128)
    a = [h["train/loss_total"] for h in r_plain.history]
    b = [h["train/loss_total"] for h in r.history]
    np.testing.assert_allclose(a, b, rtol=1e-3)
    # the biggest kernel must actually be sharded (not replicated)
    import jax

    big = max(jax.tree.leaves(r.params), key=lambda l: l.size)
    assert big.sharding.shard_shape(big.shape) != big.shape
