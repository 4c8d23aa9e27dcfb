"""Host-resident (streamed) training epochs (extracted from trainer.py
in round 4): datasets larger than device HBM stream through the mesh in
double-buffered blocks, each block one already-compiled scan program
from epoch_program.build_epoch_fns. See Trainer.fit_streamed for the
public API and tests/test_streaming.py for the bit-parity lattice
(block_rows == n_train reduces to the resident path exactly).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from hyperbolic_vae_tpu.data.core import ArrayDataModule
from hyperbolic_vae_tpu.parallel.mesh import data_sharding

logger = logging.getLogger(__name__)


def make_streamed_epoch(trainer, dm: ArrayDataModule, block_rows: int, n_val: int,
                        start_epoch: int = 0):
    """Build a train-epoch callable for HOST-RESIDENT training data
    (datasets larger than device HBM — the one capacity ceiling of the
    stage-once design, data/core.py docstring).

    The epoch is J = n_train // block_rows equal blocks. Each block is
    one already-compiled scan program (the per-block shapes are
    constant, so XLA compiles exactly once); the NEXT block's
    host->device transfer is enqueued right after the current block's
    dispatch, so the copy overlaps device compute (double buffering —
    peak HBM is two blocks + params/opt state/activations).

    Shuffling: block ORDER is host-permuted per epoch and rows are
    shuffled on-device within each block (trainer.shuffle semantics), i.e.
    shuffled-shards + in-shard shuffle. ``stream_reshuffle='rows'``
    additionally re-assigns rows to blocks each epoch via a full host
    permutation (exact mixing incl. the n %% block_rows tail, at the
    cost of a host gather per block). With J == 1 the closure reduces
    to the resident path's train_epoch call bit-for-bit. Each block
    trains block_rows // batch_size steps. NB: in 'block_order' mode
    rows never cross block boundaries, so the n %% block_rows tail is
    excluded from EVERY epoch (a warning is logged; the resident path
    re-draws its dropped n %% batch_size tail each epoch) — use
    reshuffle='rows' when the tail must participate.
    """
    x_host = dm.x_train  # numpy or np.memmap — NEVER staged whole
    n_train = int(x_host.shape[0])
    bs = dm.batch_size
    if block_rows < bs:
        raise ValueError(f"block_rows {block_rows} < batch_size {bs}")
    if trainer.mesh is not None and block_rows % trainer.mesh.shape["data"]:
        raise ValueError("block_rows must shard evenly over the mesh 'data' axis")
    j_blocks = n_train // block_rows
    if j_blocks < 1:
        raise ValueError(f"block_rows {block_rows} > n_train {n_train}")
    if n_train % block_rows and trainer._stream_reshuffle == "block_order":
        logger.warning(
            "fit_streamed(block_order): the %d-row tail (n_train %% "
            "block_rows) is excluded from every epoch; pass "
            "reshuffle='rows' to mix it in",
            n_train - j_blocks * block_rows,
        )
    block_fn, _ = trainer._epoch_fns(block_rows, bs, n_val)
    mesh = trainer.mesh
    reshuffle = trainer._stream_reshuffle
    # seeded with start_epoch so a resumed run replays the SAME
    # block-order/row-assignment schedule an uninterrupted run uses
    epoch_counter = {"n": int(start_epoch)}

    def put(block_np):
        b = np.asarray(block_np, np.float32)
        if mesh is not None:
            return jax.device_put(b, data_sharding(mesh, b.ndim))
        return jax.device_put(b)

    from concurrent.futures import ThreadPoolExecutor

    def train_epoch(params, opt_state, _x_unused, key, hp=None):
        e = epoch_counter["n"]
        epoch_counter["n"] += 1
        rng = np.random.default_rng((trainer.seed, 0x5EED, e))
        # block materialization is LAZY (one block at a time, one
        # prefetched ahead on a host thread): 'rows' mode gathers
        # block_rows rows per call — never a full-split host copy
        if reshuffle == "rows" and j_blocks > 1:
            perm = rng.permutation(n_train)[: j_blocks * block_rows]

            def host_block(i):
                return x_host[perm[i * block_rows : (i + 1) * block_rows]]

        else:
            order = rng.permutation(j_blocks) if j_blocks > 1 else np.arange(1)

            def host_block(i):
                j = int(order[i])
                return x_host[j * block_rows : (j + 1) * block_rows]

        ms_list = []
        # fresh single-worker prefetcher per epoch (shut down at the
        # end: no idle thread outlives the epoch)
        prefetcher = ThreadPoolExecutor(max_workers=1) if j_blocks > 1 else None
        cur = put(host_block(0))
        pre = prefetcher.submit(host_block, 1) if j_blocks > 1 else None
        for i in range(j_blocks):
            kk = key if j_blocks == 1 else jax.random.fold_in(key, i)
            params, opt_state, ms = block_fn(params, opt_state, cur, kk, hp)
            # enqueue the next block's H2D while this block computes;
            # the host gather for block i+2 overlaps on its own thread
            if i + 1 < j_blocks:
                cur = put(pre.result())
                pre = (
                    prefetcher.submit(host_block, i + 2)
                    if i + 2 < j_blocks
                    else None
                )
            else:
                cur = None
            if j_blocks > 1:
                # cap the async queue at ~2 in-flight ops: a tiny host
                # fetch of one metric scalar AFTER enqueueing the next
                # transfer, so H2D(i+1) still overlaps compute(i).
                # Deep unsynced put->dispatch chains degrade the axon
                # relay ~5x below its sustained H2D rate (measured:
                # 44.6 s vs 8.3 s for the same 671 MB epoch); on
                # healthy runtimes this fetch costs ~0.1 ms/block.
                float(jnp.ravel(jax.tree.leaves(ms)[0])[0])
            ms_list.append(ms)
        if prefetcher is not None:
            prefetcher.shutdown(wait=True)
        if j_blocks == 1:
            return params, opt_state, ms_list[0]
        mean_ms = jax.tree.map(lambda *xs: sum(xs) / j_blocks, *ms_list)
        return params, opt_state, mean_ms

    train_epoch.steps_per_epoch = j_blocks * (block_rows // bs)
    return train_epoch


def run_streamed_fit(trainer, dm: ArrayDataModule, params, opt_state, key,
                     train_epoch, eval_epoch, x_val, start_epoch: int,
                     history: list, best_params):
    """The host-driven epoch loop for STREAMED fits (moved here from the
    Trainer in round 5, when the resident K=1 loop collapsed into the
    chunk program — VERDICT r4 #5). Streaming is the one engine that
    cannot stage-and-scan: x_train lives on the host, each epoch is J
    block dispatches (make_streamed_epoch), so the controllers /
    best-tracking / checkpoint cadence run host-side per epoch exactly
    as the former K=1 loop did (same RNG discipline: with
    block_rows == n_train the history is bit-identical to fit())."""
    import time

    from hyperbolic_vae_tpu.optim import ema_params
    from hyperbolic_vae_tpu.train.trainer import TrainResult

    best_metric = float("inf")
    steps = train_epoch.steps_per_epoch
    samples_per_epoch = steps * dm.batch_size
    total_samples = 0
    t_start = None  # set after the first (compile) epoch
    # start_epoch, not 0: resuming an already-complete run executes
    # zero epochs and must not report epochs_run=0 / overwrite the
    # real "last" checkpoint metadata with epoch=-1 (ADVICE r3)
    epochs_run = start_epoch

    for epoch in range(start_epoch, trainer.max_epochs):
        if trainer.profile_dir and epoch == 1:
            jax.profiler.start_trace(trainer.profile_dir)
        key, ek, vk = jax.random.split(key, 3)
        if trainer.lr_schedule is not None:
            # same f32 callable the chunked program traces in-graph
            lr_epoch = float(jax.device_get(trainer.lr_schedule(epoch)))
        else:
            lr_epoch = trainer.plateau.lr
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr_epoch, jnp.float32)
        if trainer.hp_schedule is not None:
            # same f32 callable the chunked program evaluates in-graph
            # from ctrl["epoch"] — pass the jnp scalars as-is so the
            # traced arithmetic (and hence the history) is identical
            hp_epoch = trainer.hp_schedule(jnp.asarray(epoch, jnp.int32))
            params, opt_state, train_ms = train_epoch(
                params, opt_state, None, ek, hp_epoch
            )
            val_ms = eval_epoch(params, x_val, vk, hp_epoch)
        else:
            params, opt_state, train_ms = train_epoch(params, opt_state, None, ek)
            val_ms = eval_epoch(params, x_val, vk)
        # ONE batched host transfer per epoch (axon: each float() is its
        # own ~25 ms round trip; device_get fetches the pytree at once)
        train_ms, val_ms = jax.device_get((train_ms, val_ms))
        train_ms = {f"train/{k}": float(v) for k, v in train_ms.items()}
        val_ms = {f"val/{k}": float(v) for k, v in val_ms.items()}
        if trainer.profile_dir and epoch == 1:
            jax.profiler.stop_trace()
        metrics = {**train_ms, **val_ms, "lr": lr_epoch, "epoch": epoch}
        history.append(metrics)
        epochs_run = epoch + 1
        if t_start is None:
            t_start = time.perf_counter()  # exclude compile epoch
        else:
            total_samples += samples_per_epoch

        if epoch % trainer.log_every_n_epochs == 0:
            trainer.metric_logger.log_scalars(epoch, metrics)

        if trainer.check_finite and not np.isfinite(metrics["train/loss_total"]):
            logger.warning("non-finite train loss at epoch %d: %s", epoch, metrics)

        monitored = metrics.get(trainer.monitor)
        if monitored is not None and np.isfinite(monitored):
            if monitored < best_metric:
                best_metric = monitored
                # copy: the live params buffer is DONATED to the next
                # epoch call — a bare reference would alias freed memory
                best_params = jax.tree.map(jnp.copy, params)
                if trainer._ckpt_mgr:
                    trainer._ckpt_mgr.save_best(epoch, params, metrics)
            if trainer.lr_schedule is None:
                trainer.plateau.step(monitored)
            if trainer.early_stopping and trainer.early_stopping.step(monitored):
                logger.info("early stopping at epoch %d", epoch)
                for cb in trainer.callbacks:
                    if hasattr(cb, "on_epoch_end"):
                        cb.on_epoch_end(trainer, epoch, params, metrics)
                break

        for cb in trainer.callbacks:
            if hasattr(cb, "on_epoch_end"):
                cb.on_epoch_end(trainer, epoch, params, metrics)

        saved_state = (
            trainer._ckpt_mgr and (epoch + 1) % trainer.state_every_n_epochs == 0
        )
        if saved_state:
            trainer._save_resume_state(params, opt_state, key, epoch)

        # a budget expiring exactly at the final epoch is a COMPLETED
        # run, not an interruption — don't mark it interrupted=True
        # (a restart-until-done wrapper would otherwise loop forever)
        reason = None if epoch == trainer.max_epochs - 1 else trainer._external_stop()
        if reason:
            # graceful stop (preemption / wall budget): persist the
            # full resume state even off the state_every_n cadence,
            # then leave through the normal save-last/result path
            trainer._stop_reason = reason
            logger.warning("graceful stop after epoch %d: %s", epoch, reason)
            if trainer._ckpt_mgr and not saved_state:
                trainer._save_resume_state(params, opt_state, key, epoch)
            break

    if trainer._ckpt_mgr and epochs_run > start_epoch:
        trainer._ckpt_mgr.save_last(
            epochs_run - 1, params, history[-1] if history else {}
        )
        trainer._save_ema_checkpoint(opt_state, epochs_run - 1)
        # saves are async (background commit thread): fit() returning
        # is the durability point callers rely on
        trainer._ckpt_mgr.wait_until_finished()
    elapsed = max(time.perf_counter() - t_start, 1e-9) if t_start else 1e-9
    sps = total_samples / elapsed if total_samples else 0.0
    trainer.metric_logger.close()
    return TrainResult(
        params=params,
        best_params=best_params,
        history=history,
        best_metric=best_metric,
        epochs_run=epochs_run,
        samples_per_sec=sps,
        ema_params=(ema_params(opt_state)
                    if trainer._ema_decay is not None else None),
        interrupted=trainer._stop_reason is not None,
        stop_reason=trainer._stop_reason,
    )
