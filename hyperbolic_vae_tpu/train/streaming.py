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
