"""The framework's training engine (replaces pytorch-lightning's
``trainer.fit`` — SURVEY section 1 "the training loop itself is inside
pytorch-lightning"; here it is ours, designed TPU-first):

  * The ENTIRE epoch is one jit-compiled program: a `lax.scan` over
    steps with on-device shuffling (jax.random.permutation) and gather —
    zero host<->device traffic inside an epoch, one metrics transfer per
    epoch. This is where the >=10x-per-epoch target is won: the torch
    reference pays Python dispatch + DataLoader IPC per step.
  * Datasets are staged into HBM once, sharded over the 'data' mesh
    axis; params are replicated; XLA inserts the gradient psums.
  * The learning rate lives in the optimizer state via
    optax.inject_hyperparams, so ReduceLROnPlateau changes it WITHOUT
    recompiling the epoch program.
  * Host-side per-epoch controllers mirror the reference semantics:
    ReduceLROnPlateau(0.2, 20, min 5e-5) + EarlyStopping(patience 10) on
    val/loss_total (trainer_mnist.py:14-39), Orbax checkpointing
    (best-on-monitor + last, like Lightning ModelCheckpoint,
    trainer_mnist.py:22-27), metric namespacing train/ val/ test/.
  * Numerical sanitization: per-epoch isfinite guard replaces torch's
    detect_anomaly wrapper (scripts/_6:64); optional jax_debug_nans.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyperbolic_vae_tpu.data.core import ArrayDataModule
from hyperbolic_vae_tpu.manifolds import PoincareBall
from hyperbolic_vae_tpu.optim import (
    EarlyStopping,
    ReduceLROnPlateau,
    ema_params,
    riemannian_adam,
)
from hyperbolic_vae_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from hyperbolic_vae_tpu.train.metrics import MetricLogger

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainResult:
    params: Any
    best_params: Any
    history: list
    best_metric: float
    epochs_run: int
    samples_per_sec: float
    # Polyak/EMA of the parameters over the whole run (None unless the
    # Trainer was built with ema_decay=...) — evaluate with
    # trainer.evaluate(dm, params=result.ema_params)
    ema_params: Any = None
    # True when the run stopped early on an EXTERNAL event (preemption
    # signal / wall-clock budget — train/preemption.py) rather than
    # max_epochs or early stopping; resume state was saved, so a later
    # fit(resume=True) continues where this run left off
    interrupted: bool = False
    stop_reason: Optional[str] = None


class Trainer:
    def __init__(
        self,
        model,
        lr: Optional[float] = None,
        max_epochs: int = 300,
        seed: int = 42,
        mesh=None,
        use_mesh: bool = False,
        monitor: str = "val/loss_total",
        early_stopping_patience: Optional[int] = 10,
        plateau_factor: float = 0.2,
        plateau_patience: int = 20,
        plateau_min_lr: float = 5e-5,
        log_dir: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
        callbacks: Sequence = (),
        check_finite: bool = True,
        log_every_n_epochs: int = 1,
        profile_dir: Optional[str] = None,
        state_every_n_epochs: int = 1,
        debug_nans: bool = False,
        shuffle: str = "row",  # "row" (exact reference semantics) | "block" (TPU-fast)
        epochs_per_dispatch: int = 1,  # K>1: scan K epochs per device dispatch
        loss_fn=None,  # optional fn(params, batch, key) -> metrics dict
        train_step_fn=None,  # optional fn(params, opt_state, batch, key) -> (params, opt_state, metrics)
        param_sharding_fn=None,  # optional fn(params, mesh) -> sharding pytree (tensor parallelism)
        moment_dtype: Optional[str] = None,  # Adam moment STORAGE dtype (e.g. 'bfloat16'); None = follow params
        hp_model_fn=None,  # optional fn(hp dict of scalars) -> flax model: hyperparameter-LANE sweeps (fit_lane_sweep)
        ema_decay: Optional[float] = None,  # parameter EMA (Polyak averaging) tracked in the optimizer state
        lr_schedule=None,  # optional jnp-traceable fn(epoch) -> lr (optim/schedules.py cosine_schedule/exponential_schedule); replaces plateau control
        grad_accum_steps: int = 1,  # A>1: each optimizer step accumulates grads over A microbatches of batch_size/A rows (in-graph lax.scan; activation memory = ONE microbatch)
        grad_clip_norm: Optional[float] = None,  # clip grads to this global L2 norm before the optimizer (Lightning gradient_clip_val equivalent; applied to Euclidean grads, i.e. before egrad2rgrad)
        max_wall_seconds: Optional[float] = None,  # graceful stop once fit() exceeds this budget (checked at epoch/chunk boundaries; full resume state saved)
        preempt_signals: Sequence[int] = (),  # e.g. (signal.SIGTERM,): handle these as graceful-stop requests during fit (train/preemption.py)
    ):
        assert shuffle in ("row", "block"), shuffle
        self.shuffle = shuffle
        # K epochs (train + full val eval + in-graph best-params tracking
        # + IN-GRAPH plateau-LR/early-stopping controllers) run as ONE
        # compiled program per dispatch. On dispatch-latency-heavy
        # backends (axon: ~25-30 ms per round trip) this is the
        # difference between 1.4M and 4.7M samples/sec on the flagship.
        # Semantics are EXACTLY the K=1 loop's for any K (bit-identical
        # histories incl. across LR drops and early stops — the
        # controllers run inside the scan; tests/test_chunked_fit.py).
        # Remaining K>1 trade-offs: callbacks/state checkpoints fire at
        # chunk boundaries, profile_dir is unsupported.
        assert epochs_per_dispatch >= 1
        self.epochs_per_dispatch = int(epochs_per_dispatch)
        # gradient accumulation: the effective (optimizer-step) batch is
        # still dm.batch_size; each step computes it as A sequential
        # microbatch grad passes accumulated in the scan carry, so the
        # activation high-water mark is batch_size/A rows. Exact for
        # per-sample-mean losses (mean of equal-size microbatch grads ==
        # full-batch grad up to f32 reduction order); MC losses draw one
        # sample key PER MICROBATCH, so stochastic metrics agree in
        # distribution, not bitwise, with A=1.
        assert grad_accum_steps >= 1
        self.grad_accum_steps = int(grad_accum_steps)
        if self.grad_accum_steps > 1 and train_step_fn is not None:
            raise ValueError(
                "grad_accum_steps does not compose with train_step_fn "
                "(the full-step override owns its own grad computation)"
            )
        # global-norm gradient clipping (torch clip_grad_norm_ / Lightning
        # gradient_clip_val semantics: one shared scale min(1, c/||g||)).
        # Clips the EUCLIDEAN grads — riemannian_adam's egrad2rgrad runs
        # after, so manifold params see the same uniform scaling.
        if grad_clip_norm is not None and train_step_fn is not None:
            raise ValueError("grad_clip_norm does not compose with train_step_fn")
        self.grad_clip_norm = (
            float(grad_clip_norm) if grad_clip_norm is not None else None
        )
        # graceful-stop plumbing (preemption / wall-clock budgets): see
        # train/preemption.py and _external_stop
        self.max_wall_seconds = max_wall_seconds
        self.preempt_signals = tuple(preempt_signals)
        self._shutdown = None
        self._fit_t0 = None
        self._stop_reason = None
        # loss override: e.g. the fused Pallas flagship step
        # (ops/flagship_fused.make_fused_loss_fn); defaults to
        # model.apply(method='loss')
        self.loss_fn = loss_fn
        # full-step override: e.g. the single-kernel fused train step
        # (ops/flagship_fused.make_fused_train_step) - replaces
        # grad + optimizer entirely (its own in-kernel nonfinite guard)
        self.train_step_fn = train_step_fn
        # tensor-parallel parameter placement over the mesh's 'model'
        # axis (e.g. parallel.sharding_rules.tp_param_shardings for the
        # wide RNA-seq layers); default: replicate params
        self.param_sharding_fn = param_sharding_fn
        self.state_every_n_epochs = state_every_n_epochs
        if debug_nans:
            # step-level NaN localization — the jit-world analogue of the
            # reference's torch detect_anomaly wrapper (scripts/_6:64)
            jax.config.update("jax_debug_nans", True)
        self.model = model
        # hyperparameter-lane mode: the model is RECONSTRUCTED inside the
        # traced program from per-lane scalars (curvature/beta/...), so S
        # grid cells train as vmapped lanes of ONE compiled program
        # (train/ensemble.py fit_lane_sweep). ``model`` stays as the
        # representative instance (shapes/defaults). Only the ensemble
        # path supports this — fit()/evaluate() raise.
        self.hp_model_fn = hp_model_fn
        if hp_model_fn is not None and (loss_fn or train_step_fn):
            raise ValueError("hp_model_fn does not compose with loss_fn/train_step_fn")
        if ema_decay is not None and train_step_fn is not None:
            # a full-step override replaces the optimizer chain entirely,
            # so the EMA (which lives in riemannian_adam's state) would
            # silently never update
            raise ValueError("ema_decay does not compose with train_step_fn")
        self.lr = float(lr if lr is not None else getattr(model, "lr", 1e-3))
        self.max_epochs = max_epochs
        self.seed = seed
        self.monitor = monitor
        self.callbacks = list(callbacks)
        self.check_finite = check_finite
        self.log_every_n_epochs = log_every_n_epochs
        # jax.profiler trace of epoch 1 (post-compile) -> TensorBoard/XProf
        # (the reference ships torch-tb-profiler but never wires it,
        # SURVEY section 5.1 — here it's a first-class flag)
        self.profile_dir = profile_dir
        # host-resident-data streaming (set by fit_streamed, never directly)
        self._stream_rows = None
        self._stream_reshuffle = "block_order"

        ball = getattr(model, "ball", None) or PoincareBall(c=1.0)
        # only learning_rate is injected (mutable without recompile);
        # everything else must stay a static Python value.
        # hyperparam_dtype pinned to f32: with bf16-stored params optax
        # would otherwise store learning_rate in bf16 (quantizing LR
        # values and breaking dtype agreement between the chunk
        # program's cond branches).
        self._moment_dtype = moment_dtype
        # parameter EMA: manifold leaves average in T_0 (exactly
        # on-manifold), Euclidean leaves linearly; lives in the optimizer
        # state so chunked programs / checkpoints / FSDP need no plumbing
        self._ema_decay = ema_decay
        self._optimizer = self._make_optimizer(ball)

        # deterministic epoch-indexed LR (beyond-reference; the reference
        # only ships plateau). The SAME f32 callable evaluates host-side
        # (K=1 loop) and inside the chunked in-graph program, so K=1 and
        # K>1 stay equivalent. When set, ReduceLROnPlateau is bypassed
        # (early stopping still runs); lane lr sweeps don't compose.
        self.lr_schedule = lr_schedule
        self._plateau_cfg = dict(
            lr=self.lr,
            factor=plateau_factor,
            patience=plateau_patience,
            min_lr=plateau_min_lr,
        )
        self._early_patience = early_stopping_patience
        self.plateau = ReduceLROnPlateau(**self._plateau_cfg)
        self.early_stopping = (
            EarlyStopping(patience=early_stopping_patience)
            if early_stopping_patience
            else None
        )
        # (n_train, batch_size, n_val) -> jitted epoch programs, so repeated
        # fit()/evaluate() calls (multi-seed studies) reuse XLA's compile cache
        self._epoch_fns_cache = {}
        self._body_fns_cache = {}  # unjitted bodies (filled by _build_epoch_fns)
        self._chunk_fn_cache = {}
        self._chunk_body_cache = {}  # unjitted chunk bodies (for vmapped ensembles)
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        self.metric_logger = MetricLogger(log_dir)
        self.checkpoint_dir = checkpoint_dir
        self._ckpt_mgr = None
        if checkpoint_dir:
            from hyperbolic_vae_tpu.train.checkpoint import CheckpointManager, model_hparams

            self._ckpt_mgr = CheckpointManager(checkpoint_dir, monitor=monitor)
            # embed the model's constructor config so checkpoints are
            # self-describing (restore_model rebuilds any model family)
            self._ckpt_mgr.model_config = model_hparams(model)

    # ------------------------------------------------------------------ #

    def _make_optimizer(self, ball):
        """The optimizer chain for a given manifold. ``ball`` may carry a
        TRACED curvature in hyperparameter-lane mode (constructed inside
        the traced program); the transformation itself is pure jnp."""
        return optax.inject_hyperparams(
            riemannian_adam,
            static_args=("ball", "b1", "b2", "eps", "weight_decay",
                         "moment_dtype", "ema_decay"),
            hyperparam_dtype=jnp.float32,
        )(learning_rate=self.lr, ball=ball, moment_dtype=self._moment_dtype,
          ema_decay=self._ema_decay)

    def _build_epoch_fns(self, n_train: int, batch_size: int, n_val: int):
        steps = n_train // batch_size
        model = self.model
        hp_model_fn = self.hp_model_fn
        if hp_model_fn is not None:
            # hyperparameter-lane mode: model + optimizer are functions of
            # the per-lane scalar dict ``hp`` (traced under vmap)
            def loss_metrics(p, batch, key, hp):
                return hp_model_fn(hp).apply(
                    {"params": p}, batch, method="loss", rngs={"sample": key}
                )

            def get_optimizer(hp):
                m = hp_model_fn(hp)
                return self._make_optimizer(
                    getattr(m, "ball", None) or PoincareBall(c=1.0)
                )

        else:
            base_loss = self.loss_fn or (
                lambda p, batch, key: model.apply(
                    {"params": p}, batch, method="loss", rngs={"sample": key}
                )
            )

            def loss_metrics(p, batch, key, hp):
                del hp
                return base_loss(p, batch, key)

            def get_optimizer(hp):
                del hp
                return self._optimizer

        shuffle = self.shuffle
        train_step_fn = self.train_step_fn
        grad_accum = self.grad_accum_steps
        grad_clip = self.grad_clip_norm
        if grad_accum > 1 and batch_size % grad_accum:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"grad_accum_steps {grad_accum}"
            )

        def grads_and_metrics(p, batch, sk, hp):
            """(loss, metrics, grads) for one optimizer step; with
            grad_accum>1 the batch is A equal microbatches scanned
            sequentially, grads/metrics accumulated in the carry (ONE
            microbatch of activations live at a time)."""
            if grad_accum == 1:
                def loss_fn(p_):
                    m = loss_metrics(p_, batch, sk, hp)
                    return m["loss_total"], m

                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(p)
                return loss, metrics, grads

            micro = batch.reshape(
                grad_accum, batch_size // grad_accum, *batch.shape[1:]
            )
            keys = jax.random.split(sk, grad_accum)
            m0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(loss_metrics, p, micro[0], keys[0], hp),
            )
            g0 = jax.tree.map(jnp.zeros_like, p)

            def micro_body(carry, xs):
                g_acc, m_acc = carry
                mb, mk = xs

                def loss_fn(p_):
                    m = loss_metrics(p_, mb, mk, hp)
                    return m["loss_total"], m

                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, m_acc, m),
                ), None

            (g_sum, m_sum), _ = jax.lax.scan(micro_body, (g0, m0), (micro, keys))
            inv = 1.0 / grad_accum
            metrics = jax.tree.map(lambda v: v * inv, m_sum)
            grads = jax.tree.map(lambda v: v * inv, g_sum)
            return metrics["loss_total"], metrics, grads

        def train_epoch(params, opt_state, x_all, key, hp=None):
            optimizer = get_optimizer(hp)
            perm_key, sample_key, off_key = jax.random.split(key, 3)
            if shuffle == "row":
                # exact reference semantics: fresh per-sample permutation
                perm = jax.random.permutation(perm_key, n_train)[: steps * batch_size]
                scan_xs = perm.reshape(steps, batch_size)
            else:
                # "block": each batch is a random contiguous window of the
                # (host-shuffled) dataset. Per-row gathers are DMA-latency
                # bound on TPU (~40ms/epoch at 60k x 784); one contiguous
                # dynamic_slice per step is ~2x faster end-to-end. Window
                # starts are uniform over [0, n-B], so batch composition
                # re-mixes every step/epoch.
                del off_key
                scan_xs = jax.random.randint(
                    perm_key, (steps,), 0, n_train - batch_size + 1
                )

            def step(carry, xs):
                params, opt_state, skey = carry
                skey, sk = jax.random.split(skey)
                if shuffle == "row":
                    batch = jnp.take(x_all, xs, axis=0, mode="clip")  # in-bounds by construction; default "fill" gather miscompiles on some TPU backends
                else:
                    batch = jax.lax.dynamic_slice_in_dim(x_all, xs, batch_size, axis=0)

                if train_step_fn is not None:
                    params, opt_state, metrics = train_step_fn(params, opt_state, batch, sk)
                    return (params, opt_state, skey), metrics

                loss, metrics, grads = grads_and_metrics(params, batch, sk, hp)
                gnorm = optax.global_norm(grads)
                if grad_clip is not None:
                    # one shared scale (torch clip_grad_norm_ semantics);
                    # a non-finite gnorm leaves grads non-finite and the
                    # ok-guard below skips the step as before
                    scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
                    grads = jax.tree.map(lambda g: g * scale, grads)
                # failure containment (SURVEY 5.2): a non-finite loss or
                # gradient skips the update instead of poisoning params —
                # the jit-world version of "probe_infnan then continue".
                ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
                updates, new_opt_state = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_params, params)
                opt_state = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
                )
                metrics = dict(metrics, skipped_steps=1.0 - ok.astype(jnp.float32))
                return (params, opt_state, skey), metrics

            (params, opt_state, _), ms = jax.lax.scan(
                step, (params, opt_state, sample_key), scan_xs
            )
            return params, opt_state, jax.tree.map(jnp.mean, ms)

        eval_batch = min(batch_size, n_val)
        eval_steps = max(n_val // eval_batch, 1)
        # the n_val % eval_batch tail is evaluated as its own (tiny) jitted
        # batch and folded in with an exact sample-count weighting, so the
        # monitored metric covers the FULL split like the reference's
        eval_rem = n_val - eval_steps * eval_batch

        def eval_scan(params, x_all, key, hp=None):
            idx = jnp.arange(eval_steps * eval_batch).reshape(eval_steps, eval_batch)

            def step(skey, batch_idx):
                skey, sk = jax.random.split(skey)
                batch = jnp.take(x_all, batch_idx, axis=0, mode="clip")
                m = loss_metrics(params, batch, sk, hp)
                return skey, m

            _, ms = jax.lax.scan(step, key, idx)
            return jax.tree.map(jnp.mean, ms)

        eval_scan_jit = jax.jit(eval_scan)
        eval_tail_jit = jax.jit(loss_metrics) if eval_rem else None
        mesh = self.mesh

        def eval_epoch(params, x_all, key):
            k_main, k_tail = jax.random.split(key)
            ms = eval_scan_jit(params, x_all, k_main)
            if eval_rem:
                start = eval_steps * eval_batch
                x_tail = x_all[start : start + eval_rem]
                if mesh is not None:
                    x_tail = jax.device_put(x_tail, replicated(mesh))
                tm = eval_tail_jit(params, x_tail, k_tail, None)
                w_main = (eval_steps * eval_batch) / n_val
                w_tail = eval_rem / n_val
                ms = jax.tree.map(lambda a, b: a * w_main + b * w_tail, ms, tm)
            return ms

        def eval_full(params, x_all, key, hp=None):
            """Fully in-graph eval incl. the tail fold — same math as
            eval_epoch (trace-safe for the chunked multi-epoch program)."""
            k_main, k_tail = jax.random.split(key)
            ms = eval_scan(params, x_all, k_main, hp)
            if eval_rem:
                start = eval_steps * eval_batch
                tm = loss_metrics(params, x_all[start : start + eval_rem], k_tail, hp)
                w_main = (eval_steps * eval_batch) / n_val
                w_tail = eval_rem / n_val
                ms = jax.tree.map(lambda a, b: a * w_main + b * w_tail, ms, tm)
            return ms

        donate = (0, 1)
        # unjitted in-graph bodies, the chunk program's building blocks
        self._body_fns_cache[(n_train, batch_size, n_val)] = (train_epoch, eval_full)
        return (
            jax.jit(train_epoch, donate_argnums=donate),
            eval_epoch,
        )

    def _stage(self, x: np.ndarray):
        x = jnp.asarray(x, dtype=jnp.float32)
        if self.mesh is not None:
            # pad to a multiple of the data-axis size for even sharding
            n_dev = self.mesh.shape["data"]
            rem = x.shape[0] % n_dev
            if rem:
                x = jnp.concatenate([x, x[: n_dev - rem]], axis=0)
            x = jax.device_put(x, data_sharding(self.mesh, x.ndim))
        return x

    def init_params(self, sample_batch, key=None):
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        variables = self.model.init(
            {"params": k1, "sample": k2}, jnp.asarray(sample_batch[:2])
        )
        params = variables["params"]
        if self.mesh is not None:
            if self.param_sharding_fn is not None:
                params = jax.device_put(params, self.param_sharding_fn(params, self.mesh))
            else:
                params = jax.device_put(params, replicated(self.mesh))
        return params

    # ------------------------------------------------------------------ #

    def _epoch_fns(self, n_train: int, batch_size: int, n_val: int):
        key = (n_train, batch_size, n_val)
        if key not in self._epoch_fns_cache:
            self._epoch_fns_cache[key] = self._build_epoch_fns(n_train, batch_size, n_val)
        return self._epoch_fns_cache[key]

    def _chunk_fn(self, n_train: int, batch_size: int, n_val: int, k: int):
        """K-epochs-in-one-dispatch program: scan of (train epoch + full
        val eval + best-params tracking + IN-GRAPH controllers).

        ReduceLROnPlateau and EarlyStopping run inside the compiled scan
        with the exact host semantics (optim/schedules.py), so chunked
        training is bit-identical to the K=1 loop for ANY K — including
        across LR drops and early stops. Epochs after an in-graph stop are
        skipped via lax.cond (no wasted FLOPs); the epoch counter freezes,
        which is how the host learns how many epochs actually ran.

        ``ctrl`` is a dict of scalars: the controller + best-tracking
        state threaded through chunks (see _fit_chunked for the fields).
        """
        # the schedule's values are baked into the traced program, so a
        # different schedule callable must compile a different program
        cache_key = (n_train, batch_size, n_val, k, self.lr_schedule)
        if cache_key in self._chunk_fn_cache:
            return self._chunk_fn_cache[cache_key]
        self._epoch_fns(n_train, batch_size, n_val)  # fills _body_fns_cache
        train_body, eval_full = self._body_fns_cache[(n_train, batch_size, n_val)]
        if not self.monitor.startswith("val/"):
            raise ValueError(
                f"epochs_per_dispatch>1 requires a val/ monitor, got {self.monitor}"
            )
        monitor_key = self.monitor.split("/", 1)[1]
        pl_factor = self._plateau_cfg["factor"]
        pl_patience = self._plateau_cfg["patience"]
        pl_min_lr = self._plateau_cfg["min_lr"]
        pl_threshold = self.plateau.threshold
        es_enabled = self._early_patience is not None
        es_patience = self._early_patience or 0
        es_min_delta = self.early_stopping.min_delta if es_enabled else 0.0
        lr_schedule = self.lr_schedule

        def chunk(params, opt_state, best_params, ctrl, x_train, x_val, key, hp=None):
            # abstract-eval (no FLOPs) the metric pytree structures so the
            # skip branch of the cond can emit NaN rows of matching shape
            tms_shape = jax.eval_shape(
                lambda p, o, kk: train_body(p, o, x_train, kk, hp)[2], params, opt_state, key
            )
            vms_shape = jax.eval_shape(lambda p, kk: eval_full(p, x_val, kk, hp), params, key)
            nan_of = lambda tree: jax.tree.map(
                lambda s: jnp.full(s.shape, jnp.nan, s.dtype), tree
            )

            def body(carry, _):
                params, opt_state, best_params, ctrl, key = carry
                key, ek, vk = jax.random.split(key, 3)  # same order as fit()
                active = ~ctrl["stopped"]
                # deterministic schedule (epoch-indexed, in-graph) takes
                # precedence over the plateau controller's lr
                if lr_schedule is not None:
                    lr_used = lr_schedule(ctrl["epoch"])
                else:
                    lr_used = ctrl["pl_lr"]

                def do_epoch(args):
                    params, opt_state, ek, vk, lr = args
                    # in-graph LR injection: same mechanism as the K=1
                    # loop's host-side hyperparams write, but per-epoch
                    opt_state = opt_state._replace(
                        hyperparams=dict(opt_state.hyperparams, learning_rate=lr)
                    )
                    params, opt_state, tms = train_body(params, opt_state, x_train, ek, hp)
                    vms = eval_full(params, x_val, vk, hp)
                    return params, opt_state, tms, vms

                def skip_epoch(args):
                    params, opt_state, *_ = args
                    return params, opt_state, nan_of(tms_shape), nan_of(vms_shape)

                params, opt_state, tms, vms = jax.lax.cond(
                    active, do_epoch, skip_epoch, (params, opt_state, ek, vk, lr_used)
                )

                mon = vms[monitor_key]
                finite = jnp.isfinite(mon) & active
                # best-model tracking (mirrors the K=1 host loop)
                better = finite & (mon < ctrl["best_val"])
                best_params = jax.tree.map(
                    lambda b, p: jnp.where(better, p, b), best_params, params
                )
                ctrl = dict(ctrl)
                ctrl["best_val"] = jnp.where(better, mon, ctrl["best_val"])
                ctrl["best_epoch"] = jnp.where(better, ctrl["epoch"], ctrl["best_epoch"])
                # ReduceLROnPlateau (torch rel-threshold min semantics)
                improved = mon < ctrl["pl_best"] * (1.0 - pl_threshold)
                pl_best = jnp.where(improved, mon, ctrl["pl_best"])
                pl_bad = jnp.where(improved, 0, ctrl["pl_bad"] + 1)
                trip = pl_bad > pl_patience
                # reductions only (torch eps-guard): a per-lane lr below
                # min_lr must never be RAISED to min_lr on a trip
                pl_cand = jnp.maximum(ctrl["pl_lr"] * pl_factor, pl_min_lr)
                pl_lr = jnp.where(
                    trip & (pl_cand < ctrl["pl_lr"]), pl_cand, ctrl["pl_lr"]
                )
                pl_bad = jnp.where(trip, 0, pl_bad)
                # controllers only step on finite monitors (K=1 parity)
                ctrl["pl_best"] = jnp.where(finite, pl_best, ctrl["pl_best"])
                ctrl["pl_bad"] = jnp.where(finite, pl_bad, ctrl["pl_bad"])
                ctrl["pl_lr"] = jnp.where(finite, pl_lr, ctrl["pl_lr"])
                if es_enabled:
                    es_improved = mon < ctrl["es_best"] - es_min_delta
                    es_best = jnp.where(es_improved, mon, ctrl["es_best"])
                    es_wait = jnp.where(es_improved, 0, ctrl["es_wait"] + 1)
                    ctrl["es_best"] = jnp.where(finite, es_best, ctrl["es_best"])
                    ctrl["es_wait"] = jnp.where(finite, es_wait, ctrl["es_wait"])
                    ctrl["stopped"] = ctrl["stopped"] | (
                        finite & (es_wait >= es_patience)
                    )
                # the stop epoch itself counts as run (K=1 records it)
                ctrl["epoch"] = ctrl["epoch"] + jnp.where(active, 1, 0)
                return (params, opt_state, best_params, ctrl, key), (tms, vms, lr_used)

            carry, ys = jax.lax.scan(
                body, (params, opt_state, best_params, ctrl, key), None, length=k
            )
            return carry + ys

        fn = jax.jit(chunk, donate_argnums=(0, 1, 2))
        # the UNJITTED body is reused by train/ensemble.py, which vmaps it
        # over a leading seed axis (multi-seed training in one program)
        self._chunk_body_cache[cache_key] = chunk
        self._chunk_fn_cache[cache_key] = fn
        return fn

    def _init_ctrl(self, start_epoch: int = 0) -> dict:
        """In-graph controller + best-tracking state for the chunk program
        (fields mirror optim/schedules.py; seeded from the possibly-resumed
        host controller mirrors)."""
        return {
            "best_val": jnp.asarray(jnp.inf, jnp.float32),
            "best_epoch": jnp.asarray(-1, jnp.int32),
            "epoch": jnp.asarray(start_epoch, jnp.int32),
            "pl_lr": jnp.asarray(self.plateau.lr, jnp.float32),
            "pl_best": jnp.asarray(self.plateau.best, jnp.float32),
            "pl_bad": jnp.asarray(self.plateau.num_bad_epochs, jnp.int32),
            "es_best": jnp.asarray(
                self.early_stopping.best if self.early_stopping else jnp.inf, jnp.float32
            ),
            "es_wait": jnp.asarray(
                self.early_stopping.wait if self.early_stopping else 0, jnp.int32
            ),
            "stopped": jnp.asarray(False),
        }

    def _make_streamed_epoch(self, dm: ArrayDataModule, block_rows: int, n_val: int,
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
        shuffled on-device within each block (self.shuffle semantics), i.e.
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
        if self.mesh is not None and block_rows % self.mesh.shape["data"]:
            raise ValueError("block_rows must shard evenly over the mesh 'data' axis")
        j_blocks = n_train // block_rows
        if j_blocks < 1:
            raise ValueError(f"block_rows {block_rows} > n_train {n_train}")
        if n_train % block_rows and self._stream_reshuffle == "block_order":
            logger.warning(
                "fit_streamed(block_order): the %d-row tail (n_train %% "
                "block_rows) is excluded from every epoch; pass "
                "reshuffle='rows' to mix it in",
                n_train - j_blocks * block_rows,
            )
        block_fn, _ = self._epoch_fns(block_rows, bs, n_val)
        mesh = self.mesh
        reshuffle = self._stream_reshuffle
        # seeded with start_epoch so a resumed run replays the SAME
        # block-order/row-assignment schedule an uninterrupted run uses
        epoch_counter = {"n": int(start_epoch)}

        def put(block_np):
            b = np.asarray(block_np, np.float32)
            if mesh is not None:
                return jax.device_put(b, data_sharding(mesh, b.ndim))
            return jax.device_put(b)

        from concurrent.futures import ThreadPoolExecutor

        def train_epoch(params, opt_state, _x_unused, key):
            e = epoch_counter["n"]
            epoch_counter["n"] += 1
            rng = np.random.default_rng((self.seed, 0x5EED, e))
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
                params, opt_state, ms = block_fn(params, opt_state, cur, kk)
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

    def fit_streamed(
        self,
        dm: ArrayDataModule,
        block_rows: int,
        params=None,
        resume: bool = False,
        reshuffle: str = "block_order",  # "block_order" | "rows"
    ) -> TrainResult:
        """``fit`` for training splits that do NOT fit in device HBM:
        ``dm.x_train`` stays on the host (numpy or np.memmap) and streams
        through the device in double-buffered blocks of ``block_rows``
        rows (see _make_streamed_epoch). Controllers, checkpointing,
        metrics and RNG discipline are the K=1 host loop's; with
        block_rows == n_train the history is bit-identical to ``fit``.

        Not composable with epochs_per_dispatch>1 (each epoch is already
        J dispatches) or hp_model_fn lanes. ``x_val`` stays device-
        resident — pass a subsampled val split at extreme scale."""
        assert reshuffle in ("block_order", "rows"), reshuffle
        if self.epochs_per_dispatch > 1:
            raise ValueError("fit_streamed does not compose with epochs_per_dispatch>1")
        self._stream_rows = int(block_rows)
        self._stream_reshuffle = reshuffle
        try:
            return self.fit(dm, params=params, resume=resume)
        finally:
            self._stream_rows = None

    def _external_stop(self) -> Optional[str]:
        """Graceful-stop reason, or None. Checked at epoch (K=1) / chunk
        (K>1) boundaries — the granularity at which resume state is
        consistent (a dispatch is never abandoned mid-flight)."""
        if self._shutdown is not None and self._shutdown.triggered:
            import signal as _signal

            return f"preemption signal {_signal.Signals(self._shutdown.signum).name}"
        if (
            self.max_wall_seconds is not None
            and time.monotonic() - self._fit_t0 > self.max_wall_seconds
        ):
            return f"wall-clock budget ({self.max_wall_seconds}s) exceeded"
        return None

    def _save_resume_state(self, params, opt_state, key, epoch: int) -> None:
        """Full resume state: params/opt/PRNG + host controller mirrors
        (fit(resume=True) restores all of it — bit-identical continuation)."""
        self._ckpt_mgr.save_state(
            {"params": params, "opt_state": opt_state, "key": key},
            {
                "epoch": epoch,
                "plateau_lr": self.plateau.lr,
                "plateau_best": self.plateau.best,
                "plateau_bad": self.plateau.num_bad_epochs,
                "early_best": self.early_stopping.best if self.early_stopping else 0.0,
                "early_wait": self.early_stopping.wait if self.early_stopping else 0,
            },
        )

    def fit(self, dm: ArrayDataModule, params=None, resume: bool = False) -> TrainResult:
        """See _fit_inner; this wrapper owns the graceful-stop machinery
        (preemption signals are installed only while fit runs)."""
        self._fit_t0 = time.monotonic()
        self._stop_reason = None
        if not self.preempt_signals:
            self._shutdown = None
            return self._fit_inner(dm, params=params, resume=resume)
        from hyperbolic_vae_tpu.train.preemption import GracefulShutdown

        with GracefulShutdown(self.preempt_signals) as shutdown:
            self._shutdown = shutdown
            try:
                return self._fit_inner(dm, params=params, resume=resume)
            finally:
                self._shutdown = None

    def _fit_inner(self, dm: ArrayDataModule, params=None, resume: bool = False) -> TrainResult:
        if self.hp_model_fn is not None:
            raise ValueError(
                "hp_model_fn trainers sweep hyperparameter LANES — use "
                "fit_lane_sweep; for a single config construct the model "
                "concretely and use a plain Trainer"
            )
        # fresh controller state per fit, so one Trainer can run several
        # fits (e.g. multi-seed parity) without leaking plateau/stop state
        self.plateau = ReduceLROnPlateau(**self._plateau_cfg)
        if self._early_patience:
            self.early_stopping = EarlyStopping(patience=self._early_patience)
        key = jax.random.PRNGKey(self.seed)
        key, init_key = jax.random.split(key)
        if params is None:
            params = self.init_params(dm.x_train, init_key)
        elif self.mesh is not None:
            # caller-provided params get the same placement init would
            params = jax.device_put(
                params,
                self.param_sharding_fn(params, self.mesh)
                if self.param_sharding_fn is not None
                else replicated(self.mesh),
            )
        opt_state = self._optimizer.init(params)
        if self.mesh is not None:
            # moments inherit their params' shardings (FSDP shards them
            # n_data-way; TP stops replicating model-sharded kernels'
            # moments); scalars/hyperparams replicated
            from hyperbolic_vae_tpu.parallel.sharding_rules import opt_state_shardings

            opt_state = jax.device_put(
                opt_state, opt_state_shardings(self._optimizer, opt_state, params, self.mesh)
            )

        start_epoch = 0
        if resume and self._ckpt_mgr and self._ckpt_mgr.has_state():
            state, meta = self._ckpt_mgr.restore_state(
                {"params": params, "opt_state": opt_state, "key": key}
            )
            if state is not None:
                params, opt_state, key = state["params"], state["opt_state"], state["key"]
                if self.mesh is not None:
                    # orbax commits the restored key to ITS target's device
                    # (single device 0); a committed single-device arg
                    # conflicts with the mesh-sharded params inside jit.
                    # params/opt_state already restored with the mesh
                    # shardings their targets carried.
                    key = jax.device_put(key, replicated(self.mesh))
                start_epoch = int(meta.get("epoch", -1)) + 1
                self.plateau.lr = float(meta.get("plateau_lr", self.plateau.lr))
                self.plateau.best = float(meta.get("plateau_best", self.plateau.best))
                self.plateau.num_bad_epochs = int(meta.get("plateau_bad", 0))
                if self.early_stopping:
                    self.early_stopping.best = float(
                        meta.get("early_best", self.early_stopping.best)
                    )
                    self.early_stopping.wait = int(meta.get("early_wait", 0))
                logger.info("resumed from epoch %d", start_epoch)

        n_train = int(dm.x_train.shape[0])
        n_val = int(dm.x_val.shape[0])
        stream_rows = getattr(self, "_stream_rows", None)
        if stream_rows:
            # host-resident training data (fit_streamed): blocks stream
            # through the device; never stage the whole split
            x_train = None
            train_epoch = self._make_streamed_epoch(
                dm, stream_rows, n_val, start_epoch=start_epoch
            )
            _, eval_epoch = self._epoch_fns(stream_rows, dm.batch_size, n_val)
        else:
            x_train = self._stage(dm.x_train)
            train_epoch, eval_epoch = self._epoch_fns(n_train, dm.batch_size, n_val)
        x_val = self._stage(dm.x_val)

        self.metric_logger.log_hparams(
            {
                "model": self.model,
                "lr": self.lr,
                "batch_size": dm.batch_size,
                "max_epochs": self.max_epochs,
                "dataset": dm.name,
            }
        )
        for cb in self.callbacks:
            if hasattr(cb, "on_fit_start"):
                cb.on_fit_start(self, dm)

        history = []
        best_metric = float("inf")
        # copy, not reference: params is donated to the first epoch call, so
        # if the monitor is never finite best_params must not alias freed HBM
        best_params = jax.tree.map(jnp.copy, params)
        steps = (
            train_epoch.steps_per_epoch if stream_rows else n_train // dm.batch_size
        )
        samples_per_epoch = steps * dm.batch_size
        total_samples = 0
        t_start = None  # set after the first (compile) epoch
        epochs_run = 0

        if self.epochs_per_dispatch > 1:
            return self._fit_chunked(
                dm, params, opt_state, key, x_train, x_val,
                n_train, start_epoch, history, best_params,
            )

        for epoch in range(start_epoch, self.max_epochs):
            if self.profile_dir and epoch == 1:
                jax.profiler.start_trace(self.profile_dir)
            key, ek, vk = jax.random.split(key, 3)
            if self.lr_schedule is not None:
                # same f32 callable the chunked program traces in-graph
                lr_epoch = float(jax.device_get(self.lr_schedule(epoch)))
            else:
                lr_epoch = self.plateau.lr
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr_epoch, jnp.float32
            )
            params, opt_state, train_ms = train_epoch(params, opt_state, x_train, ek)
            val_ms = eval_epoch(params, x_val, vk)
            # ONE batched host transfer per epoch: on the axon backend each
            # individual float() is a separate ~25 ms device round trip, so
            # per-scalar fetching costs ~7x25 ms/epoch (measured 108 vs 33
            # ms/epoch on the parity config); device_get fetches the whole
            # metric pytree in a single round trip
            train_ms, val_ms = jax.device_get((train_ms, val_ms))
            train_ms = {f"train/{k}": float(v) for k, v in train_ms.items()}
            val_ms = {f"val/{k}": float(v) for k, v in val_ms.items()}
            if self.profile_dir and epoch == 1:
                jax.profiler.stop_trace()
            metrics = {**train_ms, **val_ms, "lr": lr_epoch, "epoch": epoch}
            history.append(metrics)
            epochs_run = epoch + 1
            if t_start is None:
                t_start = time.perf_counter()  # exclude compile epoch
            else:
                total_samples += samples_per_epoch

            if epoch % self.log_every_n_epochs == 0:
                self.metric_logger.log_scalars(epoch, metrics)

            if self.check_finite and not np.isfinite(metrics["train/loss_total"]):
                logger.warning("non-finite train loss at epoch %d: %s", epoch, metrics)

            monitored = metrics.get(self.monitor)
            if monitored is not None and np.isfinite(monitored):
                if monitored < best_metric:
                    best_metric = monitored
                    # copy: the live params buffer is DONATED to the next
                    # epoch call — keeping a bare reference would leave
                    # best_params pointing at freed memory whenever the
                    # best epoch is not the last one
                    best_params = jax.tree.map(jnp.copy, params)
                    if self._ckpt_mgr:
                        self._ckpt_mgr.save_best(epoch, params, metrics)
                if self.lr_schedule is None:
                    self.plateau.step(monitored)
                if self.early_stopping and self.early_stopping.step(monitored):
                    logger.info("early stopping at epoch %d", epoch)
                    for cb in self.callbacks:
                        if hasattr(cb, "on_epoch_end"):
                            cb.on_epoch_end(self, epoch, params, metrics)
                    break

            for cb in self.callbacks:
                if hasattr(cb, "on_epoch_end"):
                    cb.on_epoch_end(self, epoch, params, metrics)

            saved_state = self._ckpt_mgr and (epoch + 1) % self.state_every_n_epochs == 0
            if saved_state:
                self._save_resume_state(params, opt_state, key, epoch)

            reason = self._external_stop()
            if reason:
                # graceful stop (preemption / wall budget): persist the
                # full resume state even off the state_every_n cadence,
                # then leave through the normal save-last/result path
                self._stop_reason = reason
                logger.warning("graceful stop after epoch %d: %s", epoch, reason)
                if self._ckpt_mgr and not saved_state:
                    self._save_resume_state(params, opt_state, key, epoch)
                break

        if self._ckpt_mgr:
            self._ckpt_mgr.save_last(epochs_run - 1, params, history[-1] if history else {})
            self._save_ema_checkpoint(opt_state, epochs_run - 1)
            # saves are async (background commit thread): fit() returning
            # is the durability point callers rely on (copying the run
            # dir, exiting the process)
            self._ckpt_mgr.wait_until_finished()
        elapsed = max(time.perf_counter() - t_start, 1e-9) if t_start else 1e-9
        sps = total_samples / elapsed if total_samples else 0.0
        self.metric_logger.close()
        return TrainResult(
            params=params,
            best_params=best_params,
            history=history,
            best_metric=best_metric,
            epochs_run=epochs_run,
            samples_per_sec=sps,
            ema_params=(ema_params(opt_state)
                        if self._ema_decay is not None else None),
            interrupted=self._stop_reason is not None,
            stop_reason=self._stop_reason,
        )

    def _save_ema_checkpoint(self, opt_state, epoch: int) -> None:
        """The Polyak-averaged weights as their own self-describing
        checkpoint: restore_model(dir, "ema") serves/evals them like any
        other (docs/API.md, --ema-decay on every CLI)."""
        if self._ema_decay is None:
            return
        self._ckpt_mgr.save_named(
            "ema", ema_params(opt_state),
            {"epoch": epoch, "ema_decay": self._ema_decay},
        )

    def _fit_chunked(
        self, dm, params, opt_state, key, x_train, x_val,
        n_train, start_epoch, history, best_params,
    ) -> TrainResult:
        """K-epochs-per-dispatch fit loop (epochs_per_dispatch > 1).

        Per-epoch metrics, best-params tracking, ReduceLROnPlateau and
        EarlyStopping ALL run in-graph inside the chunk program with the
        exact K=1 host semantics, so histories (incl. per-epoch LR) are
        bit-identical to the K=1 loop for any K, the stop epoch is the
        same, and the tail chunk never trains past max_epochs (the final
        chunk is compiled at the trimmed length). The host's job here is
        logging, checkpointing and callback dispatch only."""
        k = self.epochs_per_dispatch
        n_val = int(dm.x_val.shape[0])
        steps = n_train // dm.batch_size
        samples_per_epoch = steps * dm.batch_size
        best_metric = float("inf")
        total_samples = 0
        t_start = None
        epochs_run = start_epoch
        ctrl = self._init_ctrl(start_epoch)

        for chunk_start in range(start_epoch, self.max_epochs, k):
            # trim the final chunk so training NEVER runs past max_epochs
            # (the compile cache is keyed by k, so only the tail length
            # costs one extra compile)
            k_eff = min(k, self.max_epochs - chunk_start)
            chunk_fn = self._chunk_fn(n_train, dm.batch_size, n_val, k_eff)
            params, opt_state, best_params, ctrl, key, tms, vms, lrs = chunk_fn(
                params, opt_state, best_params, ctrl, x_train, x_val, key
            )
            tms, vms, lrs, ctrl_host = jax.device_get((tms, vms, lrs, ctrl))
            if t_start is None:
                t_start = time.perf_counter()  # exclude the compile chunk
            epochs_this_chunk = int(ctrl_host["epoch"]) - chunk_start
            if t_start is not None and chunk_start != start_epoch:
                total_samples += samples_per_epoch * epochs_this_chunk
            stop = bool(ctrl_host["stopped"])
            # sync the host controller mirrors (resume metadata + hparams)
            self.plateau.lr = float(ctrl_host["pl_lr"])
            self.plateau.best = float(ctrl_host["pl_best"])
            self.plateau.num_bad_epochs = int(ctrl_host["pl_bad"])
            if self.early_stopping:
                self.early_stopping.best = float(ctrl_host["es_best"])
                self.early_stopping.wait = int(ctrl_host["es_wait"])
                self.early_stopping.stopped = stop

            best_row = None  # (epoch, metrics) of the best epoch in this chunk
            for i in range(epochs_this_chunk):
                epoch = chunk_start + i
                metrics = {f"train/{m}": float(v[i]) for m, v in tms.items()}
                metrics.update({f"val/{m}": float(v[i]) for m, v in vms.items()})
                metrics.update(lr=float(lrs[i]), epoch=epoch)
                history.append(metrics)
                epochs_run = epoch + 1
                if epoch % self.log_every_n_epochs == 0:
                    self.metric_logger.log_scalars(epoch, metrics)
                if self.check_finite and not np.isfinite(metrics["train/loss_total"]):
                    logger.warning("non-finite train loss at epoch %d", epoch)
                monitored = metrics.get(self.monitor)
                if monitored is not None and np.isfinite(monitored):
                    if monitored < best_metric:
                        best_metric = monitored
                        best_row = (epoch, metrics)
            if stop:
                logger.info("early stopping at epoch %d (in-graph)", epochs_run - 1)

            if best_row is not None and self._ckpt_mgr:
                # best_params is tracked in-graph; copy so the async save
                # never races the next dispatch's donation of the buffer.
                # The in-graph best_epoch must agree with the host scan of
                # the recorded history — a mismatch means label/content
                # drift, so fail loudly rather than save a mislabeled best.
                assert int(ctrl_host["best_epoch"]) == best_row[0], (
                    int(ctrl_host["best_epoch"]),
                    best_row[0],
                )
                self._ckpt_mgr.save_best(
                    best_row[0], jax.tree.map(jnp.copy, best_params), best_row[1]
                )
            for cb in self.callbacks:
                if hasattr(cb, "on_epoch_end"):
                    cb.on_epoch_end(self, epochs_run - 1, params, history[-1])
            if self._ckpt_mgr:
                self._save_resume_state(params, opt_state, key, epochs_run - 1)
            if stop:
                break
            reason = self._external_stop()
            if reason:
                # graceful stop at chunk granularity: resume state for
                # this chunk is already saved above
                self._stop_reason = reason
                logger.warning(
                    "graceful stop after epoch %d: %s", epochs_run - 1, reason
                )
                break

        if self._ckpt_mgr:
            self._ckpt_mgr.save_last(epochs_run - 1, params, history[-1] if history else {})
            self._save_ema_checkpoint(opt_state, epochs_run - 1)
            # saves are async (background commit thread): fit() returning
            # is the durability point callers rely on (copying the run
            # dir, exiting the process)
            self._ckpt_mgr.wait_until_finished()
        elapsed = max(time.perf_counter() - t_start, 1e-9) if t_start else 1e-9
        sps = total_samples / elapsed if total_samples else 0.0
        self.metric_logger.close()
        return TrainResult(
            params=params,
            best_params=best_params,
            history=history,
            best_metric=best_metric,
            epochs_run=epochs_run,
            samples_per_sec=sps,
            ema_params=(ema_params(opt_state)
                        if self._ema_decay is not None else None),
            interrupted=self._stop_reason is not None,
            stop_reason=self._stop_reason,
        )

    def fit_ensemble(self, dm: ArrayDataModule, seeds: Sequence[int],
                     epochs_per_dispatch: Optional[int] = None,
                     seed_mesh=None) -> list:
        """Train one independent model PER SEED simultaneously: the chunk
        program vmapped over a leading seed axis (see train/ensemble.py).
        Returns a list of TrainResult, one per seed, each matching what a
        sequential ``fit`` with that seed produces. ``seed_mesh`` (a 1-D
        Mesh over 'seed', parallel.make_seed_mesh) shards the lanes
        across devices — zero-collective sweep scale-out."""
        from hyperbolic_vae_tpu.train.ensemble import fit_ensemble

        return fit_ensemble(self, dm, seeds, epochs_per_dispatch, seed_mesh=seed_mesh)

    def fit_lane_sweep(self, dm: ArrayDataModule, lanes: Sequence[dict],
                       epochs_per_dispatch: Optional[int] = None,
                       seed_mesh=None) -> list:
        """Hyperparameter-lane sweep: every lane (a dict of scalars, e.g.
        curvature/beta/lr/seed) trains its own model inside ONE vmapped
        program. Requires ``Trainer(hp_model_fn=...)``; see
        train/ensemble.py:fit_lane_sweep."""
        if self.lr_schedule is not None and any("lr" in lane for lane in lanes):
            # a single baked schedule would silently override every
            # lane's lr — the sweep's whole point
            raise ValueError("lr_schedule does not compose with per-lane lr sweeps")
        from hyperbolic_vae_tpu.train.ensemble import fit_lane_sweep

        return fit_lane_sweep(self, dm, lanes, epochs_per_dispatch, seed_mesh=seed_mesh)

    # ------------------------------------------------------------------ #

    def evaluate(
        self,
        dm: ArrayDataModule,
        params,
        split: str = "test",
        stream_block_rows: Optional[int] = None,
    ) -> dict:
        """Mean loss metrics over a split. ``stream_block_rows`` evaluates
        host-resident splits larger than HBM in blocks (exact
        sample-count weighting; the per-block sample-RNG stream differs
        from the resident path's single stream, so MC metrics agree in
        distribution, not bitwise)."""
        if self.hp_model_fn is not None:
            raise ValueError(
                "evaluate needs a concrete model; rebuild one from the "
                "lane's hparams with a plain Trainer"
            )
        x_host = getattr(dm, f"x_{split}")
        n = int(x_host.shape[0])
        if stream_block_rows and stream_block_rows < n:
            m = int(stream_block_rows)
            key = jax.random.PRNGKey(self.seed + 1)
            acc, seen = None, 0
            for start in range(0, n, m):
                blk = np.asarray(x_host[start : start + m], np.float32)
                r = len(blk)
                _, eval_ep = self._epoch_fns(max(r, dm.batch_size), dm.batch_size, r)
                key, k = jax.random.split(key)
                ms = jax.device_get(eval_ep(params, self._stage(blk), k))
                acc = (
                    {mk: float(v) * r for mk, v in ms.items()}
                    if acc is None
                    else {mk: acc[mk] + float(ms[mk]) * r for mk in acc}
                )
                seen += r
            return {f"{split}/{mk}": v / seen for mk, v in acc.items()}
        x = self._stage(x_host)
        _, eval_epoch = self._epoch_fns(
            max(n, dm.batch_size), dm.batch_size, n
        )
        ms = jax.device_get(eval_epoch(params, x, jax.random.PRNGKey(self.seed + 1)))
        return {f"{split}/{k}": float(v) for k, v in ms.items()}

    def evaluate_iwae(
        self,
        dm: ArrayDataModule,
        params,
        k: int = 5000,
        split: str = "test",
        batch_chunk: int = 256,
        k_chunk: int = 500,
    ) -> float:
        """Mean K-importance-weighted log p(x) bound over a split — the
        reference's written follow-up ("report IWAE loss for each model
        on test set", vae_hyperbolic_gyroplane_decoder.py:37-40), for any
        model exposing ``iwae(x, k)`` (all VAE families; models/iwae.py).

        Memory-bounded two-axis chunking: the split streams in
        ``batch_chunk`` rows, K in ``k_chunk`` independent sample chunks
        recombined EXACTLY via logsumexp (combine_chunked_bounds) —
        K=5000 at any data width without a (K, B, D) materialization."""
        from hyperbolic_vae_tpu.models.iwae import combine_chunked_bounds

        if self.hp_model_fn is not None:
            raise ValueError(
                "evaluate_iwae needs a concrete model; rebuild one from "
                "the lane's hparams with a plain Trainer"
            )
        x_host = np.asarray(getattr(dm, f"x_{split}"), np.float32)
        ks = [k_chunk] * (k // k_chunk) + ([k % k_chunk] if k % k_chunk else [])
        fns = {}  # one compiled program per distinct k chunk size

        def fn_for(kc):
            if kc not in fns:
                fns[kc] = jax.jit(
                    lambda p, xb, key: self.model.apply(
                        {"params": p}, xb, kc, method="iwae",
                        rngs={"sample": key},
                    )
                )
            return fns[kc]

        key = jax.random.PRNGKey(self.seed + 2)
        total, n = 0.0, int(x_host.shape[0])
        for start in range(0, n, batch_chunk):
            xb = jnp.asarray(x_host[start : start + batch_chunk])
            bounds = []
            for kc in ks:
                key, sub = jax.random.split(key)
                bounds.append(fn_for(kc)(params, xb, sub))
            combined = combine_chunked_bounds(bounds, ks)
            total += float(jnp.sum(combined))
        return total / n

    def evaluate_probe(self, dm: ArrayDataModule, params, k: int = 10,
                       train_split: str = "train", eval_split: str = "test",
                       max_train: int = 20000) -> dict:
        """Latent-space probe accuracies (probe.py): kNN + nearest
        Fréchet mean under the model's latent metric, on posterior-mean
        embeddings from the padded encode_split path. ``max_train``
        bounds the reference set (seeded subsample) so the distance
        blocks stay MXU-sized at MNIST scale."""
        from hyperbolic_vae_tpu.probe import knn_accuracy, nearest_mean_accuracy

        z_tr, y_tr = self.encode_split(dm, params, train_split)
        if len(z_tr) > max_train:
            idx = np.random.default_rng(self.seed).choice(
                len(z_tr), max_train, replace=False
            )
            z_tr, y_tr = z_tr[idx], np.asarray(y_tr)[idx]
        z_te, y_te = self.encode_split(dm, params, eval_split)
        ball = getattr(self.model, "ball", None)
        return {
            f"{eval_split}/probe_knn{k}_acc": float(
                knn_accuracy(z_tr, y_tr, z_te, y_te, ball=ball, k=k)
            ),
            f"{eval_split}/probe_nearest_mean_acc": float(
                nearest_mean_accuracy(z_tr, y_tr, z_te, y_te, ball=ball)
            ),
        }

    def encode_split(self, dm: ArrayDataModule, params, split: str = "val",
                     batch_size: Optional[int] = None):
        """Posterior means for a split (for latent-space visualization).

        Runs through serve.Inferencer's padded fixed-batch path, so the
        memory high-water mark is one batch of activations — a 50k-row
        20k-gene split encodes without materializing a single giant
        apply. The Inferencer (and its compiled programs) is cached on
        the Trainer; params are swapped in per call."""
        if self.hp_model_fn is not None:
            # silently embedding lane params with the REPRESENTATIVE
            # model's curvature would be wrong for every other lane
            raise ValueError(
                "encode_split needs a concrete model; rebuild one from "
                "the lane's hparams with a plain Trainer"
            )
        x = np.asarray(getattr(dm, f"x_{split}"), np.float32)
        bs = int(batch_size or dm.batch_size)
        if self.mesh is not None:
            # match Inferencer's rounding so the cache check agrees: the
            # serving batch must shard evenly over the 'data' axis even
            # when the TRAINING batch (gathered in-graph) need not
            n_data = self.mesh.shape["data"]
            bs = -(-bs // n_data) * n_data
        inf = getattr(self, "_encode_inferencer", None)
        if inf is None or inf.batch_size != bs:
            from hyperbolic_vae_tpu.serve import Inferencer

            inf = Inferencer(self.model, params, batch_size=bs, mesh=self.mesh)
            self._encode_inferencer = inf
        else:
            if self.mesh is not None:
                params = jax.device_put(params, replicated(self.mesh))
            inf.params = params
        mu = inf.embed(x)
        # keep the compiled programs cached but release the params (a
        # replicated copy under a mesh) — otherwise a one-off encode pins
        # a full parameter tree in HBM for the Trainer's lifetime
        inf.params = None
        return np.asarray(mu), np.asarray(getattr(dm, f"y_{split}"))
