"""Serving: fixed-shape batched inference over trained checkpoints.

The reference has no deployment story (its closest analogue is calling
``pl_module.reconstruct`` inside a callback,
/root/reference/hyperbolic_vae/training/generate_callback.py:23-35).
This framework is built for production TPU serving, where the rules are
different from training:

  * XLA compiles per input shape — a server must run a bounded set of
    fixed shapes and pad, or it recompiles (seconds to minutes on a
    remote relay) on every ragged request. Request sizes are BUCKETED
    to powers of two: sub-batch row counts below ``batch_size`` (so a
    1-row request at production width pads to 1 row, not to a 21 MB
    batch), then whole batches up to ``max_batches_per_dispatch``. An
    adversarial ragged stream compiles at most log2(B)+log2(cap)+1
    programs per method; ``warmup()`` primes the whole set.
  * Dispatch round trips dominate small requests (~25-30 ms each on the
    axon tunnel), so a k-batch request runs as ONE lax.map program —
    sequential per-batch dispatches do not pipeline there. Large
    requests are then host<->device TRANSFER-bound on tunneled devices
    (~13 MB moved for a 2048-image reconstruct), which no dispatch
    strategy fixes; on directly-attached TPUs the same design is
    PCIe/DMA-bound far later.
  * Donation would free the params between calls; serving params are
    held resident and never donated.

``Inferencer`` wraps any model family (everything exposing the repo's
``encode`` / ``decode`` / ``reconstruct`` method protocol — CLAUDE.md
conventions) behind a padded fixed-batch jit program; ``from_checkpoint``
builds one straight from a self-describing Orbax checkpoint
(train/checkpoint.py:54, restore_model).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def model_data_shape(model) -> tuple:
    """Per-sample feature shape of a model's INPUT, by the repo's model
    conventions (data_shape on image families, input_size/in_features on
    the 1-D families). Raises on a model exposing none — a silent wrong
    shape would propagate into warmup/export/manifests."""
    shape = (
        getattr(model, "data_shape", None)
        or getattr(model, "input_size", None)
        or getattr(model, "in_features", None)
    )
    if not shape:
        raise AttributeError(
            f"{type(model).__name__} exposes none of data_shape/"
            "input_size/in_features — pass data_shape explicitly"
        )
    return (shape,) if isinstance(shape, int) else tuple(shape)


class Inferencer:
    """Fixed-batch, padded, jit-compiled inference endpoint.

    methods: "encode" (posterior mean [+ scale]), "decode", "reconstruct",
    or any other zero-RNG method the model exposes via ``model.apply``.
    Stochastic paths (rsample) are deliberately excluded: serving is
    deterministic (the posterior MEAN is the embedding the reference's
    figures use, vae_euclidean.py:237-303). The one sampling endpoint,
    ``generate(n, seed)``, keeps that property by deriving every batch's
    key from the CLIENT-supplied seed — replayable by construction.
    """

    # endpoints whose INPUT / OUTPUT arrays are data-shaped (the big ones
    # worth shrinking on the wire); latent-shaped arrays stay f32
    _DATA_IN = ("encode", "reconstruct")
    _DATA_OUT = ("decode", "reconstruct", "generate")

    def __init__(self, model, params, batch_size: int = 256, mesh=None,
                 max_batches_per_dispatch: int = 16, io_dtype=None,
                 sub_batch_buckets: bool = True):
        self.model = model
        self.batch_size = int(batch_size)
        self.mesh = mesh
        # Half-precision WIRE format (io_dtype="float16" or "bfloat16"):
        # data-shaped arrays cross the host<->device link at half width —
        # inputs are cast host-side BEFORE the transfer, the compiled
        # program upcasts to f32 at entry (all model math stays f32), and
        # data-shaped outputs come back half and are restored to float32
        # numpy on the host (the public API dtype never changes). Latent-
        # shaped arrays (encode outputs, decode inputs) stay f32: they are
        # tiny and precision-sensitive. Production-width serving is
        # transfer-bound (a 2048x20480-gene reconstruct moves 336 MB f32;
        # benchmarks/BENCH_SERVE.json) — this halves it. float16 keeps 11
        # mantissa bits (~5e-4 relative on z-scored data / [0,1] images)
        # and is the recommended setting; bfloat16 is offered for range.
        if io_dtype is not None:
            io_dtype = jnp.dtype(io_dtype)
            if io_dtype not in (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16)):
                raise ValueError(
                    f"io_dtype must be float16 or bfloat16, got {io_dtype}"
                )
        self.io_dtype = io_dtype
        if mesh is not None:
            from hyperbolic_vae_tpu.parallel.mesh import replicated

            # the batch axis is device_put over 'data': round the serving
            # batch up so every dispatch shards evenly (uneven device_put
            # raises; requests are padded to full batches anyway)
            n_data = mesh.shape["data"]
            self.batch_size = -(-self.batch_size // n_data) * n_data
            params = jax.device_put(params, replicated(mesh))
        self.params = params  # resident, never donated
        self._compiled = {}
        # guards the check-then-insert on _compiled: endpoints (and
        # library users) may build programs from multiple request
        # threads — two racing builders would each trace a DISTINCT jit
        # object and pay the seconds-to-minutes relay compile twice.
        # RLock: _fn_k/_fn_rows compose the base _fn while holding it.
        import threading

        self._compile_lock = threading.RLock()
        # k-batch requests are bucketed to powers of two up to this cap,
        # so the compile cache holds at most log2(cap)+1 programs per
        # method no matter how ragged the request stream is (each compile
        # is seconds-to-minutes through a remote relay). Requests larger
        # than cap*batch_size run as several full-cap dispatches.
        assert max_batches_per_dispatch >= 1
        self.max_batches_per_dispatch = int(max_batches_per_dispatch)
        self._buckets = []
        b = 1
        while b < self.max_batches_per_dispatch:
            self._buckets.append(b)
            b *= 2
        self._buckets.append(self.max_batches_per_dispatch)
        # Sub-batch ROW buckets: a request smaller than one batch pads to
        # the next power-of-two row count, not to the full batch — a
        # 1-row request at 20,480 genes moves 80 KB instead of the 21 MB
        # padded batch (transfer is the serving bottleneck at production
        # width, benchmarks/BENCH_SERVE.json), at the cost of log2(B)
        # extra programs per method (primed by warmup() like the rest).
        # Disabled under a mesh (sub-batch rows can't shard the 'data'
        # axis evenly).
        self.sub_batch_buckets = bool(sub_batch_buckets) and mesh is None
        self._row_buckets = []
        if self.sub_batch_buckets:
            r = 1
            while r < self.batch_size:
                self._row_buckets.append(r)
                r *= 2

    def _row_bucket(self, n: int):
        """Smallest sub-batch row bucket >= n (None: use full batches)."""
        for r in self._row_buckets:
            if r >= n:
                return r
        return None

    def _bucket(self, k: int) -> int:
        """Smallest bucket >= k (the caller splits k above the cap)."""
        for b in self._buckets:
            if b >= k:
                return b
        return self.max_batches_per_dispatch

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, name: str = "best",
                        batch_size: int = 256, mesh=None,
                        max_batches_per_dispatch: int = 16,
                        io_dtype=None,
                        sub_batch_buckets: bool = True) -> "Inferencer":
        from hyperbolic_vae_tpu.train.checkpoint import restore_model

        model, params, _meta = restore_model(ckpt_dir, name)
        return cls(model, params, batch_size=batch_size, mesh=mesh,
                   max_batches_per_dispatch=max_batches_per_dispatch,
                   io_dtype=io_dtype, sub_batch_buckets=sub_batch_buckets)

    # ------------------------------------------------------------------ #

    def _wire_in_dtype(self, method: str):
        """Dtype a request array for ``method`` crosses the wire in."""
        if self.io_dtype is not None and method in self._DATA_IN:
            return self.io_dtype
        return jnp.dtype(jnp.float32)

    @staticmethod
    def _host_restore(a) -> np.ndarray:
        """Fetched output -> float32 numpy (half wire dtypes upcast)."""
        a = np.asarray(a)
        if a.dtype in (np.dtype(jnp.float16), np.dtype(jnp.bfloat16)):
            return a.astype(np.float32)
        return a

    def _fn(self, method: str):
        with self._compile_lock:
            return self._fn_locked(method)

    def _fn_locked(self, method: str):
        if method not in self._compiled:
            model = self.model
            out_dtype = (self.io_dtype if self.io_dtype is not None
                         and method in self._DATA_OUT else None)

            if method == "reconstruct":
                # deterministic serving semantics: decode the posterior
                # MEAN (model.reconstruct rsamples, which is a training/
                # visualization behavior, not an endpoint)
                def apply(params, x):
                    x = x.astype(jnp.float32)  # wire dtype -> compute dtype
                    out = model.apply({"params": params}, x, method="encode")
                    mu = out[0] if isinstance(out, tuple) else out
                    out = model.apply({"params": params}, mu, method="decode")
                    return (out if out_dtype is None
                            else jax.tree.map(lambda a: a.astype(out_dtype), out))

            else:
                def apply(params, x):
                    x = x.astype(jnp.float32)
                    out = model.apply({"params": params}, x, method=method)
                    return (out if out_dtype is None
                            else jax.tree.map(lambda a: a.astype(out_dtype), out))

            self._compiled[method] = jax.jit(apply)
        return self._compiled[method]

    def _fn_rows(self, method: str, r: int):
        """Program for a sub-batch dispatch of r rows. The live Inferencer
        reuses the base jit (which retraces per input shape); the cache
        key exists so bounds/warmup accounting and ExportedInferencer's
        fixed-shape programs line up."""
        key = (method, "r", r)
        with self._compile_lock:
            if key not in self._compiled:
                self._compiled[key] = self._fn_locked(method)
            return self._compiled[key]

    def _smallest_ready_rows(self, method: str):
        """Smallest row count some already-available program for
        ``method`` accepts (None if nothing is available yet) — empty
        requests route through it instead of compiling a fresh shape."""
        with self._compile_lock:
            keys = list(self._compiled)
        rows = [k[2] for k in keys
                if isinstance(k, tuple) and len(k) == 3 and k[:2] == (method, "r")]
        if rows:
            return min(rows)
        if method in self._compiled:
            return self.batch_size
        return None

    def _fn_k(self, method: str, k: int):
        """ONE compiled program for a k-batch request: lax.map over the
        (k, B, ...) stack, so a request of any size costs a single device
        round trip (sequential per-batch dispatches do NOT pipeline on
        the axon tunnel — measured ~50 ms each). Cached per (method, k);
        warmup() can prime common sizes."""
        assert k > 1, "single-batch requests go through _fn directly"
        key = (method, k)
        with self._compile_lock:
            if key not in self._compiled:
                apply = self._fn_locked(method)

                def apply_k(params, xk):
                    return jax.lax.map(lambda xb: apply(params, xb), xk)

                self._compiled[key] = jax.jit(apply_k)
            return self._compiled[key]

    def _dispatch(self, method: str, x: np.ndarray, n_keep: int):
        """Run one bucketed dispatch: pad the row count up to bucket*B
        (repeating row 0; padded outputs discarded), run the k-batch
        program, fetch once, trim to n_keep rows."""
        b = self.batch_size
        # cast on the HOST so half io_dtype halves the bytes transferred
        # (jnp.asarray of an already-cast numpy array ships it verbatim)
        x = np.asarray(x, np.dtype(self._wire_in_dtype(method)))
        r = self._row_bucket(x.shape[0])
        if r is not None:
            # sub-batch request: pad to the row bucket, not the full batch
            pad = r - x.shape[0]
            if pad:
                x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)], 0)
            out = jax.device_get(self._fn_rows(method, r)(self.params, jnp.asarray(x)))
            return jax.tree.map(lambda a: self._host_restore(a)[:n_keep], out)
        k = self._bucket(max((x.shape[0] + b - 1) // b, 1))
        pad = k * b - x.shape[0]
        if pad:
            x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)], 0)
        if k > 1:
            xk = jnp.asarray(x.reshape((k, b) + x.shape[1:]))
            if self.mesh is not None:
                # shard the BATCH axis (axis 1: lax.map iterates axis 0)
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = P(None, "data", *([None] * (xk.ndim - 2)))
                xk = jax.device_put(xk, NamedSharding(self.mesh, spec))
            out = self._fn_k(method, k)(self.params, xk)
            return jax.tree.map(
                lambda a: self._host_restore(a).reshape(
                    (k * b,) + a.shape[2:])[:n_keep],
                jax.device_get(out),
            )
        xb = jnp.asarray(x)
        if self.mesh is not None:
            from hyperbolic_vae_tpu.parallel.mesh import data_sharding

            xb = jax.device_put(xb, data_sharding(self.mesh, xb.ndim))
        out = jax.device_get(self._fn(method)(self.params, xb))
        return jax.tree.map(lambda a: self._host_restore(a)[:n_keep], out)

    def _run_padded(self, method: str, x: np.ndarray):
        """Serve a request of any size within the bounded program set:
        full-cap dispatches for the bulk, one bucketed dispatch for the
        remainder."""
        n = x.shape[0]
        if n == 0:
            # run zero rows through an ALREADY-AVAILABLE program (smallest
            # row-bucket/batch shape compiled so far) and trim — an empty
            # request must not compile a fresh out-of-bucket program
            rows = self._smallest_ready_rows(method)
            if rows is None:
                rows = self._row_buckets[0] if self._row_buckets else 1
            x = np.zeros((rows,) + tuple(x.shape[1:]), np.float32)
            return self._dispatch(method, x, 0)
        cap_rows = self.max_batches_per_dispatch * self.batch_size
        if n <= cap_rows:
            return self._dispatch(method, x, n)
        pieces = []
        for start in range(0, n, cap_rows):
            piece = x[start : start + cap_rows]
            pieces.append(self._dispatch(method, piece, piece.shape[0]))
        return jax.tree.map(lambda *parts: np.concatenate(parts, axis=0), *pieces)

    # ------------------------------------------------------------------ #

    def _gen_fn(self):
        """Compiled (params, key) -> one generated batch. The key is a
        legacy uint32[2] PRNG key ARRAY (not an opaque typed key), so the
        same program exports to a StableHLO bundle unchanged."""
        with self._compile_lock:
            if "generate" not in self._compiled:
                model, b = self.model, self.batch_size
                out_dtype = self.io_dtype  # generate output is data-shaped

                def apply(params, key):
                    out = model.apply(
                        {"params": params}, b, method="generate",
                        rngs={"sample": key},
                    )
                    return (out if out_dtype is None
                            else jax.tree.map(lambda a: a.astype(out_dtype), out))

                self._compiled["generate"] = jax.jit(apply)
            return self._compiled["generate"]

    def _gen_fn_k(self, k: int):
        assert k > 1
        key = ("generate", k)
        apply = self._gen_fn()
        with self._compile_lock:
            if key not in self._compiled:

                def apply_k(params, keys):
                    return jax.lax.map(lambda kk: apply(params, kk), keys)

                self._compiled[key] = jax.jit(apply_k)
            return self._compiled[key]

    def supports_method(self, method: str) -> bool:
        """True when this engine can serve ``method``. The HTTP front-end
        checks this UP FRONT so capability gaps answer 404 without
        relying on exception classes leaking out of inference code (an
        incidental AttributeError/KeyError inside a traced apply must
        stay a 500 server fault, not masquerade as a missing route)."""
        if method == "generate":
            # models/sampling.py wires generate onto the VAE families;
            # the non-variational Autoencoder has no prior to sample
            return callable(getattr(self.model, "generate", None))
        return method in ("encode", "embed", "decode", "reconstruct")

    def generate(self, n: int, seed: int = 0) -> np.ndarray:
        """n decoded latent-prior samples (models/sampling.py), served
        with the serving-grade determinism the other endpoints have: the
        same (n, seed) always returns the same rows, and batch i draws
        from fold_in(PRNGKey(seed), i) — so growing n only APPENDS rows,
        it never reshuffles the ones already served. Bucketed identically
        to the x-endpoints (bounded compile set)."""
        b = self.batch_size
        base = jax.random.PRNGKey(int(seed))
        n_batches = max(-(-int(n) // b), 1)
        cap = self.max_batches_per_dispatch
        # one vmapped fold_in per piece, NOT a Python loop of eager
        # fold_in calls — each eager op is a separate device round trip
        # on dispatch-latency-heavy backends (see _fn_k)
        fold = jax.vmap(lambda i: jax.random.fold_in(base, i))
        pieces = []
        for start in range(0, n_batches, cap):
            kb = min(cap, n_batches - start)
            bucket = self._bucket(kb)
            keys = fold(jnp.arange(start, start + bucket))
            if bucket == 1:
                out = self._gen_fn()(self.params, keys[0])
                pieces.append(self._host_restore(jax.device_get(out)))
            else:
                out = self._gen_fn_k(bucket)(self.params, keys)
                a = self._host_restore(jax.device_get(out))
                pieces.append(a.reshape((bucket * b,) + a.shape[2:]))
        return np.concatenate(pieces, axis=0)[: int(n)]

    # ------------------------------------------------------------------ #

    def encode(self, x: np.ndarray):
        """Posterior parameters; first element (or the array itself) is the
        on-manifold mean — the latent embedding."""
        return self._run_padded("encode", x)

    def decode(self, z: np.ndarray):
        return self._run_padded("decode", z)

    def reconstruct(self, x: np.ndarray):
        return self._run_padded("reconstruct", x)

    def embed(self, x: np.ndarray) -> np.ndarray:
        """Poincaré-ball embedding (posterior mean) as a single array."""
        out = self.encode(x)
        return out[0] if isinstance(out, (tuple, list)) else out

    @property
    def n_programs(self) -> int:
        """Number of distinct compiled programs (bounded: at most
        len(row_buckets)+len(buckets)+1 per method regardless of the
        request stream)."""
        return len(self._compiled)

    def warmup(self, data_shape: Optional[tuple] = None,
               methods: Optional[tuple] = None):
        """Pay every compile before traffic arrives (first TPU compile can
        take minutes through a remote relay): primes the FULL bucket set
        per method — including decode's latent-shaped programs and, for
        models that expose it, generate's key-driven programs — so no
        request on any endpoint triggers a compile later."""
        if methods is None:
            methods = ("reconstruct", "encode", "decode") + (
                ("generate",) if hasattr(self.model, "generate") else ()
            )
        shape = tuple(data_shape) if data_shape else model_data_shape(self.model)
        for method in methods:
            if method == "generate":
                for k in self._buckets:
                    self.generate(k * self.batch_size)
                continue
            feat = ((int(self.model.latent_dim),) if method == "decode"
                    else shape)
            for r in self._row_buckets:
                getattr(self, method)(np.zeros((r,) + feat, np.float32))
            for k in self._buckets:
                x = np.zeros((k * self.batch_size,) + feat, np.float32)
                getattr(self, method)(x)
        return self

    # ------------------------------------------------------------------ #

    def export_programs(self, out_dir, methods: tuple = ("encode", "decode", "reconstruct"),
                        data_shape: Optional[tuple] = None,
                        latent_dim: Optional[int] = None,
                        platforms: tuple = ("cpu", "tpu")):
        """Serialize the FULL bucketed program set as a self-contained
        serving bundle: jax.export StableHLO per (method, bucket), the
        params as an npz, and a JSON manifest. A serving process loads it
        with ``ExportedInferencer.load(dir)`` and serves WITHOUT the
        model's Python class and without retracing — the deployment
        artifact is the bundle, not the training codebase. Programs are
        exported unsharded (single-device serving) and, by default, for
        BOTH cpu and tpu, so the bundle runs off the exporting backend
        (export once on the training host, serve anywhere).

        Params are stored dtype-preserving (raw bytes + dtype/shape in
        the manifest): bf16-stored kernels (RNASeqVAE param_dtype)
        round-trip exactly — np.savez alone cannot encode ml_dtypes."""
        import json
        from pathlib import Path

        from jax import export as jexport

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        data_shape = tuple(data_shape) if data_shape else model_data_shape(self.model)
        latent_dim = int(latent_dim or getattr(self.model, "latent_dim"))
        pspec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), self.params
        )
        feat = {m: ((latent_dim,) if m == "decode" else data_shape) for m in methods}
        for method in methods:
            for k in self._buckets:
                if method == "generate":
                    # key-array-in programs: uint32[2] per batch (legacy
                    # PRNG keys are plain arrays, so they export cleanly)
                    fn = self._gen_fn() if k == 1 else self._gen_fn_k(k)
                    xs = jax.ShapeDtypeStruct(
                        (2,) if k == 1 else (k, 2), jnp.uint32
                    )
                else:
                    fn = self._fn(method) if k == 1 else self._fn_k(method, k)
                    shape = ((self.batch_size,) if k == 1 else (k, self.batch_size)) + feat[method]
                    xs = jax.ShapeDtypeStruct(shape, self._wire_in_dtype(method))
                exp = jexport.export(fn, platforms=list(platforms))(pspec, xs)
                (out / f"{method}_k{k}.stablehlo").write_bytes(exp.serialize())
            if method != "generate":
                # sub-batch row programs (fixed shapes in a bundle, unlike
                # the live jit which retraces)
                for r in self._row_buckets:
                    fn = self._fn_rows(method, r)
                    xs = jax.ShapeDtypeStruct(
                        (r,) + feat[method], self._wire_in_dtype(method)
                    )
                    exp = jexport.export(fn, platforms=list(platforms))(pspec, xs)
                    (out / f"{method}_r{r}.stablehlo").write_bytes(exp.serialize())
        flat, _ = jax.tree_util.tree_flatten_with_path(self.params)
        keys, dtypes, shapes, arrs = [], [], [], {}
        for i, (path, v) in enumerate(flat):
            a = np.ascontiguousarray(np.asarray(v))
            keys.append("/".join(str(getattr(p, "key", p)) for p in path))
            dtypes.append(a.dtype.name)
            shapes.append(list(a.shape))
            # raw-byte view: dtype-agnostic (np.savez turns ml_dtypes
            # bf16 into an unloadable void dtype otherwise)
            arrs[f"arr_{i}"] = a.reshape(-1).view(np.uint8)
        np.savez(out / "params.npz", **arrs)
        (out / "manifest.json").write_text(
            json.dumps(
                {
                    "batch_size": self.batch_size,
                    "max_batches_per_dispatch": self.max_batches_per_dispatch,
                    "buckets": self._buckets,
                    "row_buckets": self._row_buckets,
                    "methods": list(methods),
                    "data_shape": list(data_shape),
                    "latent_dim": latent_dim,
                    "platforms": list(platforms),
                    "io_dtype": (None if self.io_dtype is None
                                 else self.io_dtype.name),
                    "param_paths": keys,
                    "param_dtypes": dtypes,
                    "param_shapes": shapes,
                }
            )
        )
        return out


class ExportedInferencer(Inferencer):
    """Serve a bundle written by ``Inferencer.export_programs`` — no model
    class, no flax, no retracing: every program is deserialized StableHLO
    (jax.export), so the serving image needs only jax + the bundle. The
    padding/bucketing front-end is inherited unchanged."""

    def __init__(self, programs: dict, params, manifest: dict):
        import threading

        self.model = None
        self.mesh = None
        # the class contract: _compile_lock guards _compiled on every
        # Inferencer (bundle programs are pre-built, but inherited
        # helpers iterate/read _compiled under the lock)
        self._compile_lock = threading.RLock()
        io = manifest.get("io_dtype")  # absent in pre-round-4 bundles
        self.io_dtype = None if io is None else jnp.dtype(io)
        self.batch_size = int(manifest["batch_size"])
        self.max_batches_per_dispatch = int(manifest["max_batches_per_dispatch"])
        self._buckets = list(manifest["buckets"])
        # absent in pre-round-4 bundles: those pad to full batches
        self._row_buckets = list(manifest.get("row_buckets", []))
        self.sub_batch_buckets = bool(self._row_buckets)
        self._manifest = manifest
        self.params = params
        self._compiled = programs

    @classmethod
    def load(cls, bundle_dir) -> "ExportedInferencer":
        import json
        from pathlib import Path

        from jax import export as jexport

        d = Path(bundle_dir)
        manifest = json.loads((d / "manifest.json").read_text())
        npz = np.load(d / "params.npz")
        params = {}
        for i, (path, dt, shp) in enumerate(
            zip(manifest["param_paths"], manifest["param_dtypes"],
                manifest["param_shapes"])
        ):
            node = params
            parts = path.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            raw = npz[f"arr_{i}"]
            node[parts[-1]] = jnp.asarray(raw.view(jnp.dtype(dt)).reshape(shp))
        programs = {}
        for method in manifest["methods"]:
            for k in manifest["buckets"]:
                exp = jexport.deserialize(
                    bytearray((d / f"{method}_k{k}.stablehlo").read_bytes())
                )
                programs[method if k == 1 else (method, k)] = exp.call
            if method != "generate":
                for r in manifest.get("row_buckets", []):
                    exp = jexport.deserialize(
                        bytearray((d / f"{method}_r{r}.stablehlo").read_bytes())
                    )
                    programs[(method, "r", r)] = exp.call
        return cls(programs, params, manifest)

    def supports_method(self, method: str) -> bool:
        methods = set(self._manifest["methods"])
        if method == "embed":
            # embed is host-side sugar over the encode program
            # (Inferencer.embed): available whenever encode is
            return "encode" in methods
        return method in methods

    def _fn(self, method: str):
        if method not in self._compiled:
            raise KeyError(f"method {method!r} was not exported in this bundle")
        return self._compiled[method]

    def _fn_k(self, method: str, k: int):
        key = (method, k)
        if key not in self._compiled:
            raise KeyError(f"bucket {key} was not exported in this bundle")
        return self._compiled[key]

    def _fn_rows(self, method: str, r: int):
        key = (method, "r", r)
        if key not in self._compiled:
            raise KeyError(f"row bucket {key} was not exported in this bundle")
        return self._compiled[key]

    def _gen_fn(self):
        return self._fn("generate")

    def _gen_fn_k(self, k: int):
        return self._fn_k("generate", k)

    def warmup(self, data_shape: Optional[tuple] = None,
               methods: Optional[tuple] = None):
        shape = tuple(data_shape or self._manifest["data_shape"])
        lat = (self._manifest["latent_dim"],)
        for method in methods or self._manifest["methods"]:
            if method == "generate":
                for k in self._buckets:
                    self.generate(k * self.batch_size)
                continue
            feat = lat if method == "decode" else shape
            for r in self._row_buckets:
                getattr(self, method)(np.zeros((r,) + feat, np.float32))
            for k in self._buckets:
                x = np.zeros((k * self.batch_size,) + feat, np.float32)
                getattr(self, method)(x)
        return self
