"""Serving: fixed-shape batched inference over trained checkpoints.

The reference has no deployment story (its closest analogue is calling
``pl_module.reconstruct`` inside a callback,
/root/reference/hyperbolic_vae/training/generate_callback.py:23-35).
This framework is built for production TPU serving, where the rules are
different from training:

  * XLA compiles per input shape — a server must run ONE fixed batch
    shape and pad, or it recompiles (seconds to minutes on a remote
    relay) on every ragged request. Multi-batch request sizes are
    BUCKETED to powers of two up to ``max_batches_per_dispatch``, so an
    adversarial ragged stream compiles at most log2(cap)+1 programs per
    method; ``warmup()`` primes the whole bucket set.
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

    def __init__(self, model, params, batch_size: int = 256, mesh=None,
                 max_batches_per_dispatch: int = 16):
        self.model = model
        self.batch_size = int(batch_size)
        self.mesh = mesh
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

    def _bucket(self, k: int) -> int:
        """Smallest bucket >= k (the caller splits k above the cap)."""
        for b in self._buckets:
            if b >= k:
                return b
        return self.max_batches_per_dispatch

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, name: str = "best",
                        batch_size: int = 256, mesh=None,
                        max_batches_per_dispatch: int = 16) -> "Inferencer":
        from hyperbolic_vae_tpu.train.checkpoint import restore_model

        model, params, _meta = restore_model(ckpt_dir, name)
        return cls(model, params, batch_size=batch_size, mesh=mesh,
                   max_batches_per_dispatch=max_batches_per_dispatch)

    # ------------------------------------------------------------------ #

    def _fn(self, method: str):
        if method not in self._compiled:
            model = self.model

            if method == "reconstruct":
                # deterministic serving semantics: decode the posterior
                # MEAN (model.reconstruct rsamples, which is a training/
                # visualization behavior, not an endpoint)
                def apply(params, x):
                    out = model.apply({"params": params}, x, method="encode")
                    mu = out[0] if isinstance(out, tuple) else out
                    return model.apply({"params": params}, mu, method="decode")

            else:
                def apply(params, x):
                    return model.apply({"params": params}, x, method=method)

            self._compiled[method] = jax.jit(apply)
        return self._compiled[method]

    def _fn_k(self, method: str, k: int):
        """ONE compiled program for a k-batch request: lax.map over the
        (k, B, ...) stack, so a request of any size costs a single device
        round trip (sequential per-batch dispatches do NOT pipeline on
        the axon tunnel — measured ~50 ms each). Cached per (method, k);
        warmup() can prime common sizes."""
        assert k > 1, "single-batch requests go through _fn directly"
        key = (method, k)
        if key not in self._compiled:
            apply = self._fn(method)

            def apply_k(params, xk):
                return jax.lax.map(lambda xb: apply(params, xb), xk)

            self._compiled[key] = jax.jit(apply_k)
        return self._compiled[key]

    def _dispatch(self, method: str, x: np.ndarray, n_keep: int):
        """Run one bucketed dispatch: pad the row count up to bucket*B
        (repeating row 0; padded outputs discarded), run the k-batch
        program, fetch once, trim to n_keep rows."""
        b = self.batch_size
        k = self._bucket(max((x.shape[0] + b - 1) // b, 1))
        pad = k * b - x.shape[0]
        if pad:
            x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)], 0)
        if k > 1:
            xk = jnp.asarray(x.reshape((k, b) + x.shape[1:]), jnp.float32)
            if self.mesh is not None:
                # shard the BATCH axis (axis 1: lax.map iterates axis 0)
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = P(None, "data", *([None] * (xk.ndim - 2)))
                xk = jax.device_put(xk, NamedSharding(self.mesh, spec))
            out = self._fn_k(method, k)(self.params, xk)
            return jax.tree.map(
                lambda a: np.asarray(a).reshape((k * b,) + a.shape[2:])[:n_keep],
                jax.device_get(out),
            )
        xb = jnp.asarray(x, jnp.float32)
        if self.mesh is not None:
            from hyperbolic_vae_tpu.parallel.mesh import data_sharding

            xb = jax.device_put(xb, data_sharding(self.mesh, xb.ndim))
        out = jax.device_get(self._fn(method)(self.params, xb))
        return jax.tree.map(lambda a: np.asarray(a)[:n_keep], out)

    def _run_padded(self, method: str, x: np.ndarray):
        """Serve a request of any size within the bounded program set:
        full-cap dispatches for the bulk, one bucketed dispatch for the
        remainder."""
        n = x.shape[0]
        if n == 0:
            # run ONE zero row through the already-primed 1-batch program
            # and trim — an empty request must not compile a fresh
            # (0, ...)-shaped out-of-bucket program
            x = np.zeros((1,) + tuple(x.shape[1:]), np.float32)
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
        if "generate" not in self._compiled:
            model, b = self.model, self.batch_size

            def apply(params, key):
                return model.apply(
                    {"params": params}, b, method="generate",
                    rngs={"sample": key},
                )

            self._compiled["generate"] = jax.jit(apply)
        return self._compiled["generate"]

    def _gen_fn_k(self, k: int):
        assert k > 1
        key = ("generate", k)
        if key not in self._compiled:
            apply = self._gen_fn()

            def apply_k(params, keys):
                return jax.lax.map(lambda kk: apply(params, kk), keys)

            self._compiled[key] = jax.jit(apply_k)
        return self._compiled[key]

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
                pieces.append(np.asarray(jax.device_get(out)))
            else:
                out = self._gen_fn_k(bucket)(self.params, keys)
                a = np.asarray(jax.device_get(out))
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
        len(buckets)+1 per method regardless of the request stream)."""
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
                    xs = jax.ShapeDtypeStruct(shape, jnp.float32)
                exp = jexport.export(fn, platforms=list(platforms))(pspec, xs)
                (out / f"{method}_k{k}.stablehlo").write_bytes(exp.serialize())
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
                    "methods": list(methods),
                    "data_shape": list(data_shape),
                    "latent_dim": latent_dim,
                    "platforms": list(platforms),
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
        self.model = None
        self.mesh = None
        self.batch_size = int(manifest["batch_size"])
        self.max_batches_per_dispatch = int(manifest["max_batches_per_dispatch"])
        self._buckets = list(manifest["buckets"])
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
        return cls(programs, params, manifest)

    def _fn(self, method: str):
        if method not in self._compiled:
            raise KeyError(f"method {method!r} was not exported in this bundle")
        return self._compiled[method]

    def _fn_k(self, method: str, k: int):
        key = (method, k)
        if key not in self._compiled:
            raise KeyError(f"bucket {key} was not exported in this bundle")
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
            for k in self._buckets:
                feat = lat if method == "decode" else shape
                x = np.zeros((k * self.batch_size,) + feat, np.float32)
                getattr(self, method)(x)
        return self
