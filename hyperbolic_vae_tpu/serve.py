"""Serving: fixed-shape batched inference over trained checkpoints.

The reference has no deployment story (its closest analogue is calling
``pl_module.reconstruct`` inside a callback,
/root/reference/hyperbolic_vae/training/generate_callback.py:23-35).
This framework is built for production TPU serving, where the rules are
different from training:

  * XLA compiles per input shape — a server must run ONE fixed batch
    shape and pad, or it recompiles (seconds to minutes on a remote
    relay) on every ragged request.
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


class Inferencer:
    """Fixed-batch, padded, jit-compiled inference endpoint.

    methods: "encode" (posterior mean [+ scale]), "decode", "reconstruct",
    or any other zero-RNG method the model exposes via ``model.apply``.
    Stochastic paths (rsample) are deliberately excluded: serving is
    deterministic (the posterior MEAN is the embedding the reference's
    figures use, vae_euclidean.py:237-303).
    """

    def __init__(self, model, params, batch_size: int = 256, mesh=None):
        self.model = model
        self.batch_size = int(batch_size)
        self.mesh = mesh
        if mesh is not None:
            from hyperbolic_vae_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
        self.params = params  # resident, never donated
        self._compiled = {}

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, name: str = "best",
                        batch_size: int = 256, mesh=None) -> "Inferencer":
        from hyperbolic_vae_tpu.train.checkpoint import restore_model

        model, params, _meta = restore_model(ckpt_dir, name)
        return cls(model, params, batch_size=batch_size, mesh=mesh)

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
        key = (method, k)
        if key not in self._compiled:
            apply = self._fn(method)

            def apply_k(params, xk):
                return jax.lax.map(lambda xb: apply(params, xb), xk)

            self._compiled[key] = jax.jit(apply_k) if k > 1 else apply
        return self._compiled[key]

    def _run_padded(self, method: str, x: np.ndarray):
        """Pad N up to k*B (repeating row 0; padded outputs discarded),
        run the k-batch program, fetch once."""
        n = x.shape[0]
        b = self.batch_size
        k = max((n + b - 1) // b, 1)
        pad = k * b - n
        if pad:
            x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)], 0)
        if k > 1:
            xk = jnp.asarray(x.reshape((k, b) + x.shape[1:]), jnp.float32)
            out = self._fn_k(method, k)(self.params, xk)
            flat = jax.tree.map(
                lambda a: np.asarray(a).reshape((k * b,) + a.shape[2:])[:n],
                jax.device_get(out),
            )
            return flat
        xb = jnp.asarray(x, jnp.float32)
        if self.mesh is not None:
            from hyperbolic_vae_tpu.parallel.mesh import data_sharding

            xb = jax.device_put(xb, data_sharding(self.mesh, xb.ndim))
        out = jax.device_get(self._fn(method)(self.params, xb))
        return jax.tree.map(lambda a: np.asarray(a)[:n], out)

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

    def warmup(self, data_shape: Optional[tuple] = None):
        """Pay every compile before traffic arrives (first TPU compile can
        take minutes through a remote relay)."""
        shape = tuple(data_shape or self.model.data_shape)
        x = np.zeros((self.batch_size,) + shape, np.float32)
        self.reconstruct(x)
        self.encode(x)
        return self
