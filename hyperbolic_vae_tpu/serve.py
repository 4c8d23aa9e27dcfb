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
    axon tunnel), so the whole request should be as few dispatches as
    possible: ceil(N / batch) compiled calls, one host fetch.
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

    def _run_padded(self, method: str, x: np.ndarray):
        """ceil(N/B) fixed-shape dispatches; pad the last batch by
        repeating row 0 (values discarded), fetch once."""
        n = x.shape[0]
        b = self.batch_size
        fn = self._fn(method)
        outs = []
        for start in range(0, n, b):
            chunk = x[start : start + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, axis=0)], 0)
            xb = jnp.asarray(chunk, jnp.float32)
            if self.mesh is not None:
                from hyperbolic_vae_tpu.parallel.mesh import data_sharding

                xb = jax.device_put(xb, data_sharding(self.mesh, xb.ndim))
            outs.append(fn(self.params, xb))
        outs = jax.device_get(outs)  # ONE host transfer for the whole request

        def cat(*leaves):
            return np.concatenate(leaves, axis=0)[:n]

        return jax.tree.map(cat, *outs) if len(outs) > 1 else jax.tree.map(
            lambda a: np.asarray(a)[:n], outs[0]
        )

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
