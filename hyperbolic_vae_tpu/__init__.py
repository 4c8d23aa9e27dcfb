"""hyperbolic_vae_tpu — a TPU-native (JAX/XLA/Pallas) framework for
hyperbolic variational autoencoders on the Poincare ball.

Ground-up rebuild of the capabilities of grisaitis/hyperbolic-vae
(reference mounted read-only at /root/reference) designed TPU-first:
pure-functional manifold math, reparameterized manifold distributions,
flax model families, a Riemannian Adam optax transform with retraction +
momentum transport, a jit-compiled full-epoch training loop, and
jax.sharding data/model parallelism.
"""

__version__ = "0.1.0"

from hyperbolic_vae_tpu.utils.config import enable_compilation_cache

# persistent XLA compilation cache: on remote-relay TPU backends a fresh
# process pays tens of seconds per program otherwise (67 s -> 0.45 s
# measured). Opt out with HVT_NO_COMPILE_CACHE=1.
enable_compilation_cache()

from hyperbolic_vae_tpu.manifolds import Euclidean, PoincareBall

__all__ = ["PoincareBall", "Euclidean", "__version__"]


def __getattr__(name):
    """Lazy top-level re-exports (avoid importing flax/optax at package
    import time): Trainer, models, distributions."""
    if name in ("Trainer", "make_trainer_hyperbolic"):
        from hyperbolic_vae_tpu import train

        return getattr(train, name)
    if name in (
        "GyroplaneVAE", "EuclideanVAE", "HyperbolicImageVAE",
        "UnifiedVAE", "RNASeqVAE", "Autoencoder", "PvaeMLPVAE",
    ):
        from hyperbolic_vae_tpu import models

        return getattr(models, name)
    if name in ("WrappedNormal", "RiemannianNormal"):
        from hyperbolic_vae_tpu import distributions

        return getattr(distributions, name)
    if name == "Inferencer":
        from hyperbolic_vae_tpu.serve import Inferencer

        return Inferencer
    raise AttributeError(name)
