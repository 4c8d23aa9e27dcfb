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

from hyperbolic_vae_tpu.manifolds import Euclidean, PoincareBall

__all__ = ["PoincareBall", "Euclidean", "__version__"]
