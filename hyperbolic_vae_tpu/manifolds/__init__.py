from hyperbolic_vae_tpu.manifolds.euclidean import Euclidean
from hyperbolic_vae_tpu.manifolds.stats import (
    class_means,
    frechet_mean,
    frechet_variance,
    geodesic,
)
from hyperbolic_vae_tpu.manifolds.poincare import (
    MIN_NORM,
    PoincareBall,
    PoincareBallWithExtras,
    artanh,
    arsinh,
    log_sinh_ratio,
    logdetexp,
    normdist2plane,
)

__all__ = [
    "MIN_NORM",
    "PoincareBall",
    "PoincareBallWithExtras",
    "Euclidean",
    "artanh",
    "arsinh",
    "log_sinh_ratio",
    "logdetexp",
    "normdist2plane",
    "frechet_mean",
    "frechet_variance",
    "class_means",
    "geodesic",
]
