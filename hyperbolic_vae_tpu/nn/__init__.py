from hyperbolic_vae_tpu.nn.layers import (
    MANIFOLD_PARAM_PREFIX,
    Distance2PoincareHyperplanes,
    Distance2StereographicHyperplanes,
    ExpMap0,
    GeodesicLayer,
    LogMap0,
    MobiusLayer,
    PoincareHyperplanes,
    is_manifold_param,
)

__all__ = [
    "MANIFOLD_PARAM_PREFIX",
    "ExpMap0",
    "LogMap0",
    "GeodesicLayer",
    "MobiusLayer",
    "PoincareHyperplanes",
    "Distance2PoincareHyperplanes",
    "Distance2StereographicHyperplanes",
    "is_manifold_param",
]
