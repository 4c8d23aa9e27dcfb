from hyperbolic_vae_tpu.distributions.normal import (
    kl_normal_normal,
    kl_std_normal_from_logvar,
    normal_log_prob,
)
from hyperbolic_vae_tpu.distributions.relaxed_bernoulli import relaxed_bernoulli_log_prob
from hyperbolic_vae_tpu.distributions.riemannian_normal import (
    RiemannianNormal,
    log_radius_normalizer,
    sample_radius,
)
from hyperbolic_vae_tpu.distributions.wrapped_normal import (
    WrappedNormal,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
    wrapped_normal_rsample_from_eps,
)

__all__ = [
    "WrappedNormal",
    "wrapped_normal_rsample",
    "wrapped_normal_log_prob",
    "wrapped_normal_rsample_from_eps",
    "RiemannianNormal",
    "sample_radius",
    "log_radius_normalizer",
    "relaxed_bernoulli_log_prob",
    "normal_log_prob",
    "kl_normal_normal",
    "kl_std_normal_from_logvar",
]
