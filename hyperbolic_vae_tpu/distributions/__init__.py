from hyperbolic_vae_tpu.distributions.normal import (
    kl_normal_normal,
    kl_std_normal_from_logvar,
    normal_log_prob,
)
from hyperbolic_vae_tpu.distributions.hyperspherical import (
    HyperbolicRadius,
    HypersphericalUniform,
    expmap_polar,
)
from hyperbolic_vae_tpu.distributions.negative_binomial import (
    nb_mean_dispersion_to_logits,
    negative_binomial_log_prob,
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
    "HyperbolicRadius",
    "HypersphericalUniform",
    "expmap_polar",
    "sample_radius",
    "log_radius_normalizer",
    "relaxed_bernoulli_log_prob",
    "negative_binomial_log_prob",
    "nb_mean_dispersion_to_logits",
    "normal_log_prob",
    "kl_normal_normal",
    "kl_std_normal_from_logvar",
]
