"""RelaxedBernoulli (Concrete / Gumbel-Softmax binary) log density.

The reference's reconstruction likelihood for MNIST
(/root/reference/hyperbolic_vae/models/vae_hyperbolic_gyroplane_decoder.py:121-122,
vae_one_b.py:152-161, vae_hyperbolic.py:224-225) is
torch.distributions.RelaxedBernoulli(temperature, probs|logits).log_prob(x).

Density (Maddison et al. 2017, eq. for the binary Concrete): with
temperature l, logit a, and y = logit(x):

    log p(x) = log l + a - l*y - 2*softplus(a - l*y) - log x - log(1-x)

torch's SigmoidTransform clamps x into [tiny, 1-eps] before the logit;
we clamp the same way so exact-0/1 pixels (most of MNIST) give the same
finite values as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relaxed_bernoulli_log_prob(
    x: jax.Array,
    temperature: float,
    logits: jax.Array | None = None,
    probs: jax.Array | None = None,
) -> jax.Array:
    if (logits is None) == (probs is None):
        raise ValueError("pass exactly one of logits / probs")
    if logits is None:
        p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
        logits = jnp.log(p) - jnp.log1p(-p)
    finfo = jnp.finfo(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32)
    xc = jnp.clip(x, finfo.tiny, 1.0 - finfo.eps)
    y = jnp.log(xc) - jnp.log1p(-xc)  # logit(x), matches torch SigmoidTransform.inv
    diff = logits - temperature * y
    base = jnp.log(temperature) + diff - 2.0 * jax.nn.softplus(diff)
    # change of variables d logit(x)/dx = 1/(x(1-x))
    return base - jnp.log(xc) - jnp.log1p(-xc)
