"""Cross-validate the IWAE log-weights against an INDEPENDENT torch
implementation (benchmarks/torch_baseline.py mirror, shared init): the
same importance samples z evaluated by both frameworks must produce the
same log q / log p / log p(x|z) — deterministic, no MC tolerance."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from hyperbolic_vae_tpu.distributions import (
    relaxed_bernoulli_log_prob,
    wrapped_normal_log_prob,
    wrapped_normal_rsample,
)
from hyperbolic_vae_tpu.models import GyroplaneVAE
from hyperbolic_vae_tpu.models.iwae import iwae_bound


@pytest.mark.slow
def test_iwae_log_weights_match_torch_mirror():
    torch = pytest.importorskip("torch")
    from parity import load_jax_init_into_torch
    from torch_baseline import TorchGyroplaneVAE

    k, b, side = 64, 16, 28
    rng = np.random.default_rng(0)
    x = rng.uniform(0.05, 0.95, (b, side, side, 1)).astype(np.float32)
    xf = x.reshape(b, -1)

    model = GyroplaneVAE(data_shape=(side, side, 1), latent_dim=2)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(x),
    )["params"]
    tmodel = TorchGyroplaneVAE(data_numel=side * side)
    load_jax_init_into_torch(tmodel, jax.device_get(params))

    # --- jax arm: draw z once, compute the three log-weight terms ------
    ball = model.ball
    mu, scale = model.apply({"params": params}, jnp.asarray(x), method="encode")
    z = wrapped_normal_rsample(jax.random.PRNGKey(2), ball, mu, scale, (k,))
    log_q = wrapped_normal_log_prob(ball, mu, scale, z)
    origin = jnp.zeros((2,), jnp.float32)
    log_p = wrapped_normal_log_prob(ball, origin, jnp.ones((2,)), z)
    xh = model.apply(
        {"params": params}, z.reshape(-1, 2), method="decode"
    ).reshape(k, b, -1)
    log_px = jnp.sum(relaxed_bernoulli_log_prob(xf[None], 1.0, probs=xh), axis=-1)

    # --- torch arm: SAME z/mu/scale, independent math ------------------
    tball = tmodel.ball
    tz = torch.from_numpy(np.asarray(z).reshape(-1, 2))
    tmu = torch.from_numpy(np.asarray(mu)).repeat(k, 1)
    tscale = torch.from_numpy(np.asarray(scale)).repeat(k, 1)

    def t_log_prob(loc, s, value):
        v = tball.logmap(loc, value)
        u = tball.transp0back(loc, v) * 2.0
        lp = torch.distributions.Normal(torch.zeros_like(s), s).log_prob(u).sum(-1)
        return lp - tball.logdetexp(loc, value).squeeze(-1)

    with torch.no_grad():
        t_log_q = t_log_prob(tmu, tscale, tz)
        t_log_p = t_log_prob(torch.zeros_like(tmu), torch.ones_like(tscale), tz)
        pts = tmodel.mp_points
        d = tball.dist2plane(tz.unsqueeze(1), pts, pts, signed=True) + tmodel.plane_bias
        t_xh = tmodel.dec(d)
        t_log_px = (
            torch.distributions.RelaxedBernoulli(
                temperature=torch.tensor(1.0), probs=t_xh.clamp(1e-6, 1 - 1e-6)
            )
            .log_prob(torch.from_numpy(xf).repeat(k, 1).clamp(1e-6, 1 - 1e-6))
            .sum(-1)
        )

    np.testing.assert_allclose(
        np.asarray(log_q).reshape(-1), t_log_q.numpy(), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(log_p).reshape(-1), t_log_p.numpy(), atol=5e-3
    )
    # decode runs through 3 dense layers: f32 accumulation differences
    # scale with the 784-pixel sum
    np.testing.assert_allclose(
        np.asarray(log_px).reshape(-1), t_log_px.numpy(), atol=0.05, rtol=1e-5
    )

    # end to end: the two frameworks' K-sample bounds agree per sample
    t_log_w = (t_log_px + t_log_p - t_log_q).reshape(k, b)
    t_bound = torch.logsumexp(t_log_w, dim=0) - np.log(float(k))
    j_bound = iwae_bound(log_px + log_p - log_q)
    np.testing.assert_allclose(np.asarray(j_bound), t_bound.numpy(), atol=0.05)
