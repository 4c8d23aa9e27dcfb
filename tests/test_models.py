"""Model-family matrix: every configuration initializes, runs one loss
step with finite values, and gradients flow. Mirrors the option space of
the reference's scripts _1/_2/_3/_5/_6/_7/_8 (SURVEY section 2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperbolic_vae_tpu.models import (
    Autoencoder,
    EuclideanVAE,
    GyroplaneVAE,
    HyperbolicImageVAE,
    RNASeqVAE,
    UnifiedVAE,
)


def _one_step(model, x):
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)
    params = variables["params"]

    def loss_fn(p):
        m = model.apply({"params": p}, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)})
        return m["loss_total"], m

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat), "non-finite grads"
    assert np.isfinite(float(loss))
    return params, metrics


@pytest.mark.slow
def test_autoencoder():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 0.5, (4, 32, 32, 3)), jnp.float32)
    params, m = _one_step(Autoencoder(data_shape=(32, 32, 3), latent_dim=64), x)
    assert "loss_total" in m


def test_euclidean_vae():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 0.5, (4, 32, 32, 3)), jnp.float32)
    _, m = _one_step(EuclideanVAE(data_shape=(32, 32, 3), latent_dim=2), x)
    assert set(m) >= {"loss_total", "loss_recon", "loss_kld"}


def test_gyroplane_vae():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 28, 28, 1)), jnp.float32)
    _, m = _one_step(GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2), x)
    assert set(m) >= {"loss_total", "recon_loss", "kl_loss"}


@pytest.mark.parametrize("enc_last", ["linear", "mobius"])
@pytest.mark.parametrize("dec_first", ["linear", "geodesic", "mobius", "geoopt_gyroplane"])
def test_hyperbolic_image_vae_matrix(enc_last, dec_first):
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    model = HyperbolicImageVAE(
        data_shape=(32, 32, 1),
        latent_dim=2,
        manifold_curvature=1.4,
        encoder_last_layer_module=enc_last,
        decoder_first_layer_module=dec_first,
        loss_recon="mse",
    )
    _one_step(model, x)


def test_hyperbolic_image_vae_bernoulli():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    model = HyperbolicImageVAE(data_shape=(32, 32, 1), loss_recon="bernoulli")
    _, m = _one_step(model, x)
    assert "mse" in m


def test_bernoulli_elbo_reduction_identities():
    """bernoulli_elbo = the SAME likelihood with corrected reductions:
    recon_elbo == H*W*C * recon_bernoulli (per-element mean -> per-sample
    pixel sum, batch-meaned) and kl_elbo == kl_bernoulli / B (batch sum
    -> batch mean). Same params, same sample draw."""
    B, px = 4, 32 * 32 * 1
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (B, 32, 32, 1)), jnp.float32)
    out = {}
    for mode in ("bernoulli", "bernoulli_elbo"):
        model = HyperbolicImageVAE(data_shape=(32, 32, 1), loss_recon=mode)
        v = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
        out[mode] = model.apply(
            v, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)}
        )
    np.testing.assert_allclose(
        float(out["bernoulli_elbo"]["loss_recon"]),
        px * float(out["bernoulli"]["loss_recon"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(out["bernoulli_elbo"]["loss_kl"]),
        float(out["bernoulli"]["loss_kl"]) / B,
        rtol=1e-5,
    )


def test_rnaseq_vae():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 200)), jnp.float32)
    _, m = _one_step(RNASeqVAE(in_features=200, hidden_dim=32, latent_dim=2), x)
    assert np.isfinite(float(m["loss_kl"]))


@pytest.mark.parametrize("curvature", [None, 1.0])
@pytest.mark.parametrize("kl_method", ["log_prob", "logmap0_analytic", "logmap0_log_prob"])
def test_unified_vae_kl_matrix(curvature, kl_method):
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 8, 8, 1)), jnp.float32)
    model = UnifiedVAE(
        input_size=(8, 8, 1),
        hidden_layer_dim=16,
        latent_dim=2,
        latent_curvature=curvature,
        prior_scale=2.0,
        kl_loss_method=kl_method,
        last_activation="sigmoid",
        loss_recon_method="MSE",
    )
    _one_step(model, x)


@pytest.mark.parametrize(
    "recon,last_act",
    [
        ("MSE", "sigmoid"),
        ("binary_cross_entropy", "sigmoid"),
        ("binary_cross_entropy_with_logits", "none"),
        ("relaxed bernoulli", "none"),
        ("relaxed bernoulli", "sigmoid"),
        ("MSE", "softplus"),
    ],
)
def test_unified_vae_recon_matrix(recon, last_act):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.01, 0.99, (4, 8, 8, 1)), jnp.float32)
    model = UnifiedVAE(
        input_size=(8, 8, 1),
        hidden_layer_dim=16,
        latent_dim=2,
        loss_recon_method=recon,
        last_activation=last_act,
    )
    _one_step(model, x)


@pytest.mark.slow
def test_unified_vae_fixed_scale():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 16)), jnp.float32)
    model = UnifiedVAE(
        input_size=(16,), hidden_layer_dim=8, posterior_scale="fixed",
        last_activation="sigmoid",
    )
    _one_step(model, x)


def test_mu_encodings_on_manifold():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 28, 28, 1)), jnp.float32)
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2, manifold_curvature=1.0)
    params, _ = _one_step(model, x)
    mu, scale = model.apply({"params": params}, x, method="encode")
    assert np.all(np.linalg.norm(np.asarray(mu), axis=-1) < 1.0)
    assert np.all(np.asarray(scale) > 0)


def test_euclidean_vae_bf16_compute():
    """bf16 conv path: finite loss/grads, f32 params, loss close to f32."""
    x = jnp.asarray(np.random.default_rng(0).normal(0, 0.5, (4, 32, 32, 3)), jnp.float32)
    m32 = EuclideanVAE(data_shape=(32, 32, 3), latent_dim=2)
    mbf = EuclideanVAE(data_shape=(32, 32, 3), latent_dim=2, compute_dtype="bfloat16")
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    p32 = m32.init(rngs, x)["params"]
    pbf = mbf.init(rngs, x)["params"]
    # params are stored f32 regardless of compute dtype
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(pbf))
    l32 = m32.apply({"params": p32}, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)})
    lbf = mbf.apply({"params": pbf}, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)})
    assert np.isfinite(float(lbf["loss_total"]))
    rel = abs(float(lbf["loss_total"]) - float(l32["loss_total"])) / abs(float(l32["loss_total"]))
    assert rel < 0.1, rel


def test_hyperbolic_image_vae_bf16_compute():
    """bf16 conv stacks with f32 manifold math: finite grads, loss ≈ f32."""
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 1)), jnp.float32)
    kw = dict(data_shape=(32, 32, 1), decoder_first_layer_module="geoopt_gyroplane")
    m32 = HyperbolicImageVAE(**kw)
    mbf = HyperbolicImageVAE(**kw, compute_dtype="bfloat16")
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    p32 = m32.init(rngs, x)["params"]
    pbf, mtr = _one_step(mbf, x)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(pbf))
    l32 = m32.apply({"params": p32}, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)})
    rel = abs(float(mtr["loss_total"]) - float(l32["loss_total"])) / abs(float(l32["loss_total"]))
    assert rel < 0.1, rel


def test_rnaseq_vae_bf16_compute():
    """bf16 wide matmuls with f32 gyroplane/sampling: finite grads, loss ≈ f32."""
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (8, 256)), jnp.float32)
    m32 = RNASeqVAE(in_features=256, hidden_dim=32, latent_dim=2)
    mbf = RNASeqVAE(in_features=256, hidden_dim=32, latent_dim=2, compute_dtype="bfloat16")
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    p32 = m32.init(rngs, x)["params"]
    pbf, mtr = _one_step(mbf, x)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(pbf))
    l32 = m32.apply({"params": p32}, x, method="loss", rngs={"sample": jax.random.PRNGKey(2)})
    rel = abs(float(mtr["loss_total"]) - float(l32["loss_total"])) / abs(float(l32["loss_total"]))
    assert rel < 0.1, rel


def test_hyperbolic_image_vae_base_channels():
    """base_channels widens the conv stack (m, 2m, 2m) — the MXU
    lane-occupancy control arm of benchmarks/conv_roofline.py. Shapes,
    loss and grads must stay healthy at non-reference widths, and the
    encoder flatten width must track 2*m."""
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    model = HyperbolicImageVAE(data_shape=(32, 32, 1), latent_dim=2, base_channels=32)
    assert model.encoder_out_channels == 2 * 32 * 4 * 4
    params, _ = _one_step(model, x)
    assert params["conv1"]["kernel"].shape[-1] == 32
    assert params["conv2"]["kernel"].shape[-1] == 64
    # default stays the reference's fixed 16/32 architecture
    assert HyperbolicImageVAE(data_shape=(32, 32, 1), latent_dim=2).encoder_out_channels == 512
