"""Torch checkpoint import: forward parity against torch replicas of the
reference layouts (interop/torch_import.py).

Each replica reproduces a reference model's exact state_dict key layout
(Sequential indices, geoopt/Riemannian parameter names). GELU uses the
tanh approximation on the torch side so parity with flax.linen's default
is exact, isolating the WEIGHT mapping from the documented activation
formulation difference.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from benchmarks.torch_baseline import TorchBall
from hyperbolic_vae_tpu.interop import import_torch_state_dict, load_torch_state_dict
from hyperbolic_vae_tpu.models import (
    Autoencoder,
    EuclideanVAE,
    GyroplaneVAE,
    HyperbolicImageVAE,
    RNASeqVAE,
)

GELU = lambda: tnn.GELU(approximate="tanh")  # noqa: E731


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _to_nhwc(y: torch.Tensor) -> np.ndarray:
    return y.detach().numpy().transpose(0, 2, 3, 1)


class _GyroplanesTorch(tnn.Module):
    """geoopt Distance2StereographicHyperplanes stand-in: same state_dict
    (a single ``points`` (planes, dim) parameter) and same forward."""

    def __init__(self, dim, planes, c=1.0, bias=False):
        super().__init__()
        self.points = tnn.Parameter(torch.randn(planes, dim) * 0.3)
        self.ball = TorchBall(c)
        if bias:
            self.bias = tnn.Parameter(torch.randn(planes))
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        d = self.ball.dist2plane(x[:, None, :], self.points, self.points, signed=True)
        return d + self.bias if self.bias is not None else d


# --------------------------------------------------------------------- #
# flagship


class _TorchFlagship(tnn.Module):
    """VAEHyperbolicGyroplaneDecoder layout
    (reference vae_hyperbolic_gyroplane_decoder.py:59-85)."""

    def __init__(self, numel=784, latent=2, c=1.0):
        super().__init__()
        self.ball = TorchBall(c)
        self.encoder = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(numel, 64), GELU(), tnn.Linear(64, 16), GELU()
        )
        self.mu = tnn.Sequential(tnn.Linear(16, latent))
        self.scale = tnn.Sequential(tnn.Linear(16, latent), tnn.Softplus())
        self.decoder = tnn.Sequential(
            _GyroplanesTorch(latent, 16, c),
            GELU(),
            tnn.Linear(16, 64),
            GELU(),
            tnn.Linear(64, numel),
            tnn.Sigmoid(),
        )

    def encode(self, x):
        h = self.encoder(x)
        mu = self.ball.expmap0(self.mu(h))
        scale = torch.clamp(self.scale(h) + 1e-3, 1e-3, 10.0)
        return mu, scale


def test_flagship_forward_parity():
    torch.manual_seed(0)
    t = _TorchFlagship(numel=28 * 28)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
    params = import_torch_state_dict(model, sd)

    x = np.random.default_rng(0).random((4, 28, 28, 1), np.float32)
    with torch.no_grad():
        mu_t, scale_t = t.encode(torch.from_numpy(x))
    mu_j, scale_j = model.apply({"params": params}, jnp.asarray(x), method="encode")
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale_j), scale_t.numpy(), atol=1e-5)

    z = np.asarray(mu_j)
    with torch.no_grad():
        xh_t = t.decoder(torch.from_numpy(z)).numpy().reshape(4, 28, 28, 1)
    xh_j = np.asarray(model.apply({"params": params}, jnp.asarray(z), method="decode"))
    np.testing.assert_allclose(xh_j, xh_t, atol=1e-5)


# --------------------------------------------------------------------- #
# vae_one_b (RNA-seq / unified)


class _TorchOneB(tnn.Module):
    """vae_one_b.VAE layout, hyperbolic branch with the reference's OWN
    hyperplane layer (points + bias), 1-D input (vae_one_b.py:50-73)."""

    def __init__(self, features=20, hidden=8, latent=2, c=1.0):
        super().__init__()
        self.ball = TorchBall(c)
        self.encoder = tnn.Sequential(tnn.Linear(features, hidden), GELU())
        self.mu = tnn.Sequential(tnn.Linear(hidden, latent))
        self.scale = tnn.Sequential(tnn.Linear(hidden, latent), tnn.Softplus())
        self.decoder = tnn.Sequential(
            _GyroplanesTorch(latent, hidden, c, bias=True),
            GELU(),
            tnn.Linear(hidden, features),
        )


def test_rnaseq_forward_parity():
    torch.manual_seed(1)
    t = _TorchOneB()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    model = RNASeqVAE(in_features=20, hidden_dim=8, latent_dim=2)
    params = import_torch_state_dict(model, sd)

    x = np.random.default_rng(1).random((6, 20), np.float32)
    mu_j, _ = model.apply({"params": params}, jnp.asarray(x), method="encode")
    with torch.no_grad():
        h = t.encoder(torch.from_numpy(x))
        mu_t = t.ball.expmap0(t.mu(h))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-5)

    z = np.asarray(mu_j)
    with torch.no_grad():
        # reconstruction head before the model-specific output likelihood
        d_t = t.decoder[0](torch.from_numpy(z))
    # our gyroplanes layer output, via the module's own path
    d_j = model.apply(
        {"params": params},
        jnp.asarray(z),
        method=lambda m, zz: m.gyroplanes(zz),
    )
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
# conv families


class _TorchEuclidean(tnn.Module):
    """VAEEuclidean layout (reference vae_euclidean.py:31-88)."""

    def __init__(self, ch=3, c_hid=4, latent=2):
        super().__init__()
        self.encoder = tnn.Sequential(
            tnn.Conv2d(ch, c_hid, 3, padding=1, stride=2), GELU(),
            tnn.Conv2d(c_hid, c_hid, 3, padding=1), GELU(),
            tnn.Conv2d(c_hid, 2 * c_hid, 3, padding=1, stride=2), GELU(),
            tnn.Conv2d(2 * c_hid, 2 * c_hid, 3, padding=1), GELU(),
            tnn.Conv2d(2 * c_hid, 2 * c_hid, 3, padding=1, stride=2), GELU(),
            tnn.Flatten(),
        )
        self.mu = tnn.Linear(2 * c_hid * 16, latent)
        self.log_var = tnn.Linear(2 * c_hid * 16, latent)
        self.decoder = tnn.Sequential(
            tnn.Linear(latent, 2 * c_hid * 16), GELU(),
            tnn.Unflatten(1, (2 * c_hid, 4, 4)),
            tnn.ConvTranspose2d(2 * c_hid, 2 * c_hid, 3, output_padding=1, padding=1, stride=2), GELU(),
            tnn.Conv2d(2 * c_hid, 2 * c_hid, 3, padding=1), GELU(),
            tnn.ConvTranspose2d(2 * c_hid, c_hid, 3, output_padding=1, padding=1, stride=2), GELU(),
            tnn.Conv2d(c_hid, c_hid, 3, padding=1), GELU(),
            tnn.ConvTranspose2d(c_hid, ch, 3, output_padding=1, padding=1, stride=2),
            tnn.Tanh(),
        )


def test_euclidean_vae_forward_parity():
    torch.manual_seed(2)
    t = _TorchEuclidean()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    model = EuclideanVAE(data_shape=(32, 32, 3), hidden_size=4, latent_dim=2)
    params = import_torch_state_dict(model, sd)

    x = np.random.default_rng(2).random((2, 32, 32, 3), np.float32)
    with torch.no_grad():
        h = t.encoder(_nchw(x))
        mu_t, lv_t = t.mu(h).numpy(), t.log_var(h).numpy()
    mu_j, lv_j = model.apply({"params": params}, jnp.asarray(x), method="encode")
    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t, atol=1e-5)

    z = mu_t
    with torch.no_grad():
        xh_t = _to_nhwc(t.decoder(torch.from_numpy(z)))
    xh_j = np.asarray(model.apply({"params": params}, jnp.asarray(z), method="decode"))
    np.testing.assert_allclose(xh_j, xh_t, atol=1e-5)


class _TorchAE(tnn.Module):
    """autoencoder_nonvariational layout: encoder.net / decoder.linear +
    decoder.net (reference autoencoder_nonvariational.py:25-97)."""

    def __init__(self, ch=3, c_hid=4, latent=16):
        super().__init__()
        enc = tnn.Sequential(
            tnn.Conv2d(ch, c_hid, 3, padding=1, stride=2), GELU(),
            tnn.Conv2d(c_hid, c_hid, 3, padding=1), GELU(),
            tnn.Conv2d(c_hid, 2 * c_hid, 3, padding=1, stride=2), GELU(),
            tnn.Conv2d(2 * c_hid, 2 * c_hid, 3, padding=1), GELU(),
            tnn.Conv2d(2 * c_hid, 2 * c_hid, 3, padding=1, stride=2), GELU(),
            tnn.Flatten(),
            tnn.Linear(2 * c_hid * 16, latent),
        )
        self.encoder = tnn.Module()
        self.encoder.net = enc
        self.decoder = tnn.Module()
        self.decoder.linear = tnn.Sequential(tnn.Linear(latent, 2 * c_hid * 16), GELU())
        self.decoder.net = tnn.Sequential(
            tnn.ConvTranspose2d(2 * c_hid, 2 * c_hid, 3, output_padding=1, padding=1, stride=2), GELU(),
            tnn.Conv2d(2 * c_hid, 2 * c_hid, 3, padding=1), GELU(),
            tnn.ConvTranspose2d(2 * c_hid, c_hid, 3, output_padding=1, padding=1, stride=2), GELU(),
            tnn.Conv2d(c_hid, c_hid, 3, padding=1), GELU(),
            tnn.ConvTranspose2d(c_hid, ch, 3, output_padding=1, padding=1, stride=2),
            tnn.Tanh(),
        )

    def forward(self, x):
        z = self.encoder.net(x)
        h = self.decoder.linear(z)
        h = h.reshape(h.shape[0], -1, 4, 4)
        return z, self.decoder.net(h)


def test_autoencoder_forward_parity():
    torch.manual_seed(3)
    t = _TorchAE()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    model = Autoencoder(data_shape=(32, 32, 3), base_channel_size=4, latent_dim=16)
    params = import_torch_state_dict(model, sd)

    x = np.random.default_rng(3).random((2, 32, 32, 3), np.float32)
    with torch.no_grad():
        z_t, xh_t = t(_nchw(x))
    z_j = np.asarray(model.apply({"params": params}, jnp.asarray(x), method="encode"))
    np.testing.assert_allclose(z_j, z_t.numpy(), atol=1e-5)
    xh_j = np.asarray(model.apply({"params": params}, jnp.asarray(z_j), method="decode"))
    np.testing.assert_allclose(xh_j, _to_nhwc(xh_t), atol=1e-5)


class _TorchHImage(tnn.Module):
    """ImageVAEHyperbolic layout, linear/geoopt_gyroplane variant
    (reference vae_hyperbolic.py:57-109)."""

    def __init__(self, ch=1, latent=2, c=1.0):
        super().__init__()
        self.ball = TorchBall(c)
        self.encoder = tnn.Sequential(
            tnn.Conv2d(ch, 16, 3, 2, 1), GELU(),
            tnn.Conv2d(16, 32, 3, 2, 1), GELU(),
            tnn.Conv2d(32, 32, 3, 2, 1), GELU(),
            tnn.Flatten(),
        )
        f = 32 * 16
        self.mu = tnn.Linear(f, latent)
        self.log_var = tnn.Linear(f, latent)
        self.decoder = tnn.Sequential(
            _GyroplanesTorch(latent, f, c), GELU(),
            tnn.Unflatten(-1, (32, 4, 4)),
            tnn.ConvTranspose2d(32, 32, 3, 2, 1, output_padding=1), GELU(),
            tnn.Conv2d(32, 32, 3, 1, 1), GELU(),
            tnn.ConvTranspose2d(32, 16, 3, 2, 1, output_padding=1), GELU(),
            tnn.Conv2d(16, 16, 3, 1, 1), GELU(),
            tnn.ConvTranspose2d(16, ch, 3, 2, 1, output_padding=1),
            tnn.Sigmoid(),
        )


def test_hyperbolic_image_gyroplane_forward_parity():
    torch.manual_seed(4)
    t = _TorchHImage()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    model = HyperbolicImageVAE(
        data_shape=(32, 32, 1), latent_dim=2,
        decoder_first_layer_module="geoopt_gyroplane", loss_recon="mse",
    )
    params = import_torch_state_dict(model, sd)

    x = np.random.default_rng(4).random((2, 32, 32, 1), np.float32)
    with torch.no_grad():
        h = t.encoder(_nchw(x))
        mu_t = t.ball.expmap0(t.mu(h))
        scale_t = torch.clamp(torch.exp(0.5 * t.log_var(h)), 1e-3, 10.0)
    mu_j, scale_j = model.apply({"params": params}, jnp.asarray(x), method="encode")
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale_j), scale_t.numpy(), atol=1e-5)

    z = np.asarray(mu_j)
    with torch.no_grad():
        xh_t = _to_nhwc(t.decoder(torch.from_numpy(z)))
    xh_j = np.asarray(model.apply({"params": params}, jnp.asarray(z), method="decode"))
    np.testing.assert_allclose(xh_j, xh_t, atol=1e-5)


def test_hyperbolic_image_riemannian_variant_mapping():
    """mobius encoder-last / geodesic decoder-first: RiemannianLayer
    _weight/_bias map to weight_t0/bias_scalar with the feature-axis
    permutation on the right axis (structure + exact array checks)."""
    f = 32 * 16
    rng = np.random.default_rng(5)
    sd = {
        "encoder.0.weight": rng.normal(size=(16, 1, 3, 3)).astype(np.float32),
        "encoder.0.bias": np.zeros(16, np.float32),
        "encoder.2.weight": rng.normal(size=(32, 16, 3, 3)).astype(np.float32),
        "encoder.2.bias": np.zeros(32, np.float32),
        "encoder.4.weight": rng.normal(size=(32, 32, 3, 3)).astype(np.float32),
        "encoder.4.bias": np.zeros(32, np.float32),
        "mu._weight": rng.normal(size=(2, f)).astype(np.float32),
        "mu._bias": rng.normal(size=(2, 1)).astype(np.float32),
        "log_var.weight": rng.normal(size=(2, f)).astype(np.float32),
        "log_var.bias": np.zeros(2, np.float32),
        "decoder.0._weight": rng.normal(size=(f, 2)).astype(np.float32),
        "decoder.0._bias": rng.normal(size=(f, 1)).astype(np.float32),
        "decoder.3.weight": rng.normal(size=(32, 32, 3, 3)).astype(np.float32),
        "decoder.3.bias": np.zeros(32, np.float32),
        "decoder.5.weight": rng.normal(size=(32, 32, 3, 3)).astype(np.float32),
        "decoder.5.bias": np.zeros(32, np.float32),
        "decoder.7.weight": rng.normal(size=(32, 16, 3, 3)).astype(np.float32),
        "decoder.7.bias": np.zeros(16, np.float32),
        "decoder.9.weight": rng.normal(size=(16, 16, 3, 3)).astype(np.float32),
        "decoder.9.bias": np.zeros(16, np.float32),
        "decoder.11.weight": rng.normal(size=(16, 1, 3, 3)).astype(np.float32),
        "decoder.11.bias": np.zeros(1, np.float32),
    }
    model = HyperbolicImageVAE(
        data_shape=(32, 32, 1), latent_dim=2,
        encoder_last_layer_module="mobius",
        decoder_first_layer_module="geodesic",
    )
    params = import_torch_state_dict(model, sd)
    perm = np.arange(f).reshape(32, 4, 4).transpose(1, 2, 0).reshape(-1)
    np.testing.assert_array_equal(
        np.asarray(params["mu_mobius"]["weight_t0"]), sd["mu._weight"][:, perm]
    )
    np.testing.assert_array_equal(
        np.asarray(params["mu_mobius"]["bias_scalar"]), sd["mu._bias"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["dec_first"]["weight_t0"]), sd["decoder.0._weight"][perm, :]
    )
    np.testing.assert_array_equal(
        np.asarray(params["dec_first"]["bias_scalar"]), sd["decoder.0._bias"][perm]
    )
    # the full model still runs with the imported params
    out = model.apply(
        {"params": params},
        jnp.zeros((2, 32, 32, 1)),
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    assert np.all(np.isfinite(np.asarray(out["x_hat"])))


# --------------------------------------------------------------------- #
# loading & validation


def test_load_torch_state_dict_formats(tmp_path):
    torch.manual_seed(6)
    t = _TorchOneB()
    sd = t.state_dict()

    ckpt = tmp_path / "epoch=9.ckpt"
    torch.save(
        {"state_dict": {f"model.{k}": v for k, v in sd.items()}, "epoch": 9},
        ckpt,
    )
    loaded = load_torch_state_dict(ckpt)
    assert set(loaded) == set(sd)  # "model." prefix stripped

    npz = tmp_path / "weights.npz"
    np.savez(npz, **{k: v.detach().numpy() for k, v in sd.items()})
    loaded2 = load_torch_state_dict(npz)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], loaded2[k])

    model = RNASeqVAE(in_features=20, hidden_dim=8, latent_dim=2)
    p1 = import_torch_state_dict(model, loaded)
    p2 = import_torch_state_dict(model, loaded2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_structure_mismatch_raises():
    torch.manual_seed(7)
    t = _TorchOneB(features=20, hidden=8, latent=2)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    with pytest.raises(ValueError, match="shapes|structure|Linear|encoder"):
        import_torch_state_dict(
            RNASeqVAE(in_features=21, hidden_dim=8, latent_dim=2), sd
        )
    with pytest.raises(ValueError, match="no torch importer"):
        import_torch_state_dict(object(), sd)


# --------------------------------------------------------------------- #
# CLI: torch ckpt -> self-describing Orbax checkpoint


def test_detect_family():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "experiments"))
    from import_torch_checkpoint import detect_family

    conv = np.zeros((4, 3, 3, 3), np.float32)
    assert detect_family({"encoder.net.0.weight": conv}) == "autoencoder"
    assert detect_family({"encoder.0.weight": conv, "encoder.6.weight": conv}) == "euclidean"
    assert detect_family({"encoder.0.weight": conv}) == "hyperbolic-image"
    lin = np.zeros((8, 20), np.float32)
    assert detect_family({"encoder.1.weight": lin, "encoder.3.weight": lin}) == "gyroplane"
    assert detect_family({"encoder.0.weight": lin}) == "unified"


def test_import_cli_end_to_end(tmp_path):
    """Lightning .ckpt -> import CLI -> restore_model -> encode parity
    with the direct import path (slow-ish: subprocess + orbax)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    torch.manual_seed(8)
    t = _TorchFlagship(numel=28 * 28)
    ckpt = tmp_path / "epoch=42.ckpt"
    torch.save(
        {
            "state_dict": t.state_dict(),
            "hyper_parameters": {
                "data_shape": [1, 28, 28],
                "manifold_curvature": 1.0,
                "beta": 1.0,
                "prior_scale": 1.0,
            },
        },
        ckpt,
    )
    repo = Path(__file__).resolve().parent.parent
    out = tmp_path / "imported"
    env = dict(os.environ)
    env["HVAE_FORCE_CPU"] = "1"
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
    proc = subprocess.run(
        [sys.executable, str(repo / "experiments/import_torch_checkpoint.py"),
         str(ckpt), "--out", str(out)],
        cwd=repo / "experiments", env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "GyroplaneVAE" in proc.stdout

    from hyperbolic_vae_tpu.train.checkpoint import restore_model

    model, params, meta = restore_model(str(out), "best")
    assert type(model).__name__ == "GyroplaneVAE"
    assert tuple(model.data_shape) == (28, 28, 1)
    assert meta["imported_from"].endswith("epoch=42.ckpt")

    x = np.random.default_rng(8).random((3, 28, 28, 1), np.float32)
    mu_j, _ = model.apply({"params": params}, jnp.asarray(x), method="encode")
    with torch.no_grad():
        mu_t, _ = t.encode(torch.from_numpy(x.copy()))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-5)


def test_finetune_imported_checkpoint():
    """Imported torch weights warm-start Trainer.fit (the migrate-then-
    fine-tune path): loss decreases from the imported starting point."""
    from hyperbolic_vae_tpu.data import mnist
    from hyperbolic_vae_tpu.train import Trainer

    torch.manual_seed(9)
    t = _TorchFlagship(numel=28 * 28)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
    params = import_torch_state_dict(model, sd)

    dm = mnist.make_data_module(batch_size=64, synthetic=True, n_train=512, n_test=64)
    trainer = Trainer(model, max_epochs=3, early_stopping_patience=None,
                      check_finite=False)
    first = trainer.evaluate(dm, params, split="val")["val/loss_total"]
    res = trainer.fit(dm, params=params)
    assert np.isfinite(res.history[-1]["val/loss_total"])
    assert res.history[-1]["val/loss_total"] < first


# --------------------------------------------------------------------- #
# reverse direction: export to torch layout (round-trip pins both maps)


@pytest.mark.parametrize("family", [
    "gyroplane", "rnaseq", "euclidean", "autoencoder",
    "himage_gyroplane", "himage_riemannian",
])
def test_export_import_round_trip(family):
    """export_torch_state_dict inverts import exactly: random flax params
    -> torch layout -> re-import == identity, for every family/variant."""
    from hyperbolic_vae_tpu.interop import export_torch_state_dict

    key = jax.random.PRNGKey(hash(family) % (2**31))
    if family == "gyroplane":
        model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
        x = jnp.zeros((1, 28, 28, 1))
    elif family == "rnaseq":
        model = RNASeqVAE(in_features=20, hidden_dim=8, latent_dim=2)
        x = jnp.zeros((1, 20))
    elif family == "euclidean":
        model = EuclideanVAE(data_shape=(32, 32, 3), hidden_size=4, latent_dim=2)
        x = jnp.zeros((1, 32, 32, 3))
    elif family == "autoencoder":
        model = Autoencoder(data_shape=(32, 32, 3), base_channel_size=4, latent_dim=16)
        x = jnp.zeros((1, 32, 32, 3))
    elif family == "himage_gyroplane":
        model = HyperbolicImageVAE(
            data_shape=(32, 32, 1), latent_dim=2,
            decoder_first_layer_module="geoopt_gyroplane")
        x = jnp.zeros((1, 32, 32, 1))
    else:
        model = HyperbolicImageVAE(
            data_shape=(32, 32, 1), latent_dim=2,
            encoder_last_layer_module="mobius",
            decoder_first_layer_module="geodesic")
        x = jnp.zeros((1, 32, 32, 1))

    params = model.init({"params": key, "sample": key}, x)["params"]
    sd = export_torch_state_dict(model, params)
    back = import_torch_state_dict(model, sd)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b),
                                      err_msg=str(pa))


def test_export_loads_into_torch_module():
    """Exported state_dict loads into the torch replica and reproduces
    our forward exactly (flagship; gyroplane bias carried over)."""
    from hyperbolic_vae_tpu.interop import export_torch_state_dict

    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
    key = jax.random.PRNGKey(11)
    params = model.init({"params": key, "sample": key},
                        jnp.zeros((1, 28, 28, 1)))["params"]
    sd = export_torch_state_dict(model, params)

    t = _TorchFlagship(numel=784)
    # our layer has a bias; the geoopt stand-in is constructed with one
    t.decoder[0] = _GyroplanesTorch(2, 16, 1.0, bias=True)
    t.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()})

    x = np.random.default_rng(11).random((4, 28, 28, 1), np.float32)
    mu_j, scale_j = model.apply({"params": params}, jnp.asarray(x), method="encode")
    with torch.no_grad():
        mu_t, scale_t = t.encode(torch.from_numpy(x.copy()))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale_j), scale_t.numpy(), atol=1e-5)


def test_unconsumed_source_weights_raise():
    """Round-5 review finding: an importer must never silently drop
    source weights. Extra decoder Linears hit the layout check; extra
    non-Sequential heads hit the consumed-keys audit."""
    torch.manual_seed(8)
    t = _TorchOneB(features=20, hidden=8, latent=2)
    model = RNASeqVAE(in_features=20, hidden_dim=8, latent_dim=2)

    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    sd["decoder.4.weight"] = np.zeros((20, 20), np.float32)
    sd["decoder.4.bias"] = np.zeros((20,), np.float32)
    with pytest.raises(ValueError, match="one decoder Linear"):
        import_torch_state_dict(model, sd)

    sd2 = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    sd2["aux_head.weight"] = np.zeros((3, 20), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        import_torch_state_dict(model, sd2)


def test_geoopt_curvature_params_validated_not_rejected():
    """Authentic geoopt checkpoints carry the ball curvature as an
    nn.Parameter under EVERY module holding the manifold (the reference
    assigns the ball as a submodule, vae_hyperbolic_gyroplane_decoder.py
    :58 — so real state_dicts have 'manifold.k', 'decoder.0.ball.k',
    ...; geoopt Stereographic stores k = -c). Round-5 session-3 review:
    the unconsumed-weights audit must treat these as validated geometry
    hyperparameters, not reject every authentic checkpoint."""
    torch.manual_seed(10)
    t = _TorchFlagship(numel=28 * 28)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    sd["manifold.k"] = np.asarray(-1.0, np.float32)
    sd["decoder.0.ball.k"] = np.asarray([-1.0], np.float32)
    # softplus-inverse storage (geoopt's learnable-curvature form):
    # an authentic c=1.0 checkpoint carries isp_c = log(e^1 - 1)
    sd["mu.1.manifold.isp_c"] = np.asarray(
        np.log(np.expm1(1.0)), np.float32
    )
    model = GyroplaneVAE(data_shape=(28, 28, 1), latent_dim=2)
    params = import_torch_state_dict(model, sd)
    assert "kernel" in params["mu"]

    # curvature mismatch is a wrong-pairing error, not a silent accept
    sd_bad = dict(sd)
    sd_bad["manifold.k"] = np.asarray(-2.5, np.float32)
    with pytest.raises(ValueError, match="curvature"):
        import_torch_state_dict(model, sd_bad)

    # k > 0 is SPHERICAL geometry — must not abs() into a ball import
    sd_sph = dict(sd)
    sd_sph["manifold.k"] = np.asarray(1.0, np.float32)
    with pytest.raises(ValueError, match="SPHERICAL"):
        import_torch_state_dict(model, sd_sph)

    # a stray unmapped scalar merely ENDING in .c/.k is NOT curvature —
    # it must still fail the unconsumed-weights audit
    sd_stray = dict(sd)
    sd_stray["temperature.c"] = np.asarray(1.0, np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        import_torch_state_dict(model, sd_stray)


def test_curvature_param_on_euclidean_target_raises():
    torch.manual_seed(11)
    t = _TorchEuclidean()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    sd["manifold.k"] = np.asarray(-1.0, np.float32)
    model = EuclideanVAE(data_shape=(32, 32, 3), hidden_size=4, latent_dim=2)
    with pytest.raises(ValueError, match="Euclidean"):
        import_torch_state_dict(model, sd)


def test_unsafe_pickle_fallback_is_opt_in(tmp_path):
    """weights_only=True failures must NOT silently fall back to full
    pickle (which executes code embedded in the file) — the fallback
    requires allow_unsafe_pickle=True (round-5 review finding)."""
    import argparse

    torch.manual_seed(9)
    t = _TorchOneB(features=20, hidden=8, latent=2)
    path = tmp_path / "meta.ckpt"
    # Namespace is not on the weights-only allowlist -> load rejects it
    torch.save(
        {"state_dict": t.state_dict(), "meta": argparse.Namespace(x=1)}, path
    )
    with pytest.raises(ValueError, match="allow_unsafe_pickle"):
        load_torch_state_dict(path)
    loaded = load_torch_state_dict(path, allow_unsafe_pickle=True)
    assert set(loaded) == set(t.state_dict())
