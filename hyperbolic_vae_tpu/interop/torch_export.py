"""Export flax params back to reference-layout torch state_dicts.

The inverse of torch_import.py: weights trained here (on TPU) become a
state_dict the reference's torch modules load, so results remain
portable to torch-land analyses (geoopt tooling, existing notebooks):

    sd = export_torch_state_dict(model, params)
    np.savez("weights.npz", **sd)        # or torch.save(dict(sd), ...)

Exact inverse of every import transform (round-trip == identity, tested
per family in tests/test_torch_import.py). One representability caveat:
this framework's PoincareHyperplanes has a trained Euclidean bias;
geoopt's Distance2StereographicHyperplanes (the reference flagship's
decoder.0, vae_hyperbolic_gyroplane_decoder.py:70-74) has none. The
export keeps the bias under ``<layer>.bias`` — load with the reference's
OWN Distance2PoincareHyperplanes (layers.py:150-228; identical forward
WITH bias), or drop it via torch's ``strict=False`` (changes outputs by
the bias).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hyperbolic_vae_tpu.interop.torch_import import _chw_to_hwc_perm

__all__ = ["export_torch_state_dict"]


def _np(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a, np.float32), tree)


def _inv(perm):
    return np.argsort(perm)


def _lin_out(p, key, sd, in_perm=None, out_perm=None):
    w = p["kernel"].T.copy()  # (out, in)
    b = p["bias"].copy()
    if in_perm is not None:
        w = w[:, _inv(in_perm)]
    if out_perm is not None:
        inv = _inv(out_perm)
        w, b = w[inv, :], b[inv]
    sd[f"{key}.weight"], sd[f"{key}.bias"] = w, b


def _conv_out(p, key, sd):
    # (kh, kw, in, out) -> (out, in, kh, kw)
    sd[f"{key}.weight"] = np.ascontiguousarray(p["kernel"].transpose(3, 2, 0, 1))
    sd[f"{key}.bias"] = p["bias"].copy()


def _convt_out(p, key, sd):
    # inverse of flip + (in, out, kh, kw)->(kh, kw, in, out)
    k = p["kernel"][::-1, ::-1].transpose(2, 3, 0, 1)
    sd[f"{key}.weight"] = np.ascontiguousarray(k)
    sd[f"{key}.bias"] = p["bias"].copy()


def _gyro_out(p, key, sd, out_perm=None):
    pts, b = p["mp_points"].copy(), p["bias"].copy()
    if out_perm is not None:
        inv = _inv(out_perm)
        pts, b = pts[inv], b[inv]
    sd[f"{key}.points"] = pts
    sd[f"{key}.bias"] = b  # see module docstring re geoopt's bias-less layer


def _riem_out(p, key, sd, in_perm=None, out_perm=None):
    w = p["weight_t0"].copy()
    b = (p.get("bias_scalar") if "bias_scalar" in p else p["mp_bias"]).copy()
    if in_perm is not None:
        inv = _inv(in_perm)
        w = w[:, inv]
        if b.shape[-1] == w.shape[-1]:
            b = b[:, inv]
    if out_perm is not None:
        inv = _inv(out_perm)
        w, b = w[inv, :], b[inv]
    sd[f"{key}._weight"], sd[f"{key}._bias"] = w, b


def _export_gyroplane(model, p):
    sd: Dict[str, np.ndarray] = {}
    # reference Sequential indices: Flatten at 0, Linear at odd slots
    for i in range(len(model.hidden_dims)):
        _lin_out(p[f"enc_{i}"], f"encoder.{2 * i + 1}", sd)
    _lin_out(p["mu"], "mu.0", sd)
    _lin_out(p["scale"], "scale.0", sd)
    _gyro_out(p["gyroplanes"], "decoder.0", sd)
    n_dec = len(model.hidden_dims) - 1
    for i in range(n_dec):
        _lin_out(p[f"dec_{i}"], f"decoder.{2 * (i + 1)}", sd)
    _lin_out(p["out"], f"decoder.{2 * (n_dec + 1)}", sd)
    return sd


def _export_unified(model, p):
    sd: Dict[str, np.ndarray] = {}
    # reference: Flatten first only for multi-dim inputs (vae_one_b.py:104-108)
    multi = len(getattr(model, "input_size", (0,))) > 1
    _lin_out(p["enc"], f"encoder.{1 if multi else 0}", sd)
    _lin_out(p["mu"], "mu.0", sd)
    if "scale" in p:
        _lin_out(p["scale"], "scale.0", sd)
    if "gyroplanes" in p:
        _gyro_out(p["gyroplanes"], "decoder.0", sd)
    else:
        _lin_out(p["dec_first"], "decoder.0", sd)
    _lin_out(p["dec_out"], "decoder.2", sd)
    return sd


def _export_euclidean(model, p):
    perm = _chw_to_hwc_perm(
        2 * model.hidden_size, model.data_shape[0] // 8, model.data_shape[1] // 8
    )
    sd: Dict[str, np.ndarray] = {}
    for i in range(5):
        _conv_out(p["encoder"][f"Conv_{i}"], f"encoder.{2 * i}", sd)
    _lin_out(p["mu"], "mu", sd, in_perm=perm)
    _lin_out(p["log_var"], "log_var", sd, in_perm=perm)
    d = p["decoder"]
    _lin_out(d["Dense_0"], "decoder.0", sd, out_perm=perm)
    _convt_out(d["ConvTranspose_0"], "decoder.3", sd)
    _conv_out(d["Conv_0"], "decoder.5", sd)
    _convt_out(d["ConvTranspose_1"], "decoder.7", sd)
    _conv_out(d["Conv_1"], "decoder.9", sd)
    _convt_out(d["ConvTranspose_2"], "decoder.11", sd)
    return sd


def _export_autoencoder(model, p):
    perm = _chw_to_hwc_perm(
        2 * model.base_channel_size,
        model.data_shape[0] // 8,
        model.data_shape[1] // 8,
    )
    sd: Dict[str, np.ndarray] = {}
    for i in range(5):
        _conv_out(p["encoder"][f"Conv_{i}"], f"encoder.net.{2 * i}", sd)
    _lin_out(p["latent"], "encoder.net.11", sd, in_perm=perm)
    d = p["decoder"]
    _lin_out(d["Dense_0"], "decoder.linear.0", sd, out_perm=perm)
    _convt_out(d["ConvTranspose_0"], "decoder.net.0", sd)
    _conv_out(d["Conv_0"], "decoder.net.2", sd)
    _convt_out(d["ConvTranspose_1"], "decoder.net.4", sd)
    _conv_out(d["Conv_1"], "decoder.net.6", sd)
    _convt_out(d["ConvTranspose_2"], "decoder.net.8", sd)
    return sd


def _export_hyperbolic_image(model, p):
    perm = _chw_to_hwc_perm(
        32, model.data_shape[0] // 8, model.data_shape[1] // 8
    )
    sd: Dict[str, np.ndarray] = {}
    _conv_out(p["conv1"], "encoder.0", sd)
    _conv_out(p["conv2"], "encoder.2", sd)
    _conv_out(p["conv3"], "encoder.4", sd)
    if "mu" in p:
        _lin_out(p["mu"], "mu", sd, in_perm=perm)
    else:
        _riem_out(p["mu_mobius"], "mu", sd, in_perm=perm)
    _lin_out(p["log_var"], "log_var", sd, in_perm=perm)
    dec = p["dec_first"]
    if "mp_points" in dec:
        _gyro_out(dec, "decoder.0", sd, out_perm=perm)
    elif "weight_t0" in dec:
        _riem_out(dec, "decoder.0", sd, out_perm=perm)
    else:
        _lin_out(dec, "decoder.0", sd, out_perm=perm)
    _convt_out(p["deconv1"], "decoder.3", sd)
    _conv_out(p["conv4"], "decoder.5", sd)
    _convt_out(p["deconv2"], "decoder.7", sd)
    _conv_out(p["conv5"], "decoder.9", sd)
    _convt_out(p["deconv3"], "decoder.11", sd)
    return sd


_EXPORTERS = {
    "GyroplaneVAE": _export_gyroplane,
    "UnifiedVAE": _export_unified,
    "VAE": _export_unified,
    "RNASeqVAE": _export_unified,
    "EuclideanVAE": _export_euclidean,
    "Autoencoder": _export_autoencoder,
    "HyperbolicImageVAE": _export_hyperbolic_image,
}


def export_torch_state_dict(model, params) -> Dict[str, np.ndarray]:
    """``params`` (this framework's bare tree, f32-cast) -> a state_dict
    in the matching reference torch module's layout."""
    name = type(model).__name__
    if name not in _EXPORTERS:
        raise ValueError(
            f"no torch exporter for model class {name!r}; supported: "
            f"{sorted(_EXPORTERS)}"
        )
    return _EXPORTERS[name](model, _np(params))
