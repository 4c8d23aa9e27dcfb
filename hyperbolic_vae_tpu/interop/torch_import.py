"""Import trained PyTorch checkpoints from the reference implementation.

A user of the reference (grisaitis/hyperbolic-vae) has Lightning
checkpoints trained with torch + geoopt. This module maps their
state_dicts onto this framework's flax parameter trees so the weights
can be served, evaluated, and fine-tuned here without retraining:

    sd = load_torch_state_dict("epoch=99.ckpt")        # or .npz / .pt
    model = GyroplaneVAE(data_shape=(32, 32, 1))
    params = import_torch_state_dict(model, sd)
    Inferencer(model, params, ...).warmup()

Supported source model classes (reference file -> target flax class):

  VAEHyperbolicGyroplaneDecoder (models/vae_hyperbolic_gyroplane_decoder.py:42)
      -> GyroplaneVAE
  VAE / "vae_one_b" (models/vae_one_b.py:17) -> UnifiedVAE, RNASeqVAE
  VAEEuclidean / VAEEuclideanExperiment (models/vae_euclidean.py:21,105)
      -> EuclideanVAE
  Autoencoder (models/autoencoder_nonvariational.py:101) -> Autoencoder
  ImageVAEHyperbolic / VAEHyperbolicExperiment (models/vae_hyperbolic.py:38,133)
      -> HyperbolicImageVAE

Weight-layout transforms applied (all verified by forward-parity tests
against torch, tests/test_torch_import.py):

  * Linear (out, in) -> Dense kernel (in, out): transpose.
  * Conv2d (out, in, kh, kw) -> flax Conv NHWC kernel (kh, kw, in, out).
  * ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, in, out) with a 180-degree spatial flip; the models use the
    explicit ((1, 2), (1, 2)) padding (models/vae_euclidean.py
    CONVT_PADDING) that reproduces torch's padding=1/output_padding=1
    geometry exactly.
  * Flatten order: torch flattens NCHW to (c, h, w); the NHWC models
    here flatten to (h, w, c). Linear weights that face a flattened
    feature axis get the corresponding permutation on that axis.
  * geoopt Distance2StereographicHyperplanes `points` and the
    reference's own Distance2PoincareHyperplanes `points`/`bias`
    -> PoincareHyperplanes `mp_points`/`bias` (zero bias when the
    source layer has none: identical forward).
  * RiemannianLayer `_weight`/`_bias` (layers.py:35-76)
    -> `weight_t0` / (`bias_scalar` | over-param `mp_bias`).

geoopt's ManifoldParameter cannot be unpickled without geoopt
installed; in that environment export a portable .npz first:

    import numpy as np, torch
    sd = torch.load(path, map_location="cpu")["state_dict"]
    np.savez(out, **{k: v.detach().cpu().numpy() for k, v in sd.items()})

The activation caveat: the reference uses exact-erf GELU, flax.linen's
default is the tanh approximation — imported weights reproduce torch
forward passes to ~1e-3 absolute through GELU stacks (exactly, when the
torch side uses nn.GELU(approximate="tanh"); the parity tests pin this).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["load_torch_state_dict", "import_torch_state_dict"]


# --------------------------------------------------------------------- #
# loading


def load_torch_state_dict(path, allow_unsafe_pickle: bool = False) -> Dict[str, np.ndarray]:
    """A flat {param_name: float ndarray} dict from a .npz export, a raw
    torch-saved state_dict, or a Lightning .ckpt (unwraps "state_dict",
    strips the experiment-wrapper prefix: VAEEuclideanExperiment stores
    the net under ``vae.``, VAEHyperbolicExperiment under ``model.``).

    ``allow_unsafe_pickle``: some Lightning ckpts carry non-tensor
    metadata the weights-only unpickler rejects; loading them requires
    full pickle, which EXECUTES code embedded in the file. That fallback
    is therefore opt-in — enable it only for checkpoints you produced
    yourself (a silent fallback would nullify weights_only entirely)."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            sd = {k: np.asarray(z[k]) for k in z.files}
    else:
        import torch

        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except Exception as e:
            if not allow_unsafe_pickle:
                raise ValueError(
                    f"{path} is not loadable with torch.load(weights_only="
                    f"True) ({e}). If this checkpoint is YOUR OWN artifact "
                    f"(e.g. a Lightning ckpt with non-tensor metadata), "
                    f"pass allow_unsafe_pickle=True — full pickle executes "
                    f"code embedded in the file, so never enable it for "
                    f"files from untrusted sources."
                ) from e
            raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        sd = {
            k: v.detach().cpu().numpy()
            for k, v in raw.items()
            if hasattr(v, "detach")
        }
    for prefix in ("vae.", "model."):
        if sd and all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    return sd


# --------------------------------------------------------------------- #
# leaf transforms


def _lin(sd, key, in_perm=None, out_perm=None):
    w = np.asarray(sd[f"{key}.weight"], np.float32)  # (out, in)
    b = np.asarray(sd[f"{key}.bias"], np.float32)
    if in_perm is not None:
        w = w[:, in_perm]
    if out_perm is not None:
        w, b = w[out_perm, :], b[out_perm]
    return {"kernel": np.ascontiguousarray(w.T), "bias": b}


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)  # (out, in, kh, kw)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def _convt(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)  # (in, out, kh, kw)
    return {
        "kernel": np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def _gyroplanes(sd, key, out_perm=None):
    """geoopt / reference hyperplane layers -> PoincareHyperplanes."""
    points = np.asarray(sd[f"{key}.points"], np.float32)  # (planes, dim)
    bias_key = f"{key}.bias"
    bias = (
        np.asarray(sd[bias_key], np.float32)
        if bias_key in sd
        # geoopt's layer has no bias term; zero is the identical forward
        else np.zeros((points.shape[0],), np.float32)
    )
    if out_perm is not None:
        points, bias = points[out_perm], bias[out_perm]
    return {"mp_points": points, "bias": bias}


def _riemannian(sd, key, in_perm=None, out_perm=None):
    """RiemannianLayer (_weight in T_0, _bias scalar-or-manifold-point,
    reference layers.py:35-76) -> _RiemannianParams (nn/layers.py)."""
    w = np.asarray(sd[f"{key}._weight"], np.float32)  # (out, in)
    b = np.asarray(sd[f"{key}._bias"], np.float32)  # (out, 1) | (out, in)
    if in_perm is not None:
        w = w[:, in_perm]
        if b.shape[-1] == w.shape[-1]:
            b = b[:, in_perm]
    if out_perm is not None:
        w, b = w[out_perm, :], b[out_perm]
    name = "mp_bias" if b.ndim == 2 and b.shape[1] > 1 else "bias_scalar"
    return {"weight_t0": w, name: b}


def _linear_indices(sd, prefix):
    """Sorted Sequential indices i with an ``{prefix}.{i}.weight`` entry."""
    out = []
    for k in sd:
        if k.startswith(prefix + ".") and k.endswith(".weight"):
            mid = k[len(prefix) + 1 : -len(".weight")]
            if mid.isdigit():
                out.append(int(mid))
    return sorted(out)


def _chw_to_hwc_perm(c, h, w):
    """perm[our_flat_hwc_index] = torch_flat_chw_index."""
    return np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).reshape(-1)


# --------------------------------------------------------------------- #
# per-family mappers
# (each returns the nested dict under "params" for the target model)


def _import_gyroplane(model, sd):
    """VAEHyperbolicGyroplaneDecoder -> GyroplaneVAE.

    Source layout (vae_hyperbolic_gyroplane_decoder.py:59-85):
    encoder.{1,3} Linear, mu.0 / scale.0 Linear, decoder.0 geoopt
    gyroplanes, decoder.{2,4} Linear. The reference flattens (c, h, w)
    but trains on 1-channel images, where torch's (c=1, h, w) flatten
    equals this framework's (h, w, c=1) — no permutation needed."""
    if len(model.data_shape) >= 3 and model.data_shape[-1] != 1:
        raise ValueError(
            "GyroplaneVAE import assumes single-channel images (flatten "
            f"order is channel-sensitive); got data_shape={model.data_shape}"
        )
    enc_idx = _linear_indices(sd, "encoder")
    dec_idx = _linear_indices(sd, "decoder")
    if not dec_idx:
        raise ValueError(
            "no decoder Linear layers found in the source state_dict "
            "(expected decoder.{2,4,...} after the decoder.0 gyroplanes)"
        )
    if len(enc_idx) != len(model.hidden_dims):
        raise ValueError(
            f"encoder has {len(enc_idx)} Linear layers, model.hidden_dims "
            f"is {model.hidden_dims}"
        )
    p = {f"enc_{i}": _lin(sd, f"encoder.{j}") for i, j in enumerate(enc_idx)}
    p["mu"] = _lin(sd, "mu.0")
    p["scale"] = _lin(sd, "scale.0")
    p["gyroplanes"] = _gyroplanes(sd, "decoder.0")
    for i, j in enumerate(dec_idx[:-1]):
        p[f"dec_{i}"] = _lin(sd, f"decoder.{j}")
    p["out"] = _lin(sd, f"decoder.{dec_idx[-1]}")
    return p


def _import_unified(model, sd):
    """vae_one_b.VAE -> UnifiedVAE / RNASeqVAE.

    Source layout (vae_one_b.py:50-73): encoder.[Flatten?].Linear.act,
    mu.0 (+ExpMap0), scale.0 (learned posterior only), decoder.0
    (Distance2PoincareHyperplanes | Linear), decoder.2 Linear."""
    enc_idx = _linear_indices(sd, "encoder")
    if len(enc_idx) != 1:
        raise ValueError(f"expected 1 encoder Linear, found indices {enc_idx}")
    p = {"enc": _lin(sd, f"encoder.{enc_idx[0]}"), "mu": _lin(sd, "mu.0")}
    if "scale.0.weight" in sd:
        p["scale"] = _lin(sd, "scale.0")
    elif getattr(model, "posterior_scale", "learned") == "learned":
        raise ValueError(
            "source checkpoint has no scale head (posterior_scale='fixed' "
            "in the reference); construct the target model accordingly"
        )
    if "decoder.0.points" in sd:
        p["gyroplanes"] = _gyroplanes(sd, "decoder.0")
    else:
        p["dec_first"] = _lin(sd, "decoder.0")
    dec_idx = [i for i in _linear_indices(sd, "decoder") if i != 0]
    # the vae_one_b decoder is exactly [first op, act, Linear] — a
    # source with more (or no) trailing Linears is a different
    # architecture; importing a subset would silently drop weights
    if len(dec_idx) != 1:
        raise ValueError(
            f"expected exactly one decoder Linear after decoder.0 "
            f"(vae_one_b.py decoder layout), found indices {dec_idx}"
        )
    p["dec_out"] = _lin(sd, f"decoder.{dec_idx[0]}")
    return p


def _conv_feature_perm(model):
    """Permutation for Linear weights facing the flattened conv features
    (torch flattens (2c, h/8, w/8) channels-first; these models flatten
    NHWC)."""
    c2 = 2 * getattr(model, "hidden_size", getattr(model, "base_channel_size", None))
    h8, w8 = model.data_shape[0] // 8, model.data_shape[1] // 8
    return _chw_to_hwc_perm(c2, h8, w8)


def _conv_stack(sd, pairs, conv_fn_by_kind):
    return {ours: conv_fn_by_kind[kind](sd, theirs) for ours, theirs, kind in pairs}


_KIND = {"conv": _conv, "convt": _convt}


def _import_euclidean(model, sd):
    """VAEEuclidean -> EuclideanVAE (vae_euclidean.py:31-88).

    encoder.{0,2,4,6,8} Conv, mu / log_var Linear (input = flattened
    conv features), decoder.0 Linear -> Unflatten, decoder.{3,7,11}
    ConvTranspose, decoder.{5,9} Conv."""
    perm = _conv_feature_perm(model)
    p = {
        "encoder": _conv_stack(
            sd,
            [(f"Conv_{i}", f"encoder.{2 * i}", "conv") for i in range(5)],
            _KIND,
        ),
        "mu": _lin(sd, "mu", in_perm=perm),
        "log_var": _lin(sd, "log_var", in_perm=perm),
        "decoder": {
            "Dense_0": _lin(sd, "decoder.0", out_perm=perm),
            **_conv_stack(
                sd,
                [
                    ("ConvTranspose_0", "decoder.3", "convt"),
                    ("Conv_0", "decoder.5", "conv"),
                    ("ConvTranspose_1", "decoder.7", "convt"),
                    ("Conv_1", "decoder.9", "conv"),
                    ("ConvTranspose_2", "decoder.11", "convt"),
                ],
                _KIND,
            ),
        },
    }
    return p


def _import_autoencoder(model, sd):
    """autoencoder_nonvariational.Autoencoder -> Autoencoder
    (autoencoder_nonvariational.py:25-97): encoder.net.{0,2,4,6,8} Conv
    + encoder.net.11 Linear; decoder.linear.0 Linear +
    decoder.net.{0,4,8} ConvTranspose / decoder.net.{2,6} Conv."""
    perm = _conv_feature_perm(model)
    return {
        "encoder": _conv_stack(
            sd,
            [(f"Conv_{i}", f"encoder.net.{2 * i}", "conv") for i in range(5)],
            _KIND,
        ),
        "latent": _lin(sd, "encoder.net.11", in_perm=perm),
        "decoder": {
            "Dense_0": _lin(sd, "decoder.linear.0", out_perm=perm),
            **_conv_stack(
                sd,
                [
                    ("ConvTranspose_0", "decoder.net.0", "convt"),
                    ("Conv_0", "decoder.net.2", "conv"),
                    ("ConvTranspose_1", "decoder.net.4", "convt"),
                    ("Conv_1", "decoder.net.6", "conv"),
                    ("ConvTranspose_2", "decoder.net.8", "convt"),
                ],
                _KIND,
            ),
        },
    }


def _import_hyperbolic_image(model, sd):
    """ImageVAEHyperbolic -> HyperbolicImageVAE (vae_hyperbolic.py:57-109):
    encoder.{0,2,4} Conv, mu (Linear | MobiusLayer), log_var Linear,
    decoder.0 (Linear | Geodesic | Mobius | geoopt gyroplanes),
    decoder.{3,7,11} ConvTranspose, decoder.{5,9} Conv."""
    h8, w8 = model.data_shape[0] // 8, model.data_shape[1] // 8
    perm = _chw_to_hwc_perm(32, h8, w8)
    p = {
        "conv1": _conv(sd, "encoder.0"),
        "conv2": _conv(sd, "encoder.2"),
        "conv3": _conv(sd, "encoder.4"),
        "log_var": _lin(sd, "log_var", in_perm=perm),
        "deconv1": _convt(sd, "decoder.3"),
        "conv4": _conv(sd, "decoder.5"),
        "deconv2": _convt(sd, "decoder.7"),
        "conv5": _conv(sd, "decoder.9"),
        "deconv3": _convt(sd, "decoder.11"),
    }
    if model.encoder_last_layer_module == "linear":
        p["mu"] = _lin(sd, "mu", in_perm=perm)
    else:
        p["mu_mobius"] = _riemannian(sd, "mu", in_perm=perm)
    d = model.decoder_first_layer_module
    if d == "linear":
        p["dec_first"] = _lin(sd, "decoder.0", out_perm=perm)
    elif d in ("geodesic", "mobius"):
        p["dec_first"] = _riemannian(sd, "decoder.0", out_perm=perm)
    elif d == "geoopt_gyroplane":
        p["dec_first"] = _gyroplanes(sd, "decoder.0", out_perm=perm)
    else:
        raise ValueError(d)
    return p


_IMPORTERS: Dict[str, Callable] = {
    "GyroplaneVAE": _import_gyroplane,
    "UnifiedVAE": _import_unified,
    "VAE": _import_unified,  # reference-parity alias of UnifiedVAE
    "RNASeqVAE": _import_unified,
    "EuclideanVAE": _import_euclidean,
    "Autoencoder": _import_autoencoder,
    "HyperbolicImageVAE": _import_hyperbolic_image,
}


# --------------------------------------------------------------------- #
# entry point


class _TrackedDict(dict):
    """state_dict wrapper recording which keys an importer actually READ
    (membership probes and iteration don't count — only consumed
    weights do), so unconsumed source weights fail loudly instead of
    being silently dropped."""

    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


_CURVATURE_LEAVES = ("k", "c", "isp_k", "isp_c")
_CURVATURE_PARENTS = ("manifold", "ball")


def _model_curvature(model):
    """The target model's ball curvature c (>0), or None for Euclidean."""
    for attr in ("manifold_curvature", "latent_curvature", "curvature"):
        v = getattr(model, attr, None)
        if v:
            return float(v)
    return None


def _source_curvature(key: str, raw: float) -> float:
    """Ball curvature c (>0) from a geoopt curvature entry, honoring the
    parameterization the leaf name declares:

      ``c``            the ball curvature directly (c > 0)
      ``k``            sectional curvature, k = -c for a Poincaré ball —
                       a POSITIVE k is spherical geometry and must not
                       silently import into a hyperbolic target
      ``isp_c/isp_k``  softplus-inverse storage (geoopt keeps the
                       learnable curvature as isp_c with
                       c = softplus(isp_c), so an authentic c=1.0
                       checkpoint carries isp_c ~= 0.5413)
    """
    leaf = key.split(".")[-1]
    if leaf in ("isp_c", "isp_k"):
        return float(np.logaddexp(0.0, raw))  # softplus
    if leaf == "k":
        if raw > 0:
            raise ValueError(
                f"source curvature {key!r} is k={raw} > 0 (SPHERICAL "
                f"geometry); the target expects a Poincaré ball (k<0) — "
                f"wrong source/target pairing"
            )
        return -raw
    return raw  # leaf == "c"


def import_torch_state_dict(model, sd: Dict[str, np.ndarray]):
    """Map a reference torch state_dict onto ``model``'s parameter tree.

    Returns the bare params tree (this framework's convention: the
    Trainer, serve.Inferencer, and checkpoints all carry params without
    the ``{"params": ...}`` wrapper; wrap for a raw ``model.apply``).
    Every produced leaf is validated against the model's own init
    structure (name-for-name, shape-for-shape) AND every source weight
    must be consumed by the mapping, so a mismatched architecture fails
    loudly in either direction, never silently."""
    name = type(model).__name__
    if name not in _IMPORTERS:
        raise ValueError(
            f"no torch importer for model class {name!r}; supported: "
            f"{sorted(_IMPORTERS)}"
        )
    tracked = _TrackedDict(sd)
    built = _IMPORTERS[name](model, tracked)
    leftover = set(tracked) - tracked.read
    # geoopt registers the ball's curvature as an nn.Parameter
    # (Stereographic stores k = -c), so every authentic checkpoint
    # carries scalar curvature entries under each module holding the
    # manifold — ``manifold.k``, ``decoder.0.ball.k``, ``mu.1.manifold.k``
    # etc. (reference vae_hyperbolic.py:56, vae_hyperbolic_gyroplane_
    # decoder.py:58 assign the ball as a submodule). They are geometry
    # hyperparameters, not weights: validate them against the target
    # model's curvature instead of rejecting them as unconsumed.
    # only leaves under a module actually named for the manifold count
    # as curvature (parent 'manifold'/'ball', the geoopt registration
    # paths) — a stray unmapped scalar that merely ENDS in .k/.c must
    # still fail the unconsumed-weights audit, not be swallowed here
    def _is_curvature_key(k):
        parts = k.split(".")
        return (
            parts[-1] in _CURVATURE_LEAVES
            and len(parts) >= 2
            and parts[-2] in _CURVATURE_PARENTS
            and np.asarray(dict.__getitem__(tracked, k)).size == 1
        )

    curv_keys = {k for k in leftover if _is_curvature_key(k)}
    c_model = _model_curvature(model)
    for k in sorted(curv_keys):
        raw = float(np.asarray(dict.__getitem__(tracked, k)).reshape(()))
        c_src = _source_curvature(k, raw)
        if c_model is None:
            raise ValueError(
                f"source checkpoint carries a manifold curvature parameter "
                f"{k!r} (c={c_src}) but the target {name} has a Euclidean "
                f"latent — wrong source/target pairing"
            )
        if not np.isclose(c_src, c_model, rtol=1e-5, atol=1e-6):
            raise ValueError(
                f"source curvature {k!r} is c={c_src:.6g} (raw {raw:.6g}) "
                f"but the target {name} was constructed with curvature "
                f"{c_model}; rebuild the target with the checkpoint's "
                f"curvature"
            )
    unconsumed = sorted(leftover - curv_keys)
    if unconsumed:
        raise ValueError(
            f"source weights not consumed by the {name} importer: "
            f"{unconsumed} — the checkpoint's architecture has layers "
            f"the target model does not (importing a subset would "
            f"silently drop them)"
        )

    from hyperbolic_vae_tpu.serve import model_data_shape

    shape = model_data_shape(model)
    expected = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1,) + shape, jnp.float32),
        )
    )["params"]

    exp_leaves = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_leaves = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(built)[0]
    }
    missing = sorted(set(exp_leaves) - set(got_leaves))
    extra = sorted(set(got_leaves) - set(exp_leaves))
    if missing or extra:
        raise ValueError(
            f"import structure mismatch for {name}: missing {missing}, "
            f"unexpected {extra}"
        )
    bad = [
        (k, got_leaves[k].shape, exp_leaves[k].shape)
        for k in exp_leaves
        if tuple(got_leaves[k].shape) != tuple(exp_leaves[k].shape)
    ]
    if bad:
        raise ValueError(f"imported shapes differ from {name}'s params: {bad}")
    return jax.tree.map(
        lambda leaf, exp: jnp.asarray(leaf, exp.dtype), built, expected
    )
