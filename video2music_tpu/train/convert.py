"""Reference-checkpoint conversion: torch ``state_dict`` pickles -> flax
params.

The reference saves bare ``model.state_dict()`` pickles
(``train.py:337-341``). These functions map them weight-for-weight onto the
flax trees of this framework so existing trained models carry over:

  * base AMT (``VideoMusicTransformer`` with rpr=True,
    reference model/video_music_transformer.py:910-977 + model/rpr.py) via
    :func:`convert_reference_amt`;
  * the regression models with RNN backbones via
    :func:`convert_reference_regression`.

torch Linear stores (out, in) — flax Dense stores (in, out); packed qkv
``in_proj_weight`` (3D, D) splits into per-projection kernels. The fork's V1
to V3 variants use bespoke torch modules and can be added by extending the
name maps here.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(sd, k):
    v = sd[k]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _linear(sd, k):
    return {"kernel": _np(sd, k + ".weight").T, "bias": _np(sd, k + ".bias")}


def _norm(sd, k):
    return {"scale": _np(sd, k + ".weight"), "bias": _np(sd, k + ".bias")}


def _mha(sd, prefix, *, er: bool = False) -> Dict[str, Any]:
    """torch MultiheadAttention(RPR) -> our MultiHeadAttention params."""
    w = _np(sd, prefix + ".in_proj_weight")
    b = _np(sd, prefix + ".in_proj_bias")
    D = w.shape[1]
    out = {
        "q_proj": {"kernel": w[:D].T, "bias": b[:D]},
        "k_proj": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
        "v_proj": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
        "out_proj": _linear(sd, prefix + ".out_proj"),
    }
    if er:
        out["Er"] = _np(sd, prefix + ".Er")
    return out


def convert_transformer_core(sd, n_layers: int, *, prefix: str = "transformer.",
                             rpr_decoder: bool = True) -> Dict[str, Any]:
    """torch ``nn.Transformer`` (+ RPR custom decoder) -> enc_i/dec_i trees."""
    params: Dict[str, Any] = {}
    for i in range(n_layers):
        e = f"{prefix}encoder.layers.{i}."
        params[f"enc_{i}"] = {
            "self_attn": _mha(sd, e + "self_attn"),
            "ffn": {"Dense_0": _linear(sd, e + "linear1"),
                    "Dense_1": _linear(sd, e + "linear2")},
            "norm1": _norm(sd, e + "norm1"),
            "norm2": _norm(sd, e + "norm2"),
        }
        d = f"{prefix}decoder.layers.{i}."
        params[f"dec_{i}"] = {
            "self_attn": _mha(sd, d + "self_attn", er=rpr_decoder),
            "cross_attn": _mha(sd, d + "multihead_attn"),
            "ffn": {"Dense_0": _linear(sd, d + "linear1"),
                    "Dense_1": _linear(sd, d + "linear2")},
            "norm1": _norm(sd, d + "norm1"),
            "norm2": _norm(sd, d + "norm2"),
            "norm3": _norm(sd, d + "norm3"),
        }
    params["encoder_norm"] = _norm(sd, prefix + "encoder.norm")
    params["decoder_norm"] = _norm(sd, prefix + "decoder.norm")
    return params


def convert_reference_amt(sd, n_layers: int = 6) -> Dict[str, Any]:
    """Base AMT state_dict -> VideoMusicTransformer flax params
    (reference: model/video_music_transformer.py:910-977)."""
    params = convert_transformer_core(sd, n_layers)
    params["embedding_root"] = {"embedding": _np(sd, "embedding_root.weight")}
    params["embedding_attr"] = {"embedding": _np(sd, "embedding_attr.weight")}
    params["Linear_chord"] = _linear(sd, "Linear_chord")
    params["Linear_vis"] = _linear(sd, "Linear_vis")
    params["Wout"] = _linear(sd, "Wout")
    if "scene_embedding.weight" in sd:
        params["scene_embedding"] = {
            "embedding": _np(sd, "scene_embedding.weight")}
    return params


def convert_reference_regression(sd, reg_model: str = "bilstm"
                                 ) -> Dict[str, Any]:
    """VideoRegression state_dict -> flax params for RNN/CNN backbones
    (reference: model/video_regression.py:104-245). RNN weights keep torch's
    (gates*H, in) layout and names (ops/scan.py consumes them directly)."""
    params: Dict[str, Any] = {
        "in_proj": _linear(sd, "in_proj.0"),
        "regressor": _linear(sd, "regressor"),
        "classifier": _linear(sd, "classifier.0"),
    }
    rnn = {}
    for k in sd:
        if k.startswith("model.") and ("weight_" in k or "bias_" in k):
            rnn[k[len("model."):]] = _np(sd, k)
    if reg_model in ("cnngru", "cnnbigru"):
        # Sequential(cnn, silu, dropout) then GRU (reference :86-104)
        params["model"] = {
            "cnn": {"kernel": np.transpose(_np(sd, "model.0.weight"),
                                           (2, 1, 0)),
                    "bias": _np(sd, "model.0.bias")},
            "gru": rnn,
        }
    else:
        params["model"] = rnn
    return params
