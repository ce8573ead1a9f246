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


def _glu_expert(sd, prefix):
    """GLUExpert Linear trio -> our SwiGLU names (reference moe.py:36-49)."""
    return {"linear1": _linear(sd, prefix + ".linear1"),
            "gate": _linear(sd, prefix + ".gate"),
            "linear2": _linear(sd, prefix + ".linear2")}


def _glu_expert_stack(sd, prefix, n_experts):
    """n GLUExperts -> stacked (E, D, F) arrays (ops/moe.py GLUExpertStack)."""
    w1 = np.stack([_np(sd, f"{prefix}.{e}.linear1.weight").T
                   for e in range(n_experts)])
    b1 = np.stack([_np(sd, f"{prefix}.{e}.linear1.bias")
                   for e in range(n_experts)])
    wg = np.stack([_np(sd, f"{prefix}.{e}.gate.weight").T
                   for e in range(n_experts)])
    bg = np.stack([_np(sd, f"{prefix}.{e}.gate.bias")
                   for e in range(n_experts)])
    w2 = np.stack([_np(sd, f"{prefix}.{e}.linear2.weight").T
                   for e in range(n_experts)])
    b2 = np.stack([_np(sd, f"{prefix}.{e}.linear2.bias")
                   for e in range(n_experts)])
    return {"w1": w1, "b1": b1, "wg": wg, "bg": bg, "w2": w2, "b2": b2}


def _shared_moe(sd, prefix, n_experts=6):
    """SharedMoELayer -> our MoELayer params (reference moe.py:203-302)."""
    out = {"gate": _linear(sd, prefix + ".gate"),
           "experts": _glu_expert_stack(sd, prefix + ".experts", n_experts)}
    if f"{prefix}.shared_expert.linear1.weight" in sd:
        out["shared_expert"] = {
            "w1": _np(sd, f"{prefix}.shared_expert.linear1.weight").T[None],
            "b1": _np(sd, f"{prefix}.shared_expert.linear1.bias")[None],
            "wg": _np(sd, f"{prefix}.shared_expert.gate.weight").T[None],
            "bg": _np(sd, f"{prefix}.shared_expert.gate.bias")[None],
            "w2": _np(sd, f"{prefix}.shared_expert.linear2.weight").T[None],
            "b2": _np(sd, f"{prefix}.shared_expert.linear2.bias")[None],
        }
    return out


def convert_reference_amt_v2(sd, n_layers: int = 6, n_experts: int = 6
                             ) -> Dict[str, Any]:
    """V2-family state_dict (3 SwiGLU + 3 SharedMoE layers, reference
    model/video_music_transformer.py:316-437) -> flax params matching
    ``amt_config("2.x")``. Works for 2.0/2.1/2.2 (2.3's KAN experts need a
    KANLinear map)."""
    params: Dict[str, Any] = {
        "embedding_root": {"embedding": _np(sd, "embedding_root.weight")},
        "embedding_attr": {"embedding": _np(sd, "embedding_attr.weight")},
        "Linear_chord": _linear(sd, "Linear_chord"),
        "Linear_vis": _linear(sd, "Linear_vis"),
    }
    if "Wout.weight" in sd:
        params["Wout"] = _linear(sd, "Wout")
    else:
        params["Wout_root"] = _linear(sd, "Wout_root")
        params["Wout_attr"] = _linear(sd, "Wout_attr")
    if "positional_embedding.weight" in sd:  # version 2.0
        params["pe_chord"] = {
            "embedding": _np(sd, "positional_embedding.weight")}
        params["pe_video"] = {
            "embedding": _np(sd, "positional_embedding_video.weight")}
    rate = min(3, max(0, n_layers - 1))
    for i in range(n_layers):
        e = f"transformer.encoder.layers.{i}."
        enc = {"self_attn": _mha(sd, e + "self_attn"),
               "norm1": _norm(sd, e + "norm1"),
               "norm2": _norm(sd, e + "norm2")}
        enc["ffn"] = (_glu_expert(sd, e + "ff") if i < rate
                      else _shared_moe(sd, e + "ff", n_experts))
        params[f"enc_{i}"] = enc
        d = f"transformer.decoder.layers.{i}."
        dec = {"self_attn": _mha(sd, d + "self_attn"),
               "cross_attn": _mha(sd, d + "cross_attn"),
               "norm1": _norm(sd, d + "norm1"),
               "norm2": _norm(sd, d + "norm2"),
               "norm3": _norm(sd, d + "norm3")}
        dec["ffn"] = (_glu_expert(sd, d + "ff") if i < rate
                      else _shared_moe(sd, d + "ff", n_experts))
        params[f"dec_{i}"] = dec
    params["encoder_norm"] = _norm(sd, "transformer.encoder.norm")
    params["decoder_norm"] = _norm(sd, "transformer.decoder.norm")
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
