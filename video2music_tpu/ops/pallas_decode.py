"""Fused single-token decoder-layer step kernels for TPU.

The KV-cached decode scan is op-latency-bound: one XLA decode step of the
flagship AMT 2.2 issues ~130 small ops across 6 decoder layers (measured
~220 us/step device-side at B=1, vs ~95 us of pure HBM weight traffic).
These kernels collapse one whole decoder layer step — LayerNorms, fused QKV
projection, RoPE, KV-cache append, masked cached self-attention, cached
cross-attention, and the feed-forward (SwiGLU, or top-2 MoE with the
selected experts DMA'd from HBM while the shared expert computes) — into a
single ``pallas_call``, so a step is 6 kernel launches plus a handful of
embed/head glue ops.

Semantics mirror the XLA path exactly (post-norm LayerNorm(eps=1e-5)
residual blocks, f32 softmax/normalization, pairwise RoPE per
ops/embeddings.apply_rope, -1e9 causal mask, eval-mode top-k routing over
raw gate logits per ops/moe.py) for the decoder wiring of the V2 family
(reference: model/video_music_transformer.py:439-520 forward semantics;
the reference's own generate loop re-forwards the full prefix per token,
:522-609). Parity is enforced by tests/test_pallas_decode.py against the
unfused DecoderLayer step path.

Weight layout: packed host-side once per generate call (QKV kernels
concatenated, SwiGLU linear1|gate concatenated, per-pair-interleaved RoPE
cos/sin tables); XLA hoists the packing out of the decode scan as loop
invariants.

Int8 weight-only mode (``pack_decoder_layers(..., quantize="int8")``): the
decode step is HBM weight-traffic bound (see CLAUDE.md), so every large
matmul weight is stored int8 with a symmetric per-output-channel f32 scale
and dequantized *after* the dot — ``x @ (Wq * s) == (x @ Wq) * s`` for
per-column scales — halving the per-step HBM bytes. Biases, norms, the
tiny MoE gate, and all activations/caches stay in the compute dtype. The
same quantization applied to the unfused XLA path (fake-quant params) is
the numerical oracle (tests/test_pallas_decode.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .embeddings import rope_cache

NEG_INF = -1e9
LN_EPS = 1e-5


@functools.lru_cache(maxsize=None)
def rope_tables_interleaved(max_len: int, head_dim: int, n_heads: int = 1):
    """(S, head_dim * n_heads) cos/sin tables: each frequency repeated over
    its pair of lanes (cos[:, 2j] == cos[:, 2j+1]) and the per-head pattern
    tiled across the lane-concatenated heads."""
    cache = rope_cache(max_len, head_dim)  # (S, hd/2, 2)
    cos = np.repeat(cache[..., 0], 2, axis=-1).astype(np.float32)
    sin = np.repeat(cache[..., 1], 2, axis=-1).astype(np.float32)
    return np.tile(cos, (1, n_heads)), np.tile(sin, (1, n_heads))


def _rot_pairs(x):
    """Pairwise rotation helper: (x0, x1) -> (-x1, x0) per consecutive pair
    (the torchtune/apply_rope convention)."""
    n = x.shape[-1]
    left = pltpu.roll(x, n - 1, axis=x.ndim - 1)   # x[i+1] at even lanes
    right = pltpu.roll(x, 1, axis=x.ndim - 1)      # x[i-1] at odd lanes
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lanes % 2 == 0, -left, right)


def _layer_norm(x, scale, bias):
    """flax nn.LayerNorm(eps=1e-5) in f32. x (1, D); scale/bias (1, D)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _head_map(D: int, H: int):
    """(D, H) f32 one-hot map lane d -> head d // (D//H). Lets per-head
    logit reductions and probability broadcasts run as two tiny matmuls in
    the lane-concatenated layout (no (1, D) -> (H, hd) reshape, which
    Mosaic cannot lower)."""
    hd = D // H
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    return (lane_head == head).astype(jnp.float32)


def _cached_attention(q, k_cache, v_cache, n_heads, *, pos=None):
    """q: (1, D) f32, heads concatenated along lanes (already roped);
    caches (S, D) in the same layout. Masked (rows <= pos) when pos is
    given, else full-memory attention. Returns (1, D) f32."""
    S, D = k_cache.shape
    hd = D // n_heads
    R = _head_map(D, n_heads)
    prod = q * k_cache.astype(jnp.float32)  # (S, D)
    logits = jnp.dot(prod, R,
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    if pos is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(rows <= pos, logits, NEG_INF)
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)  # (S, H)
    p_full = jnp.dot(p, R.T, preferred_element_type=jnp.float32)  # (S, D)
    return jnp.sum(p_full * v_cache.astype(jnp.float32), axis=0,
                   keepdims=True)


def _scaled_dot(x, w_ref, s_ref):
    """dot against an optionally int8 weight ref: dequantization happens on
    the OUTPUT via the per-column scale row, so the matmul input reads the
    int8 bytes straight out of VMEM (half the HBM->VMEM traffic)."""
    out = jnp.dot(x, w_ref[:].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    if s_ref is not None:
        out = out * s_ref[:].astype(jnp.float32)
    return out


def _attn_block(x, pos, wqkv, bqkv, wo, bo, kc_ref, vc_ref, cos_p, sin_p,
                n_heads, sqkv=None, so=None):
    """Self-attention sublayer: (1, D) f32 output; writes this position's
    K/V into the (aliased) cache refs, then attends over them."""
    D = x.shape[-1]
    qkv = _scaled_dot(x, wqkv, sqkv)
    qkv = qkv + bqkv[:].astype(jnp.float32)  # (1, 3D)
    q = qkv[:, :D]
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]
    if cos_p is not None:
        q = q * cos_p + _rot_pairs(q) * sin_p
        k = k * cos_p + _rot_pairs(k) * sin_p
    # Append at pos via a masked full-buffer select: Mosaic cannot prove
    # alignment for a dynamic single-row vector store, and the full cache
    # is read for attention right below anyway.
    S = kc_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, k.shape[-1]), 0)
    k_all = jnp.where(rows == pos, k.astype(kc_ref.dtype), kc_ref[:])
    v_all = jnp.where(rows == pos, v.astype(vc_ref.dtype), vc_ref[:])
    kc_ref[:] = k_all
    vc_ref[:] = v_all
    attn = _cached_attention(q, k_all, v_all, n_heads, pos=pos)
    out = _scaled_dot(attn.astype(x.dtype), wo, so)
    return out + bo[:].astype(jnp.float32)


def _cross_block(x, wq, bq, wo, bo, kx_ref, vx_ref, cos_p, sin_p, n_heads,
                 sq=None, so=None):
    """Cross-attention sublayer over primed memory K/V: (1, D) f32."""
    q = _scaled_dot(x, wq, sq)
    q = q + bq[:].astype(jnp.float32)
    if cos_p is not None:
        q = q * cos_p + _rot_pairs(q) * sin_p
    attn = _cached_attention(q, kx_ref[:], vx_ref[:], n_heads, pos=None)
    out = _scaled_dot(attn.astype(x.dtype), wo, so)
    return out + bo[:].astype(jnp.float32)


def _swiglu(x_bf, w1g, b1g, w2, b2, s1g=None, s2=None):
    """x (1, D) -> (1, D) f32; w1g = [linear1|gate] concat (D, 2F).
    s1g/s2 are per-column dequant scales when w1g/w2 are int8 (arrays,
    already read out of their refs — the expert path reads them via
    one-hot matmuls)."""
    F = w2.shape[0]
    hg = jnp.dot(x_bf, w1g.astype(x_bf.dtype),
                 preferred_element_type=jnp.float32)
    if s1g is not None:
        hg = hg * s1g.astype(jnp.float32)
    hg = hg + b1g.astype(jnp.float32)  # (1, 2F)
    h, g = hg[:, :F], hg[:, F:]
    h = h * (g * jax.nn.sigmoid(g))  # silu(g)
    out = jnp.dot(h.astype(x_bf.dtype), w2.astype(x_bf.dtype),
                  preferred_element_type=jnp.float32)
    if s2 is not None:
        out = out * s2.astype(jnp.float32)
    return out + b2.astype(jnp.float32)


def _prologue(pos_ref, x_ref, cos_ref, sin_ref, wqkv, bqkv, wo, bo,
              cwq, cbq, cwo, cbo, nscale, nbias, kx, vx, kc_ref, vc_ref,
              n_heads, rope, sqkv=None, so=None, scq=None, sco=None):
    """Shared attention + cross-attention prologue -> x2 (post-norm2, f32)."""
    pos = pos_ref[0]
    if rope:
        cos_p = cos_ref[pl.ds(pos, 1), :]  # (1, D), per-head tiled
        sin_p = sin_ref[pl.ds(pos, 1), :]
    else:
        cos_p = sin_p = None
    x0 = x_ref[:]
    h = _attn_block(x0, pos, wqkv, bqkv, wo, bo, kc_ref, vc_ref,
                    cos_p, sin_p, n_heads, sqkv, so)
    x1 = _layer_norm(x0.astype(jnp.float32) + h, nscale[0:1, :],
                     nbias[0:1, :])
    h = _cross_block(x1.astype(x0.dtype), cwq, cbq, cwo, cbo, kx, vx,
                     cos_p, sin_p, n_heads, scq, sco)
    return _layer_norm(x1 + h, nscale[1:2, :], nbias[1:2, :])


def _shallow_kernel(pos_ref, x_ref, cos_ref, sin_ref,
                    wqkv, bqkv, wo, bo,
                    cwq, cbq, cwo, cbo,
                    nscale, nbias,
                    fw1g, fb1g, fw2, fb2,
                    *rest, n_heads, rope, quant=False):
    if quant:  # per-column dequant scale rows follow the weights
        sqkv, so, scq, sco, sf1g, sf2 = rest[:6]
        rest = rest[6:]
    else:
        sqkv = so = scq = sco = sf1g = sf2 = None
    kx, vx, kc_in, vc_in, kc_ref, vc_ref, out_ref = rest
    del kc_in, vc_in  # aliased to kc_ref/vc_ref
    x2 = _prologue(pos_ref, x_ref, cos_ref, sin_ref, wqkv, bqkv, wo, bo,
                   cwq, cbq, cwo, cbo, nscale, nbias, kx, vx, kc_ref,
                   vc_ref, n_heads, rope, sqkv, so, scq, sco)
    h = _swiglu(x2.astype(x_ref.dtype), fw1g[:], fb1g[:], fw2[:], fb2[:],
                None if sf1g is None else sf1g[:],
                None if sf2 is None else sf2[:])
    x3 = _layer_norm(x2 + h, nscale[2:3, :], nbias[2:3, :])
    out_ref[:] = x3.astype(out_ref.dtype)


def _deep_kernel(pos_ref, x_ref, cos_ref, sin_ref,
                 wqkv, bqkv, wo, bo,
                 cwq, cbq, cwo, cbo,
                 nscale, nbias,
                 gate_w, gate_b,
                 sw1g, sb1g, sw2, sb2,
                 ew1g_hbm, ew2_hbm, eb1g, eb2,
                 *rest, n_heads, rope, k_top, quant=False):
    if quant:  # per-column dequant scales (expert scales (E, .) in VMEM)
        sqkv, so, scq, sco, ssw1g, ssw2, es1g, es2 = rest[:8]
        rest = rest[8:]
    else:
        sqkv = so = scq = sco = ssw1g = ssw2 = es1g = es2 = None
    kx, vx, kc_in, vc_in, kc_ref, vc_ref, out_ref = rest[:7]
    scratch = rest[7:]
    del kc_in, vc_in  # aliased to kc_ref/vc_ref
    sems = scratch[-1]
    w1g_scr = scratch[0:2 * k_top:2]
    w2_scr = scratch[1:2 * k_top:2]

    x2 = _prologue(pos_ref, x_ref, cos_ref, sin_ref, wqkv, bqkv, wo, bo,
                   cwq, cbq, cwo, cbo, nscale, nbias, kx, vx, kc_ref,
                   vc_ref, n_heads, rope, sqkv, so, scq, sco)
    x2b = x2.astype(x_ref.dtype)

    # -- MoE: eval-mode top-k over raw gate logits (ops/moe.py gathered
    # path semantics). Selected expert weights are DMA'd from HBM while the
    # always-on shared expert computes.
    logits = jnp.dot(x2b, gate_w[:], preferred_element_type=jnp.float32)
    logits = logits + gate_b[:].astype(jnp.float32)  # (1, E)
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    remaining = logits
    sel_idx, sel_logit = [], []
    for _ in range(k_top):
        e = jnp.argmax(remaining, axis=-1)[0]
        sel_idx.append(e)
        sel_logit.append(jnp.max(remaining))
        remaining = jnp.where(lanes == e, NEG_INF, remaining)
    # softmax over the k selected raw logits (scalars)
    m = sel_logit[0]
    exps = [jnp.exp(g - m) for g in sel_logit]
    denom = sum(exps)

    dmas = []
    for j in range(k_top):
        dmas.append(pltpu.make_async_copy(
            ew1g_hbm.at[sel_idx[j]], w1g_scr[j], sems.at[2 * j]))
        dmas.append(pltpu.make_async_copy(
            ew2_hbm.at[sel_idx[j]], w2_scr[j], sems.at[2 * j + 1]))
    for d in dmas:
        d.start()

    h = _swiglu(x2b, sw1g[:], sb1g[:], sw2[:], sb2[:],
                None if ssw1g is None else ssw1g[:],
                None if ssw2 is None else ssw2[:]) / float(k_top)

    for d in dmas:
        d.wait()
    E = eb1g.shape[0]
    for j in range(k_top):
        e = sel_idx[j]
        # bias rows via one-hot matmul: a dynamic single-row vector load
        # can't be proven sublane-aligned by Mosaic
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
                  == e).astype(jnp.float32)
        b1g_j = jnp.dot(onehot, eb1g[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        b2_j = jnp.dot(onehot, eb2[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        s1g_j = s2_j = None
        if quant:  # this expert's dequant scale rows, same one-hot trick
            s1g_j = jnp.dot(onehot, es1g[:].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
            s2_j = jnp.dot(onehot, es2[:].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        yj = _swiglu(x2b, w1g_scr[j][:], b1g_j, w2_scr[j][:], b2_j,
                     s1g_j, s2_j)
        h = h + (exps[j] / denom) * yj

    x3 = _layer_norm(x2 + h, nscale[2:3, :], nbias[2:3, :])
    out_ref[:] = x3.astype(out_ref.dtype)


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def decode_layer_step(x, pos, layer: Dict[str, Any], k_cache, v_cache,
                      k_cross, v_cross, *, n_heads: int, rope: bool,
                      k_top: int = 2, interpret: bool = False):
    """One fused decoder-layer step.

    Args:
      x: (1, D) activation.
      pos: scalar int32 position of the current token.
      layer: packed weights (see pack_decoder_layers).
      k_cache/v_cache: (S, D) self-attention caches (heads concatenated
        along lanes), functionally updated (aliased in-place).
      k_cross/v_cross: (Sm, D) primed memory K/V in the same layout.
    Returns:
      (y, new_k_cache, new_v_cache); y is (1, D) in x.dtype.
    """
    D = x.shape[-1]
    hd = D // n_heads
    S = k_cache.shape[0]
    cos, sin = rope_tables_interleaved(S, hd, n_heads)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    deep = "gate_w" in layer
    quant = "wqkv_s" in layer

    common = [x, jnp.asarray(cos), jnp.asarray(sin),
              layer["wqkv"], layer["bqkv"], layer["wo"], layer["bo"],
              layer["cwq"], layer["cbq"], layer["cwo"], layer["cbo"],
              layer["norm_scale"], layer["norm_bias"]]
    if deep:
        ffn = [layer["gate_w"], layer["gate_b"],
               layer["sw1g"], layer["sb1g"], layer["sw2"], layer["sb2"],
               layer["ew1g"], layer["ew2"], layer["eb1g"], layer["eb2"]]
        ffn_specs = ([_vmem()] * 6
                     + [pl.BlockSpec(memory_space=pl.ANY)] * 2
                     + [_vmem()] * 2)
        if quant:
            ffn += [layer["wqkv_s"], layer["wo_s"], layer["cwq_s"],
                    layer["cwo_s"], layer["sw1g_s"], layer["sw2_s"],
                    layer["ew1g_s"], layer["ew2_s"]]
            ffn_specs += [_vmem()] * 8
        F = layer["ew2"].shape[1]
        scratch = []
        for _ in range(k_top):
            scratch.append(pltpu.VMEM((D, 2 * F), layer["ew1g"].dtype))
            scratch.append(pltpu.VMEM((F, D), layer["ew2"].dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2 * k_top,)))
        kernel = functools.partial(_deep_kernel, n_heads=n_heads, rope=rope,
                                   k_top=k_top, quant=quant)
    else:
        ffn = [layer["fw1g"], layer["fb1g"], layer["fw2"], layer["fb2"]]
        ffn_specs = [_vmem()] * 4
        if quant:
            ffn += [layer["wqkv_s"], layer["wo_s"], layer["cwq_s"],
                    layer["cwo_s"], layer["fw1g_s"], layer["fw2_s"]]
            ffn_specs += [_vmem()] * 6
        scratch = []
        kernel = functools.partial(_shallow_kernel, n_heads=n_heads,
                                   rope=rope, quant=quant)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]   # pos
        + [_vmem()] * 13                           # x, rope, attn, norms
        + ffn_specs
        + [_vmem()] * 2                            # cross K/V
        + [_vmem()] * 2                            # self caches (aliased)
    )
    args = [pos_arr] + common + ffn + [k_cross, v_cross, k_cache, v_cache]
    n_in = len(args)

    new_k, new_v, y = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ),
        in_specs=in_specs,
        out_specs=(_vmem(), _vmem(), _vmem()),
        scratch_shapes=scratch,
        input_output_aliases={n_in - 2: 0, n_in - 1: 1},
        interpret=interpret,
    )(*args)
    return y, new_k, new_v


def _row(b):
    return b.reshape(1, -1)


def quantize_weight(w, axis: int = -2):
    """Symmetric per-output-channel int8 quantization: reduce |w| over the
    input (contraction) axis, scale so the max maps to 127. Returns
    (int8 weights, f32 scales with the reduced axis dropped) — e.g.
    (D, N) -> ((D, N) int8, (1, N) f32); (E, D, F) -> (.., (E, F))."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(w.astype(jnp.float32)
                  / jnp.expand_dims(s, axis)).astype(jnp.int8)
    if w.ndim == 2:
        s = s.reshape(1, -1)
    return q, s


def _quantize_packed(packed: Dict[str, Any], keys) -> None:
    for key in keys:
        q, s = quantize_weight(packed[key])
        packed[key] = q
        packed[key + "_s"] = s


def dequantize(q, s, axis: int = -2):
    """Inverse of quantize_weight (for the fake-quant XLA oracle)."""
    if q.ndim == 2:
        s = s.reshape(s.shape[-1])
    return q.astype(jnp.float32) * jnp.expand_dims(s, axis)


def fake_quantize_decoder_params(params: Dict[str, Any], cfg):
    """Round-trip every decoder weight the fused int8 kernels quantize
    through int8 (dequantize(quantize(w))), leaving everything else —
    biases, norms, the MoE gate, cross K/V projections (used only during
    fp priming), embeddings, heads — untouched. The unfused XLA decode
    path with these params is the numerical oracle for the fused int8
    path: per-column scales commute with the matmul, so both compute the
    same math up to fp reassociation.

    Covers both fused families: the V2 wiring and the variant wirings
    (``pallas_decode_variant``) — base-AMT ReLU MLPs (Dense_0/Dense_1),
    V1 MLP experts (no gate weight), shared-less MoE, differential
    projections. Matches ``pallas_decode_variant.QUANT_KEYS``: the RPR Er
    table and differential lambda/subln rows stay full precision."""
    def rt(w):
        dt = w.dtype
        return dequantize(*quantize_weight(w)).astype(dt)

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    out = dict(params)
    for i, spec in enumerate(cfg.decoder_layers):
        p = dict(out[f"dec_{i}"])
        sa = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in p["self_attn"].items()}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sa[proj]["kernel"] = rt(sa[proj]["kernel"])
        p["self_attn"] = sa
        ca = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in p["cross_attn"].items()}
        for proj in ("q_proj", "out_proj"):
            ca[proj]["kernel"] = rt(ca[proj]["kernel"])
        p["cross_attn"] = ca
        f = {k: (dict(v) if isinstance(v, dict) else v)
             for k, v in p["ffn"].items()}
        if spec.ffn == "swiglu":
            for lin in ("linear1", "gate", "linear2"):
                f[lin]["kernel"] = rt(f[lin]["kernel"])
        elif spec.ffn == "relu_mlp":
            for lin in ("Dense_0", "Dense_1"):
                f[lin]["kernel"] = rt(f[lin]["kernel"])
        else:  # moe: glu (w1/wg/w2) or mlp (w1/w2) experts, shared optional
            groups = ["experts"] + (
                ["shared_expert"] if "shared_expert" in f else [])
            for grp in groups:
                f[grp] = dict(f[grp])
                for wname in ("w1", "wg", "w2"):
                    if wname in f[grp]:
                        f[grp][wname] = rt(f[grp][wname])
        p["ffn"] = f
        out[f"dec_{i}"] = p
    return out


def pack_decoder_layers(params: Dict[str, Any], cfg,
                        quantize: str = None) -> list:
    """Per-layer packed weight dicts from a VideoMusicTransformer param
    tree. Pure jnp concatenations — XLA hoists them out of the decode scan
    as loop invariants, so packing costs one pass per generate call.
    Biases are kept 2D (1, N) for TPU-friendly layouts.

    quantize="int8" stores every large matmul weight as int8 plus a
    per-output-channel f32 scale row under ``<key>_s`` (see module
    docstring); quantizing the column-concatenated packs equals quantizing
    each source weight separately, since scales are per-column."""
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    layers = []
    for i, spec in enumerate(cfg.decoder_layers):
        p = params[f"dec_{i}"]
        sa, ca = p["self_attn"], p["cross_attn"]
        packed = {
            "wqkv": jnp.concatenate([sa["q_proj"]["kernel"],
                                     sa["k_proj"]["kernel"],
                                     sa["v_proj"]["kernel"]], axis=1),
            "bqkv": _row(jnp.concatenate([sa["q_proj"]["bias"],
                                          sa["k_proj"]["bias"],
                                          sa["v_proj"]["bias"]])),
            "wo": sa["out_proj"]["kernel"],
            "bo": _row(sa["out_proj"]["bias"]),
            "cwq": ca["q_proj"]["kernel"],
            "cbq": _row(ca["q_proj"]["bias"]),
            "cwo": ca["out_proj"]["kernel"],
            "cbo": _row(ca["out_proj"]["bias"]),
            "norm_scale": jnp.stack([p["norm1"]["scale"],
                                     p["norm2"]["scale"],
                                     p["norm3"]["scale"]]),
            "norm_bias": jnp.stack([p["norm1"]["bias"],
                                    p["norm2"]["bias"],
                                    p["norm3"]["bias"]]),
        }
        f = p["ffn"]
        if spec.ffn == "swiglu":
            packed["fw1g"] = jnp.concatenate(
                [f["linear1"]["kernel"], f["gate"]["kernel"]], axis=1)
            packed["fb1g"] = _row(jnp.concatenate(
                [f["linear1"]["bias"], f["gate"]["bias"]]))
            packed["fw2"] = f["linear2"]["kernel"]
            packed["fb2"] = _row(f["linear2"]["bias"])
        else:  # moe (glu experts + shared)
            e = f["experts"]
            packed["gate_w"] = f["gate"]["kernel"]
            packed["gate_b"] = _row(f["gate"]["bias"])
            packed["ew1g"] = jnp.concatenate([e["w1"], e["wg"]], axis=2)
            packed["eb1g"] = jnp.concatenate([e["b1"], e["bg"]], axis=1)
            packed["ew2"] = e["w2"]
            packed["eb2"] = e["b2"]
            s = f["shared_expert"]
            packed["sw1g"] = jnp.concatenate([s["w1"][0], s["wg"][0]],
                                             axis=1)
            packed["sb1g"] = _row(jnp.concatenate([s["b1"][0], s["bg"][0]]))
            packed["sw2"] = s["w2"][0]
            packed["sb2"] = _row(s["b2"][0])
        if quantize == "int8":
            _quantize_packed(
                packed,
                ["wqkv", "wo", "cwq", "cwo"]
                + (["sw1g", "sw2", "ew1g", "ew2"] if spec.ffn == "moe"
                   else ["fw1g", "fw2"]))
        layers.append(packed)
    return layers


def fused_decode_eligible(cfg) -> bool:
    """True when the decoder wiring matches what the fused kernels
    implement: post-norm LayerNorm blocks, vanilla (optionally RoPE) MHA
    with biases, SwiGLU or shared-GLU-MoE (top-2) FFN, single chord head,
    no position add in the decoder, no residual dropout (version != None),
    no temperature quirk."""
    if cfg.version is None or cfg.separated or cfg.chord_embed:
        return False
    if cfg.pos_encoding != "none" or cfg.pre_norm or cfg.norm != "layernorm":
        return False
    if cfg.moe.temperature_schedule or cfg.moe.expert != "glu":
        return False
    if cfg.kv_heads is not None:
        return False
    if cfg.d_model % cfg.num_heads or (cfg.d_model // cfg.num_heads) % 2:
        return False  # RoPE pairing needs an even head_dim
    for spec in cfg.decoder_layers:
        for att in (spec.attn, spec.cross_attn):
            if att is None or att.kind != "vanilla" or not att.bias:
                return False
            if att.rope != cfg.decoder_layers[0].attn.rope:
                return False
        if spec.ffn not in ("swiglu", "moe"):
            return False
        if spec.ffn == "moe" and not cfg.moe.shared_expert:
            return False
    return True


def fused_decode_mosaic_ok(cfg) -> bool:
    """True when the model dims satisfy Mosaic's TPU lane-tiling
    constraints for these kernels (last-dim slices of stacked weight
    buffers must align to the 128-lane tile; observed hardware failure:
    a (E, D, 2*d_ff) expert stack with 2*d_ff = 64 -> "Slice shape along
    dimension 2 must be aligned to tiling (128)").

    Checked separately from :func:`fused_decode_eligible` because the
    constraint is a HARDWARE lowering property, not a wiring property:
    interpreter-mode tests run the kernels at tiny dims, and undersized
    configs on a real TPU should fall back to the XLA decode path rather
    than fail in the Mosaic compiler. Production AMT dims (d_model=512,
    d_ff=1024) pass."""
    return cfg.d_model % 128 == 0 and (2 * cfg.d_ff) % 128 == 0
