"""Fused single-token decoder-layer kernels for the NON-V2 decoder wirings.

``ops/pallas_decode.py`` fuses the V2 family (post-norm LayerNorm + vanilla
RoPE MHA + SwiGLU/shared-MoE). This module generalizes the same one-kernel-
per-layer design to every other decoder wiring the framework ships, so the
base AMT, V1 and V3 families decode through fused Pallas kernels instead of
the XLA fallback:

  * **RPR self-attention** (base AMT; reference ``model/rpr.py:390-395``):
    the Shaw/Huang relative bias for a single query at absolute position
    ``pos`` is ``bias[j] = q . Er[er_len - 1 - (pos - j)]``. In-kernel this
    is two tiny matmuls — ``qr = (q * Er_tiled) @ R`` per head over the
    lane-concatenated layout, then a one-hot SHIFT matrix
    ``shift[j, m] = (m == er_len - 1 - pos + j)`` gathers the diagonal
    (Mosaic cannot lower a dynamic multi-row vector gather; a one-hot
    matmul is the house pattern, see ``pallas_decode._head_map``).
  * **Differential attention** (V3; reference
    ``model/custom_transformer.py:610-834``): 2H query/key heads against H
    value heads; the paired softmax maps subtract with the learned scalar
    lambda (precomputed at pack time — it depends only on params), then a
    per-head RMSNorm (eps 1e-5) and the ``(1 - lambda_init)`` scale (folded
    into the packed subln weight row). Even/odd probability-to-value-lane
    maps are one-hot matmuls like ``_head_map``. The reference's broken
    output reshape is NOT reproduced (see ``ops/attention.py`` module
    docstring — we match our own corrected XLA path).
  * **ReLU MLP feed-forward** (base AMT; torch ``TransformerDecoderLayer``
    semantics) and **MLP (SiLU) MoE experts** (V1; reference
    ``model/video_music_transformer.py:82-88``), with or without the shared
    expert, alongside the existing GLU experts.
  * **RMSNorm (eps 1e-6) and pre-norm residual wiring** (V3.2; reference
    ``model/custom_transformer.py:1241-1248``).

Embedding differences (sinusoidal/learned positional adds, the frozen
Word2Vec chord table) stay in the XLA glue of
``decode/fused.make_fused_variant_step`` — one table row add per step.

Same numerical contract as ``pallas_decode``: f32 softmax/normalization,
-1e9 causal mask, caches in the compute dtype, eval-mode top-k routing over
raw gate logits. Parity is enforced against the unfused flax ``decode_step``
in ``tests/test_pallas_decode_variant.py``.

int8 weight-only mode (``pack_variant_layers(..., quantize="int8")``) works
like ``pallas_decode``'s: every large matmul weight is stored int8 with a
symmetric per-output-channel f32 scale row (``<key>_s``), dequantized on the
matmul OUTPUT (``x @ (Wq * s) == (x @ Wq) * s`` for per-column scales), so
the resident decoder weights halve for serving memory. The RPR ``er`` table
and the differential lambda/subln rows stay f32 (tiny, and they feed
elementwise math, not output-channel dots). Like the V2 kernels this is a
MEMORY feature, not a speed one — the B=1 step is kernel-compute-latency
bound (BACKLOG "int8 weight-only decode").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import lambda_init_fn
from .pallas_decode import (LN_EPS, NEG_INF, _head_map, _row, _vmem,
                            rope_tables_interleaved, _rot_pairs)

RMS_EPS = 1e-6     # make_norm("rmsnorm") epsilon (ops/norms.py)
SUBLN_EPS = 1e-5   # differential attention's per-head RMSNorm epsilon


@dataclasses.dataclass(frozen=True)
class VariantLayerMeta:
    """Static per-layer wiring the kernel is specialized on."""

    attn: str            # "vanilla" | "rpr" | "differential"
    cross: str           # "vanilla" | "differential"
    ffn: str             # "relu" | "swiglu" | "moe"
    expert: str = "glu"  # MoE expert kind: "glu" | "mlp"
    shared: bool = False  # SharedMoE always-on expert present


# ---------------------------------------------------------------------------
# kernel sub-blocks
# ---------------------------------------------------------------------------

def _norm_f32(x_f32, scale, bias, kind):
    """LayerNorm(eps=1e-5) or RMSNorm(eps=1e-6) over a (1, D) f32 row.
    scale/bias are (1, D) rows (bias ignored for rmsnorm)."""
    if kind == "layernorm":
        mean = jnp.mean(x_f32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x_f32 - mean), axis=-1, keepdims=True)
        y = (x_f32 - mean) * jax.lax.rsqrt(var + LN_EPS)
        return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = x_f32 * jax.lax.rsqrt(
        jnp.mean(jnp.square(x_f32), axis=-1, keepdims=True) + RMS_EPS)
    return y * scale.astype(jnp.float32)


def _attend(q, k_all, v_all, n_heads, *, pos=None, logit_bias=None):
    """Vanilla masked attention in the lane-concatenated head layout.
    q (1, D) f32; caches (S, D). ``logit_bias`` (S, H) is added to the
    UNSCALED q.k products (the RPR bias uses the same hd**-0.5 scale)."""
    S, D = k_all.shape
    hd = D // n_heads
    R = _head_map(D, n_heads)
    prod = q * k_all.astype(jnp.float32)
    logits = jnp.dot(prod, R, preferred_element_type=jnp.float32)
    if logit_bias is not None:
        logits = logits + logit_bias
    logits = logits * (hd ** -0.5)
    if pos is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(rows <= pos, logits, NEG_INF)
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    p_full = jnp.dot(p, R.T, preferred_element_type=jnp.float32)
    return jnp.sum(p_full * v_all.astype(jnp.float32), axis=0, keepdims=True)


def _diff_attend(q, k_all, v_all, n_heads, lam, *, pos=None):
    """Differential attention core: q (1, 2D) over k (S, 2D) / v (S, D);
    per-pair softmax maps combined as ``p_even - lam * p_odd`` against the
    shared value head, then the per-head RMSNorm (eps 1e-5, affine applied
    by the caller via the packed subln row). Matches
    ops/attention.dot_product_attention + the diff epilogue exactly
    (subtraction after the value product is equivalent by linearity —
    reference custom_transformer.py:806-824)."""
    S, D2 = k_all.shape
    D = v_all.shape[1]
    H = n_heads
    hd = D // H
    R2 = _head_map(D2, 2 * H)
    prod = q * k_all.astype(jnp.float32)
    logits = jnp.dot(prod, R2,
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    if pos is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(rows <= pos, logits, NEG_INF)
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)  # (S, 2H)
    # even/odd softmax-map -> value-lane broadcast maps (one-hot matmuls:
    # lane l of the value layout belongs to head l // hd, fed by query
    # heads 2*(l//hd) and 2*(l//hd)+1)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (2 * H, D), 1) // hd
    i = jax.lax.broadcasted_iota(jnp.int32, (2 * H, D), 0)
    m1 = (i == 2 * lane_head).astype(jnp.float32)
    m2 = (i == 2 * lane_head + 1).astype(jnp.float32)
    vf = v_all.astype(jnp.float32)
    out1 = jnp.sum(jnp.dot(p, m1, preferred_element_type=jnp.float32) * vf,
                   axis=0, keepdims=True)
    out2 = jnp.sum(jnp.dot(p, m2, preferred_element_type=jnp.float32) * vf,
                   axis=0, keepdims=True)
    attn = out1 - lam * out2  # (1, D)
    # per-head RMSNorm (subln): mean of squares within each head's lanes
    Rv = _head_map(D, H)
    ms = jnp.dot(attn * attn, Rv,
                 preferred_element_type=jnp.float32) / float(hd)  # (1, H)
    inv = jax.lax.rsqrt(ms + SUBLN_EPS)
    return attn * jnp.dot(inv, Rv.T, preferred_element_type=jnp.float32)


def _dot(x, w, b=None, s=None):
    """(1, .) @ (., N) in f32; ``s`` is an optional (1, N) per-output-column
    dequant scale row (int8 weights), applied between the dot and the bias
    — dequantizing on the OUTPUT keeps the matmul reading int8 bytes."""
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if s is not None:
        out = out * s.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out


def _sc(r, key):
    """The dequant scale row for ``key`` if the layer was packed int8."""
    s = r.get(key + "_s")
    return None if s is None else s[:]


def _rpr_bias(q, er_tiled, pos, S, n_heads):
    """(S, H) Shaw/Huang decode bias: qr per relative slot then a one-hot
    shift gather (dynamic multi-row slices don't lower on Mosaic)."""
    D = q.shape[-1]
    R = _head_map(D, n_heads)
    er_len = er_tiled.shape[0]
    qr = jnp.dot(q * er_tiled.astype(jnp.float32), R,
                 preferred_element_type=jnp.float32)  # (er_len, H)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, er_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, er_len), 1)
    shift = (cols == er_len - 1 - pos + rows).astype(jnp.float32)
    return jnp.dot(shift, qr, preferred_element_type=jnp.float32)  # (S, H)


def _ffn_core(x_bf, w1g, b1g, w2, b2, act, s1g=None, s2=None):
    """(1, D) -> (1, D) f32 two-matmul feed-forward. act:
    "glu" — w1g is [linear1|gate] (D, 2F), h = lin * silu(gate);
    "silu" — h = silu(x @ w1g + b1g) (the V1 MLP expert);
    "relu" — h = relu(...) (base-AMT torch FFN).
    s1g/s2: optional int8 dequant scale rows (already read from refs —
    the MoE path materializes them via one-hot matmuls)."""
    hg = _dot(x_bf, w1g, b1g, s1g)
    if act == "glu":
        F = w2.shape[0]
        h, g = hg[:, :F], hg[:, F:]
        h = h * (g * jax.nn.sigmoid(g))
    elif act == "silu":
        h = hg * jax.nn.sigmoid(hg)
    else:  # relu
        h = jnp.maximum(hg, 0.0)
    return _dot(h.astype(x_bf.dtype), w2, b2, s2)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _self_block(x, pos, r, meta, H, cos_p, sin_p, kc_ref, vc_ref):
    """Self-attention sublayer -> (1, D) f32; appends this position's K/V
    into the aliased cache refs."""
    D = x.shape[-1]
    qkv = _dot(x, r["wqkv"][:], r["bqkv"][:], _sc(r, "wqkv"))
    if meta.attn == "differential":
        q, k, v = qkv[:, :2 * D], qkv[:, 2 * D:4 * D], qkv[:, 4 * D:]
    else:
        q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    if cos_p is not None:
        q = q * cos_p + _rot_pairs(q) * sin_p
        k = k * cos_p + _rot_pairs(k) * sin_p
    S = kc_ref.shape[0]
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (S, k.shape[-1]), 0)
    rows_v = jax.lax.broadcasted_iota(jnp.int32, (S, v.shape[-1]), 0)
    k_all = jnp.where(rows_k == pos, k.astype(kc_ref.dtype), kc_ref[:])
    v_all = jnp.where(rows_v == pos, v.astype(vc_ref.dtype), vc_ref[:])
    kc_ref[:] = k_all
    vc_ref[:] = v_all
    if meta.attn == "differential":
        attn = _diff_attend(q, k_all, v_all, H, r["lam"][0, 0], pos=pos)
        attn = attn * r["subw"][:].astype(jnp.float32)
    else:
        bias = None
        if meta.attn == "rpr":
            bias = _rpr_bias(q, r["er"][:], pos, S, H)
        attn = _attend(q, k_all, v_all, H, pos=pos, logit_bias=bias)
    return _dot(attn.astype(x.dtype), r["wo"][:], r["bo"][:], _sc(r, "wo"))


def _cross_block(x, r, meta, H, cos_p, sin_p, kx, vx):
    """Cross-attention sublayer over the primed memory K/V -> (1, D) f32."""
    q = _dot(x, r["cwq"][:], r["cbq"][:], _sc(r, "cwq"))
    if cos_p is not None:
        q = q * cos_p + _rot_pairs(q) * sin_p
    if meta.cross == "differential":
        attn = _diff_attend(q, kx[:], vx[:], H, r["clam"][0, 0], pos=None)
        attn = attn * r["csubw"][:].astype(jnp.float32)
    else:
        attn = _attend(q, kx[:], vx[:], H, pos=None)
    return _dot(attn.astype(x.dtype), r["cwo"][:], r["cbo"][:],
                _sc(r, "cwo"))


def _moe_block(x2b, r, meta, k_top, scratch):
    """Eval-mode top-k MoE: router over raw gate logits, selected expert
    weights DMA'd from HBM while the (optional) shared expert computes —
    the variant of pallas_decode._deep_kernel supporting MLP experts and
    shared-less combines (reference model/moe.py:150-302)."""
    act = "glu" if meta.expert == "glu" else "silu"
    logits = _dot(x2b, r["gate_w"][:], r["gate_b"][:])  # (1, E)
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    remaining = logits
    sel_idx, sel_logit = [], []
    for _ in range(k_top):
        e = jnp.argmax(remaining, axis=-1)[0]
        sel_idx.append(e)
        sel_logit.append(jnp.max(remaining))
        remaining = jnp.where(lanes == e, NEG_INF, remaining)
    m = sel_logit[0]
    exps = [jnp.exp(g - m) for g in sel_logit]
    denom = sum(exps)

    sems = scratch[-1]
    w1g_scr = scratch[0:2 * k_top:2]
    w2_scr = scratch[1:2 * k_top:2]
    dmas = []
    for j in range(k_top):
        dmas.append(pltpu.make_async_copy(
            r["ew1g"].at[sel_idx[j]], w1g_scr[j], sems.at[2 * j]))
        dmas.append(pltpu.make_async_copy(
            r["ew2"].at[sel_idx[j]], w2_scr[j], sems.at[2 * j + 1]))
    for d in dmas:
        d.start()

    if meta.shared:
        h = _ffn_core(x2b, r["sw1g"][:], r["sb1g"][:], r["sw2"][:],
                      r["sb2"][:], act, _sc(r, "sw1g"),
                      _sc(r, "sw2")) / float(k_top)
    else:
        h = jnp.zeros((1, x2b.shape[-1]), jnp.float32)

    for d in dmas:
        d.wait()
    E = r["eb1g"].shape[0]
    quant = "ew1g_s" in r
    for j in range(k_top):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
                  == sel_idx[j]).astype(jnp.float32)
        b1g_j = jnp.dot(onehot, r["eb1g"][:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        b2_j = jnp.dot(onehot, r["eb2"][:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        s1g_j = s2_j = None
        if quant:  # this expert's dequant scale rows, same one-hot trick
            s1g_j = jnp.dot(onehot, r["ew1g_s"][:].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
            s2_j = jnp.dot(onehot, r["ew2_s"][:].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        yj = _ffn_core(x2b, w1g_scr[j][:], b1g_j, w2_scr[j][:], b2_j, act,
                       s1g_j, s2_j)
        h = h + (exps[j] / denom) * yj
    return h


def _variant_kernel(*refs, names, meta, n_heads, k_top, rope, norm,
                    pre_norm):
    pos_ref = refs[0]
    r = dict(zip(names, refs[1:1 + len(names)]))
    outs = refs[1 + len(names):]
    kc_ref, vc_ref, out_ref = outs[0], outs[1], outs[2]
    scratch = outs[3:]
    pos = pos_ref[0]

    x0 = r["x"][:]
    dt = x0.dtype
    if rope:
        cos_p = r["cos"][pl.ds(pos, 1), :]
        sin_p = r["sin"][pl.ds(pos, 1), :]
    else:
        cos_p = sin_p = None
    ns, nb = r["norm_scale"], r["norm_bias"]

    def ffn(x_row):
        if meta.ffn == "moe":
            return _moe_block(x_row, r, meta, k_top, scratch)
        act = "glu" if meta.ffn == "swiglu" else "relu"
        return _ffn_core(x_row, r["fw1g"][:], r["fb1g"][:], r["fw2"][:],
                         r["fb2"][:], act, _sc(r, "fw1g"), _sc(r, "fw2"))

    if not pre_norm:
        h = _self_block(x0, pos, r, meta, n_heads, cos_p, sin_p,
                        kc_ref, vc_ref)
        x1 = _norm_f32(x0.astype(jnp.float32) + h, ns[0:1, :], nb[0:1, :],
                       norm)
        h = _cross_block(x1.astype(dt), r, meta, n_heads, cos_p, sin_p,
                         r["kx"], r["vx"])
        x2 = _norm_f32(x1 + h, ns[1:2, :], nb[1:2, :], norm)
        h = ffn(x2.astype(dt))
        x3 = _norm_f32(x2 + h, ns[2:3, :], nb[2:3, :], norm)
    else:  # pre-norm (V3.2): x += sublayer(norm(x))
        x0f = x0.astype(jnp.float32)
        n = _norm_f32(x0f, ns[0:1, :], nb[0:1, :], norm)
        x1 = x0f + _self_block(n.astype(dt), pos, r, meta, n_heads,
                               cos_p, sin_p, kc_ref, vc_ref)
        n = _norm_f32(x1, ns[1:2, :], nb[1:2, :], norm)
        x2 = x1 + _cross_block(n.astype(dt), r, meta, n_heads, cos_p,
                               sin_p, r["kx"], r["vx"])
        n = _norm_f32(x2, ns[2:3, :], nb[2:3, :], norm)
        x3 = x2 + ffn(n.astype(dt))
    out_ref[:] = x3.astype(out_ref.dtype)


def decode_variant_layer_step(x, pos, layer: Dict[str, Any],
                              meta: VariantLayerMeta, k_cache, v_cache,
                              k_cross, v_cross, *, n_heads: int, rope: bool,
                              k_top: int, norm: str, pre_norm: bool,
                              interpret: bool = False):
    """One fused decoder-layer step for an arbitrary wiring.

    Same contract as ``pallas_decode.decode_layer_step``: x (1, D), caches
    functionally updated via aliasing. Cache lane widths follow the attn
    kind (differential keys carry 2H heads -> (S, 2D))."""
    D = x.shape[-1]
    hd = D // n_heads
    S = k_cache.shape[0]
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    names: List[str] = ["x"]
    args: List[Any] = [x]
    if rope:
        q_heads = 2 * n_heads if meta.attn == "differential" else n_heads
        cos, sin = rope_tables_interleaved(S, hd, q_heads)
        names += ["cos", "sin"]
        args += [jnp.asarray(cos), jnp.asarray(sin)]
    for key in ("wqkv", "bqkv", "wo", "bo"):
        names.append(key)
        args.append(layer[key])
    if meta.attn == "differential":
        names += ["lam", "subw"]
        args += [layer["lam"], layer["subw"]]
    if meta.attn == "rpr":
        names.append("er")
        args.append(layer["er"])
    for key in ("cwq", "cbq", "cwo", "cbo"):
        names.append(key)
        args.append(layer[key])
    if meta.cross == "differential":
        names += ["clam", "csubw"]
        args += [layer["clam"], layer["csubw"]]
    names += ["norm_scale", "norm_bias"]
    args += [layer["norm_scale"], layer["norm_bias"]]

    scratch: List[Any] = []
    hbm_names = set()
    if meta.ffn == "moe":
        keys = ["gate_w", "gate_b"]
        if meta.shared:
            keys += ["sw1g", "sb1g", "sw2", "sb2"]
        keys += ["eb1g", "eb2", "ew1g", "ew2"]
        hbm_names = {"ew1g", "ew2"}
        for key in keys:
            names.append(key)
            args.append(layer[key])
        G = layer["ew1g"].shape[2]
        Fw = layer["ew2"].shape[1]
        for _ in range(k_top):
            scratch.append(pltpu.VMEM((D, G), layer["ew1g"].dtype))
            scratch.append(pltpu.VMEM((Fw, D), layer["ew2"].dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2 * k_top,)))
    else:
        for key in ("fw1g", "fb1g", "fw2", "fb2"):
            names.append(key)
            args.append(layer[key])

    # int8 dequant scale rows ride along as extra VMEM operands (tiny)
    for key in QUANT_KEYS:
        if key + "_s" in layer:
            names.append(key + "_s")
            args.append(layer[key + "_s"])

    names += ["kx", "vx", "kc_in", "vc_in"]
    args += [k_cross, v_cross, k_cache, v_cache]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pl.ANY) if n in hbm_names else _vmem()
        for n in names]
    n_in = 1 + len(names)

    kernel = functools.partial(
        _variant_kernel, names=tuple(names), meta=meta, n_heads=n_heads,
        k_top=k_top, rope=rope, norm=norm, pre_norm=pre_norm)
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
    )(pos_arr, *args)
    return y, new_k, new_v


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

# weights eligible for int8 quantization (every large matmul; the RPR er
# table and differential lambda/subln rows stay f32)
QUANT_KEYS = ("wqkv", "wo", "cwq", "cwo", "fw1g", "fw2",
              "sw1g", "sw2", "ew1g", "ew2")


def _zeros_row(n):
    return jnp.zeros((1, n), jnp.float32)


def _attn_bias(proj, n):
    b = proj.get("bias")
    return _row(b) if b is not None else _zeros_row(n)


def _pack_subln(attn_params, depth: int, n_heads: int, prefix=""):
    """Differential-attention extras: the packed scalar lambda (it depends
    only on params — reference custom_transformer.py:799-805) and the
    subln weight row tiled per head, pre-scaled by (1 - lambda_init)."""
    lam_init = lambda_init_fn(depth)
    lam = (jnp.exp(jnp.sum(attn_params["lambda_q1"]
                           * attn_params["lambda_k1"]))
           - jnp.exp(jnp.sum(attn_params["lambda_q2"]
                             * attn_params["lambda_k2"])) + lam_init)
    w = attn_params["subln"]["weight"]  # (hd,)
    subw = jnp.tile(w.astype(jnp.float32), n_heads).reshape(1, -1) \
        * (1.0 - lam_init)
    return {prefix + "lam": lam.astype(jnp.float32).reshape(1, 1),
            prefix + "subw": subw}


def pack_variant_layers(params: Dict[str, Any], cfg, quantize: str = None
                        ) -> Tuple[list, List[VariantLayerMeta]]:
    """Per-layer packed weights + static metas from a VideoMusicTransformer
    param tree for any fused_variant_eligible config. Pure jnp concats —
    hoisted out of the decode scan as loop invariants.

    quantize="int8" stores every ``QUANT_KEYS`` weight as int8 plus a
    per-output-channel f32 scale row under ``<key>_s`` (same scheme and
    fake-quant oracle as ``pallas_decode.pack_decoder_layers``)."""
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    from .pallas_decode import _quantize_packed
    D = cfg.d_model
    layers, metas = [], []
    for i, spec in enumerate(cfg.decoder_layers):
        p = params[f"dec_{i}"]
        sa, ca = p["self_attn"], p["cross_attn"]
        cross_kind = (spec.cross_attn or spec.attn).kind
        meta = VariantLayerMeta(
            attn=spec.attn.kind,
            cross="differential" if cross_kind == "differential"
            else "vanilla",
            ffn={"relu_mlp": "relu", "swiglu": "swiglu",
                 "moe": "moe"}[spec.ffn],
            expert=cfg.moe.expert,
            shared=cfg.moe.shared_expert)
        wqkv = jnp.concatenate([sa["q_proj"]["kernel"],
                                sa["k_proj"]["kernel"],
                                sa["v_proj"]["kernel"]], axis=1)
        bqkv = jnp.concatenate([
            _attn_bias(sa["q_proj"], sa["q_proj"]["kernel"].shape[1]),
            _attn_bias(sa["k_proj"], sa["k_proj"]["kernel"].shape[1]),
            _attn_bias(sa["v_proj"], sa["v_proj"]["kernel"].shape[1])],
            axis=1)
        packed = {
            "wqkv": wqkv, "bqkv": bqkv,
            "wo": sa["out_proj"]["kernel"],
            "bo": _attn_bias(sa["out_proj"], D),
            "cwq": ca["q_proj"]["kernel"],
            "cbq": _attn_bias(ca["q_proj"], ca["q_proj"]["kernel"].shape[1]),
            "cwo": ca["out_proj"]["kernel"],
            "cbo": _attn_bias(ca["out_proj"], D),
        }
        if meta.attn == "differential":
            packed.update(_pack_subln(sa, i, cfg.num_heads))
        if meta.cross == "differential":
            packed.update(_pack_subln(ca, i, cfg.num_heads, prefix="c"))
        if meta.attn == "rpr":
            # (er_len, hd) shared across heads -> tiled (er_len, D) f32
            packed["er"] = jnp.tile(sa["Er"].astype(jnp.float32),
                                    (1, cfg.num_heads))
        if cfg.norm == "layernorm":
            packed["norm_scale"] = jnp.stack([p["norm1"]["scale"],
                                              p["norm2"]["scale"],
                                              p["norm3"]["scale"]])
            packed["norm_bias"] = jnp.stack([p["norm1"]["bias"],
                                             p["norm2"]["bias"],
                                             p["norm3"]["bias"]])
        else:  # rmsnorm: affine weight only
            packed["norm_scale"] = jnp.stack([p["norm1"]["weight"],
                                              p["norm2"]["weight"],
                                              p["norm3"]["weight"]])
            packed["norm_bias"] = jnp.zeros((3, D), jnp.float32)
        f = p["ffn"]
        if spec.ffn == "relu_mlp":
            packed["fw1g"] = f["Dense_0"]["kernel"]
            packed["fb1g"] = _row(f["Dense_0"]["bias"])
            packed["fw2"] = f["Dense_1"]["kernel"]
            packed["fb2"] = _row(f["Dense_1"]["bias"])
        elif spec.ffn == "swiglu":
            packed["fw1g"] = jnp.concatenate(
                [f["linear1"]["kernel"], f["gate"]["kernel"]], axis=1)
            packed["fb1g"] = _row(jnp.concatenate(
                [f["linear1"]["bias"], f["gate"]["bias"]]))
            packed["fw2"] = f["linear2"]["kernel"]
            packed["fb2"] = _row(f["linear2"]["bias"])
        else:  # moe
            e = f["experts"]
            packed["gate_w"] = f["gate"]["kernel"]
            packed["gate_b"] = _row(f["gate"]["bias"])
            if cfg.moe.expert == "glu":
                packed["ew1g"] = jnp.concatenate([e["w1"], e["wg"]], axis=2)
                packed["eb1g"] = jnp.concatenate([e["b1"], e["bg"]], axis=1)
            else:  # mlp: single (E, D, 2D) silu layer
                packed["ew1g"] = e["w1"]
                packed["eb1g"] = e["b1"]
            packed["ew2"] = e["w2"]
            packed["eb2"] = e["b2"]
            if cfg.moe.shared_expert:
                s = f["shared_expert"]
                if cfg.moe.expert == "glu":
                    packed["sw1g"] = jnp.concatenate(
                        [s["w1"][0], s["wg"][0]], axis=1)
                    packed["sb1g"] = _row(jnp.concatenate(
                        [s["b1"][0], s["bg"][0]]))
                else:
                    packed["sw1g"] = s["w1"][0]
                    packed["sb1g"] = _row(s["b1"][0])
                packed["sw2"] = s["w2"][0]
                packed["sb2"] = _row(s["b2"][0])
        if quantize == "int8":
            _quantize_packed(packed,
                             [k for k in QUANT_KEYS if k in packed])
        layers.append(packed)
        metas.append(meta)
    return layers, metas


# ---------------------------------------------------------------------------
# eligibility
# ---------------------------------------------------------------------------

def fused_variant_eligible(cfg) -> bool:
    """True when the decoder wiring is covered by these variant kernels:
    post- or pre-norm LayerNorm/RMSNorm blocks, vanilla/RPR/differential
    attention, ReLU/SwiGLU/MoE (GLU or MLP experts, shared or not) FFN,
    single chord head. Positional adds and the Word2Vec chord table are
    handled in the step glue. Not covered: separated heads, GQA, KAN
    experts, the live temperature-schedule quirk, odd head dims."""
    if cfg.separated or cfg.kv_heads is not None:
        return False
    if cfg.norm not in ("layernorm", "rmsnorm"):
        return False
    if cfg.moe.temperature_schedule or cfg.moe.expert not in ("glu", "mlp"):
        return False
    if cfg.d_model % cfg.num_heads or (cfg.d_model // cfg.num_heads) % 2:
        return False
    if not cfg.decoder_layers:
        return False
    rope0 = cfg.decoder_layers[0].attn.rope
    for spec in cfg.decoder_layers:
        attn, cross = spec.attn, spec.cross_attn
        if attn is None or cross is None:
            return False
        for a in (attn, cross):
            if a.kind not in ("vanilla", "rpr", "differential"):
                return False
            if a.kind == "differential" and a.bias:
                return False  # only the no-bias shipped form
            if a.rope != rope0:
                return False
        if cross.kind == "rpr":
            return False  # no shipped model; decode-time positions differ
        if attn.kind == "rpr" and attn.rope:
            return False  # unshipped combination, untested ordering
        if spec.ffn not in ("relu_mlp", "swiglu", "moe"):
            return False
        if spec.ffn == "moe" and cfg.moe.n_experts_per_token \
                >= cfg.moe.n_experts:
            return False  # scalar top-k loop assumes k < E
    return True


def fused_variant_mosaic_ok(cfg) -> bool:
    """Hardware lane-tiling constraints (see
    pallas_decode.fused_decode_mosaic_ok): lane-dim SLICES of packed
    buffers must align to the 128 tile. d_model covers the qkv splits and
    the differential even/odd maps; the GLU h|g split needs d_ff % 64."""
    if cfg.d_model % 128:
        return False
    for spec in cfg.decoder_layers:
        uses_glu = (spec.ffn == "swiglu"
                    or (spec.ffn == "moe" and cfg.moe.expert == "glu"))
        if uses_glu and (2 * cfg.d_ff) % 128:
            return False
        if spec.ffn == "relu_mlp" and cfg.d_ff % 128:
            return False
    return True
