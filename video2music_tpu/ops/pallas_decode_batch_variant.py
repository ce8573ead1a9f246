"""Fused BATCHED single-token decoder-layer kernels for the NON-V2 wirings.

``ops/pallas_decode_batch.py`` fuses the batched (B>1) decode step for the
V2 family; until round 5 every other wiring fell back to the XLA step at
B>1 (measured ~1.4-3x slower per clip at serving batch sizes). This module
generalizes the batched design — sublane-stacked (Bb*S, D) cache slabs, a
grid over B-blocks with VMEM-resident weights, and the block-diagonal
"wide" attention form (one NT + one TN slab matmul, zero (rows, D)
elementwise passes) — to the variant wirings of
``ops/pallas_decode_variant.py``:

  * **RPR self-attention** (base AMT; reference ``model/rpr.py:390-395``):
    the Shaw/Huang decode bias generalizes to the wide layout as ONE extra
    NT matmul — ``qr = dot_general(Er_tiled, q_cat, contract (1,1))`` gives
    the (er_len, C) per-(batch, head) relative scores (q_cat's head masking
    selects the right lanes for free) — plus a (rows, er_len) one-hot SHIFT
    matmul that places ``qr[er_len - 1 - (pos - j)]`` on cache row j. The
    current position's bias is the STATIC last row of ``qr``.
  * **Differential attention** (V3; reference
    ``model/custom_transformer.py:610-834``): queries/keys carry 2H heads,
    so the wide logits simply grow to C = Bb*2H columns; the paired
    ``p_even - lambda * p_odd`` combine is two one-hot pair-selection
    matmuls on the (C, D) pv block, and the per-head RMSNorm (subln) runs
    vectorized on the regrouped (Bb, D) rows.
  * **ReLU MLP / MLP-expert / shared-less MoE feed-forwards** (base AMT,
    V1) via an ``act`` parameter on the weight-stationary expert kernel,
    and **RMSNorm / pre-norm residual wiring** (V3.x) via norm parameters
    threaded through both kernels.

Embedding glue (sinusoidal/learned positional adds, the frozen Word2Vec
chord table) stays in XLA (``decode/fused.make_fused_batch_variant_step``)
— the B=1 variant measurements showed ends-folding wins only ~5% at small
B, and the variant glue differs per family; keep it simple and measured.

Same numerical contract as ``pallas_decode_batch``: f32 softmax, -1e9
masks, MXU operands in the compute dtype with f32 accumulate (exact in f32
oracle tests), caches as PURE INPUTS with single-row appends by the
caller. int8 weights stay a B=1 feature and int8 KV caches a V2-family
batched feature (documented in ``decode/sampler.py``). Parity vs the
unfused flax ``decode_step`` is enforced in
``tests/test_pallas_decode_variant.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import NEG_INF, _head_map, _rot_pairs, \
    rope_tables_interleaved
from .pallas_decode_batch import _row_map, pick_block_b
from .pallas_decode_variant import (SUBLN_EPS, VariantLayerMeta, _norm_f32,
                                    fused_variant_eligible,
                                    fused_variant_mosaic_ok)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _wide_attention_v(q, k_slab, v_slab, H, seg, *, pos=None, k_cur=None,
                      v_cur=None, er=None, lam=None):
    """Block-diagonal batched attention for the variant wirings.

    q: (Bb, Dk) f32 (roped); k_slab (rows, Dk) / v_slab (rows, D) —
    Bb batch elements' caches stacked along sublanes, rows = Bb * seg.
    Dk == D for vanilla/RPR heads, 2D for differential (lam given).
    ``er``: (er_len, D) f32 head-tiled RPR table — adds the Shaw/Huang
    decode bias to the UNSCALED q.k products (B=1 semantics:
    pallas_decode_variant._rpr_bias). ``k_cur``/``v_cur``: this step's
    (Bb, Dk)/(Bb, D) rows — the current position never touches the slab
    (diagonal-probe trick of pallas_decode_batch._wide_attention).
    Returns (Bb, D) f32; for differential this is BEFORE the caller's
    subln/packed-weight scale.
    """
    rows, Dk = k_slab.shape
    D = v_slab.shape[1]
    Bb = rows // seg
    hd = D // H
    Hq = Dk // hd  # H, or 2H for differential
    C = Bb * Hq
    cd = k_slab.dtype
    scale = hd ** -0.5

    rep = _row_map(C, Hq, Bb)  # (C, Bb): column c -> batch c // Hq
    hm = _iota2((C, Dk), 1) // hd == _iota2((C, Dk), 0) % Hq
    rep_c = rep.astype(cd)
    q_rep = jnp.dot(rep_c, q.astype(cd),
                    preferred_element_type=jnp.float32)        # (C, Dk)
    q_cat = jnp.where(hm, q_rep, 0.0).astype(cd)

    nt = (((1,), (1,)), ((), ()))
    tn = (((0,), (0,)), ((), ()))
    logits = jax.lax.dot_general(
        k_slab, q_cat, dimension_numbers=nt,
        preferred_element_type=jnp.float32)                    # (rows, C)
    qr = None
    if er is not None:  # RPR bias on the unscaled products (Hq == H)
        er_len = er.shape[0]
        qr = jax.lax.dot_general(
            er.astype(cd), q_cat, dimension_numbers=nt,
            preferred_element_type=jnp.float32)                # (er_len, C)
        shift = (_iota2((rows, er_len), 1)
                 == er_len - 1 - pos + _iota2((rows, er_len), 0) % seg)
        logits = logits + jnp.dot(shift.astype(cd), qr.astype(cd),
                                  preferred_element_type=jnp.float32)
    logits = logits * scale
    valid = _iota2((rows, C), 0) // seg == _iota2((rows, C), 1) // Hq
    if pos is not None:
        valid = valid & (_iota2((rows, C), 0) % seg < pos)  # strict: the
        # current row rides the diagonal probe below
    logits = jnp.where(valid, logits, NEG_INF)

    eye = None
    if k_cur is not None:
        k_cat = jnp.dot(rep_c, k_cur.astype(cd),
                        preferred_element_type=jnp.float32)    # (C, Dk)
        dkq = jax.lax.dot_general(
            k_cat.astype(cd), q_cat, dimension_numbers=nt,
            preferred_element_type=jnp.float32)                # (C, C)
        eye = _iota2((C, C), 0) == _iota2((C, C), 1)
        cur_row = jnp.sum(jnp.where(eye, dkq, 0.0), axis=0,
                          keepdims=True)                       # (1, C)
        if er is not None:
            # bias at j == pos is qr[er_len - 1] — a STATIC row
            cur_row = cur_row + qr[er.shape[0] - 1:er.shape[0], :]
        cur_row = cur_row * scale
        m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), cur_row)
    else:
        m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)  # masked entries underflow to 0
    denom = jnp.sum(p, axis=0, keepdims=True)
    if k_cur is not None:
        p_cur = jnp.exp(cur_row - m)                           # (1, C)
        denom = denom + p_cur
    inv = 1.0 / denom
    p = p * inv
    pv = jax.lax.dot_general(
        p.astype(cd), v_slab, dimension_numbers=tn,
        preferred_element_type=jnp.float32)                    # (C, D)
    if v_cur is not None:
        p_cur_col = jnp.sum(
            jnp.where(eye, jnp.broadcast_to(p_cur * inv, (C, C)), 0.0),
            axis=1, keepdims=True)                             # (C, 1)
        v_cat = jnp.dot(rep_c, v_cur.astype(cd),
                        preferred_element_type=jnp.float32)    # (C, D)
        pv = pv + p_cur_col * v_cat

    if lam is None:
        pv_m = jnp.where(hm, pv, 0.0).astype(cd)  # Dk == D here
        return jnp.dot(rep_c.T, pv_m,
                       preferred_element_type=jnp.float32)     # (Bb, D)
    # differential: combine paired columns p_even - lam * p_odd via two
    # one-hot pair-selection matmuls (exact in any dtype), f32 subtract
    Co = Bb * H
    co_b = _iota2((Co, C), 0) // H
    co_h = _iota2((Co, C), 0) % H
    c_idx = _iota2((Co, C), 1)
    even = (c_idx == co_b * Hq + 2 * co_h).astype(cd)
    odd = (c_idx == co_b * Hq + 2 * co_h + 1).astype(cd)
    pv_c = pv.astype(cd)
    ev = jnp.dot(even, pv_c, preferred_element_type=jnp.float32)
    od = jnp.dot(odd, pv_c, preferred_element_type=jnp.float32)
    comb = ev - lam * od                                       # (Co, D)
    hm_v = _iota2((Co, D), 1) // hd == _iota2((Co, D), 0) % H
    comb_m = jnp.where(hm_v, comb, 0.0).astype(cd)
    return jnp.dot(_row_map(Co, H, Bb).astype(cd).T, comb_m,
                   preferred_element_type=jnp.float32)         # (Bb, D)


def _subln_b(attn, H, subw):
    """Vectorized differential per-head RMSNorm (eps 1e-5) + the packed
    subln weight row (pre-scaled by 1 - lambda_init at pack time) on
    (Bb, D) f32 rows — pallas_decode_variant._diff_attend's epilogue."""
    D = attn.shape[1]
    hd = D // H
    Rv = _head_map(D, H)
    ms = jnp.dot(attn * attn, Rv,
                 preferred_element_type=jnp.float32) / float(hd)
    inv = jax.lax.rsqrt(ms + SUBLN_EPS)
    attn = attn * jnp.dot(inv, Rv.T, preferred_element_type=jnp.float32)
    return attn * subw.astype(jnp.float32)


def _dot_b(x, w, b=None):
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out


def _ffn_b(x_cd, w1g, b1g, w2, b2, act):
    """(Bb, D) -> (Bb, D) f32 two-matmul feed-forward; act as in
    pallas_decode_variant._ffn_core ("glu" | "silu" | "relu")."""
    hg = _dot_b(x_cd, w1g, b1g)
    if act == "glu":
        F = w2.shape[0]
        h, g = hg[:, :F], hg[:, F:]
        h = h * (g * jax.nn.sigmoid(g))
    elif act == "silu":
        h = hg * jax.nn.sigmoid(hg)
    else:  # relu
        h = jnp.maximum(hg, 0.0)
    return _dot_b(h.astype(x_cd.dtype), w2, b2)


def _self_block_bv(x, pos, r, meta, H, cos_p, sin_p, kc_ref, vc_ref,
                   kn_ref, vn_ref, S):
    """Batched self-attention sublayer -> (Bb, D) f32; writes this
    position's (Bb, Dk)/(Bb, D) K/V rows to kn_ref/vn_ref (caller
    appends them to the HBM caches)."""
    Bb, D = x.shape
    cd = x.dtype
    qkv = _dot_b(x, r["wqkv"][:], r["bqkv"][:])
    if meta.attn == "differential":
        q, k, v = qkv[:, :2 * D], qkv[:, 2 * D:4 * D], qkv[:, 4 * D:]
    else:
        q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    if cos_p is not None:
        q = q * cos_p + _rot_pairs(q) * sin_p
        k = k * cos_p + _rot_pairs(k) * sin_p
    kn_ref[:] = k.astype(kn_ref.dtype)
    vn_ref[:] = v.astype(vn_ref.dtype)
    attn = _wide_attention_v(
        q, kc_ref[:].astype(cd), vc_ref[:].astype(cd), H, S, pos=pos,
        k_cur=k, v_cur=v,
        er=(r["er"][:] if meta.attn == "rpr" else None),
        lam=(r["lam"][0, 0] if meta.attn == "differential" else None))
    if meta.attn == "differential":
        attn = _subln_b(attn, H, r["subw"][:])
    return _dot_b(attn.astype(cd), r["wo"][:], r["bo"][:])


def _cross_block_bv(x, r, meta, H, cos_p, sin_p, kx_ref, vx_ref, Sm):
    """Batched cross-attention sublayer over the primed memory slabs."""
    cd = x.dtype
    q = _dot_b(x, r["cwq"][:], r["cbq"][:])
    if cos_p is not None:
        q = q * cos_p + _rot_pairs(q) * sin_p
    attn = _wide_attention_v(
        q, kx_ref[:].astype(cd), vx_ref[:].astype(cd), H, Sm, pos=None,
        lam=(r["clam"][0, 0] if meta.cross == "differential" else None))
    if meta.cross == "differential":
        attn = _subln_b(attn, H, r["csubw"][:])
    return _dot_b(attn.astype(cd), r["cwo"][:], r["cbo"][:])


def _attn_kernel_bv(*refs, names, meta, H, rope, S, Sm, norm, pre_norm):
    """One B-block: norms + self-attention + cross-attention (+ the
    shallow FFN when the layer has one; deep/MoE layers return the FFN
    input for :func:`batched_variant_moe_ffn`)."""
    pos_ref = refs[0]
    r = dict(zip(names, refs[1:1 + len(names)]))
    y_ref, kn_ref, vn_ref = refs[1 + len(names):]
    pos = pos_ref[0]
    x0 = r["x"][:]
    dt = x0.dtype
    if rope:
        cos_p, sin_p = r["cos"][:], r["sin"][:]
    else:
        cos_p = sin_p = None
    ns, nb = r["norm_scale"], r["norm_bias"]
    shallow = meta.ffn != "moe"

    def ffn(x_row):
        act = "glu" if meta.ffn == "swiglu" else "relu"
        return _ffn_b(x_row, r["fw1g"][:], r["fb1g"][:], r["fw2"][:],
                      r["fb2"][:], act)

    if not pre_norm:
        h = _self_block_bv(x0, pos, r, meta, H, cos_p, sin_p,
                           r["kc"], r["vc"], kn_ref, vn_ref, S)
        x1 = _norm_f32(x0.astype(jnp.float32) + h, ns[0:1, :], nb[0:1, :],
                       norm)
        h = _cross_block_bv(x1.astype(dt), r, meta, H, cos_p, sin_p,
                            r["kx"], r["vx"], Sm)
        x2 = _norm_f32(x1 + h, ns[1:2, :], nb[1:2, :], norm)
        if shallow:
            x2 = _norm_f32(x2 + ffn(x2.astype(dt)), ns[2:3, :], nb[2:3, :],
                           norm)
    else:  # pre-norm (V3.2): x += sublayer(norm(x))
        x0f = x0.astype(jnp.float32)
        n = _norm_f32(x0f, ns[0:1, :], nb[0:1, :], norm)
        x1 = x0f + _self_block_bv(n.astype(dt), pos, r, meta, H, cos_p,
                                  sin_p, r["kc"], r["vc"], kn_ref, vn_ref,
                                  S)
        n = _norm_f32(x1, ns[1:2, :], nb[1:2, :], norm)
        x2 = x1 + _cross_block_bv(n.astype(dt), r, meta, H, cos_p, sin_p,
                                  r["kx"], r["vx"], Sm)
        if shallow:
            n = _norm_f32(x2, ns[2:3, :], nb[2:3, :], norm)
            x2 = x2 + ffn(n.astype(dt))
    y_ref[:] = x2.astype(y_ref.dtype)


def _moe_kernel_bv(*refs, n_experts, k_top, act, shared, norm, pre_norm):
    """Weight-stationary batched MoE for the variant wirings: in-kernel
    router (cell 0, the vectorized first-index tie-break of
    pallas_decode_batch._moe_kernel_b), routed experts with GLU or MLP
    ("silu") activations, optional shared expert, and the closing
    residual in post- (norm3(x2 + h)) or pre-norm (x2 + h(norm3(x2)))
    wiring."""
    it = iter(refs)
    x2_ref = next(it)
    gate_w, gate_b = next(it), next(it)
    gw1g_ref, gw2_ref, eb1g, eb2 = next(it), next(it), next(it), next(it)
    if shared:
        sw1g, sb1g, sw2, sb2 = next(it), next(it), next(it), next(it)
    nscale, nbias = next(it), next(it)
    out_ref = next(it)
    acc_ref = next(it)
    cw_scr = next(it)

    j = pl.program_id(0)
    x2 = x2_ref[:]  # (B, D) compute dtype: f32 residual rounded by caller
    if pre_norm:
        xn = _norm_f32(x2.astype(jnp.float32), nscale[2:3, :],
                       nbias[2:3, :], norm).astype(x2.dtype)
    else:
        xn = x2

    @pl.when(j == 0)
    def _route():
        gl = jnp.dot(xn, gate_w[:], preferred_element_type=jnp.float32)
        gl = gl + gate_b[:].astype(jnp.float32)  # (B, E) f32
        lanes = jax.lax.broadcasted_iota(jnp.int32, gl.shape, 1)
        remaining = gl
        sel = []
        for _ in range(k_top):
            m = jnp.max(remaining, axis=-1, keepdims=True)
            first = jnp.min(
                jnp.where(remaining == m, lanes, n_experts),
                axis=-1, keepdims=True)
            oh = (lanes == first).astype(jnp.float32)
            sel.append((m, oh))
            remaining = jnp.where(oh > 0, -jnp.inf, remaining)
        m0 = sel[0][0]
        exps = [jnp.exp(m - m0) for m, _ in sel]
        denom = sum(exps)
        cw_scr[:] = sum((e / denom) * oh for e, (_, oh) in zip(exps, sel))
        if shared:
            acc_ref[:] = _ffn_b(xn, sw1g[:], sb1g[:], sw2[:], sb2[:],
                                act) / float(k_top)
        else:
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(j > 0)
    def _routed():
        e = j - 1
        E = n_experts
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
                  == e).astype(jnp.float32)
        b1g_j = jnp.dot(onehot, eb1g[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        b2_j = jnp.dot(onehot, eb2[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        cj = jnp.dot(cw_scr[:], onehot.T,
                     preferred_element_type=jnp.float32)  # (B, 1)
        yj = _ffn_b(xn, gw1g_ref[0], b1g_j, gw2_ref[0], b2_j, act)
        acc_ref[:] = acc_ref[:] + cj * yj

    @pl.when(j == n_experts)
    def _finalize():
        if pre_norm:
            x3 = x2.astype(jnp.float32) + acc_ref[:]
        else:
            x3 = _norm_f32(x2.astype(jnp.float32) + acc_ref[:],
                           nscale[2:3, :], nbias[2:3, :], norm)
        out_ref[:] = x3.astype(out_ref.dtype)


def _vmem(block=None, index_map=None):
    if block is None:
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def batched_variant_layer_step(x, pos, layer: Dict[str, Any],
                               meta: VariantLayerMeta, k_cache, v_cache,
                               k_cross, v_cross, *, n_heads: int,
                               rope: bool, norm: str, pre_norm: bool,
                               block_b: int = None,
                               interpret: bool = False):
    """Attention half (plus FFN for shallow layers) of one fused batched
    variant decoder-layer step.

    Same caller contract as ``pallas_decode_batch.batched_layer_step``:
    caches are PURE INPUTS of shape (B, S, Dk)/(B, S, D) (differential
    keys carry 2H heads, Dk = 2D), the return is (y, k_row, v_row) and
    the caller appends the rows with ``dynamic_update_slice``. ``layer``
    is a ``pallas_decode_variant.pack_variant_layers`` dict (f32/bf16 —
    int8 packs are rejected; weight-int8 stays a B=1 feature)."""
    B, S, Dk = k_cache.shape
    D = v_cache.shape[2]
    Sm = k_cross.shape[1]
    hd = D // n_heads
    if "wqkv_s" in layer:
        raise ValueError("int8-packed variant layers are a B=1 feature "
                         "(pallas_decode_variant); the batched kernels "
                         "read compute-dtype weights")
    if block_b is None:
        block_b = pick_block_b(B)
    if B % block_b:
        raise ValueError(f"B={B} not divisible by block_b={block_b}")
    if block_b != B and block_b % 8 and not interpret:
        raise ValueError(
            f"block_b={block_b} must be the full batch or a multiple of 8 "
            "(Mosaic sublane-tile divisibility)")
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    names: List[str] = ["x"]
    args: List[Any] = [x]
    specs: List[Any] = [_vmem((block_b, D), lambda i: (i, 0))]
    full = lambda a: _vmem(a.shape, lambda i: (0,) * a.ndim)
    if rope:
        q_heads = 2 * n_heads if meta.attn == "differential" else n_heads
        cos, sin = rope_tables_interleaved(S, hd, q_heads)
        p = jnp.asarray(pos, jnp.int32)
        cos_p = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos), p, 1, 0)
        sin_p = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin), p, 1, 0)
        names += ["cos", "sin"]
        args += [cos_p, sin_p]
        specs += [full(cos_p), full(sin_p)]

    keys = ["wqkv", "bqkv", "wo", "bo"]
    if meta.attn == "differential":
        keys += ["lam", "subw"]
    if meta.attn == "rpr":
        keys.append("er")
    keys += ["cwq", "cbq", "cwo", "cbo"]
    if meta.cross == "differential":
        keys += ["clam", "csubw"]
    keys += ["norm_scale", "norm_bias"]
    if meta.ffn != "moe":
        keys += ["fw1g", "fb1g", "fw2", "fb2"]
    for key in keys:
        names.append(key)
        args.append(layer[key])
        specs.append(full(layer[key]))

    slab = lambda n, w: _vmem((block_b * n, w), lambda i: (i, 0))
    names += ["kx", "vx", "kc", "vc"]
    args += [k_cross.reshape(B * Sm, Dk), v_cross.reshape(B * Sm, D),
             k_cache.reshape(B * S, Dk), v_cache.reshape(B * S, D)]
    specs += [slab(Sm, Dk), slab(Sm, D), slab(S, Dk), slab(S, D)]

    kernel = functools.partial(
        _attn_kernel_bv, names=tuple(names), meta=meta, H=n_heads,
        rope=rope, S=S, Sm=Sm, norm=norm, pre_norm=pre_norm)
    row = lambda w: _vmem((block_b, w), lambda i: (i, 0))
    y, k_row, v_row = pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        out_shape=(jax.ShapeDtypeStruct((B, D), x.dtype),
                   jax.ShapeDtypeStruct((B, Dk), k_cache.dtype),
                   jax.ShapeDtypeStruct((B, D), v_cache.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
        out_specs=(row(D), row(Dk), row(D)),
        # wide-form live set: double-buffered streamed slabs + the
        # (rows, C) logits/probs. Differential doubles the K slabs
        # (Dk = 2D) and the logit columns (C = Bb*2H) — 48 MB there,
        # the V2 wide kernel's 32 MB otherwise (see
        # pallas_decode_batch.batched_layer_step for why NOT to
        # over-declare: an oversized footprint serializes the loop).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=(48 if meta.attn == "differential" else 32)
            * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, *args)
    return y, k_row, v_row


def batched_variant_moe_ffn(x2, layer: Dict[str, Any],
                            meta: VariantLayerMeta, *, k_top: int,
                            norm: str, pre_norm: bool,
                            interpret: bool = False):
    """MoE FFN half of a deep variant layer (whole batch, grid over
    experts, weights streamed through VMEM once per STEP): in-kernel
    router + GLU/MLP experts + optional shared expert + the closing
    residual in the layer's norm wiring. Returns (B, D) x3."""
    B, D = x2.shape
    E = layer["ew1g"].shape[0]
    act = "glu" if meta.expert == "glu" else "silu"
    full = lambda a: _vmem(a.shape, lambda j: (0,) * a.ndim)
    G = layer["ew1g"].shape[2]
    Fw = layer["ew2"].shape[1]

    args = [x2, layer["gate_w"], layer["gate_b"],
            layer["ew1g"], layer["ew2"], layer["eb1g"], layer["eb2"]]
    specs = [full(x2), full(layer["gate_w"]), full(layer["gate_b"]),
             _vmem((1, D, G), lambda j: (jnp.maximum(j - 1, 0), 0, 0)),
             _vmem((1, Fw, D), lambda j: (jnp.maximum(j - 1, 0), 0, 0)),
             full(layer["eb1g"]), full(layer["eb2"])]
    if meta.shared:
        args += [layer["sw1g"], layer["sb1g"], layer["sw2"], layer["sb2"]]
        specs += [full(a) for a in args[-4:]]
    args += [layer["norm_scale"], layer["norm_bias"]]
    specs += [full(args[-2]), full(args[-1])]

    return pl.pallas_call(
        functools.partial(_moe_kernel_bv, n_experts=E, k_top=k_top,
                          act=act, shared=meta.shared, norm=norm,
                          pre_norm=pre_norm),
        grid=(E + 1,),
        out_shape=jax.ShapeDtypeStruct((B, D), x2.dtype),
        in_specs=specs,
        out_specs=_vmem((B, D), lambda j: (0, 0)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((B, E), jnp.float32)],
        # the accumulator carries across expert cells: strictly sequential.
        # 48 MB matches the V2 batched MoE kernel
        # (pallas_decode_batch.batched_moe_ffn): double-buffered expert
        # blocks + the resident shared expert exceed the 16 MB default in
        # f32 (parity/oracle runs) and leave no headroom at larger d_ff
        # in bf16.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def fused_batch_variant_eligible(cfg) -> bool:
    """Wiring coverage equals the B=1 variant kernels' — the batched forms
    implement the same attention/FFN/norm zoo (the glue differences live
    in decode/fused.py either way)."""
    return fused_variant_eligible(cfg)


def fused_batch_variant_mosaic_ok(cfg) -> bool:
    """Hardware lane-tiling constraints: the B=1 variant constraints cover
    the packed-buffer slices; the wide form additionally slices nothing
    new (one-hot maps are full buffers)."""
    return fused_variant_mosaic_ok(cfg)
