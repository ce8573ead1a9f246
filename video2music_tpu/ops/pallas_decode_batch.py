"""Fused BATCHED single-token decoder-layer step kernels for TPU.

``ops/pallas_decode.py`` fuses one decoder-layer step at B=1 (the latency
path). Batched serving (``pipeline.generate_batch`` / the DynamicBatcher)
runs B clips per program, where the unfused XLA step is op-dispatch bound:
~130 small ops per step leave it ~10x off the HBM roofline (B=64 measured
~1.7 ms/step vs ~0.15 ms of unavoidable cache+weight traffic). These
kernels fuse the batched step into two ``pallas_call``s per layer:

  * ``batched_layer_step`` — grid over B-blocks (``block_b`` rows per
    cell; weights stay VMEM-resident across cells, caches stream per
    cell): LayerNorms, fused QKV, RoPE, masked cached self-attention,
    cached cross-attention, and (shallow layers) the SwiGLU FFN. Deep
    (MoE) layers return the post-norm2 activation for:
  * ``batched_moe_ffn`` — grid over experts (expert weights stream
    through VMEM ONCE per step regardless of B, the weight-stationary
    inverse of the B=1 kernel's per-token expert DMA): the shared expert,
    every routed expert weighted by the eval-mode top-k combine weights,
    and the closing residual LayerNorm.

Everything is strictly 2D inside the kernels (Mosaic cannot reshape
lanes<->sublanes): the per-batch-element attention segments live in the
SUBLANE dimension as (block_b * S, D) slabs. Two attention forms share
that layout:

  * ``_wide_attention`` (the default, ``WIDE_DEFAULT``): block-diagonal
    query matmul — each (batch, head) query becomes a COLUMN of a
    (C=Bb*H, D) ``q_cat``, so the whole attention is ONE NT matmul
    (k_slab -> (rows, C) logits), a column softmax, and ONE TN matmul
    (probs x v_slab) + a tiny head regroup; the current position rides a
    separate (C, C) diagonal probe instead of a slab splice. Zero
    (rows, D) elementwise passes. Measured 1.39x over the broadcast form
    at B=32 full size (5.33 vs 7.40 ms/clip — see WIDE_DEFAULT).
  * ``_segmented_attention`` (``wide=False``): per-group reductions and
    broadcasts ride one-hot row-map matmuls (``row -> batch element``),
    the batched generalization of the B=1 kernel's one-hot head-map
    trick, with the current position spliced into the slab.

Both subtract a column-global max in the softmax (>= every group max,
so the normalized result is identical).

Semantics mirror the XLA path exactly (post-norm LayerNorm(eps=1e-5)
residual blocks, f32 softmax, pairwise RoPE, -1e9 causal mask, eval-mode
top-k over raw gate logits with softmax over the selected — computed
in-kernel by ``_moe_kernel_b`` with ``gate=True`` (the batched "ends"
default), or by the caller via ``decode/fused.py:topk_combine`` in plain
mode).
Self-attention caches are PURE INPUTS here (the kernel attends over the
cache with this position's K/V spliced in-register and returns the new
rows; the caller appends them with one ``dynamic_update_slice`` — unlike
the B=1 kernel's aliased full-buffer rewrite, only the touched row is
written back). Parity with the unfused path is enforced in
tests/test_pallas_decode.py.

Reference parity target: model/video_music_transformer.py:439-520 forward
semantics (the reference's generate re-forwards the full prefix per
token, :522-609, and has no batched serving at all).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import (LN_EPS, NEG_INF, _head_map, _layer_norm,
                            _rot_pairs, rope_tables_interleaved)

# Largest batch the UNSEGMENTED fused kernels beat the unsegmented XLA
# step path at (measured, full AMT 2.2 bf16, TPU v5e,
# tools/batch_decode_bench.py):
#   B=4: 20.8 vs 31.6 ms/clip (1.52x)   B=8: 16.3 vs 23.6 (1.45x)
#   B=16: 13.7 vs 15.0 (1.10x)          B=32: 11.2 vs 10.2 (0.91x)
# Small batches are op-dispatch bound (fusion wins); by B=32 the
# unsegmented step is HBM-bound on full-cache reads, which fusion alone
# does not cut. KV-cache SEGMENTATION (GenerateConfig.cache_segments,
# the B>1 default) trims exactly those reads and flips the crossover:
# fused+seg4 beats XLA at every measured batch size (B=32 7.4 vs 10.2;
# B=64 6.5 vs 8.0 ms/clip), so segmented fused="auto" stays fused
# everywhere and this constant only gates the UNSEGMENTED
# (cache_segments=1) auto routing.
FUSED_BATCH_MAX_B = 16

# Default attention form for the batched kernels: True = block-diagonal
# ("wide", _wide_attention), False = one-hot broadcast
# (_segmented_attention). Callers passing wide=None get this. Measured
# full-size 2.2 bf16, seg-auto, ends, v5e (tools/batch_decode_bench.py
# widetiming): B=32 wide 5.33 vs 7.40 ms/clip (56.2k vs 40.5k tok/s
# aggregate) — the per-row-compute cut the int8-KV accounting predicted.
# COLD-START note (ADVICE r4): a process without a warm .jax_cache pays
# the wide kernel's cold Mosaic compile before its first batch — measured
# ~41 s compile+first-result for the full B=32 seg-auto ends wiring
# (round 5, tools/batch_spread_diag.py; round 4 once recorded ~15 min,
# never reproduced — and the splice form measured no faster cold, 50.4 s,
# so wide stays the right default cold AND warm). Prewarm serving boxes
# with tools/precompile.py.
WIDE_DEFAULT = True


def quantize_kv_rows(x):
    """Per-row symmetric int8 quantization for KV-cache entries:
    (..., D) -> ((..., D) int8, (..., 1) f32 scales). Same convention as
    the weight quantizer (ops/pallas_decode._quantize: s = max|x|/127,
    q = round(x/s)) but per ROW (one cache position across all heads) so
    the scale folds into the per-row logits/probs columns inside the
    kernel. All-zero rows get scale 1 (q = 0). The in-kernel quantizer
    (_quant_rows) mirrors this bit-for-bit for appended rows."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    return jnp.round(xf / s).astype(jnp.int8), s


def _quant_rows(x):
    """In-kernel mirror of :func:`quantize_kv_rows` on (Bb, D) f32 rows —
    returns integer-VALUED f32 (Mosaic int8 stores don't tile at
    (block_b, D); the caller casts to int8 when appending; +/-127 is exact
    in bf16 so the spliced slab stays compute dtype)."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    return jnp.round(x / s), s


def _row_map(n_rows: int, seg: int, n_seg: int):
    """(n_rows, n_seg) f32 one-hot map row r -> segment r // seg. Per-group
    sums/broadcasts over the sublane-stacked batch segments become tiny
    matmuls against this."""
    row_seg = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_seg), 0) // seg
    seg_id = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_seg), 1)
    return (row_seg == seg_id).astype(jnp.float32)


def _segmented_attention(q, k_slab, v_slab, n_heads, seg, *, pos=None,
                         k_scale=None, v_scale=None):
    """q: (Bb, D) f32 (roped); k/v slabs (Bb*seg, D) — Bb batch elements'
    caches stacked along sublanes. Masked (row-in-segment <= pos) when pos
    is given. Returns (Bb, D) f32.

    ``k_scale``/``v_scale``: optional (Bb*seg, 1) f32 per-row dequant
    scales for int8 KV caches (kv_quant="int8"). The slabs then hold
    integer VALUES (cast to compute dtype by the caller) and the scales
    fold where they are cheapest — k after the head-reduce dot (logits
    row r scales by k_scale[r]) and v into the (rows, H) probs before the
    R.T head-broadcast (per-row scaling commutes through it) — the math
    of tools/kv_traffic_probe.py, which measured the folding at
    HBM-roofline cost on the saved bytes.

    MXU dtype discipline: the big (rows, *)@(*, D) matmuls — the one-hot
    broadcast/gather maps and the prod->logits contraction — run with
    COMPUTE-DTYPE operands + f32 accumulate. f32 operands run the MXU at
    1/8 rate; bf16 one-hots are exact, and rounding the value operand
    matches the XLA step path's own bf16 q@k / p@v matmuls (the softmax
    itself stays f32, also like the XLA path). In f32 tests the casts are
    no-ops, keeping the oracle comparison exact. Measured NEUTRAL at
    d_model=512 (B=4/32 step times unchanged — the step is not MXU-bound
    at reference dims); kept as headroom for larger d_model/S, where the
    one-hot maps' Bb-fold redundant FLOPs grow. Hardware divergence vs
    XLA stays below the B=1-kernel floor in both dtypes
    (tools/batch_decode_bench.py parity)."""
    rows, D = k_slab.shape
    Bb = rows // seg
    hd = D // n_heads
    cd = k_slab.dtype
    R = _head_map(D, n_heads)
    M = _row_map(rows, seg, Bb)
    Mc = M.astype(cd)
    qx = jnp.dot(Mc, q.astype(cd),
                 preferred_element_type=jnp.float32)          # (rows, D)
    prod = qx * k_slab.astype(jnp.float32)
    logits = jnp.dot(prod.astype(cd), R.astype(cd),
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    if k_scale is not None:
        logits = logits * k_scale
    if pos is not None:
        in_seg = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) % seg
        logits = jnp.where(in_seg <= pos, logits, NEG_INF)
    # column-global max >= each segment's max: softmax result unchanged
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)                                   # (rows, H)
    denom = jnp.dot(M.T, p, preferred_element_type=jnp.float32)  # (Bb, H)
    p = p / jnp.dot(M, denom, preferred_element_type=jnp.float32)
    if v_scale is not None:
        # per-ROW scale commutes through the head-broadcast R.T: fold it
        # into p at (rows, H) — 64x cheaper than scaling p_full (rows, D)
        p = p * v_scale
    p_full = jnp.dot(p, R.T, preferred_element_type=jnp.float32)
    pv = p_full * v_slab.astype(jnp.float32)
    return jnp.dot(Mc.T, pv.astype(cd),
                   preferred_element_type=jnp.float32)        # (Bb, D)


def _wide_attention(q, k_slab, v_slab, n_heads, seg, *, pos=None,
                    k_cur=None, v_cur=None, k_scale=None, v_scale=None):
    """Block-diagonal ("wide") batched attention: same math as
    :func:`_segmented_attention` with ZERO (rows, D) elementwise passes.

    The per-row cost of the original form is the problem it fixes (see
    BACKLOG "Batched attention rows-compute"): broadcasting q over the
    slab (``M @ q``), the ``prod = qx * k_slab`` pass, the ``p_full``
    probability broadcast and the ``p_full * v_slab`` pass each touch a
    (Bb*seg, D) f32 temporary per attention instance. Here each batch
    element's per-head query becomes a COLUMN instead:

      * ``q_cat`` (C=Bb*H, D): row ``b*H+h`` is q[b] masked to head h's
        lanes (tiny: one replication matmul + one (C, D) mask);
      * ``logits = dot_general(k_slab, q_cat, contract (1,1))`` — ONE
        NT matmul streams the k slab through the MXU once, producing
        (rows, C) logits: entry [r, b*H+h] = <k_r, q_b>_headh. Wrong-
        batch columns are masked (lane padding makes C<=128 free);
      * the per-(batch, head) softmax is a plain COLUMN softmax — the
        row->segment one-hot matmul pair of the original disappears;
      * ``pv = dot_general(p, v_slab, contract (0,0))`` — one TN matmul
        streams the v slab once -> (C, D); the output regroups with a
        head-mask + the same tiny replication matmul.

    The CURRENT position (self-attention) never touches the slab: its
    logits ride in via a (C, C) diagonal probe of ``k_cur``/``q_cat``
    (``k_cur``/``v_cur`` are this step's dequantized (Bb, D) rows), so
    the two (rows, D) where-splices of the original are gone too. With
    int8 caches (``k_scale``/``v_scale`` (rows, 1)) the folds land on
    the (rows, C) logits/probs — same spots as the original — and
    uninitialized scale rows are harmless (masked after the fold).

    Returns (Bb, D) f32. Numerics: identical masking/f32-softmax
    semantics; MXU operands round to the compute dtype exactly like the
    original's map matmuls (f32 in == bit-identical oracle tests).
    """
    rows, D = k_slab.shape
    Bb = rows // seg
    hd = D // n_heads
    H = n_heads
    C = Bb * H
    cd = k_slab.dtype
    scale = hd ** -0.5

    # (C, Bb) one-hot replication row c -> batch c // H; (C, D) head mask
    rep = _row_map(C, H, Bb)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (C, D), 1) // hd
    col_head = jax.lax.broadcasted_iota(jnp.int32, (C, D), 0) % H
    hm = lane_head == col_head
    rep_c = rep.astype(cd)

    q_rep = jnp.dot(rep_c, q.astype(cd),
                    preferred_element_type=jnp.float32)       # (C, D)
    q_cat = jnp.where(hm, q_rep, 0.0).astype(cd)

    nt = (((1,), (1,)), ((), ()))
    tn = (((0,), (0,)), ((), ()))
    logits = jax.lax.dot_general(
        k_slab, q_cat, dimension_numbers=nt,
        preferred_element_type=jnp.float32) * scale           # (rows, C)
    if k_scale is not None:
        logits = logits * k_scale
    row_b = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0) // seg
    col_b = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 1) // H
    valid = row_b == col_b
    if pos is not None:
        in_seg = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0) % seg
        valid = valid & (in_seg < pos)  # strict: current row rides below
    logits = jnp.where(valid, logits, NEG_INF)

    eye = None
    if k_cur is not None:
        k_cat = jnp.dot(rep_c, k_cur.astype(cd),
                        preferred_element_type=jnp.float32)   # (C, D)
        dkq = jax.lax.dot_general(
            k_cat.astype(cd), q_cat, dimension_numbers=nt,
            preferred_element_type=jnp.float32) * scale       # (C, C)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (C, C), 1))
        diag = jnp.where(eye, dkq, 0.0)
        cur_row = jnp.sum(diag, axis=0, keepdims=True)        # (1, C)
        m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), cur_row)
    else:
        m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)            # masked entries underflow to 0
    denom = jnp.sum(p, axis=0, keepdims=True)
    if k_cur is not None:
        p_cur = jnp.exp(cur_row - m)                          # (1, C)
        denom = denom + p_cur
    inv = 1.0 / denom
    p = p * inv
    if v_scale is not None:
        p = p * v_scale
    pv = jax.lax.dot_general(
        p.astype(cd), v_slab, dimension_numbers=tn,
        preferred_element_type=jnp.float32)                   # (C, D)
    if v_cur is not None:
        # (1, C) -> (C, 1) via the diagonal of a row-broadcast (Mosaic
        # has no (1, C) transpose; a (C, C) mask + lane-reduce is free
        # at C <= 128)
        p_cur_col = jnp.sum(
            jnp.where(eye, jnp.broadcast_to(p_cur * inv, (C, C)), 0.0),
            axis=1, keepdims=True)                            # (C, 1)
        v_cat = jnp.dot(rep_c, v_cur.astype(cd),
                        preferred_element_type=jnp.float32)
        pv = pv + p_cur_col * v_cat
    pv_m = jnp.where(hm, pv, 0.0).astype(cd)
    return jnp.dot(rep_c.T, pv_m,
                   preferred_element_type=jnp.float32)        # (Bb, D)


def _swiglu_b(x_bf, w1g, b1g, w2, b2):
    """(Bb, D) -> (Bb, D) f32; w1g = [linear1|gate] concat (D, 2F)."""
    F = w2.shape[0]
    hg = jnp.dot(x_bf, w1g.astype(x_bf.dtype),
                 preferred_element_type=jnp.float32)
    hg = hg + b1g.astype(jnp.float32)
    h, g = hg[:, :F], hg[:, F:]
    h = h * (g * jax.nn.sigmoid(g))
    return jnp.dot(h.astype(x_bf.dtype), w2.astype(x_bf.dtype),
                   preferred_element_type=jnp.float32) + b2.astype(
                       jnp.float32)


def _embed_rows_b(root_ref, attr_ref, key_ref, er, ea, lcw, lck, lcb,
                  dtype):
    """(Bb, 1) token/key refs -> (Bb, D) embedded rows: one-hot matmul
    gathers (dynamic row loads don't lower) + the Linear_chord
    concat-with-key matmul decomposed as emb @ W[:D] + key * W[D] + b —
    the B=1 flat-monolith embed (pallas_decode_stack), vectorized over
    sublane rows."""
    Bb = root_ref.shape[0]
    nroot, nattr = er.shape[0], ea.shape[0]
    oh_r = (jax.lax.broadcasted_iota(jnp.int32, (Bb, nroot), 1)
            == root_ref[:]).astype(jnp.float32)
    oh_a = (jax.lax.broadcasted_iota(jnp.int32, (Bb, nattr), 1)
            == attr_ref[:]).astype(jnp.float32)
    emb = (jnp.dot(oh_r, er[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
           + jnp.dot(oh_a, ea[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32))
    x = jnp.dot(emb.astype(dtype), lcw[:].astype(dtype),
                preferred_element_type=jnp.float32)
    x = x + key_ref[:].astype(jnp.float32) * lck[:].astype(jnp.float32)
    return (x + lcb[:].astype(jnp.float32)).astype(dtype)


def _batched_prologue(pos_ref, x0, cos_ref, sin_ref, wqkv, bqkv, wo, bo,
                      cwq, cbq, cwo, cbo, nscale, nbias, kx_ref, vx_ref,
                      kc_ref, vc_ref, kn_ref, vn_ref, n_heads, rope, S, Sm,
                      scale_refs=None, ksn_ref=None, vsn_ref=None,
                      wide=False):
    """Self + cross attention sublayers for one B-block. ``x0`` is the
    (Bb, D) input activation (already loaded/computed by the caller).
    Returns x2 (post-norm2, f32) and writes this position's roped K/V
    rows to kn_ref/vn_ref (the caller appends them to the HBM caches).

    ``scale_refs`` = (cks, cvs, ks, vs) per-row dequant scale slabs turns
    on int8-KV mode: the four cache refs hold int8, this position's K/V
    rows are quantized in-kernel (integer-valued rows -> kn/vn, scales ->
    ksn/vsn) and spliced in integer space, and the scales fold inside
    :func:`_segmented_attention`."""
    pos = pos_ref[0]
    quant = scale_refs is not None
    if rope:
        # (1, D) rows for THIS position, sliced once per step by the
        # caller (full f32 tables would cost 2x (S, D) VMEM per layer)
        cos_p = cos_ref[:]
        sin_p = sin_ref[:]
    Bb, D = x0.shape

    qkv = jnp.dot(x0, wqkv[:].astype(x0.dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv[:].astype(jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    if rope:
        q = q * cos_p + _rot_pairs(q) * sin_p
        k = k * cos_p + _rot_pairs(k) * sin_p
    cd = x0.dtype
    ks_col = vs_col = cks = cvs = None
    if quant:
        cks_ref, cvs_ref, ks_ref, vs_ref = scale_refs
        # quantize this position's rows: integer values are APPENDED
        # (ksn/vsn carry the scales), but the row this STEP attends with
        # is the DEQUANTIZED q*s — numerically identical to what future
        # steps reconstruct (int row x scale). On the splice path the
        # scale column reads 1.0 at the current position (a where, no
        # one-hot matmul: a (rows,1)@ MXU dot pads to 128 lanes and two
        # of them per self-attention measured ~wash vs the saved bytes);
        # the wide path never touches the slab for the current row, so
        # it reads the raw scale columns (garbage rows masked after the
        # fold).
        kq, ks_new = _quant_rows(k)
        vq, vs_new = _quant_rows(v)
        ksn_ref[:] = ks_new
        vsn_ref[:] = vs_new
        kn_ref[:] = kq.astype(kn_ref.dtype)
        vn_ref[:] = vq.astype(vn_ref.dtype)
        k = kq * ks_new
        v = vq * vs_new
        if wide:
            ks_col, vs_col = ks_ref[:], vs_ref[:]
        else:
            in_col = jax.lax.broadcasted_iota(jnp.int32, (Bb * S, 1),
                                              0) % S
            ks_col = jnp.where(in_col == pos, 1.0, ks_ref[:])
            vs_col = jnp.where(in_col == pos, 1.0, vs_ref[:])
        cks, cvs = cks_ref[:], cvs_ref[:]
    else:
        kn_ref[:] = k.astype(kn_ref.dtype)
        vn_ref[:] = v.astype(vn_ref.dtype)

    if wide:
        # no splice: the current position's K/V ride into the attention
        # as separate (Bb, D) rows (see _wide_attention)
        attn = _wide_attention(q, kc_ref[:].astype(cd),
                               vc_ref[:].astype(cd), n_heads, S, pos=pos,
                               k_cur=k, v_cur=v,
                               k_scale=ks_col, v_scale=vs_col)
    else:
        # splice this position's K/V into the (input-only) cache slabs
        # (the broadcast map matmul runs compute-dtype on the MXU — the
        # spliced row is rounded exactly like the appended row future
        # steps read: with int8 caches the spliced row is the
        # dequantized q*s in compute dtype, future reads reconstruct the
        # same product from the int8 row)
        M = _row_map(Bb * S, S, Bb).astype(cd)
        in_seg = jax.lax.broadcasted_iota(jnp.int32, (Bb * S, D), 0) % S
        k_slab = jnp.where(
            in_seg == pos,
            jnp.dot(M, k.astype(cd),
                    preferred_element_type=jnp.float32).astype(cd),
            kc_ref[:].astype(cd))
        v_slab = jnp.where(
            in_seg == pos,
            jnp.dot(M, v.astype(cd),
                    preferred_element_type=jnp.float32).astype(cd),
            vc_ref[:].astype(cd))
        attn = _segmented_attention(q, k_slab, v_slab, n_heads, S,
                                    pos=pos, k_scale=ks_col,
                                    v_scale=vs_col)
    h = jnp.dot(attn.astype(x0.dtype), wo[:].astype(x0.dtype),
                preferred_element_type=jnp.float32)
    h = h + bo[:].astype(jnp.float32)
    x1 = _layer_norm(x0.astype(jnp.float32) + h, nscale[0:1, :],
                     nbias[0:1, :])

    cq = jnp.dot(x1.astype(x0.dtype), cwq[:].astype(x0.dtype),
                 preferred_element_type=jnp.float32)
    cq = cq + cbq[:].astype(jnp.float32)
    if rope:
        cq = cq * cos_p + _rot_pairs(cq) * sin_p
    cross_fn = _wide_attention if wide else _segmented_attention
    cattn = cross_fn(cq, kx_ref[:].astype(cd), vx_ref[:].astype(cd),
                     n_heads, Sm, pos=None, k_scale=cks, v_scale=cvs)
    ch = jnp.dot(cattn.astype(x0.dtype), cwo[:].astype(x0.dtype),
                 preferred_element_type=jnp.float32)
    ch = ch + cbo[:].astype(jnp.float32)
    return _layer_norm(x1 + ch, nscale[1:2, :], nbias[1:2, :])


def _attn_kernel_b(*refs, n_heads, rope, S, Sm, shallow, embed, quant,
                   wide):
    """One B-block of the attention half (plus the SwiGLU FFN when
    ``shallow``). With ``embed`` the kernel absorbs the chord-embedding +
    Linear_chord prologue ("ends" folding, decode/fused.py): the block's
    token/key rows ride in as (Bb, 1) refs instead of an x block. With
    ``quant`` the four cache refs are int8 and followed by their per-row
    scale slabs (kv_quant="int8")."""
    it = iter(refs)
    pos_ref = next(it)
    if embed:
        root_ref, attr_ref, key_ref = next(it), next(it), next(it)
        er, ea, lcw, lck, lcb = (next(it), next(it), next(it), next(it),
                                 next(it))
    else:
        x_ref = next(it)
    cos_ref, sin_ref = next(it), next(it)
    (wqkv, bqkv, wo, bo, cwq, cbq, cwo, cbo,
     nscale, nbias) = (next(it) for _ in range(10))
    if shallow:
        fw1g, fb1g, fw2, fb2 = next(it), next(it), next(it), next(it)
    kx_ref, vx_ref, kc_ref, vc_ref = next(it), next(it), next(it), next(it)
    scale_refs = ((next(it), next(it), next(it), next(it)) if quant
                  else None)
    y_ref, kn_ref, vn_ref = next(it), next(it), next(it)
    ksn_ref, vsn_ref = (next(it), next(it)) if quant else (None, None)

    if embed:
        x0 = _embed_rows_b(root_ref, attr_ref, key_ref, er, ea, lcw, lck,
                           lcb, y_ref.dtype)
    else:
        x0 = x_ref[:]
    x2 = _batched_prologue(pos_ref, x0, cos_ref, sin_ref, wqkv, bqkv,
                           wo, bo, cwq, cbq, cwo, cbo, nscale, nbias,
                           kx_ref, vx_ref, kc_ref, vc_ref, kn_ref, vn_ref,
                           n_heads, rope, S, Sm, scale_refs=scale_refs,
                           ksn_ref=ksn_ref, vsn_ref=vsn_ref, wide=wide)
    if shallow:
        h = _swiglu_b(x2.astype(y_ref.dtype), fw1g[:], fb1g[:], fw2[:],
                      fb2[:])
        x2 = _layer_norm(x2 + h, nscale[2:3, :], nbias[2:3, :])
    y_ref[:] = x2.astype(y_ref.dtype)


def _moe_kernel_b(*refs, n_experts, k_top, gate, head):
    """Grid cell j: j==0 computes the always-on shared expert (/k_top);
    cells 1..E add routed expert j-1 weighted by its combine weight; the
    LAST cell also applies the residual + closing LayerNorm. The expert
    weights stream through VMEM once per STEP (not per token/row):
    gw1g/gw2 are (1, D, 2F)/(1, F, D) blocks of the stacked expert arrays,
    indexed max(j-1, 0) so cell 0's fetch is reused by cell 1.

    ``gate``: compute the router in-kernel (cell 0) — gate matmul +
    vectorized eval-mode top-k combine (first-index tie-break via a
    min-over-masked-iota, matching jnp.argmax / decode/fused.topk_combine)
    into a (B, E) scratch — instead of reading caller-side combine
    weights. ``head``: the last cell folds the final LayerNorm + chord
    head ("ends" folding) and out_ref is (B, CHORD_SIZE) logits."""
    it = iter(refs)
    x2_ref = next(it)
    if gate:
        gate_w, gate_b = next(it), next(it)
    else:
        cw_ref = next(it)
    (gw1g_ref, gw2_ref, eb1g, eb2, sw1g, sb1g, sw2, sb2,
     nscale, nbias) = (next(it) for _ in range(10))
    if head:
        dns, dnb, wout, bout = next(it), next(it), next(it), next(it)
    out_ref = next(it)
    acc_ref = next(it)
    cw_scr = next(it) if gate else None

    j = pl.program_id(0)
    x2 = x2_ref[:]                       # (B, D) compute dtype

    @pl.when(j == 0)
    def _shared():
        if gate:
            gl = jnp.dot(x2, gate_w[:],
                         preferred_element_type=jnp.float32)
            gl = gl + gate_b[:].astype(jnp.float32)      # (B, E) f32
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
                # -inf (not NEG_INF) so a selected expert can never
                # re-win, exactly like topk_combine's mask
                remaining = jnp.where(oh > 0, -jnp.inf, remaining)
            m0 = sel[0][0]
            exps = [jnp.exp(m - m0) for m, _ in sel]
            denom = sum(exps)
            cw_scr[:] = sum((e / denom) * oh
                            for e, (_, oh) in zip(exps, sel))
        acc_ref[:] = _swiglu_b(x2, sw1g[:], sb1g[:], sw2[:],
                               sb2[:]) / float(k_top)

    @pl.when(j > 0)
    def _routed():
        e = j - 1
        E = n_experts
        # this expert's bias rows + per-row combine weight column via
        # one-hot matmuls (dynamic single-row loads don't lower)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
                  == e).astype(jnp.float32)
        b1g_j = jnp.dot(onehot, eb1g[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        b2_j = jnp.dot(onehot, eb2[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        cw = cw_scr[:] if gate else cw_ref[:].astype(jnp.float32)
        cj = jnp.dot(cw, onehot.T,
                     preferred_element_type=jnp.float32)  # (B, 1)
        yj = _swiglu_b(x2, gw1g_ref[0], b1g_j, gw2_ref[0], b2_j)
        acc_ref[:] = acc_ref[:] + cj * yj

    @pl.when(j == n_experts)
    def _finalize():
        x3 = _layer_norm(x2.astype(jnp.float32) + acc_ref[:],
                         nscale[2:3, :], nbias[2:3, :])
        if head:
            # layer-boundary rounding to compute dtype, then final
            # LayerNorm + chord head — bit-parity with the XLA epilogue
            xb = x3.astype(x2.dtype)
            xf = _layer_norm(xb, dns[:], dnb[:])
            out = jnp.dot(xf.astype(x2.dtype), wout[:].astype(x2.dtype),
                          preferred_element_type=jnp.float32)
            out_ref[:] = (out + bout[:].astype(jnp.float32)).astype(
                out_ref.dtype)
        else:
            out_ref[:] = x3.astype(out_ref.dtype)


def _vmem(block=None, index_map=None):
    if block is None:
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def pick_block_b(B: int) -> int:
    """Largest valid B-block: Mosaic requires the second-minor block dim
    be divisible by 8 (the f32 sublane tile) OR equal to the full array
    dim — so blocks of 8 when B divides, else the whole batch in one grid
    cell (weights are VMEM-resident either way; only the cache slabs
    stream per cell)."""
    return 8 if B % 8 == 0 else B


def batched_layer_step(x, pos, layer: Dict[str, Any], k_cache, v_cache,
                       k_cross, v_cross, *, n_heads: int, rope: bool,
                       block_b: int = None, interpret: bool = False,
                       tokens=None, embed_pack: Dict[str, Any] = None,
                       kv_scales=None, wide: bool = None):
    """Attention half (plus FFN for shallow layers) of one fused BATCHED
    decoder-layer step.

    Args:
      x: (B, D) activations (ignored — pass None — when ``tokens`` is
        given).
      pos: scalar int32 current position (same for every batch element —
        generate_batch pads primers on-device, positions align).
      layer: packed weights (ops/pallas_decode.pack_decoder_layers).
      k_cache/v_cache: (B, S, D) self-attention caches — PURE INPUTS;
        append the returned rows with
        ``jax.lax.dynamic_update_slice(cache, rows[:, None], (0, pos, 0))``.
      k_cross/v_cross: (B, Sm, D) primed memory K/V.
      tokens: optional (token_root, token_attr, key) arrays of shape
        (B,)/(B, 1) — folds the chord-embedding + Linear_chord prologue
        into this (first) layer's kernel ("ends" mode); requires
        ``embed_pack`` with emb_root/emb_attr/lc_w/lc_krow/lc_b
        (decode/fused.py builds it).
      kv_scales: optional (k_scale, v_scale, ck_scale, cv_scale) per-row
        f32 dequant scales of shapes (B, S, 1)/(B, S, 1)/(B, Sm, 1)/
        (B, Sm, 1) — turns on int8-KV mode: the four cache args must be
        int8 (``quantize_kv_rows`` layout) and the return grows scale
        rows for the append.
      wide: use the block-diagonal attention form (:func:`_wide_attention`
        — one NT + one TN slab matmul, zero (rows, D) elementwise
        passes) instead of the one-hot broadcast form
        (:func:`_segmented_attention`). Same semantics. None = the
        module default (``WIDE_DEFAULT``).
    Returns:
      (y, k_row, v_row): y is (B, D) — the full layer output for shallow
      (SwiGLU) layers, or the post-norm2 activation for deep (MoE) layers
      (feed it to :func:`batched_moe_ffn`); k_row/v_row are the (B, D)
      roped K/V rows for position ``pos``. With ``kv_scales`` the rows
      come back integer-valued plus (B, 1) f32 scale rows:
      (y, k_row, v_row, ks_row, vs_row) — cast the rows to int8 when
      appending.
    """
    B, S, D = k_cache.shape
    Sm = k_cross.shape[1]
    hd = D // n_heads
    if wide is None:
        wide = WIDE_DEFAULT
    if block_b is None:
        block_b = pick_block_b(B)
    if B % block_b:
        raise ValueError(f"B={B} not divisible by block_b={block_b}")
    if block_b != B and block_b % 8 and not interpret:
        # hardware lowering property only — interpreter-mode tests use
        # small blocks to exercise the multi-cell grid at tiny B
        raise ValueError(
            f"block_b={block_b} must be the full batch or a multiple of 8 "
            "(Mosaic sublane-tile divisibility for the (block_b, D) "
            "row blocks)")
    cos, sin = rope_tables_interleaved(S, hd, n_heads)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    # slice this position's RoPE rows once, outside the kernel
    p = jnp.asarray(pos, jnp.int32)
    cos_p = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos), p, 1, axis=0)
    sin_p = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin), p, 1, axis=0)
    deep = "gate_w" in layer
    embed = tokens is not None
    quant = kv_scales is not None
    dtype = layer["wqkv"].dtype if embed else x.dtype

    grid = (B // block_b,)
    full = lambda a: _vmem(a.shape, lambda i: (0,) * a.ndim)
    slab = lambda n: _vmem((block_b * n, D), lambda i: (i, 0))
    scol = lambda n: _vmem((block_b * n, 1), lambda i: (i, 0))
    row_block = _vmem((block_b, D), lambda i: (i, 0))
    col_block = _vmem((block_b, 1), lambda i: (i, 0))
    tok_block = _vmem((block_b, 1), lambda i: (i, 0))

    if embed:
        tr, ta, kk = tokens
        lead = [jnp.asarray(tr, jnp.int32).reshape(B, 1),
                jnp.asarray(ta, jnp.int32).reshape(B, 1),
                jnp.asarray(kk, jnp.float32).reshape(B, 1),
                embed_pack["emb_root"], embed_pack["emb_attr"],
                embed_pack["lc_w"], embed_pack["lc_krow"],
                embed_pack["lc_b"]]
        lead_specs = [tok_block] * 3 + [full(a) for a in lead[3:]]
    else:
        lead, lead_specs = [x], [row_block]

    weights = [layer["wqkv"], layer["bqkv"], layer["wo"], layer["bo"],
               layer["cwq"], layer["cbq"], layer["cwo"], layer["cbo"],
               layer["norm_scale"], layer["norm_bias"]]
    if not deep:
        weights += [layer["fw1g"], layer["fb1g"], layer["fw2"],
                    layer["fb2"]]
    kernel = functools.partial(_attn_kernel_b, n_heads=n_heads,
                               rope=rope, S=S, Sm=Sm, shallow=not deep,
                               embed=embed, quant=quant, wide=wide)

    args = ([pos_arr] + lead + [cos_p, sin_p] + weights
            + [k_cross.reshape(B * Sm, D), v_cross.reshape(B * Sm, D),
               k_cache.reshape(B * S, D), v_cache.reshape(B * S, D)])
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] + lead_specs
        + [full(cos_p), full(sin_p)]
        + [full(w) for w in weights]
        + [slab(Sm), slab(Sm), slab(S), slab(S)])
    if quant:
        ksc, vsc, cksc, cvsc = kv_scales
        # kernel-side unpack order: (cks, cvs, ks, vs)
        args += [cksc.reshape(B * Sm, 1), cvsc.reshape(B * Sm, 1),
                 ksc.reshape(B * S, 1), vsc.reshape(B * S, 1)]
        in_specs += [scol(Sm), scol(Sm), scol(S), scol(S)]

    # with int8 caches the returned rows are integer-valued in the
    # compute dtype (exact for |q| <= 127); the caller casts on append
    out_shape = [jax.ShapeDtypeStruct((B, D), dtype),
                 jax.ShapeDtypeStruct(
                     (B, D), dtype if quant else k_cache.dtype),
                 jax.ShapeDtypeStruct(
                     (B, D), dtype if quant else v_cache.dtype)]
    out_specs = [row_block, row_block, row_block]
    if quant:
        out_shape += [jax.ShapeDtypeStruct((B, 1), jnp.float32)] * 2
        out_specs += [col_block, col_block]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        # B-blocks are independent. The limit is raised to the SMALLEST
        # bucket that fits (the f32 attention intermediates need a
        # 45.2 MB scoped stack at block_b=8 full size; 17.9 MB OOM vs
        # the 16 MB default without blocks): over-declaring VMEM
        # (100 MB) measured a 2-3x slowdown of EVERY kernel in the
        # surrounding decode loop — the scheduler serializes around
        # calls with a large declared footprint (see BACKLOG).
        # The wide form's biggest live set is the double-buffered streamed
        # slabs (4 x 2.4 MB x 2 at block_b=8 full size) + the (rows, C)
        # logits/probs — the (rows, D) f32 intermediates that forced
        # 48 MB on the splice path don't exist there (24 MB measured OOM,
        # 32 MB fits).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=(32 if wide else 48) * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return outs


def batched_moe_ffn(x2, combine_weights, layer: Dict[str, Any], *,
                    k_top: int = 2, interpret: bool = False,
                    gate: bool = False, head_pack: Dict[str, Any] = None):
    """MoE FFN half of a deep layer for the whole batch: shared expert +
    combine-weighted routed experts + residual/closing LayerNorm, expert
    weights streamed through VMEM once per step (weight-stationary over
    the batch — the inverse of the B=1 kernel's per-token expert DMA).

    Args:
      x2: (B, D) post-norm2 activations from :func:`batched_layer_step`.
      combine_weights: (B, E) f32 eval-mode top-k combine weights (zero
        for unselected experts) — ``decode/fused.py:topk_combine``.
        Ignored (pass None) with ``gate=True``, which computes the router
        + top-k combine IN-KERNEL from the layer's gate_w/gate_b instead.
      head_pack: optional dn_scale/dn_bias/wout/bout dict — folds the
        final LayerNorm + chord head into the last cell ("ends" mode) and
        returns (B, CHORD_SIZE) logits instead of x3.
    Returns:
      (B, D) layer output x3, or (B, CHORD_SIZE) logits with head_pack.
    """
    B, D = x2.shape
    E, _, F2 = layer["ew1g"].shape
    F = F2 // 2
    grid = (E + 1,)
    full = lambda a: _vmem(a.shape, lambda j: (0,) * a.ndim)
    head = head_pack is not None
    n_out = head_pack["wout"].shape[-1] if head else D

    if gate:
        route = [layer["gate_w"], layer["gate_b"]]
    else:
        route = [combine_weights]
    tail = ([head_pack["dn_scale"], head_pack["dn_bias"],
             head_pack["wout"], head_pack["bout"]] if head else [])
    scratch = [pltpu.VMEM((B, D), jnp.float32)]
    if gate:
        scratch.append(pltpu.VMEM((B, E), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_moe_kernel_b, n_experts=E, k_top=k_top,
                          gate=gate, head=head),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, n_out), x2.dtype),
        in_specs=(
            [full(x2)] + [full(a) for a in route]
            + [_vmem((1, D, F2), lambda j: (jnp.maximum(j - 1, 0), 0, 0)),
               _vmem((1, F, D), lambda j: (jnp.maximum(j - 1, 0), 0, 0)),
               full(layer["eb1g"]), full(layer["eb2"]),
               full(layer["sw1g"]), full(layer["sb1g"]),
               full(layer["sw2"]), full(layer["sb2"]),
               full(layer["norm_scale"]), full(layer["norm_bias"])]
            + [full(a) for a in tail]),
        out_specs=_vmem((B, n_out), lambda j: (0, 0)),
        scratch_shapes=scratch,
        # the accumulator carries across expert cells: strictly sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x2, *route, layer["ew1g"], layer["ew2"], layer["eb1g"],
      layer["eb2"], layer["sw1g"], layer["sb1g"], layer["sw2"],
      layer["sb2"], layer["norm_scale"], layer["norm_bias"], *tail)
    return out
