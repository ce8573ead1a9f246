"""Stacked-segment fused decode kernels: one ``pallas_call`` per RUN of
same-kind decoder layers (B=1 latency path).

``ops/pallas_decode.py`` fuses one decoder layer per kernel, so a step of
the 6-layer flagship is 6 launches + embed/head glue. The measured step
(~72 us device-side) is kernel-LATENCY bound, not HBM bound — the fixed
per-launch cost (dispatch, pipeline fill/drain between kernels) is a
large fraction. These kernels collapse each homogeneous SEGMENT (the
V2 family is 3 SwiGLU layers then 3 MoE layers) into ONE ``pallas_call``
with ``grid=(n_layers_in_segment,)``:

  * per-layer weights are stacked along a leading axis and block-indexed
    by the grid cell (Mosaic streams each layer's weights into VMEM while
    the previous layer computes);
  * the activation flows cell -> cell through a VMEM scratch register,
    rounded to the compute dtype at each layer boundary exactly like the
    per-layer kernels' out_ref writes (bit-parity preserved);
  * self-attention caches are stacked ``(n, S, D)`` and aliased in/out,
    one ``(1, S, D)`` block per cell;
  * MoE expert weights are stacked flat ``(n*E, D, 2F)`` in ANY (HBM)
    space; each cell DMAs its layer's top-k selected experts while the
    shared expert computes (index ``j*E + e``).

Same math helpers and semantics as the per-layer kernels (post-norm
LayerNorm residual blocks, f32 softmax, pairwise RoPE, masked-select
cache append, eval-mode top-k over raw gate logits). int8 weight-only
mode is NOT wired here — it measured zero step-time change on the
per-layer kernels (the step is latency-bound, not traffic-bound), so
int8 decode keeps using the per-layer path (decode/sampler.py routes).

Reference parity target: model/video_music_transformer.py:439-520
forward semantics (the reference re-forwards the full prefix per token,
:522-609). Parity enforced in tests/test_pallas_decode.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import (NEG_INF, _cached_attention, _layer_norm,
                            _prologue, _rot_pairs, _swiglu,
                            pack_decoder_layers, rope_tables_interleaved)


def decoder_segments(cfg) -> List[Dict[str, Any]]:
    """Runs of consecutive same-ffn-kind decoder layers:
    [{"kind": "swiglu"|"moe", "start": i, "layers": [i..j]}, ...]."""
    segs = []
    for i, spec in enumerate(cfg.decoder_layers):
        if segs and segs[-1]["kind"] == spec.ffn:
            segs[-1]["layers"].append(i)
        else:
            segs.append({"kind": spec.ffn, "start": i, "layers": [i]})
    return segs


def pack_decoder_segments(params: Dict[str, Any], cfg) -> List[Dict[str, Any]]:
    """Stack :func:`pack_decoder_layers` outputs per segment: every packed
    weight gains a leading layer axis; expert stacks are flattened to
    (n*E, ...) for single-scalar DMA indexing. Pure jnp stacking — XLA
    hoists it out of the decode scan as a loop invariant."""
    per_layer = pack_decoder_layers(params, cfg, quantize=None)
    packed_segs = []
    for seg in decoder_segments(cfg):
        layers = [per_layer[i] for i in seg["layers"]]
        stacked = {k: jnp.stack([l[k] for l in layers])
                   for k in layers[0].keys()}
        if seg["kind"] == "moe":
            n, E = stacked["ew1g"].shape[:2]
            stacked["ew1g"] = stacked["ew1g"].reshape(
                n * E, *stacked["ew1g"].shape[2:])
            stacked["ew2"] = stacked["ew2"].reshape(
                n * E, *stacked["ew2"].shape[2:])
        packed_segs.append({"kind": seg["kind"], **stacked})
    return packed_segs


def _seg_prologue(ci, pos, x0, cos_ref, sin_ref, wqkv, bqkv, wo, bo,
                  cwq, cbq, cwo, cbo, nscale, nbias, kx_ref, vx_ref,
                  kc_ref, vc_ref, n_heads, rope):
    """Self + cross attention sublayers for grid cell j (weights already
    read out of their (1, ...) blocks as values). Appends this position's
    K/V into the aliased cache block. Returns x2 (post-norm2, f32)."""
    if rope:
        cos_p = cos_ref[pl.ds(pos, 1), :]  # (1, D)
        sin_p = sin_ref[pl.ds(pos, 1), :]
    D = x0.shape[-1]

    qkv = jnp.dot(x0, wqkv.astype(x0.dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv.astype(jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    if rope:
        q = q * cos_p + _rot_pairs(q) * sin_p
        k = k * cos_p + _rot_pairs(k) * sin_p
    # append via masked full-buffer select (pallas_decode._attn_block)
    S = kc_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, D), 0)
    k_all = jnp.where(rows == pos, k.astype(kc_ref.dtype), kc_ref[ci])
    v_all = jnp.where(rows == pos, v.astype(vc_ref.dtype), vc_ref[ci])
    kc_ref[ci] = k_all
    vc_ref[ci] = v_all
    attn = _cached_attention(q, k_all, v_all, n_heads, pos=pos)
    h = jnp.dot(attn.astype(x0.dtype), wo.astype(x0.dtype),
                preferred_element_type=jnp.float32)
    h = h + bo.astype(jnp.float32)
    x1 = _layer_norm(x0.astype(jnp.float32) + h, nscale[0:1, :],
                     nbias[0:1, :])

    cq = jnp.dot(x1.astype(x0.dtype), cwq.astype(x0.dtype),
                 preferred_element_type=jnp.float32)
    cq = cq + cbq.astype(jnp.float32)
    if rope:
        cq = cq * cos_p + _rot_pairs(cq) * sin_p
    cattn = _cached_attention(cq, kx_ref[ci], vx_ref[ci], n_heads, pos=None)
    ch = jnp.dot(cattn.astype(x0.dtype), cwo.astype(x0.dtype),
                 preferred_element_type=jnp.float32)
    ch = ch + cbo.astype(jnp.float32)
    return _layer_norm(x1 + ch, nscale[1:2, :], nbias[1:2, :])


def _shallow_stack_kernel(pos_ref, x_ref, cos_ref, sin_ref,
                          wqkv, bqkv, wo, bo, cwq, cbq, cwo, cbo,
                          nscale, nbias, fw1g, fb1g, fw2, fb2,
                          kx_ref, vx_ref, kc_in, vc_in,
                          kc_ref, vc_ref, y_ref, x_scr,
                          *, n_heads, rope, n_layers, resident):
    del kc_in, vc_in  # aliased to kc_ref/vc_ref
    j = pl.program_id(0)
    # resident: weight stacks live whole in VMEM (fetched once in the
    # call prologue), each cell dynamic-indexes its layer j — no per-cell
    # weight DMA waits. blocked (w[0]): one layer's block streams per cell.
    w = (lambda r: r[j]) if resident else (lambda r: r[0])
    ci = j if resident else 0
    pos = pos_ref[0]

    @pl.when(j == 0)
    def _load_x():
        x_scr[:] = x_ref[:]

    x0 = x_scr[:]
    ns, nb = w(nscale), w(nbias)
    x2 = _seg_prologue(ci, pos, x0, cos_ref, sin_ref, w(wqkv), w(bqkv),
                       w(wo), w(bo), w(cwq), w(cbq), w(cwo), w(cbo),
                       ns, nb, kx_ref, vx_ref, kc_ref, vc_ref,
                       n_heads, rope)
    h = _swiglu(x2.astype(x0.dtype), w(fw1g), w(fb1g), w(fw2), w(fb2))
    x3 = _layer_norm(x2 + h, ns[2:3, :], nb[2:3, :])
    # round to the compute dtype at the layer boundary, matching the
    # per-layer kernels' out_ref writes (keeps bit parity with that path)
    x_scr[:] = x3.astype(x_scr.dtype)

    @pl.when(j == n_layers - 1)
    def _emit():
        y_ref[:] = x3.astype(y_ref.dtype)


def _deep_stack_kernel(pos_ref, x_ref, cos_ref, sin_ref,
                       wqkv, bqkv, wo, bo, cwq, cbq, cwo, cbo,
                       nscale, nbias, gate_w, gate_b,
                       sw1g, sb1g, sw2, sb2,
                       ew1g_hbm, ew2_hbm, eb1g, eb2,
                       kx_ref, vx_ref, kc_in, vc_in,
                       kc_ref, vc_ref, y_ref,
                       x_scr, *scratch, n_heads, rope, k_top, n_layers,
                       n_experts, resident):
    del kc_in, vc_in  # aliased to kc_ref/vc_ref
    j = pl.program_id(0)
    w = (lambda r: r[j]) if resident else (lambda r: r[0])
    ci = j if resident else 0
    pos = pos_ref[0]
    sems = scratch[-1]
    w1g_scr = scratch[0:2 * k_top:2]
    w2_scr = scratch[1:2 * k_top:2]

    @pl.when(j == 0)
    def _load_x():
        x_scr[:] = x_ref[:]

    x0 = x_scr[:]
    ns, nb = w(nscale), w(nbias)
    x2 = _seg_prologue(ci, pos, x0, cos_ref, sin_ref, w(wqkv), w(bqkv),
                       w(wo), w(bo), w(cwq), w(cbq), w(cwo), w(cbo),
                       ns, nb, kx_ref, vx_ref, kc_ref, vc_ref,
                       n_heads, rope)
    x2b = x2.astype(x0.dtype)

    # eval-mode top-k over raw gate logits (pallas_decode._deep_kernel)
    logits = jnp.dot(x2b, w(gate_w), preferred_element_type=jnp.float32)
    logits = logits + w(gate_b).astype(jnp.float32)  # (1, E)
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

    dmas = []
    for t in range(k_top):
        flat = j * n_experts + sel_idx[t]
        dmas.append(pltpu.make_async_copy(
            ew1g_hbm.at[flat], w1g_scr[t], sems.at[2 * t]))
        dmas.append(pltpu.make_async_copy(
            ew2_hbm.at[flat], w2_scr[t], sems.at[2 * t + 1]))
    for d in dmas:
        d.start()

    h = _swiglu(x2b, w(sw1g), w(sb1g), w(sw2), w(sb2)) / float(k_top)

    for d in dmas:
        d.wait()
    E = n_experts
    for t in range(k_top):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
                  == sel_idx[t]).astype(jnp.float32)
        b1g_t = jnp.dot(onehot, w(eb1g).astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        b2_t = jnp.dot(onehot, w(eb2).astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        yt = _swiglu(x2b, w1g_scr[t][:], b1g_t, w2_scr[t][:], b2_t)
        h = h + (exps[t] / denom) * yt

    x3 = _layer_norm(x2 + h, ns[2:3, :], nb[2:3, :])
    x_scr[:] = x3.astype(x_scr.dtype)

    @pl.when(j == n_layers - 1)
    def _emit():
        y_ref[:] = x3.astype(y_ref.dtype)


def pack_monolith(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Weight dict for :func:`decode_monolith_step`: per-layer packs
    stacked over ALL layers (attention stacks span every layer; the
    shallow/deep FFN stacks span only layers of their kind, indexed
    statically in kernel order), plus the embedding / Linear_chord /
    final-norm / head params the kernel folds in. Absent kinds get
    (1, 1, 1)-shaped placeholders (never read — the unroll is static)."""
    per_layer = pack_decoder_layers(params, cfg, quantize=None)
    attn_keys = ["wqkv", "bqkv", "wo", "bo", "cwq", "cbq", "cwo", "cbo",
                 "norm_scale", "norm_bias"]
    packed = {k: jnp.stack([l[k] for l in per_layer]) for k in attn_keys}
    dtype = packed["wqkv"].dtype
    shallow = [l for l in per_layer if "fw1g" in l]
    deep = [l for l in per_layer if "gate_w" in l]
    dummy = jnp.zeros((1, 1, 1), dtype)
    for k in ("fw1g", "fb1g", "fw2", "fb2"):
        packed[k] = (jnp.stack([l[k] for l in shallow]) if shallow
                     else dummy)
    for k in ("gate_w", "gate_b", "sw1g", "sb1g", "sw2", "sb2",
              "eb1g", "eb2"):
        packed[k] = jnp.stack([l[k] for l in deep]) if deep else dummy
    if deep:
        e1 = jnp.stack([l["ew1g"] for l in deep])
        e2 = jnp.stack([l["ew2"] for l in deep])
        packed["ew1g"] = e1.reshape(-1, *e1.shape[2:])
        packed["ew2"] = e2.reshape(-1, *e2.shape[2:])
    else:
        packed["ew1g"] = packed["ew2"] = dummy
    packed["emb_root"] = params["embedding_root"]["embedding"]
    packed["emb_attr"] = params["embedding_attr"]["embedding"]
    lc = params["Linear_chord"]
    D = cfg.d_model
    packed["lc_w"] = lc["kernel"][:D]
    packed["lc_krow"] = lc["kernel"][D:D + 1]
    packed["lc_b"] = lc["bias"].reshape(1, -1)
    packed["dn_scale"] = params["decoder_norm"]["scale"].reshape(1, -1)
    packed["dn_bias"] = params["decoder_norm"]["bias"].reshape(1, -1)
    packed["wout"] = params["Wout"]["kernel"]
    packed["bout"] = params["Wout"]["bias"].reshape(1, -1)
    return packed


def _monolith_kernel(pos_ref, root_ref, attr_ref, key_ref,
                     cos_ref, sin_ref,
                     emb_root, emb_attr, lc_w, lc_krow, lc_b,
                     wqkv, bqkv, wo, bo, cwq, cbq, cwo, cbo,
                     nscale, nbias,
                     fw1g, fb1g, fw2, fb2,
                     gate_w, gate_b, sw1g, sb1g, sw2, sb2,
                     ew1g_hbm, ew2_hbm, eb1g, eb2,
                     dn_scale, dn_bias, wout, bout,
                     kx_ref, vx_ref, kc_in, vc_in,
                     kc_ref, vc_ref, logits_ref,
                     *scratch, kinds, n_heads, rope, k_top, n_experts):
    """The WHOLE decode step in one kernel: chord embedding + key concat +
    Linear_chord, every decoder layer statically unrolled (weights read
    from the full VMEM-resident stacks at STATIC indices), final
    LayerNorm, and the chord head. Ungridded — one prologue DMA burst,
    one body, zero per-layer launch/pipeline costs."""
    del kc_in, vc_in  # aliased to kc_ref/vc_ref
    pos = pos_ref[0]
    sems = scratch[-1]
    w1g_scr = scratch[0:2 * k_top:2]
    w2_scr = scratch[1:2 * k_top:2]
    dtype = kc_ref.dtype

    # ---- embed: one-hot gathers (dynamic single-row loads don't lower),
    # concat-with-key matmul decomposed as x @ W[:D] + key * W[D] + b
    nroot = emb_root.shape[0]
    nattr = emb_attr.shape[0]
    oh_r = (jax.lax.broadcasted_iota(jnp.int32, (1, nroot), 1)
            == root_ref[0]).astype(jnp.float32)
    oh_a = (jax.lax.broadcasted_iota(jnp.int32, (1, nattr), 1)
            == attr_ref[0]).astype(jnp.float32)
    emb = (jnp.dot(oh_r, emb_root[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
           + jnp.dot(oh_a, emb_attr[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32))
    x = jnp.dot(emb.astype(dtype), lc_w[:].astype(dtype),
                preferred_element_type=jnp.float32)
    x = x + key_ref[0] * lc_krow[:].astype(jnp.float32)
    x = (x + lc_b[:].astype(jnp.float32)).astype(dtype)

    # ---- decoder layers, statically unrolled
    si = di = 0  # indices into the shallow / deep weight stacks
    for i, kind in enumerate(kinds):
        ns, nb = nscale[i], nbias[i]
        x2 = _seg_prologue(i, pos, x, cos_ref, sin_ref, wqkv[i], bqkv[i],
                           wo[i], bo[i], cwq[i], cbq[i], cwo[i], cbo[i],
                           ns, nb, kx_ref, vx_ref, kc_ref, vc_ref,
                           n_heads, rope)
        if kind != "moe":
            h = _swiglu(x2.astype(dtype), fw1g[si], fb1g[si], fw2[si],
                        fb2[si])
            si += 1
        else:
            x2b = x2.astype(dtype)
            logits = jnp.dot(x2b, gate_w[di],
                             preferred_element_type=jnp.float32)
            logits = logits + gate_b[di].astype(jnp.float32)  # (1, E)
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
            dmas = []
            for t in range(k_top):
                flat = di * n_experts + sel_idx[t]
                dmas.append(pltpu.make_async_copy(
                    ew1g_hbm.at[flat], w1g_scr[t], sems.at[2 * t]))
                dmas.append(pltpu.make_async_copy(
                    ew2_hbm.at[flat], w2_scr[t], sems.at[2 * t + 1]))
            for d in dmas:
                d.start()
            h = _swiglu(x2b, sw1g[di], sb1g[di], sw2[di],
                        sb2[di]) / float(k_top)
            for d in dmas:
                d.wait()
            for t in range(k_top):
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, n_experts), 1)
                    == sel_idx[t]).astype(jnp.float32)
                b1g_t = jnp.dot(onehot, eb1g[di].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
                b2_t = jnp.dot(onehot, eb2[di].astype(jnp.float32),
                               preferred_element_type=jnp.float32)
                yt = _swiglu(x2b, w1g_scr[t][:], b1g_t, w2_scr[t][:], b2_t)
                h = h + (exps[t] / denom) * yt
            di += 1
        x3 = _layer_norm(x2 + h, ns[2:3, :], nb[2:3, :])
        # layer-boundary rounding, bit-parity with the per-layer kernels
        x = x3.astype(dtype)

    # ---- final LayerNorm + chord head
    xf = _layer_norm(x, dn_scale[:], dn_bias[:])
    out = jnp.dot(xf.astype(dtype), wout[:].astype(dtype),
                  preferred_element_type=jnp.float32)
    logits_ref[:] = (out + bout[:].astype(jnp.float32)).astype(
        logits_ref.dtype)


_ATTN_KEYS = ("wqkv", "bqkv", "wo", "bo", "cwq", "cbq", "cwo", "cbo",
              "norm_scale", "norm_bias")
_SHALLOW_KEYS = ("fw1g", "fb1g", "fw2", "fb2")
_DEEP_KEYS = ("gate_w", "gate_b", "sw1g", "sb1g", "sw2", "sb2",
              "ew1g", "ew2", "eb1g", "eb2")


def _flat_monolith_kernel(*refs, kinds, n_heads, rope, k_top, n_experts,
                          embed=True, head=True):
    """A run of decoder layers as ONE ungridded kernel with every layer's
    weights/caches as SEPARATE unstacked operands (exactly the per-layer
    kernels' ref shapes), plus optionally the folded chord embedding /
    Linear_chord prologue (``embed``) and the final-LayerNorm + chord
    head epilogue (``head``). With one layer and one end folded this is
    the per-layer kernel with its adjacent XLA glue pulled in; with all
    layers and both ends it is the whole-step monolith (measured 2x
    SLOWER than per-layer — a single prologue DMA burst cannot overlap
    compute the way kernel-boundary pipelining does; see BACKLOG)."""
    it = iter(refs)
    nxt = lambda: next(it)
    pos_ref, cos_ref, sin_ref = nxt(), nxt(), nxt()
    if embed:
        root_ref, attr_ref, key_ref = nxt(), nxt(), nxt()
        emb_root, emb_attr, lc_w, lc_krow, lc_b = (
            nxt(), nxt(), nxt(), nxt(), nxt())
    else:
        x_ref = nxt()
    if head:
        dn_scale, dn_bias, wout, bout = nxt(), nxt(), nxt(), nxt()
    layer_refs = []
    for kind in kinds:
        grp = {k: nxt() for k in _ATTN_KEYS}
        grp.update({k: nxt() for k in
                    (_SHALLOW_KEYS if kind != "moe" else _DEEP_KEYS)})
        grp["kx"], grp["vx"] = nxt(), nxt()
        layer_refs.append(grp)
    for grp in layer_refs:  # aliased cache inputs (ignored; outs below)
        nxt(), nxt()
    for grp in layer_refs:
        grp["kc"], grp["vc"] = nxt(), nxt()
    logits_ref = nxt()
    rest = list(it)
    sems = rest[-1] if rest else None
    w1g_scr = rest[0:2 * k_top:2]
    w2_scr = rest[1:2 * k_top:2]

    pos = pos_ref[0]
    dtype = logits_ref.dtype

    if embed:
        # embed + Linear_chord (decomposed concat matmul)
        nroot, nattr = emb_root.shape[0], emb_attr.shape[0]
        oh_r = (jax.lax.broadcasted_iota(jnp.int32, (1, nroot), 1)
                == root_ref[0]).astype(jnp.float32)
        oh_a = (jax.lax.broadcasted_iota(jnp.int32, (1, nattr), 1)
                == attr_ref[0]).astype(jnp.float32)
        emb = (jnp.dot(oh_r, emb_root[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
               + jnp.dot(oh_a, emb_attr[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32))
        x = jnp.dot(emb.astype(dtype), lc_w[:].astype(dtype),
                    preferred_element_type=jnp.float32)
        x = x + key_ref[0] * lc_krow[:].astype(jnp.float32)
        x = (x + lc_b[:].astype(jnp.float32)).astype(dtype)
    else:
        x = x_ref[:]

    di = 0
    for kind, g in zip(kinds, layer_refs):
        x2 = _prologue(pos_ref, x, cos_ref, sin_ref, g["wqkv"], g["bqkv"],
                       g["wo"], g["bo"], g["cwq"], g["cbq"], g["cwo"],
                       g["cbo"], g["norm_scale"], g["norm_bias"],
                       g["kx"], g["vx"], g["kc"], g["vc"], n_heads, rope)
        ns, nb = g["norm_scale"], g["norm_bias"]
        if kind != "moe":
            h = _swiglu(x2.astype(dtype), g["fw1g"][:], g["fb1g"][:],
                        g["fw2"][:], g["fb2"][:])
        else:
            x2b = x2.astype(dtype)
            logits = jnp.dot(x2b, g["gate_w"][:],
                             preferred_element_type=jnp.float32)
            logits = logits + g["gate_b"][:].astype(jnp.float32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            remaining = logits
            sel_idx, sel_logit = [], []
            for _ in range(k_top):
                e = jnp.argmax(remaining, axis=-1)[0]
                sel_idx.append(e)
                sel_logit.append(jnp.max(remaining))
                remaining = jnp.where(lanes == e, NEG_INF, remaining)
            m = sel_logit[0]
            exps = [jnp.exp(gl - m) for gl in sel_logit]
            denom = sum(exps)
            dmas = []
            for t in range(k_top):
                dmas.append(pltpu.make_async_copy(
                    g["ew1g"].at[sel_idx[t]], w1g_scr[t], sems.at[2 * t]))
                dmas.append(pltpu.make_async_copy(
                    g["ew2"].at[sel_idx[t]], w2_scr[t], sems.at[2 * t + 1]))
            for d in dmas:
                d.start()
            h = _swiglu(x2b, g["sw1g"][:], g["sb1g"][:], g["sw2"][:],
                        g["sb2"][:]) / float(k_top)
            for d in dmas:
                d.wait()
            for t in range(k_top):
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, n_experts), 1)
                    == sel_idx[t]).astype(jnp.float32)
                b1g_t = jnp.dot(onehot, g["eb1g"][:].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
                b2_t = jnp.dot(onehot, g["eb2"][:].astype(jnp.float32),
                               preferred_element_type=jnp.float32)
                yt = _swiglu(x2b, w1g_scr[t][:], b1g_t, w2_scr[t][:],
                             b2_t)
                h = h + (exps[t] / denom) * yt
            di += 1
        x3 = _layer_norm(x2 + h, ns[2:3, :], nb[2:3, :])
        x = x3.astype(dtype)

    if head:
        xf = _layer_norm(x, dn_scale[:], dn_bias[:])
        out = jnp.dot(xf.astype(dtype), wout[:].astype(dtype),
                      preferred_element_type=jnp.float32)
        logits_ref[:] = (out + bout[:].astype(jnp.float32)).astype(
            logits_ref.dtype)
    else:
        logits_ref[:] = x.astype(logits_ref.dtype)  # the run's y output


def decode_flat_monolith_step(token_root, token_attr, key, pos,
                              layers: list, head: Dict[str, Any],
                              caches: list, *, kinds, n_heads: int,
                              rope: bool, k_top: int = 2,
                              embed: bool = True, fold_head: bool = True,
                              x=None, interpret: bool = False):
    """A RUN of decoder layers (+ optionally the folded embed prologue
    and/or final-norm+head epilogue) as a single ungridded pallas_call
    with per-layer UNSTACKED operands.

    Args:
      layers: pack_decoder_layers output (one dict per layer of the run).
      head: dict with emb_root/emb_attr/lc_w/lc_krow/lc_b/dn_scale/
        dn_bias/wout/bout (pack_monolith provides these keys).
      caches: per layer (k, v, kx, vx) tuples; k/v (S, D) aliased.
      embed: fold the chord embedding + Linear_chord in (token_root/
        token_attr/key inputs); otherwise pass ``x`` (1, D).
      fold_head: fold the final LayerNorm + chord head in (returns
        logits); otherwise returns the run's output activation y (1, D).
    Returns:
      (logits (1, CHORD_SIZE) | y (1, D), [(new_k, new_v), ...]).
    """
    S, D = caches[0][0].shape
    hd = D // n_heads
    cos, sin = rope_tables_interleaved(S, hd, n_heads)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)

    args = [pos_arr, jnp.asarray(cos), jnp.asarray(sin)]
    in_specs = [smem(), vmem(), vmem()]
    if embed:
        args += [jnp.asarray(token_root, jnp.int32).reshape(1),
                 jnp.asarray(token_attr, jnp.int32).reshape(1),
                 jnp.asarray(key, jnp.float32).reshape(1),
                 head["emb_root"], head["emb_attr"], head["lc_w"],
                 head["lc_krow"], head["lc_b"]]
        in_specs += [smem(), smem(), smem()] + [vmem()] * 5
    else:
        args.append(x)
        in_specs.append(vmem())
    if fold_head:
        args += [head["dn_scale"], head["dn_bias"], head["wout"],
                 head["bout"]]
        in_specs += [vmem()] * 4

    n_exp = 0
    F = 0
    for kind, layer, (kc, vc, kx, vx) in zip(kinds, layers, caches):
        keys = _ATTN_KEYS + (_SHALLOW_KEYS if kind != "moe"
                             else _DEEP_KEYS)
        for k in keys:
            args.append(layer[k])
            in_specs.append(any_() if k in ("ew1g", "ew2") else vmem())
        args += [kx, vx]
        in_specs += [vmem(), vmem()]
        if kind == "moe":
            n_exp = layer["eb1g"].shape[0]
            F = layer["ew2"].shape[1]
    cache_base = len(args)
    for (kc, vc, kx, vx) in caches:
        args += [kc, vc]
        in_specs += [vmem(), vmem()]

    L = len(kinds)
    out_shape = []
    for (kc, vc, kx, vx) in caches:
        out_shape.append(jax.ShapeDtypeStruct(kc.shape, kc.dtype))
        out_shape.append(jax.ShapeDtypeStruct(vc.shape, vc.dtype))
    dtype = caches[0][0].dtype
    out_shape.append(jax.ShapeDtypeStruct(
        (1, head["wout"].shape[-1] if fold_head else D), dtype))
    aliases = {cache_base + i: i for i in range(2 * L)}

    scratch = []
    for _ in range(k_top if n_exp else 0):
        scratch.append(pltpu.VMEM((D, 2 * F), layers[-1]["ew1g"].dtype))
        scratch.append(pltpu.VMEM((F, D), layers[-1]["ew2"].dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2 * k_top,)))

    outs = pl.pallas_call(
        functools.partial(_flat_monolith_kernel, kinds=tuple(kinds),
                          n_heads=n_heads, rope=rope, k_top=k_top,
                          n_experts=n_exp, embed=embed, head=fold_head),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple([vmem()] * len(out_shape)),
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        # NO vmem_limit override: single-layer runs fit the default
        # 16 MB scoped budget, and raising the limit was measured to
        # slow EVERY kernel in the surrounding decode loop 2-3x (the
        # XLA latency-hiding scheduler serializes around calls with a
        # large declared VMEM footprint) — see BACKLOG
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if len(kinds) > 1
            else None),
        interpret=interpret,
    )(*args)
    logits = outs[-1]
    new_caches = [(outs[2 * i], outs[2 * i + 1]) for i in range(L)]
    return logits, new_caches


def decode_monolith_step(token_root, token_attr, key, pos,
                         packed: Dict[str, Any], k_cache, v_cache,
                         k_cross, v_cross, *, kinds, n_heads: int,
                         rope: bool, k_top: int = 2,
                         interpret: bool = False):
    """One WHOLE decode step (embed -> all layers -> head) as a single
    ungridded pallas_call.

    Args:
      token_root/token_attr: (1,) int32 current chord root/attr ids.
      key: (1,) f32 key conditioning scalar.
      pos: scalar int32 position.
      packed: pack_monolith(params, cfg) weight dict.
      k_cache/v_cache: (L, S, D) stacked self caches (aliased in-place).
      k_cross/v_cross: (L, Sm, D) stacked primed memory K/V.
      kinds: tuple of "swiglu"/"moe" per layer (static).
    Returns:
      (logits (1, CHORD_SIZE) f32, new_k_cache, new_v_cache).
    """
    D = k_cache.shape[-1]
    S = k_cache.shape[1]
    hd = D // n_heads
    cos, sin = rope_tables_interleaved(S, hd, n_heads)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    has_moe = "moe" in kinds
    n_exp = packed["eb1g"].shape[1] if has_moe else 0
    F = packed["ew2"].shape[1] if has_moe else 0
    scratch = []
    for _ in range(k_top if n_exp else 0):
        scratch.append(pltpu.VMEM((D, 2 * F), packed["ew1g"].dtype))
        scratch.append(pltpu.VMEM((F, D), packed["ew2"].dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2 * k_top,)))

    names = ["emb_root", "emb_attr", "lc_w", "lc_krow", "lc_b",
             "wqkv", "bqkv", "wo", "bo", "cwq", "cbq", "cwo", "cbo",
             "norm_scale", "norm_bias",
             "fw1g", "fb1g", "fw2", "fb2",
             "gate_w", "gate_b", "sw1g", "sb1g", "sw2", "sb2",
             "ew1g", "ew2", "eb1g", "eb2",
             "dn_scale", "dn_bias", "wout", "bout"]
    weights = [packed[nm] for nm in names]
    w_specs = [vmem() if nm not in ("ew1g", "ew2")
               else pl.BlockSpec(memory_space=pl.ANY) for nm in names]

    args = ([pos_arr, jnp.asarray(token_root, jnp.int32).reshape(1),
             jnp.asarray(token_attr, jnp.int32).reshape(1),
             jnp.asarray(key, jnp.float32).reshape(1),
             jnp.asarray(cos), jnp.asarray(sin)] + weights
            + [k_cross, v_cross, k_cache, v_cache])
    in_specs = ([smem(), smem(), smem(), smem(), vmem(), vmem()]
                + w_specs + [vmem()] * 4)
    n_in = len(args)

    new_k, new_v, logits = pl.pallas_call(
        functools.partial(_monolith_kernel, kinds=tuple(kinds),
                          n_heads=n_heads, rope=rope, k_top=k_top,
                          n_experts=n_exp),
        out_shape=(jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
                   jax.ShapeDtypeStruct((1, packed["wout"].shape[-1]),
                                        k_cache.dtype)),
        in_specs=in_specs,
        out_specs=(vmem(), vmem(), vmem()),
        scratch_shapes=scratch,
        input_output_aliases={n_in - 2: 0, n_in - 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return logits, new_k, new_v


def decode_segment_step(x, pos, seg: Dict[str, Any], k_cache, v_cache,
                        k_cross, v_cross, *, n_heads: int, rope: bool,
                        k_top: int = 2, resident: bool = True,
                        interpret: bool = False):
    """Run one fused SEGMENT (a stack of same-kind decoder layers) for one
    decode step.

    Args:
      x: (1, D) activation entering the segment.
      pos: scalar int32 current position.
      seg: packed stacked weights (one pack_decoder_segments element).
      k_cache/v_cache: (n, S, D) stacked self caches, functionally updated
        (aliased in-place).
      k_cross/v_cross: (n, Sm, D) stacked primed memory K/V.
    Returns:
      (y, new_k_cache, new_v_cache): y (1, D) after the whole segment.
    """
    D = x.shape[-1]
    hd = D // n_heads
    n, S = k_cache.shape[0], k_cache.shape[1]
    Sm = k_cross.shape[1]
    cos, sin = rope_tables_interleaved(S, hd, n_heads)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    deep = seg["kind"] == "moe"

    def full(a):
        return pl.BlockSpec(a.shape, lambda j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def blocked(a):  # one layer's slice per grid cell
        return pl.BlockSpec((1,) + a.shape[1:], lambda j: (j,) + (0,) * (
            a.ndim - 1), memory_space=pltpu.VMEM)

    # weights: resident = whole stacks VMEM-resident, fetched once in the
    # call prologue, cells index [j] — avoids per-cell DMA waits (the
    # sequential grid cannot overlap a cell's block fetch with the
    # previous cell's compute; measured 12-20 us/layer blocked vs 7-9
    # us/layer for the per-layer kernels). Caches stay blocked: they are
    # written back per cell.
    wspec = full if resident else blocked

    common = [seg["wqkv"], seg["bqkv"], seg["wo"], seg["bo"],
              seg["cwq"], seg["cbq"], seg["cwo"], seg["cbo"],
              seg["norm_scale"], seg["norm_bias"]]
    if deep:
        ffn = [seg["gate_w"], seg["gate_b"],
               seg["sw1g"], seg["sb1g"], seg["sw2"], seg["sb2"],
               seg["ew1g"], seg["ew2"], seg["eb1g"], seg["eb2"]]
        ffn_specs = ([wspec(a) for a in ffn[:6]]
                     + [pl.BlockSpec(memory_space=pl.ANY)] * 2
                     + [wspec(a) for a in ffn[8:]])
        F = seg["ew2"].shape[1]
        scratch = [pltpu.VMEM((1, D), x.dtype)]
        for _ in range(k_top):
            scratch.append(pltpu.VMEM((D, 2 * F), seg["ew1g"].dtype))
            scratch.append(pltpu.VMEM((F, D), seg["ew2"].dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2 * k_top,)))
        kernel = functools.partial(
            _deep_stack_kernel, n_heads=n_heads, rope=rope, k_top=k_top,
            n_layers=n, n_experts=seg["eb1g"].shape[1], resident=resident)
    else:
        ffn = [seg["fw1g"], seg["fb1g"], seg["fw2"], seg["fb2"]]
        ffn_specs = [wspec(a) for a in ffn]
        scratch = [pltpu.VMEM((1, D), x.dtype)]
        kernel = functools.partial(_shallow_stack_kernel, n_heads=n_heads,
                                   rope=rope, n_layers=n,
                                   resident=resident)

    cos_a, sin_a = jnp.asarray(cos), jnp.asarray(sin)
    args = ([pos_arr, x, cos_a, sin_a] + common + ffn
            + [k_cross, v_cross, k_cache, v_cache])
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM), full(x),
         full(cos_a), full(sin_a)]
        + [wspec(a) for a in common]
        + ffn_specs
        + [wspec(k_cross), wspec(v_cross),
           wspec(k_cache), wspec(v_cache)])
    n_in = len(args)

    new_k, new_v, y = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=(jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        in_specs=in_specs,
        out_specs=(wspec(k_cache), wspec(v_cache), full(x)),
        scratch_shapes=scratch,
        input_output_aliases={n_in - 2: 0, n_in - 1: 1},
        # the activation carries across cells in x_scr: strictly
        # sequential. 32 MB is the smallest bucket that fits; a 100 MB
        # declaration measured 2-3x slowdowns loop-wide (see BACKLOG)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return y, new_k, new_v
