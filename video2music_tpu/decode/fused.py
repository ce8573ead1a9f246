"""Fused-kernel decode step: param-tree glue around ops/pallas_decode.

Builds a ``step_logits(caches, token, token_root, token_attr, key, pos)``
closure for eligible configs (see ops/pallas_decode.fused_decode_eligible)
that reproduces ``VideoMusicTransformer.decode_step`` (models/amt.py)
exactly: chord embedding + key concat + Linear_chord, the decoder stack as
one fused Pallas kernel per layer, final LayerNorm, and the 159-way head.
The sampler (decode/sampler.py) drives it inside the same ``lax.scan`` it
uses for the unfused path; tests assert logits parity between the two.

``make_fused_batch_step`` is the B>1 analogue over
``ops/pallas_decode_batch`` (two kernels per deep layer: B-blocked
attention + weight-stationary MoE); caches carry a batch dimension and
the new K/V rows are appended here with one dynamic_update_slice per
cache.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.pallas_decode import (decode_layer_step, fused_decode_eligible,
                                 pack_decoder_layers)
from ..ops.pallas_decode_batch import batched_layer_step, batched_moe_ffn

LN_EPS = 1e-5


def _layer_norm(x, p):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_fused_caches(params: Dict[str, Any], cfg,
                      cross_cache: Dict[str, Any]) -> Dict[str, Any]:
    """Self-attention caches (zeros) + primed cross K/V extracted from the
    flax "cache" collection written by model.prime."""
    D = cfg.d_model
    S = cfg.max_seq_chord
    dtype = params["Wout"]["kernel"].dtype
    to_lanes = lambda a: a[0].transpose(1, 0, 2).reshape(a.shape[2], D)
    caches = {}
    for i in range(len(cfg.decoder_layers)):
        caches[f"k{i}"] = jnp.zeros((S, D), dtype)
        caches[f"v{i}"] = jnp.zeros((S, D), dtype)
        cc = cross_cache[f"dec_{i}"]["cross_attn"]
        # (1, H, Sm, hd) -> (Sm, H*hd): heads concatenated along lanes
        caches[f"ck{i}"] = to_lanes(cc["k"])
        caches[f"cv{i}"] = to_lanes(cc["v"])
    return caches


def make_fused_step(params: Dict[str, Any], cfg, *, interpret: bool = False,
                    quantize: str = None):
    """Returns step_logits(caches, token, token_root, token_attr, key, pos)
    -> (logits (1, CHORD_SIZE), new_caches). quantize="int8" runs the
    decoder-layer matmuls from int8 weights (ops/pallas_decode docstring)."""
    assert fused_decode_eligible(cfg)
    packed = pack_decoder_layers(params, cfg, quantize=quantize)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token

    emb_root = params["embedding_root"]["embedding"]
    emb_attr = params["embedding_attr"]["embedding"]
    lc_w = params["Linear_chord"]["kernel"]
    lc_b = params["Linear_chord"]["bias"]
    wout = params["Wout"]["kernel"]
    bout = params["Wout"]["bias"]
    dnorm = params["decoder_norm"]

    def step_logits(caches, token, token_root, token_attr, key, pos):
        # chord embed + key concat + Linear_chord (models/amt.py
        # _embed_chords; reference video_music_transformer.py:984-1001)
        emb = emb_root[token_root] + emb_attr[token_attr]  # (1, 1, D)
        k = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
        x = jnp.concatenate(
            [emb, jnp.broadcast_to(k, (*emb.shape[:2], 1))], axis=-1)
        x = (jnp.dot(x, lc_w) + lc_b)[:, 0]  # (1, D)

        new = dict(caches)
        for i, layer in enumerate(packed):
            x, kc, vc = decode_layer_step(
                x, pos, layer, caches[f"k{i}"], caches[f"v{i}"],
                caches[f"ck{i}"], caches[f"cv{i}"],
                n_heads=H, rope=rope, k_top=k_top, interpret=interpret)
            new[f"k{i}"] = kc
            new[f"v{i}"] = vc
        x = _layer_norm(x, dnorm)
        logits = jnp.dot(x, wout) + bout  # (1, CHORD_SIZE)
        return logits, new

    return step_logits


def init_fused_stack_caches(params: Dict[str, Any], cfg,
                            cross_cache: Dict[str, Any]) -> Dict[str, Any]:
    """Segment-stacked analogue of :func:`init_fused_caches`: per segment
    one (n, S, D) zero self cache pair + the (n, Sm, D) stacked primed
    cross K/V in the lane-concatenated head layout."""
    from ..ops.pallas_decode_stack import decoder_segments

    D = cfg.d_model
    S = cfg.max_seq_chord
    dtype = params["Wout"]["kernel"].dtype
    to_lanes = lambda a: a[0].transpose(1, 0, 2).reshape(a.shape[2], D)
    caches = {}
    for s, seg in enumerate(decoder_segments(cfg)):
        n = len(seg["layers"])
        caches[f"sk{s}"] = jnp.zeros((n, S, D), dtype)
        caches[f"sv{s}"] = jnp.zeros((n, S, D), dtype)
        cks, cvs = [], []
        for i in seg["layers"]:
            cc = cross_cache[f"dec_{i}"]["cross_attn"]
            cks.append(to_lanes(cc["k"]))
            cvs.append(to_lanes(cc["v"]))
        caches[f"sck{s}"] = jnp.stack(cks)
        caches[f"scv{s}"] = jnp.stack(cvs)
    return caches


def make_fused_stack_step(params: Dict[str, Any], cfg, *,
                          interpret: bool = False):
    """Stacked-segment fused step (ops/pallas_decode_stack): the whole
    decoder runs as one pallas_call per homogeneous layer segment (two for
    the V2 family's 3 SwiGLU + 3 MoE split) instead of one per layer —
    same step_logits signature as :func:`make_fused_step`. int8 stays on
    the per-layer path (sampler routes)."""
    from ..ops.pallas_decode_stack import (decode_segment_step,
                                           pack_decoder_segments)

    assert fused_decode_eligible(cfg)
    segs = pack_decoder_segments(params, cfg)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token

    emb_root = params["embedding_root"]["embedding"]
    emb_attr = params["embedding_attr"]["embedding"]
    lc_w = params["Linear_chord"]["kernel"]
    lc_b = params["Linear_chord"]["bias"]
    wout = params["Wout"]["kernel"]
    bout = params["Wout"]["bias"]
    dnorm = params["decoder_norm"]

    def step_logits(caches, token, token_root, token_attr, key, pos):
        emb = emb_root[token_root] + emb_attr[token_attr]  # (1, 1, D)
        k = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
        x = jnp.concatenate(
            [emb, jnp.broadcast_to(k, (*emb.shape[:2], 1))], axis=-1)
        x = (jnp.dot(x, lc_w) + lc_b)[:, 0]  # (1, D)

        new = dict(caches)
        for s, seg in enumerate(segs):
            x, kc, vc = decode_segment_step(
                x, pos, seg, caches[f"sk{s}"], caches[f"sv{s}"],
                caches[f"sck{s}"], caches[f"scv{s}"],
                n_heads=H, rope=rope, k_top=k_top, interpret=interpret)
            new[f"sk{s}"] = kc
            new[f"sv{s}"] = vc
        x = _layer_norm(x, dnorm)
        logits = jnp.dot(x, wout) + bout  # (1, CHORD_SIZE)
        return logits, new

    return step_logits


def init_fused_monolith_caches(params: Dict[str, Any], cfg,
                               cross_cache: Dict[str, Any]) -> Dict[str, Any]:
    """(L, S, D) zero self caches + (L, Sm, D) stacked primed cross K/V
    for :func:`make_fused_monolith_step` (all layers in one stack)."""
    D = cfg.d_model
    S = cfg.max_seq_chord
    L = len(cfg.decoder_layers)
    dtype = params["Wout"]["kernel"].dtype
    to_lanes = lambda a: a[0].transpose(1, 0, 2).reshape(a.shape[2], D)
    cks, cvs = [], []
    for i in range(L):
        cc = cross_cache[f"dec_{i}"]["cross_attn"]
        cks.append(to_lanes(cc["k"]))
        cvs.append(to_lanes(cc["v"]))
    return {"k": jnp.zeros((L, S, D), dtype),
            "v": jnp.zeros((L, S, D), dtype),
            "ck": jnp.stack(cks), "cv": jnp.stack(cvs)}


def make_fused_monolith_step(params: Dict[str, Any], cfg, *,
                             interpret: bool = False):
    """MONOLITH fused step: the entire decode step — chord embed +
    Linear_chord, every decoder layer (statically unrolled over
    VMEM-resident weight stacks), final LayerNorm and the chord head —
    runs as ONE ungridded pallas_call (ops/pallas_decode_stack
    .decode_monolith_step). Same step_logits signature as
    :func:`make_fused_step`; int8 stays on the per-layer path."""
    from ..ops.pallas_decode_stack import (decode_monolith_step,
                                           pack_monolith)

    assert fused_decode_eligible(cfg)
    packed = pack_monolith(params, cfg)
    kinds = tuple(spec.ffn for spec in cfg.decoder_layers)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token

    def step_logits(caches, token, token_root, token_attr, key, pos):
        logits, kc, vc = decode_monolith_step(
            token_root.reshape(-1)[:1], token_attr.reshape(-1)[:1],
            key.reshape(-1)[:1], pos, packed,
            caches["k"], caches["v"], caches["ck"], caches["cv"],
            kinds=kinds, n_heads=H, rope=rope, k_top=k_top,
            interpret=interpret)
        new = dict(caches)
        new["k"] = kc
        new["v"] = vc
        return logits, new

    return step_logits


def make_fused_ends_step(params: Dict[str, Any], cfg, *,
                         interpret: bool = False,
                         split: bool = True):
    """Per-layer fused step with the XLA glue folded into the END kernels:
    the FIRST layer's kernel absorbs the chord embedding + Linear_chord
    prologue and the LAST layer's kernel absorbs the final LayerNorm +
    chord head (ops/pallas_decode_stack.decode_flat_monolith_step with
    one-layer runs); middle layers stay on decode_layer_step. Keeps the
    per-layer kernel-boundary DMA/compute pipelining that makes the
    6-launch path fast while deleting ~10 small glue ops per step.

    split=False runs the ENTIRE step as one kernel instead — measured 2x
    slower (one un-overlappable prologue DMA burst; see BACKLOG) and kept
    only for measurement."""
    from ..ops.pallas_decode import decode_layer_step, pack_decoder_layers
    from ..ops.pallas_decode_stack import (decode_flat_monolith_step,
                                           pack_monolith)

    assert fused_decode_eligible(cfg)
    layers = pack_decoder_layers(params, cfg, quantize=None)
    head = pack_monolith(params, cfg)  # for the embed/head keys
    kinds = tuple(spec.ffn for spec in cfg.decoder_layers)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token
    L = len(kinds)

    def step_logits(caches, token, token_root, token_attr, key, pos):
        cache_list = [(caches[f"k{i}"], caches[f"v{i}"],
                       caches[f"ck{i}"], caches[f"cv{i}"])
                      for i in range(L)]
        new = dict(caches)
        tr = token_root.reshape(-1)[:1]
        ta = token_attr.reshape(-1)[:1]
        kk = key.reshape(-1)[:1]
        if not split:  # whole-step monolith (measurement only)
            logits, new_kv = decode_flat_monolith_step(
                tr, ta, kk, pos, layers, head, cache_list, kinds=kinds,
                n_heads=H, rope=rope, k_top=k_top, interpret=interpret)
            for i, (kc, vc) in enumerate(new_kv):
                new[f"k{i}"] = kc
                new[f"v{i}"] = vc
            return logits, new

        x, kv0 = decode_flat_monolith_step(
            tr, ta, kk, pos, layers[:1], head, cache_list[:1],
            kinds=kinds[:1], n_heads=H, rope=rope, k_top=k_top,
            embed=True, fold_head=(L == 1), interpret=interpret)
        new["k0"], new["v0"] = kv0[0]
        if L == 1:
            return x, new
        for i in range(1, L - 1):
            x, kc, vc = decode_layer_step(
                x, pos, layers[i], caches[f"k{i}"], caches[f"v{i}"],
                caches[f"ck{i}"], caches[f"cv{i}"],
                n_heads=H, rope=rope, k_top=k_top, interpret=interpret)
            new[f"k{i}"] = kc
            new[f"v{i}"] = vc
        logits, kvL = decode_flat_monolith_step(
            None, None, None, pos, layers[-1:], head, cache_list[-1:],
            kinds=kinds[-1:], n_heads=H, rope=rope, k_top=k_top,
            embed=False, fold_head=True, x=x, interpret=interpret)
        new[f"k{L - 1}"], new[f"v{L - 1}"] = kvL[0]
        return logits, new

    return step_logits


def _final_norm(x, p, kind):
    """decoder_norm: LayerNorm(eps=1e-5) or RMSNorm(eps=1e-6)."""
    if kind == "layernorm":
        return _layer_norm(x, p)
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + 1e-6)
    return (y * p["weight"].astype(jnp.float32)).astype(x.dtype)


def init_fused_variant_caches(params: Dict[str, Any], cfg,
                              cross_cache: Dict[str, Any]) -> Dict[str, Any]:
    """Variant-wiring analogue of :func:`init_fused_caches`: differential
    layers carry 2H key heads, so their K caches (and primed cross K) are
    (S, 2D) in the lane-concatenated layout; V stays (S, D)."""
    D = cfg.d_model
    S = cfg.max_seq_chord
    dtype = params["Wout"]["kernel"].dtype
    # (1, heads, S, hd) -> (S, heads*hd), head count taken from the array
    to_lanes = lambda a: a[0].transpose(1, 0, 2).reshape(
        a.shape[2], a.shape[1] * a.shape[3])
    caches = {}
    for i, spec in enumerate(cfg.decoder_layers):
        kw = 2 * D if spec.attn.kind == "differential" else D
        caches[f"k{i}"] = jnp.zeros((S, kw), dtype)
        caches[f"v{i}"] = jnp.zeros((S, D), dtype)
        cc = cross_cache[f"dec_{i}"]["cross_attn"]
        caches[f"ck{i}"] = to_lanes(cc["k"])
        caches[f"cv{i}"] = to_lanes(cc["v"])
    return caches


def make_fused_variant_step(params: Dict[str, Any], cfg, *,
                            interpret: bool = False, quantize: str = None):
    """Fused per-layer decode step for the non-V2 wirings
    (ops/pallas_decode_variant): base-AMT RPR + ReLU FFN + sinusoidal PE,
    V1 learned-PE/Word2Vec-table/MLP-expert MoE, V3 differential attention
    + RMSNorm (+ pre-norm for 3.2). Same step_logits signature as
    :func:`make_fused_step`; the positional add and chord-table lookup ride
    in the XLA glue (one table row per step — reference
    video_music_transformer.py:984-1001 for the embed path).

    quantize="int8": decoder matmul weights packed int8 + per-column f32
    scales (``pack_variant_layers``) — halves the resident decoder weights
    for serving; embeddings/head/norms stay full precision."""
    from ..ops.pallas_decode_variant import (decode_variant_layer_step,
                                             fused_variant_eligible,
                                             pack_variant_layers)

    assert fused_variant_eligible(cfg)
    packed, metas = pack_variant_layers(params, cfg, quantize=quantize)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token
    norm = cfg.norm
    pre_norm = cfg.pre_norm

    if cfg.chord_embed:
        chord_tab = params["chord_embedding"]["embedding"]
        emb_root = emb_attr = None
    else:
        chord_tab = None
        emb_root = params["embedding_root"]["embedding"]
        emb_attr = params["embedding_attr"]["embedding"]
    lc_w = params["Linear_chord"]["kernel"]
    lc_b = params["Linear_chord"]["bias"]
    wout = params["Wout"]["kernel"]
    bout = params["Wout"]["bias"]
    dnorm = params["decoder_norm"]
    if cfg.pos_encoding == "sinusoidal":
        from ..ops.embeddings import sinusoidal_table
        pos_tab = jnp.asarray(sinusoidal_table(cfg.max_seq_chord,
                                               cfg.d_model))
    elif cfg.pos_encoding == "learned":
        pos_tab = params["pe_chord"]["embedding"]
    else:
        pos_tab = None

    def step_logits(caches, token, token_root, token_attr, key, pos):
        if chord_tab is None:
            emb = emb_root[token_root] + emb_attr[token_attr]  # (1, 1, D)
        else:
            emb = chord_tab[token]  # (1, 1, chord_embed_dim), frozen table
        k = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
        x = jnp.concatenate(
            [emb, jnp.broadcast_to(k, (*emb.shape[:2], 1))], axis=-1)
        x = (jnp.dot(x, lc_w) + lc_b)[:, 0]  # (1, D)
        if pos_tab is not None:
            x = x + pos_tab[pos][None, :].astype(x.dtype)

        new = dict(caches)
        for i, (layer, meta) in enumerate(zip(packed, metas)):
            x, kc, vc = decode_variant_layer_step(
                x, pos, layer, meta, caches[f"k{i}"], caches[f"v{i}"],
                caches[f"ck{i}"], caches[f"cv{i}"],
                n_heads=H, rope=rope, k_top=k_top, norm=norm,
                pre_norm=pre_norm, interpret=interpret)
            new[f"k{i}"] = kc
            new[f"v{i}"] = vc
        x = _final_norm(x, dnorm, norm)
        logits = jnp.dot(x, wout) + bout  # (1, CHORD_SIZE)
        return logits, new

    return step_logits


def topk_combine(logits, k_top: int):
    """Eval-mode top-k combine weights (B, E): softmax over the k selected
    RAW gate logits, zero elsewhere — ops/moe.py gathered-path semantics,
    identical to the B=1 fused kernel's scalar loop but vectorized over
    rows."""
    E = logits.shape[-1]
    remaining = logits
    masks, sel = [], []
    for _ in range(k_top):
        idx = jnp.argmax(remaining, axis=-1)
        onehot = jax.nn.one_hot(idx, E, dtype=logits.dtype)
        masks.append(onehot)
        sel.append(jnp.sum(onehot * logits, axis=-1, keepdims=True))
        remaining = jnp.where(onehot > 0, -jnp.inf, remaining)
    m = sel[0]  # the max of the selected
    exps = [jnp.exp(s - m) for s in sel]
    denom = sum(exps)
    return sum(e / denom * mask for e, mask in zip(exps, masks))


def init_fused_batch_caches(params: Dict[str, Any], cfg, B: int,
                            cross_cache: Dict[str, Any],
                            kv_quant: str = None) -> Dict[str, Any]:
    """Batched analogue of :func:`init_fused_caches`: (B, S, D) zero self
    caches + primed cross K/V in the lane-concatenated head layout.

    kv_quant="int8": every cache is int8 with per-row f32 scale leaves —
    self scales "ksc{i}"/"vsc{i}" (B, S, 1) start at zero (masked rows
    contribute exact zeros either way) and the primed cross K/V are
    quantized here once (``quantize_kv_rows``), scales "cksc{i}"/
    "cvsc{i}". Halves resident KV-cache HBM; a capacity feature, not a
    speed one (see make_fused_batch_step + BACKLOG "int8 KV caches")."""
    from ..ops.pallas_decode_batch import quantize_kv_rows

    D = cfg.d_model
    S = cfg.max_seq_chord
    dtype = params["Wout"]["kernel"].dtype
    quant = kv_quant == "int8"
    if quant:
        dtype = jnp.int8
    # (B, H, Sm, hd) -> (B, Sm, H*hd)
    to_lanes = lambda a: a.transpose(0, 2, 1, 3).reshape(
        a.shape[0], a.shape[2], D)
    caches = {}
    for i in range(len(cfg.decoder_layers)):
        caches[f"k{i}"] = jnp.zeros((B, S, D), dtype)
        caches[f"v{i}"] = jnp.zeros((B, S, D), dtype)
        cc = cross_cache[f"dec_{i}"]["cross_attn"]
        ck, cv = to_lanes(cc["k"]), to_lanes(cc["v"])
        if quant:
            caches[f"ksc{i}"] = jnp.zeros((B, S, 1), jnp.float32)
            caches[f"vsc{i}"] = jnp.zeros((B, S, 1), jnp.float32)
            ck, caches[f"cksc{i}"] = quantize_kv_rows(ck)
            cv, caches[f"cvsc{i}"] = quantize_kv_rows(cv)
        caches[f"ck{i}"] = ck
        caches[f"cv{i}"] = cv
    return caches


def make_fused_batch_step(params: Dict[str, Any], cfg, *,
                          block_b: int = None, interpret: bool = False,
                          ends: bool = False, kv_quant: str = None,
                          wide: bool = None):
    """Batched (B>1) fused step: step_logits(caches, token, token_root,
    token_attr, key, pos) -> (logits (B, CHORD_SIZE), new_caches).

    Each layer runs as the B-blocked attention kernel
    (ops/pallas_decode_batch.batched_layer_step) + for MoE layers the
    weight-stationary expert kernel. int8 WEIGHTS are not wired on this
    path (the batched step reads weights once per step, amortized over B;
    use the B=1 fused path or XLA fake-quant for that). kv_quant="int8"
    quantizes the CACHES instead — self and cross K/V slabs are int8 with
    per-row f32 scales (caches from ``init_fused_batch_caches(...,
    kv_quant="int8")``), halving resident KV-cache HBM. A capacity
    feature, not a speed one: measured ~5% slower than bf16 caches at
    B=32 full size (the segmented step is per-row-compute bound, see
    BACKLOG "int8 KV caches"). Numerics are quantized (~1e-2 relative
    on logits, tested); the f32/bf16-cache path stays the default.

    ``ends=False`` keeps the step's glue in XLA: chord embedding, per-deep-
    layer gate matmul + :func:`topk_combine`, final LayerNorm + chord
    head. ``ends=True`` (the batched "auto" default, mirroring the B=1
    ends backend) folds that glue into the kernels: the embedding +
    Linear_chord prologue rides in the FIRST layer's attention kernel
    (when it is shallow), every MoE layer computes its router + top-k
    combine in-kernel, and the LAST layer's MoE kernel emits the final
    logits — deleting ~35 small XLA ops per decode step."""
    assert fused_decode_eligible(cfg)
    packed = pack_decoder_layers(params, cfg, quantize=None)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token
    L = len(packed)

    emb_root = params["embedding_root"]["embedding"]
    emb_attr = params["embedding_attr"]["embedding"]
    lc_w = params["Linear_chord"]["kernel"]
    lc_b = params["Linear_chord"]["bias"]
    wout = params["Wout"]["kernel"]
    bout = params["Wout"]["bias"]
    dnorm = params["decoder_norm"]

    # ends folding applies where the layer kinds allow it (every fused-
    # eligible V2 config is shallow-first/MoE-last); other shapes keep
    # the XLA glue for that end
    D = cfg.d_model
    embed_first = ends and "gate_w" not in packed[0]
    head_last = ends and "gate_w" in packed[-1]
    embed_pack = {"emb_root": emb_root, "emb_attr": emb_attr,
                  "lc_w": lc_w[:D], "lc_krow": lc_w[D:D + 1],
                  "lc_b": lc_b.reshape(1, -1)}
    head_pack = {"dn_scale": dnorm["scale"].reshape(1, -1),
                 "dn_bias": dnorm["bias"].reshape(1, -1),
                 "wout": wout, "bout": bout.reshape(1, -1)}

    def step_logits(caches, token, token_root, token_attr, key, pos):
        if embed_first:
            x = None  # the first kernel computes it from the tokens
        else:
            emb = emb_root[token_root] + emb_attr[token_attr]  # (B, 1, D)
            k = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
            x = jnp.concatenate(
                [emb, jnp.broadcast_to(k, (*emb.shape[:2], 1))], axis=-1)
            x = (jnp.dot(x, lc_w) + lc_b)[:, 0]  # (B, D)

        new = dict(caches)
        for i, layer in enumerate(packed):
            fold_embed = embed_first and i == 0
            kv_scales = ((caches[f"ksc{i}"], caches[f"vsc{i}"],
                          caches[f"cksc{i}"], caches[f"cvsc{i}"])
                         if kv_quant == "int8" else None)
            outs = batched_layer_step(
                x, pos, layer, caches[f"k{i}"], caches[f"v{i}"],
                caches[f"ck{i}"], caches[f"cv{i}"],
                n_heads=H, rope=rope, block_b=block_b, interpret=interpret,
                tokens=((token_root, token_attr, key) if fold_embed
                        else None),
                embed_pack=embed_pack if fold_embed else None,
                kv_scales=kv_scales, wide=wide)
            y, k_row, v_row = outs[:3]
            if "gate_w" in layer:  # deep: y is post-norm2 x2
                fold_head = head_last and i == L - 1
                if ends:
                    x = batched_moe_ffn(
                        y, None, layer, k_top=k_top, interpret=interpret,
                        gate=True,
                        head_pack=head_pack if fold_head else None)
                else:
                    # same dtypes as the B=1 kernel's gate: compute-dtype
                    # operands, f32 accumulate (a rounding flip here would
                    # change expert SELECTION, not just numerics)
                    gl = jnp.dot(y, layer["gate_w"],
                                 preferred_element_type=jnp.float32)
                    gl = gl + layer["gate_b"].astype(jnp.float32)  # (B, E)
                    cw = topk_combine(gl, k_top)
                    x = batched_moe_ffn(y, cw, layer, k_top=k_top,
                                        interpret=interpret)
            else:
                x = y
            p = jnp.asarray(pos, jnp.int32)
            new[f"k{i}"] = jax.lax.dynamic_update_slice(
                caches[f"k{i}"], k_row[:, None, :].astype(
                    caches[f"k{i}"].dtype), (0, p, 0))
            new[f"v{i}"] = jax.lax.dynamic_update_slice(
                caches[f"v{i}"], v_row[:, None, :].astype(
                    caches[f"v{i}"].dtype), (0, p, 0))
            if kv_scales is not None:
                ks_row, vs_row = outs[3], outs[4]
                new[f"ksc{i}"] = jax.lax.dynamic_update_slice(
                    caches[f"ksc{i}"], ks_row[:, None, :], (0, p, 0))
                new[f"vsc{i}"] = jax.lax.dynamic_update_slice(
                    caches[f"vsc{i}"], vs_row[:, None, :], (0, p, 0))
        if head_last:
            return x, new  # the last MoE kernel already emitted logits
        x = _layer_norm(x, dnorm)
        logits = jnp.dot(x, wout) + bout  # (B, CHORD_SIZE)
        return logits, new

    return step_logits


def init_fused_batch_variant_caches(params: Dict[str, Any], cfg, B: int,
                                    cross_cache: Dict[str, Any]
                                    ) -> Dict[str, Any]:
    """Batched analogue of :func:`init_fused_variant_caches`: (B, S, Dk)
    zero self caches + primed cross K/V in the lane-concatenated head
    layout; differential layers carry 2H key heads (Dk = 2D)."""
    D = cfg.d_model
    S = cfg.max_seq_chord
    dtype = params["Wout"]["kernel"].dtype
    # (B, heads, Sm, hd) -> (B, Sm, heads*hd), head count from the array
    to_lanes = lambda a: a.transpose(0, 2, 1, 3).reshape(
        a.shape[0], a.shape[2], a.shape[1] * a.shape[3])
    caches = {}
    for i, spec in enumerate(cfg.decoder_layers):
        kw = 2 * D if spec.attn.kind == "differential" else D
        caches[f"k{i}"] = jnp.zeros((B, S, kw), dtype)
        caches[f"v{i}"] = jnp.zeros((B, S, D), dtype)
        cc = cross_cache[f"dec_{i}"]["cross_attn"]
        caches[f"ck{i}"] = to_lanes(cc["k"])
        caches[f"cv{i}"] = to_lanes(cc["v"])
    return caches


def make_fused_batch_variant_step(params: Dict[str, Any], cfg, *,
                                  block_b: int = None,
                                  interpret: bool = False):
    """Batched (B>1) fused step for the non-V2 wirings
    (ops/pallas_decode_batch_variant): base-AMT RPR + ReLU FFN, V1
    learned-PE/MLP-expert MoE, V3 differential attention + RMSNorm
    (+ pre-norm 3.2). Same ``step_logits`` contract as
    :func:`make_fused_batch_step`; the embedding/positional/head glue
    stays in XLA (no ends folding — the variant glue differs per family
    and the B=1 measurements put the fold at ~5%; see the kernel module
    docstring). int8 weights and int8 KV caches stay B=1 / V2-family
    features respectively (documented in decode/sampler.py)."""
    from ..ops.pallas_decode_batch_variant import (
        batched_variant_layer_step, batched_variant_moe_ffn,
        fused_batch_variant_eligible)
    from ..ops.pallas_decode_variant import pack_variant_layers

    assert fused_batch_variant_eligible(cfg)
    packed, metas = pack_variant_layers(params, cfg, quantize=None)
    rope = cfg.decoder_layers[0].attn.rope
    H = cfg.num_heads
    k_top = cfg.moe.n_experts_per_token
    norm = cfg.norm
    pre_norm = cfg.pre_norm

    if cfg.chord_embed:
        chord_tab = params["chord_embedding"]["embedding"]
        emb_root = emb_attr = None
    else:
        chord_tab = None
        emb_root = params["embedding_root"]["embedding"]
        emb_attr = params["embedding_attr"]["embedding"]
    lc_w = params["Linear_chord"]["kernel"]
    lc_b = params["Linear_chord"]["bias"]
    wout = params["Wout"]["kernel"]
    bout = params["Wout"]["bias"]
    dnorm = params["decoder_norm"]
    if cfg.pos_encoding == "sinusoidal":
        from ..ops.embeddings import sinusoidal_table
        pos_tab = jnp.asarray(sinusoidal_table(cfg.max_seq_chord,
                                               cfg.d_model))
    elif cfg.pos_encoding == "learned":
        pos_tab = params["pe_chord"]["embedding"]
    else:
        pos_tab = None

    def step_logits(caches, token, token_root, token_attr, key, pos):
        if chord_tab is None:
            emb = emb_root[token_root] + emb_attr[token_attr]  # (B, 1, D)
        else:
            emb = chord_tab[token]  # (B, 1, chord_embed_dim), frozen table
        k = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
        x = jnp.concatenate(
            [emb, jnp.broadcast_to(k, (*emb.shape[:2], 1))], axis=-1)
        x = (jnp.dot(x, lc_w) + lc_b)[:, 0]  # (B, D)
        if pos_tab is not None:
            x = x + pos_tab[pos][None, :].astype(x.dtype)

        new = dict(caches)
        p = jnp.asarray(pos, jnp.int32)
        for i, (layer, meta) in enumerate(zip(packed, metas)):
            y, k_row, v_row = batched_variant_layer_step(
                x, pos, layer, meta, caches[f"k{i}"], caches[f"v{i}"],
                caches[f"ck{i}"], caches[f"cv{i}"],
                n_heads=H, rope=rope, norm=norm, pre_norm=pre_norm,
                block_b=block_b, interpret=interpret)
            if meta.ffn == "moe":  # y is x2 (post-norm2 / residual)
                x = batched_variant_moe_ffn(
                    y, layer, meta, k_top=k_top, norm=norm,
                    pre_norm=pre_norm, interpret=interpret)
            else:
                x = y
            new[f"k{i}"] = jax.lax.dynamic_update_slice(
                caches[f"k{i}"], k_row[:, None, :].astype(
                    caches[f"k{i}"].dtype), (0, p, 0))
            new[f"v{i}"] = jax.lax.dynamic_update_slice(
                caches[f"v{i}"], v_row[:, None, :].astype(
                    caches[f"v{i}"].dtype), (0, p, 0))
        x = _final_norm(x, dnorm, norm)
        logits = jnp.dot(x, wout) + bout  # (B, CHORD_SIZE)
        return logits, new

    return step_logits
