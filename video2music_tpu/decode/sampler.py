"""KV-cached, constraint-aware autoregressive chord sampler.

The reference generates by re-running the FULL prefix forward for every
token with no KV cache, then doing per-token host work: softmax slicing,
python constraint checks, a JSON dict lookup to map the sampled chord id to
root/attr ids, and ``.item()`` syncs (reference:
model/video_music_transformer.py:1046-1131). That is ~300 O(L^2) forwards
and ~300 host round-trips per clip.

Here the whole decode is ONE jitted function: encoder runs once, decoder
cross-attention K/V are primed once, and a ``lax.scan`` over positions runs
single-query decode steps against growing KV caches. All constraint logic
and the chord->(root, attr) mapping live in-graph as int32 tables
(core/vocab.py).

Reproduced sampling semantics (replicating behavior, not intent — see
SURVEY.md §7 "hard parts" #3):
  * probs = softmax(logits / temperature) truncated to [:CHORD_END] and
    sampled UNNORMALIZED (equivalent to renormalizing over ids 0..156);
    CHORD_END itself can therefore never be emitted on this path, matching
    the reference where the END-break is unreachable (:1070-1073,1126).
  * if max_conseq_N == 0 the "N" chord (id 0) is banned (:1089-1090);
  * if the last ``max_conseq_chord`` emitted tokens are identical, that
    chord is banned for the next step (:1091-1102);
  * primer tokens are consumed as-is (:1059-1066).
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.vocab import chord_to_root_attr_tables


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    target_seq_length: int = 300
    temperature: float = 1.0
    max_conseq_N: int = 0
    max_conseq_chord: int = 2
    # Self-attention cache read window segmentation: split the decode scan
    # into this many position ranges, each compiled against a statically
    # sliced cache PREFIX, so early steps read (and the fused kernels DMA)
    # only the rows that can be live instead of the full max_seq_chord
    # buffer every step (~1.6x less self-cache read traffic at 4 segments).
    # 0 = auto (segment batched decodes, which are HBM-bound on cache
    # reads; keep B=1 single-segment — it is kernel-latency bound and
    # extra program variants only cost compile time). Bit-exact with the
    # unsegmented scan: masked rows contribute exact zeros to the softmax.
    cache_segments: int = 0


# Fused/flax self-attention cache leaves are sliced by their dict key:
# "k0"/"v3" (per-layer), "sk0"/"sv1" (stacked segments), bare "k"/"v"
# (monolith), "ksc0"/"vsc2" (int8-KV per-row scale columns, kv_quant).
# Cross caches ("ck0"/"cksc0", flax "cross_attn/…") must keep their full
# memory length and never match.
_SELF_CACHE_KEY = re.compile(r"s?[kv](sc)?\d*")


def _path_keys(path) -> list:
    keys = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "name", None)
        if isinstance(k, str):
            keys.append(k)
    return keys


def _is_self_cache(path) -> bool:
    keys = _path_keys(path)
    if "cross_attn" in keys:
        return False
    if "self_attn" in keys:
        return True
    return bool(keys) and _SELF_CACHE_KEY.fullmatch(keys[-1]) is not None


def _slice_self_caches(cache, window: int):
    """Slice every self-attention cache leaf to its first ``window`` rows
    along the sequence axis (uniformly ndim-2 across the fused (S, D) /
    batched (B, S, D) / flax (B, H, S, hd) layouts)."""
    def f(path, leaf):
        if not _is_self_cache(path) or leaf.shape[leaf.ndim - 2] <= window:
            return leaf
        return jax.lax.slice_in_dim(leaf, 0, window, axis=leaf.ndim - 2)
    return jax.tree_util.tree_map_with_path(f, cache)


def _merge_self_caches(full, part):
    """Write each sliced self-cache prefix back over the full buffer."""
    def f(path, a, b):
        if a.shape == b.shape:
            return b
        return jax.lax.dynamic_update_slice_in_dim(a, b, 0, axis=a.ndim - 2)
    return jax.tree_util.tree_map_with_path(f, full, part)


def plan_cache_segments(T: int, S: int, n_seg: int):
    """Contiguous decode position ranges [lo, hi) covering 1..T-2 plus the
    self-cache window for each: the smallest multiple of 16 rows (TPU
    sublane-tile friendly for bf16 caches) covering the range's last
    write at row hi-1, capped at the full buffer S."""
    n_steps = T - 2
    n_seg = max(1, min(n_seg, n_steps))
    bounds = []
    lo = 1
    for s in range(1, n_seg + 1):
        hi = 1 + (n_steps * s) // n_seg
        if hi <= lo:
            continue
        window = min(S, -(-hi // 16) * 16)
        bounds.append((lo, hi, window))
        lo = hi
    return bounds


def _sample_next(rng, logits, gen_seq, pos, gcfg: GenerateConfig,
                 temperature):
    """Sample the token for position pos+1 given logits at pos.

    ``temperature`` is a TRACED (B, 1) f32 array, not a compile-time
    constant: it only divides logits, so baking it into the program (as a
    ``GenerateConfig`` field keying the jit cache) would force a full XLA
    recompile per distinct user-supplied float — a compile-churn DoS
    vector at the serving boundary. Per-element values also let the
    dynamic batcher coalesce requests with different temperatures into
    one program."""
    probs = jax.nn.softmax(
        logits.astype(jnp.float32) / temperature, axis=-1)
    probs = probs[..., :C.CHORD_END]  # (B, 157)
    if gcfg.max_conseq_N == 0:
        probs = probs.at[..., 0].set(0.0)
    # repetition ban: if the last max_conseq_chord tokens equal, zero them
    m = gcfg.max_conseq_chord
    pre = gen_seq[:, pos]
    same = pos + 1 >= m  # enough history?
    for k in range(1, m):
        same = jnp.logical_and(same, gen_seq[:, pos - k] == pre)
    same = jnp.logical_and(same, pos + 1 >= m)
    ban = jax.nn.one_hot(pre, C.CHORD_END, dtype=jnp.float32)
    probs = jnp.where(same[..., None], probs * (1.0 - ban), probs)
    return jax.random.categorical(rng, jnp.log(probs), axis=-1)


def generate_chords(model, variables, *, semantic, key, scene_offset, motion,
                    emotion, primer, primer_root, primer_attr, num_primer,
                    rng, gcfg: GenerateConfig = GenerateConfig(),
                    temperature=None, fused: str = "auto",
                    interpret: bool = False, quantize: str = None,
                    kv_quant: str = None, wide: bool = None):
    """Generate a (B, target_seq_length) chord-id sequence.

    Args:
      model: a VideoMusicTransformer (any version).
      variables: its trained variables ({"params": ...}).
      semantic/scene_offset/motion/emotion: (B, Lv, ...) video features.
      key: (B,) or (B, 1) float key conditioning.
      primer*: (B, P) primer token ids (P <= target length); positions
        beyond ``num_primer`` are ignored.
      num_primer: number of primer tokens (>= 1) — an int/scalar array for
        a uniform batch, or a (B,)/(B, 1) array for per-element primer
        lengths (batched serving: clips with different primers share one
        compiled decode program).
      rng: jax PRNG key.
      temperature: sampling temperature as a TRACED value — a python
        float / scalar array (uniform batch) or a (B,)/(B, 1) array
        (per-element, for batched serving). ``None`` falls back to
        ``gcfg.temperature``; prefer passing it here so the compiled
        program is temperature-agnostic (no recompile per value).
      fused: "auto" (fused Pallas decode kernels on TPU when the config
        is eligible — V2-family wirings use at B=1 the ends-folded
        per-layer kernels and at B>1 the batched kernels; every other
        covered wiring — base-AMT RPR, V1 learned-PE/Word2Vec/MLP-MoE,
        V3 differential/RMSNorm/pre-norm — uses the per-layer variant
        kernels (ops/pallas_decode_variant) at B=1 and the batched
        variant kernels (ops/pallas_decode_batch_variant) at B>1), "off",
        or an explicit backend (forces even off-TPU, pair with
        interpret=True on CPU): "on"/"layer" (one kernel per decoder
        layer, embed/head in XLA — the exact-parity oracle; int8 runs
        here), "ends" (per-layer kernels with the chord-embed prologue
        folded into the first kernel and final-norm+head into the last
        — the fastest measured B=1 backend), "stack" (one kernel per
        homogeneous layer segment) or "monolith" (whole step in one
        kernel) — both bit-exact but measured ~2x slower (merged
        kernels lose kernel-boundary DMA/compute pipelining; kept as
        measured negative results, see BACKLOG).
      interpret: run the fused kernels in Pallas interpreter mode (tests).
      quantize: None (compute dtype) or "int8" — weight-only int8 decode
        across ALL fused wiring families at B=1 (V2 via
        pallas_decode.pack_decoder_layers, base-AMT/V1/V3 via
        pallas_decode_variant.pack_variant_layers): the fused kernels
        read int8 weights, halving the resident decoder weights (a
        serving-MEMORY feature — the B=1 step is kernel-latency bound,
        so step time is unchanged; see BACKLOG). On the unfused path
        (B>1, or off-TPU) the same quantization is applied as fake-quant
        params so numerics track the fused path. Encoder, priming,
        embeddings and heads stay full precision.
      kv_quant: None or "int8" — int8 KV CACHES on the batched (B>1)
        fused path: self and cross K/V slabs are stored int8 with
        per-row f32 scales folded inside the kernels
        (ops/pallas_decode_batch.quantize_kv_rows), halving KV-cache HBM
        CAPACITY (the per-batch-element resident cache) for
        memory-bound serving. NOT a speed feature: measured ~5% slower
        than bf16 caches at B=32 (7.76 vs 7.39 ms/clip full-size) — with
        4-way cache segmentation the batched step is bound by per-ROW
        kernel compute, which int8 doesn't cut and the in-kernel
        scale folds slightly add to (BACKLOG "int8 KV caches").
        Quantized numerics (~1e-2 relative logits error, tested);
        bit-exact across cache_segments settings. Ignored where no
        batched fused kernel runs (B=1 — kernel-latency bound — or XLA
        fallbacks). Mutually exclusive with ``quantize``.
      wide: batched fused kernels only — attention form override
        (ops/pallas_decode_batch: True = block-diagonal _wide_attention,
        False = one-hot broadcast _segmented_attention; None = the
        module default WIDE_DEFAULT). Same semantics either way.
    Returns:
      dict with gen_seq / gen_seq_root / gen_seq_attr, each
      (B, target_seq_length) int32.
    """
    if kv_quant not in (None, "int8"):
        raise ValueError(f"kv_quant must be None or 'int8', got {kv_quant!r}")
    if kv_quant is not None and quantize is not None:
        raise ValueError(
            "kv_quant and quantize are mutually exclusive (int8 weights "
            "are a B=1 feature, int8 KV caches a B>1 feature — see the "
            "docstring)")
    if getattr(model.cfg, "separated", False):
        raise NotImplementedError(
            "generate_chords needs the 159-way chord head; separated "
            "(root/attr) models have no generate path in the reference "
            "either (its generate slices the chord softmax, "
            "video_music_transformer.py:1070-1073)")
    root_tab, attr_tab = chord_to_root_attr_tables()
    root_tab = jnp.asarray(root_tab)
    attr_tab = jnp.asarray(attr_tab)
    T = gcfg.target_seq_length
    B = semantic.shape[0]
    # normalize to (B, 1) so scalar and per-element primer lengths share
    # one code path (broadcasts over positions)
    num_primer = jnp.broadcast_to(
        jnp.asarray(num_primer, jnp.int32).reshape(-1, 1), (B, 1))
    if temperature is None:
        temperature = gcfg.temperature
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1, 1), (B, 1))

    gen_seq = jnp.full((B, T), C.CHORD_PAD, jnp.int32)
    gen_root = jnp.full((B, T), C.CHORD_ROOT_PAD, jnp.int32)
    gen_attr = jnp.full((B, T), C.CHORD_ATTR_PAD, jnp.int32)
    P = primer.shape[1]
    in_primer = jnp.arange(T)[None, :] < num_primer  # (B, T)
    gen_seq = gen_seq.at[:, :P].set(
        jnp.where(in_primer[:, :P], primer.astype(jnp.int32), C.CHORD_PAD))
    gen_root = gen_root.at[:, :P].set(
        jnp.where(in_primer[:, :P], primer_root.astype(jnp.int32),
                  C.CHORD_ROOT_PAD))
    gen_attr = gen_attr.at[:, :P].set(
        jnp.where(in_primer[:, :P], primer_attr.astype(jnp.int32),
                  C.CHORD_ATTR_PAD))

    # 1) encoder runs once (MoE layers write load metrics -> mutable)
    memory, _ = model.apply(variables, semantic, scene_offset, motion,
                            emotion, method=model.encode,
                            mutable=["metrics", "moe_state"])
    # 2) prime cross-attention K/V caches once
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])
    cache = primed["cache"]

    # 3) step backend: fused Pallas decode-layer kernels collapse one
    #    decoder layer step into a single kernel launch (ops/pallas_decode)
    #    — the XLA step path stays the oracle and the fallback.
    from ..ops.attention import _use_pallas
    from ..ops.pallas_decode import (fused_decode_eligible,
                                     fused_decode_mosaic_ok)
    from ..ops.pallas_decode_variant import (fused_variant_eligible,
                                             fused_variant_mosaic_ok)

    from ..ops.pallas_decode_batch import FUSED_BATCH_MAX_B

    n_seg = gcfg.cache_segments or (4 if B > 1 else 1)
    # two fused families: the V2 wiring has the full backend zoo (ends/
    # stack/monolith/batched/int8); every other covered wiring (base-AMT
    # RPR, V1 learned-PE/MoE variants, V3 differential/RMSNorm/pre-norm)
    # decodes through the per-layer variant kernels at B=1
    # (ops/pallas_decode_variant)
    use_v2 = fused_decode_eligible(model.cfg)
    use_variant = not use_v2 and fused_variant_eligible(model.cfg)
    use_fused = (fused != "off" and (use_v2 or use_variant)
                 and (fused != "auto" or _use_pallas()))
    if use_fused and use_variant:
        if fused in ("ends", "stack", "monolith"):
            raise ValueError(
                f"fused={fused!r} requires the V2-family decoder wiring "
                "(ops/pallas_decode.fused_decode_eligible); this config "
                "routes through the per-layer variant kernels — use "
                "fused='on' or 'auto'")
        if B > 1 and kv_quant is not None:
            # int8 KV caches are a V2-family batched feature; the variant
            # batched kernels read compute-dtype cache slabs. Warn and run
            # fused with full-precision caches (int8-KV is a CAPACITY
            # feature that measured ~5% slower anyway — see BACKLOG).
            import warnings
            warnings.warn(
                "kv_quant='int8' covers the V2-family batched kernels "
                "(ops/pallas_decode_batch); this variant config decodes "
                "fused with full-precision KV caches", stacklevel=2)
    mosaic_ok = (fused_variant_mosaic_ok if use_variant
                 else fused_decode_mosaic_ok)
    if use_fused and B > 1 and quantize is not None:
        # int8 is a B=1 latency/memory feature; the batched kernels read
        # compute-dtype weights (once per step, amortized over B)
        if fused != "auto":
            import warnings
            warnings.warn(
                f"fused={fused!r} with quantize='int8' at B={B}: int8 "
                "weights are a B=1 fused feature; decoding on the XLA "
                "step path with fake-quantized params", stacklevel=2)
        use_fused = False
    if use_fused and fused == "auto" and B > FUSED_BATCH_MAX_B and n_seg <= 1:
        # UNSEGMENTED large batches are HBM-bound on full-cache reads,
        # where the XLA step path wins (measured crossover at B=32 — see
        # pallas_decode_batch). Cache segmentation trims exactly those
        # reads and flips the crossover back, so segmented auto-routing
        # stays fused at every batch size. Measured ms/clip, full 2.2
        # bf16, v5e, fused+seg4 vs fused-seg1 vs XLA-seg1:
        #   B=4  12.31 / 15.01 / 31.6    B=16 8.68 / 11.81 / 14.97
        #   B=32  7.37 / 10.35 / 10.18   B=64 6.53 / (n/a) /  8.03
        use_fused = False
    if use_fused and not interpret and not mosaic_ok(model.cfg):
        # undersized dims fail Mosaic's lane-tiling constraints on real
        # TPUs (tests run tiny dims in interpreter mode, which has no such
        # limit) — fall back to the XLA step path instead of crashing in
        # the kernel compiler
        if fused != "auto":
            import warnings
            warnings.warn(
                "fused='on' requested but d_model/d_ff do not satisfy the "
                "fused kernels' TPU lane-tiling constraints "
                "(ops/pallas_decode.fused_decode_mosaic_ok); using the XLA "
                "decode path", stacklevel=2)
        use_fused = False
    if use_fused and use_variant and B == 1:
        from .fused import init_fused_variant_caches, make_fused_variant_step
        step_logits = make_fused_variant_step(variables["params"],
                                              model.cfg, interpret=interpret,
                                              quantize=quantize)
        cache = init_fused_variant_caches(variables["params"], model.cfg,
                                          cache)
    elif use_fused and use_variant:
        # B>1 variant wirings: B-blocked wide-attention kernels + the
        # weight-stationary variant MoE kernel
        # (ops/pallas_decode_batch_variant) — same step contract as the
        # V2 batched path; glue (embed/positional/head) stays in XLA.
        from .fused import (init_fused_batch_variant_caches,
                            make_fused_batch_variant_step)
        step_logits = make_fused_batch_variant_step(
            variables["params"], model.cfg, interpret=interpret)
        cache = init_fused_batch_variant_caches(variables["params"],
                                                model.cfg, B, cache)
    elif use_fused and B == 1:
        # B=1 backends, fastest first (measured, full 2.2 bf16, v5e):
        #   "ends"  17.7 ms/clip — per-layer kernels with the embed and
        #           final-norm+head glue folded into the first/last
        #           kernel (the "auto" default; not int8-wired)
        #   "layer" 19.2 ms/clip — one kernel per layer ("on" keeps this
        #           for exact-token test parity; int8 runs here)
        #   "stack" 36 ms, "monolith" 39 ms — one kernel per segment /
        #           per step; bit-exact but SLOWER (a merged kernel's
        #           prologue DMA cannot overlap compute the way
        #           kernel-boundary pipelining does; see BACKLOG). Kept
        #           opt-in as measured negative results.
        use_stack = quantize is None and fused == "stack"
        use_monolith = quantize is None and fused == "monolith"
        if quantize is None and fused in ("auto", "ends"):
            from .fused import init_fused_caches, make_fused_ends_step
            step_logits = make_fused_ends_step(
                variables["params"], model.cfg, interpret=interpret)
            cache = init_fused_caches(variables["params"], model.cfg,
                                      cache)
        elif use_monolith:
            from .fused import (init_fused_monolith_caches,
                                make_fused_monolith_step)
            step_logits = make_fused_monolith_step(
                variables["params"], model.cfg, interpret=interpret)
            cache = init_fused_monolith_caches(variables["params"],
                                               model.cfg, cache)
        elif use_stack:
            from .fused import (init_fused_stack_caches,
                                make_fused_stack_step)
            step_logits = make_fused_stack_step(
                variables["params"], model.cfg, interpret=interpret)
            cache = init_fused_stack_caches(variables["params"], model.cfg,
                                            cache)
        else:
            from .fused import init_fused_caches, make_fused_step
            step_logits = make_fused_step(variables["params"], model.cfg,
                                          interpret=interpret,
                                          quantize=quantize)
            cache = init_fused_caches(variables["params"], model.cfg, cache)
    elif use_fused:
        # B>1: B-blocked attention kernels + weight-stationary MoE kernel
        # (ops/pallas_decode_batch) — same step_logits signature, caches
        # carry a batch dimension. "auto"/"ends" folds the embed/gate/head
        # glue into the kernels (the batched analogue of the B=1 ends
        # backend); "on" keeps the glue in XLA for exact-parity tests.
        from .fused import init_fused_batch_caches, make_fused_batch_step
        step_logits = make_fused_batch_step(variables["params"], model.cfg,
                                            interpret=interpret,
                                            ends=fused in ("auto", "ends"),
                                            kv_quant=kv_quant, wide=wide)
        cache = init_fused_batch_caches(variables["params"], model.cfg, B,
                                        cache, kv_quant=kv_quant)
    else:
        if quantize == "int8":
            if not (fused_decode_eligible(model.cfg)
                    or fused_variant_eligible(model.cfg)):
                raise ValueError(
                    "quantize='int8' covers the fused-decode-eligible "
                    "configs (V2-family or variant decoder wirings); got "
                    "an ineligible config")
            from ..ops.pallas_decode import fake_quantize_decoder_params
            variables = {**variables,
                         "params": fake_quantize_decoder_params(
                             variables["params"], model.cfg)}

        def step_logits(cache, token, token_root, token_attr, key_, pos):
            logits, mutated = model.apply(
                {**variables, "cache": cache},
                token, token_root, token_attr, key_, pos,
                method=model.decode_step,
                mutable=["cache", "metrics", "moe_state"])
            return logits, mutated["cache"]

    def step_fn(carry, pos):
        cache, gen_seq, gen_root, gen_attr, rng = carry
        token = jax.lax.dynamic_slice_in_dim(gen_seq, pos, 1, axis=1)
        token_root = jax.lax.dynamic_slice_in_dim(gen_root, pos, 1, axis=1)
        token_attr = jax.lax.dynamic_slice_in_dim(gen_attr, pos, 1, axis=1)
        logits, cache = step_logits(cache, token, token_root, token_attr,
                                    key, pos)
        rng, sub = jax.random.split(rng)
        nxt = _sample_next(sub, logits, gen_seq, pos, gcfg,
                           temperature).astype(jnp.int32)
        # keep primer tokens where pos+1 is still inside the primer
        keep = pos + 1 < num_primer[:, 0]  # (B,)
        cur = jax.lax.dynamic_slice_in_dim(gen_seq, pos + 1, 1, axis=1)[:, 0]
        cur_r = jax.lax.dynamic_slice_in_dim(gen_root, pos + 1, 1, axis=1)[:, 0]
        cur_a = jax.lax.dynamic_slice_in_dim(gen_attr, pos + 1, 1, axis=1)[:, 0]
        new = jnp.where(keep, cur, nxt)
        new_r = jnp.where(keep, cur_r, root_tab[nxt])
        new_a = jnp.where(keep, cur_a, attr_tab[nxt])
        gen_seq = jax.lax.dynamic_update_slice(gen_seq, new[:, None],
                                               (0, pos + 1))
        gen_root = jax.lax.dynamic_update_slice(gen_root, new_r[:, None],
                                                (0, pos + 1))
        gen_attr = jax.lax.dynamic_update_slice(gen_attr, new_a[:, None],
                                                (0, pos + 1))
        return (cache, gen_seq, gen_root, gen_attr, rng), None

    # 3) first decode step outside the scan builds the self-attn cache
    #    structure; the scan then carries a fixed-structure pytree.
    carry = (cache, gen_seq, gen_root, gen_attr, rng)
    carry, _ = step_fn(carry, jnp.asarray(0, jnp.int32))
    segments = plan_cache_segments(T, model.cfg.max_seq_chord, n_seg)
    if len(segments) <= 1:
        carry, _ = jax.lax.scan(step_fn, carry,
                                jnp.arange(1, T - 1, dtype=jnp.int32))
    else:
        # segmented scan: each range runs against a statically sliced
        # self-cache prefix (early steps stop paying full-buffer reads);
        # prefixes merge back into the full buffers at range boundaries.
        # Bit-exact with the single scan — see GenerateConfig.
        for lo, hi, window in segments:
            full_cache = carry[0]
            carry = (_slice_self_caches(full_cache, window),) + carry[1:]
            carry, _ = jax.lax.scan(step_fn, carry,
                                    jnp.arange(lo, hi, dtype=jnp.int32))
            carry = (_merge_self_caches(full_cache, carry[0]),) + carry[1:]
    _, gen_seq, gen_root, gen_attr, _ = carry
    return {"gen_seq": gen_seq, "gen_seq_root": gen_root,
            "gen_seq_attr": gen_attr}
