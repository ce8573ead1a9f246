"""Fused decode-layer kernel parity vs the unfused XLA step path (CPU,
Pallas interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.config import amt_config
from video2music_tpu.decode.fused import init_fused_caches, make_fused_step
from video2music_tpu.decode.sampler import GenerateConfig, generate_chords
from video2music_tpu.models import VideoMusicTransformer
from video2music_tpu.ops.pallas_decode import fused_decode_eligible


def _tiny(version="2.2", **kw):
    cfg = amt_config(version, n_layers=4, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=12, max_seq_chord=12,
                     total_vf_dim=7 + 1 + 1 + 2, dropout=0.0, **kw)
    return VideoMusicTransformer(cfg=cfg), cfg


def _feats(rng, B=1, L=12):
    return dict(
        semantic=jnp.asarray(rng.standard_normal((B, L, 7)).astype(np.float32)),
        key=jnp.ones((B, 1), jnp.float32),
        scene_offset=jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.float32)),
        motion=jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        emotion=jnp.asarray(rng.uniform(size=(B, L, 2)).astype(np.float32)),
    )


def _init(model, feats, L=12):
    B = feats["semantic"].shape[0]
    z = jnp.zeros((B, L - 1), jnp.int32)
    return model.init({"params": jax.random.PRNGKey(0)}, z, z, z,
                      feats["semantic"], feats["key"], feats["scene_offset"],
                      feats["motion"], feats["emotion"])


def test_eligibility():
    _, cfg22 = _tiny("2.2")
    assert fused_decode_eligible(cfg22)
    _, cfg21 = _tiny("2.1")
    assert fused_decode_eligible(cfg21)
    _, cfg_base = _tiny(None)      # RPR decoder
    assert not fused_decode_eligible(cfg_base)
    _, cfg3 = _tiny("3.1")         # differential + RMSNorm
    assert not fused_decode_eligible(cfg3)
    _, cfg20 = _tiny("2.0")        # learned PE in the decoder
    assert not fused_decode_eligible(cfg20)


@pytest.mark.parametrize("version", ["2.2", "2.1"])
def test_fused_step_logits_match_unfused(rng, version):
    """Feed the same token stream through the fused kernels (interpret
    mode) and the flax decode_step; logits must agree at every position —
    covers shallow (SwiGLU) and deep (top-2 shared MoE) layers, RoPE,
    cache append, cross-attention, norms, and the head."""
    model, cfg = _tiny(version)
    feats = _feats(rng)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_step(variables["params"], cfg, interpret=True)
    fused_caches = init_fused_caches(variables["params"], cfg,
                                     primed["cache"])

    tokens = rng.integers(0, C.CHORD_END, 8)
    roots = rng.integers(0, 13, 8)
    attrs = rng.integers(0, 14, 8)
    key = feats["key"]

    flax_cache = primed["cache"]
    for pos in range(8):
        t = jnp.asarray([[tokens[pos]]], jnp.int32)
        r = jnp.asarray([[roots[pos]]], jnp.int32)
        a = jnp.asarray([[attrs[pos]]], jnp.int32)
        want, mutated = model.apply(
            {**variables, "cache": flax_cache}, t, r, a, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, fused_caches = step_logits(fused_caches, t, r, a, key,
                                        jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"pos={pos}")


@pytest.mark.parametrize("version", ["2.2", "2.1"])
def test_fused_int8_step_matches_fake_quant_oracle(rng, version):
    """Int8 weight-only decode: the fused kernels reading int8 weights +
    per-column scales must agree with the unfused XLA step run on
    fake-quantized params (dequantize(quantize(W)) substituted) — the
    per-column scale commutes with the matmul, so the two differ only by
    fp reassociation."""
    from video2music_tpu.ops.pallas_decode import fake_quantize_decoder_params

    model, cfg = _tiny(version)
    feats = _feats(rng)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_step(variables["params"], cfg, interpret=True,
                                  quantize="int8")
    fused_caches = init_fused_caches(variables["params"], cfg,
                                     primed["cache"])
    fq = fake_quantize_decoder_params(variables["params"], cfg)
    fq_variables = {**variables, "params": fq}

    tokens = rng.integers(0, C.CHORD_END, 6)
    roots = rng.integers(0, 13, 6)
    attrs = rng.integers(0, 14, 6)
    key = feats["key"]

    flax_cache = primed["cache"]
    fp_logits = []
    for pos in range(6):
        t = jnp.asarray([[tokens[pos]]], jnp.int32)
        r = jnp.asarray([[roots[pos]]], jnp.int32)
        a = jnp.asarray([[attrs[pos]]], jnp.int32)
        want, mutated = model.apply(
            {**fq_variables, "cache": flax_cache}, t, r, a, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, fused_caches = step_logits(fused_caches, t, r, a, key,
                                        jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"pos={pos}")
        fp_logits.append(np.asarray(got))


def test_int8_quantization_error_is_small(rng):
    """Weight-only int8 with per-column scales must stay close to the fp
    weights: round-trip relative error bounded by the 127-level grid."""
    from video2music_tpu.ops.pallas_decode import dequantize, quantize_weight

    w = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8
    back = dequantize(q, s)
    # max error per column is half a quantization step = s/2
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.asarray(s).reshape(1, -1) / 2 + 1e-7
    assert (err <= bound).all()


def test_int8_generate_runs_unfused_fake_quant(rng):
    """quantize='int8' on the unfused path substitutes fake-quant params;
    the generate must run and produce valid tokens (and differ only via
    quantization noise from the fp run, not crash or emit PAD/END)."""
    model, cfg = _tiny("2.2")
    feats = _feats(rng)
    variables = _init(model, feats)
    primer = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
    kw = dict(semantic=feats["semantic"], key=feats["key"],
              scene_offset=feats["scene_offset"], motion=feats["motion"],
              emotion=feats["emotion"], primer=primer, primer_root=primer,
              primer_attr=primer, num_primer=2,
              gcfg=GenerateConfig(target_seq_length=12))
    out = generate_chords(model, variables, rng=jax.random.PRNGKey(7),
                          fused="off", quantize="int8", **kw)
    seq = np.asarray(out["gen_seq"])[0, 2:]
    assert ((seq >= 0) & (seq < C.CHORD_END)).all()
    # fused int8 (interpret) must match the fake-quant unfused sampler
    out_fused = generate_chords(model, variables, rng=jax.random.PRNGKey(7),
                                fused="on", interpret=True,
                                quantize="int8", **kw)
    for k in ("gen_seq", "gen_seq_root", "gen_seq_attr"):
        np.testing.assert_array_equal(np.asarray(out_fused[k]),
                                      np.asarray(out[k]), err_msg=k)


def test_fused_generate_matches_unfused(rng):
    """Whole constrained generate: fused and unfused backends produce the
    same token sequences given the same rng."""
    model, cfg = _tiny("2.2")
    feats = _feats(rng)
    variables = _init(model, feats)
    primer = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
    kw = dict(semantic=feats["semantic"], key=feats["key"],
              scene_offset=feats["scene_offset"], motion=feats["motion"],
              emotion=feats["emotion"], primer=primer, primer_root=primer,
              primer_attr=primer, num_primer=2,
              gcfg=GenerateConfig(target_seq_length=12))
    out_ref = generate_chords(model, variables, rng=jax.random.PRNGKey(7),
                              fused="off", **kw)
    out_fused = generate_chords(model, variables, rng=jax.random.PRNGKey(7),
                                fused="on", interpret=True, **kw)
    for k in ("gen_seq", "gen_seq_root", "gen_seq_attr"):
        np.testing.assert_array_equal(np.asarray(out_fused[k]),
                                      np.asarray(out_ref[k]), err_msg=k)


def test_fused_stack_step_logits_match_unfused(rng):
    """Stacked-segment step (ops/pallas_decode_stack: one kernel per
    homogeneous layer segment, activation carried across grid cells in
    VMEM scratch) vs the flax decode_step — logits at every position.
    Covers the blocked weight streaming, aliased (n, S, D) cache blocks,
    flat-indexed expert DMA, and the cell-boundary dtype rounding."""
    from video2music_tpu.decode.fused import (init_fused_stack_caches,
                                              make_fused_stack_step)

    model, cfg = _tiny("2.2")
    feats = _feats(rng)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_stack_step(variables["params"], cfg,
                                        interpret=True)
    stack_caches = init_fused_stack_caches(variables["params"], cfg,
                                           primed["cache"])

    tokens = rng.integers(0, C.CHORD_END, 8)
    roots = rng.integers(0, 13, 8)
    attrs = rng.integers(0, 14, 8)
    key = feats["key"]

    flax_cache = primed["cache"]
    for pos in range(8):
        t = jnp.asarray([[tokens[pos]]], jnp.int32)
        r = jnp.asarray([[roots[pos]]], jnp.int32)
        a = jnp.asarray([[attrs[pos]]], jnp.int32)
        want, mutated = model.apply(
            {**variables, "cache": flax_cache}, t, r, a, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, stack_caches = step_logits(stack_caches, t, r, a, key,
                                        jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"pos={pos}")


def test_fused_monolith_step_logits_match_unfused(rng):
    """MONOLITH step (ops/pallas_decode_stack.decode_monolith_step: the
    whole decode step — embed, every layer statically unrolled, final LN,
    head — as ONE pallas_call) vs the flax decode_step at every position.
    Covers the in-kernel one-hot embedding gathers, the decomposed
    Linear_chord (x @ W[:D] + key * W[D]), static stack indexing, and the
    folded head."""
    from video2music_tpu.decode.fused import (init_fused_monolith_caches,
                                              make_fused_monolith_step)

    model, cfg = _tiny("2.2")
    feats = _feats(rng)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_monolith_step(variables["params"], cfg,
                                           interpret=True)
    mono_caches = init_fused_monolith_caches(variables["params"], cfg,
                                             primed["cache"])

    tokens = rng.integers(0, C.CHORD_END, 8)
    roots = rng.integers(0, 13, 8)
    attrs = rng.integers(0, 14, 8)
    key = feats["key"]

    flax_cache = primed["cache"]
    for pos in range(8):
        t = jnp.asarray([[tokens[pos]]], jnp.int32)
        r = jnp.asarray([[roots[pos]]], jnp.int32)
        a = jnp.asarray([[attrs[pos]]], jnp.int32)
        want, mutated = model.apply(
            {**variables, "cache": flax_cache}, t, r, a, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, mono_caches = step_logits(mono_caches, t, r, a, key,
                                       jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"pos={pos}")


def test_fused_ends_step_logits_match_unfused(rng):
    """Ends-folded step (the production B=1 'auto' backend: per-layer
    kernels with the chord-embed prologue folded into the FIRST kernel
    and final-norm+head into the LAST) vs the flax decode_step at every
    position. Covers the one-layer flat runs (embed=True / fold_head=True)
    around plain decode_layer_step middles."""
    from video2music_tpu.decode.fused import (init_fused_caches,
                                              make_fused_ends_step)

    model, cfg = _tiny("2.2")
    feats = _feats(rng)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_ends_step(variables["params"], cfg,
                                       interpret=True)
    ends_caches = init_fused_caches(variables["params"], cfg,
                                    primed["cache"])

    tokens = rng.integers(0, C.CHORD_END, 8)
    roots = rng.integers(0, 13, 8)
    attrs = rng.integers(0, 14, 8)
    key = feats["key"]

    flax_cache = primed["cache"]
    for pos in range(8):
        t = jnp.asarray([[tokens[pos]]], jnp.int32)
        r = jnp.asarray([[roots[pos]]], jnp.int32)
        a = jnp.asarray([[attrs[pos]]], jnp.int32)
        want, mutated = model.apply(
            {**variables, "cache": flax_cache}, t, r, a, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, ends_caches = step_logits(ends_caches, t, r, a, key,
                                       jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"pos={pos}")


def test_fused_batch_generate_matches_unfused(rng):
    """Whole constrained generate at B=4 (odd block: also covers the
    block_b=1 fallback at B=3): the batched fused backend must emit the
    same token sequences as the XLA step path given the same rng —
    per-element primer lengths and temperatures included."""
    model, cfg = _tiny("2.2")
    for B in (4, 3):
        feats = _feats(rng, B=B)
        variables = _init(model, feats)
        primer = jnp.zeros((B, 4), jnp.int32).at[:, 0].set(1)
        kw = dict(semantic=feats["semantic"], key=feats["key"],
                  scene_offset=feats["scene_offset"], motion=feats["motion"],
                  emotion=feats["emotion"], primer=primer,
                  primer_root=primer, primer_attr=primer,
                  num_primer=jnp.asarray([1 + i % 3 for i in range(B)]),
                  temperature=jnp.linspace(0.8, 1.2, B),
                  gcfg=GenerateConfig(target_seq_length=12))
        out_ref = generate_chords(model, variables,
                                  rng=jax.random.PRNGKey(7), fused="off",
                                  **kw)
        # "on" = plain batched kernels (XLA glue); "ends" = the batched
        # auto default with embed/gate/head folded into the kernels
        for mode in ("on", "ends"):
            out_fused = generate_chords(model, variables,
                                        rng=jax.random.PRNGKey(7),
                                        fused=mode, interpret=True, **kw)
            for k in ("gen_seq", "gen_seq_root", "gen_seq_attr"):
                np.testing.assert_array_equal(np.asarray(out_fused[k]),
                                              np.asarray(out_ref[k]),
                                              err_msg=f"B={B} {mode} {k}")


@pytest.mark.parametrize("wide", [False, True])
def test_fused_batch_step_logits_match_unfused(rng, wide):
    """BATCHED fused step (ops/pallas_decode_batch: B-blocked attention
    kernel + weight-stationary MoE kernel) vs the flax decode_step at
    B=4: logits must agree at every position for every element — covers
    the sublane-stacked segment attention, the in-register cache splice +
    dynamic_update_slice append, per-row top-k gating, and both layer
    kinds. ``wide`` runs the block-diagonal attention form
    (_wide_attention: NT/TN slab matmuls, separate current-row path, no
    splice) against the same oracle."""
    from video2music_tpu.decode.fused import (init_fused_batch_caches,
                                              make_fused_batch_step)

    model, cfg = _tiny("2.2")
    B = 4
    feats = _feats(rng, B=B)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    # ends=False: XLA glue (embed/gate/head outside the kernels);
    # ends=True: the folded batched "auto" default — in-kernel one-hot
    # embedding gathers, per-row in-kernel router + top-k combine, and
    # the head folded into the last MoE kernel's finalize cell
    for ends in (False, True):
        step_logits = make_fused_batch_step(variables["params"], cfg,
                                            block_b=2, interpret=True,
                                            ends=ends, wide=wide)
        fused_caches = init_fused_batch_caches(variables["params"], cfg, B,
                                               primed["cache"])

        tokens = rng.integers(0, C.CHORD_END, (8, B))
        roots = rng.integers(0, 13, (8, B))
        attrs = rng.integers(0, 14, (8, B))
        key = feats["key"]

        flax_cache = primed["cache"]
        for pos in range(8):
            t = jnp.asarray(tokens[pos][:, None], jnp.int32)
            r = jnp.asarray(roots[pos][:, None], jnp.int32)
            a = jnp.asarray(attrs[pos][:, None], jnp.int32)
            want, mutated = model.apply(
                {**variables, "cache": flax_cache}, t, r, a, key,
                jnp.asarray(pos, jnp.int32), method=model.decode_step,
                mutable=["cache", "metrics", "moe_state"])
            flax_cache = mutated["cache"]
            got, fused_caches = step_logits(fused_caches, t, r, a, key,
                                            jnp.asarray(pos, jnp.int32))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"ends={ends} pos={pos}")


def test_topk_combine_matches_b1_kernel_semantics(rng):
    """topk_combine (vectorized) == the B=1 deep kernel's scalar top-k
    loop: softmax over the k selected RAW logits, zeros elsewhere,
    first-max tie-break."""
    from video2music_tpu.decode.fused import topk_combine

    logits = jnp.asarray(rng.standard_normal((5, 6)).astype(np.float32))
    got = np.asarray(topk_combine(logits, 2))
    for b in range(5):
        row = np.asarray(logits[b])
        order = np.argsort(-row, kind="stable")
        sel = order[:2]
        e = np.exp(row[sel] - row[sel[0]])
        want = np.zeros(6)
        want[sel] = e / e.sum()
        np.testing.assert_allclose(got[b], want, rtol=1e-6)
    # exact ties: the earliest lane wins, like argmax
    tied = jnp.asarray([[1.0, 1.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32)
    got = np.asarray(topk_combine(tied, 2))[0]
    np.testing.assert_allclose(got[:2], [0.5, 0.5])
    assert (got[2:] == 0).all()


def test_segmented_cache_generate_matches_unsegmented(rng):
    """Segmented KV-cache decode (GenerateConfig.cache_segments: the scan
    splits into position ranges each compiled against a statically sliced
    self-cache PREFIX) must emit exactly the unsegmented tokens — masked
    rows past the window contribute exact zeros, so the math is identical.
    Covers windows genuinely < max_seq_chord (S=48 -> 16/32/48) on:
      * the XLA step path at B=2 (flax (B, H, S, hd) caches),
      * the batched fused kernels at B=2 (sliced (B, S, D) cache slabs
        recompile per window),
      * the B=1 fused "ends" backend ((S, D) caches), and
      * the base-AMT RPR path (rpr_bias_decode at short kv_len).
    """
    S = 48
    cases = [
        ("2.2", 2, "off", {}),
        ("2.2", 2, "on", dict(interpret=True)),
        ("2.2", 2, "ends", dict(interpret=True)),
        ("2.2", 1, "ends", dict(interpret=True)),
        (None, 2, "off", {}),
    ]
    for version, B, fused, extra in cases:
        cfg = amt_config(version, n_layers=4, num_heads=2, d_model=16,
                         d_ff=32, max_seq_video=12, max_seq_chord=S,
                         total_vf_dim=7 + 1 + 1 + 2, dropout=0.0)
        model = VideoMusicTransformer(cfg=cfg)
        feats = _feats(rng, B=B)
        variables = _init(model, feats, L=S)
        primer = jnp.zeros((B, 4), jnp.int32).at[:, 0].set(1)
        kw = dict(semantic=feats["semantic"], key=feats["key"],
                  scene_offset=feats["scene_offset"], motion=feats["motion"],
                  emotion=feats["emotion"], primer=primer,
                  primer_root=primer, primer_attr=primer,
                  num_primer=jnp.asarray([2 + i for i in range(B)]),
                  rng=jax.random.PRNGKey(7), fused=fused, **extra)
        flat = generate_chords(
            model, variables,
            gcfg=GenerateConfig(target_seq_length=S, cache_segments=1), **kw)
        seg = generate_chords(
            model, variables,
            gcfg=GenerateConfig(target_seq_length=S, cache_segments=3), **kw)
        for k in ("gen_seq", "gen_seq_root", "gen_seq_attr"):
            np.testing.assert_array_equal(
                np.asarray(seg[k]), np.asarray(flat[k]),
                err_msg=f"version={version} B={B} fused={fused} {k}")


def test_quantize_kv_rows_roundtrip(rng):
    """Per-row int8 KV quantization: dequantized rows within half a
    quantization step of the source (scale = max|row|/127), all-zero rows
    exact, scale shape (..., 1)."""
    from video2music_tpu.ops.pallas_decode_batch import quantize_kv_rows

    x = rng.standard_normal((2, 9, 16)).astype(np.float32)
    x[1, 3] = 0.0  # all-zero row: scale must not divide by zero
    q, s = quantize_kv_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (2, 9, 1)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    step = np.abs(x).max(-1, keepdims=True) / 127.0
    assert np.all(np.abs(deq - x) <= step / 2 + 1e-7)
    assert np.all(deq[1, 3] == 0.0)


@pytest.mark.parametrize("wide", [False, True])
def test_kv_quant_batch_step_logits_close(rng, wide):
    """Int8-KV batched fused step (kv_quant="int8": int8 self+cross cache
    slabs, per-row scales folded in-kernel, quantized appends) vs the
    unquantized flax decode_step: logits must track within quantization
    error at every position — asserts relative L2 error < 3% and that the
    int8 caches/scale leaves round-trip through the appends (later
    positions read earlier quantized rows). Covers ends=False (XLA glue)
    and ends=True (embed/router/head folded), in both attention forms
    (``wide``: raw scale columns, no current-row splice)."""
    from video2music_tpu.decode.fused import (init_fused_batch_caches,
                                              make_fused_batch_step)

    model, cfg = _tiny("2.2")
    B = 4
    feats = _feats(rng, B=B)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    for ends in (False, True):
        step_logits = make_fused_batch_step(variables["params"], cfg,
                                            block_b=2, interpret=True,
                                            ends=ends, kv_quant="int8",
                                            wide=wide)
        caches = init_fused_batch_caches(variables["params"], cfg, B,
                                         primed["cache"], kv_quant="int8")
        assert caches["k0"].dtype == jnp.int8
        assert caches["ck0"].dtype == jnp.int8
        assert caches["ksc0"].shape == (B, cfg.max_seq_chord, 1)

        tokens = rng.integers(0, C.CHORD_END, (8, B))
        roots = rng.integers(0, 13, (8, B))
        attrs = rng.integers(0, 14, (8, B))
        key = feats["key"]

        flax_cache = primed["cache"]
        for pos in range(8):
            t = jnp.asarray(tokens[pos][:, None], jnp.int32)
            r = jnp.asarray(roots[pos][:, None], jnp.int32)
            a = jnp.asarray(attrs[pos][:, None], jnp.int32)
            want, mutated = model.apply(
                {**variables, "cache": flax_cache}, t, r, a, key,
                jnp.asarray(pos, jnp.int32), method=model.decode_step,
                mutable=["cache", "metrics", "moe_state"])
            flax_cache = mutated["cache"]
            got, caches = step_logits(caches, t, r, a, key,
                                      jnp.asarray(pos, jnp.int32))
            assert caches["k0"].dtype == jnp.int8  # appends stay int8
            w = np.asarray(want, np.float32)
            g = np.asarray(got, np.float32)
            rel = np.linalg.norm(g - w) / np.linalg.norm(w)
            assert rel < 0.03, f"ends={ends} pos={pos} rel={rel:.4f}"


def test_kv_quant_segmented_generate_bit_exact(rng):
    """kv_quant="int8" + cache segmentation: sliced int8 cache windows and
    their scale-column leaves must reproduce the unsegmented int8 decode
    BIT-exactly (same quantized math, masked rows contribute exact zeros)
    — the int8 analogue of test_segmented_cache_generate_matches_unsegmented."""
    S = 48
    cfg = amt_config("2.2", n_layers=4, num_heads=2, d_model=16,
                     d_ff=32, max_seq_video=12, max_seq_chord=S,
                     total_vf_dim=7 + 1 + 1 + 2, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    B = 2
    feats = _feats(rng, B=B)
    variables = _init(model, feats, L=S)
    primer = jnp.zeros((B, 4), jnp.int32).at[:, 0].set(1)
    kw = dict(semantic=feats["semantic"], key=feats["key"],
              scene_offset=feats["scene_offset"], motion=feats["motion"],
              emotion=feats["emotion"], primer=primer,
              primer_root=primer, primer_attr=primer,
              num_primer=jnp.asarray([2, 3]),
              rng=jax.random.PRNGKey(7), fused="ends", interpret=True,
              kv_quant="int8")
    flat = generate_chords(
        model, variables,
        gcfg=GenerateConfig(target_seq_length=S, cache_segments=1), **kw)
    seg = generate_chords(
        model, variables,
        gcfg=GenerateConfig(target_seq_length=S, cache_segments=3), **kw)
    for k in ("gen_seq", "gen_seq_root", "gen_seq_attr"):
        np.testing.assert_array_equal(np.asarray(seg[k]), np.asarray(flat[k]),
                                      err_msg=k)


def test_kv_quant_guards():
    """kv_quant validation: bad value and the quantize+kv_quant combination
    both raise before any compute."""
    model, cfg = _tiny("2.2")
    dummy = dict(semantic=None, key=None, scene_offset=None, motion=None,
                 emotion=None, primer=None, primer_root=None,
                 primer_attr=None, num_primer=1, rng=None)
    with pytest.raises(ValueError, match="kv_quant"):
        generate_chords(model, {}, kv_quant="int4", **dummy)
    with pytest.raises(ValueError, match="mutually exclusive"):
        generate_chords(model, {}, kv_quant="int8", quantize="int8", **dummy)
