"""Variant fused decode-layer kernel parity vs the unfused XLA step path
(CPU, Pallas interpreter mode) — the non-V2 wirings: base-AMT RPR + ReLU
FFN + sinusoidal PE (reference model/rpr.py:390-395), the V1 family
(learned PE, MoE with MLP experts / no shared expert / Word2Vec chord
table, reference model/video_music_transformer.py:22-140), and the V3
family (differential attention + RMSNorm + pre-norm, reference
model/custom_transformer.py:610-834)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.config import amt_config
from video2music_tpu.decode.fused import (init_fused_variant_caches,
                                          make_fused_variant_step)
from video2music_tpu.decode.sampler import GenerateConfig, generate_chords
from video2music_tpu.models import VideoMusicTransformer
from video2music_tpu.ops.pallas_decode import fused_decode_eligible
from video2music_tpu.ops.pallas_decode_variant import fused_variant_eligible

# every wiring family the variant kernels must cover:
#   None   — RPR self-attn, vanilla cross, ReLU FFN, sinusoidal PE
#   1.0    — learned PE, MoE everywhere, MLP experts, NO shared expert
#   1.1    — learned PE, GLU experts, no shared expert
#   1.2.3  — RoPE, MLP experts, shared expert
#   1.3.3  — shallow SwiGLU / deep GLU-MoE split, shared expert
#   2.0    — learned PE with the V2 SwiGLU/SharedMoE stack (+ TopKScheduler)
#   3.0    — differential decoder attention, RMSNorm, balancing
#   3.2    — pre-norm differential + RMSNorm
VARIANT_VERSIONS = [None, "1.0", "1.1", "1.2.3", "1.3.3", "2.0", "3.0",
                    "3.2"]


def _tiny(version, **kw):
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


def test_variant_eligibility():
    for version in VARIANT_VERSIONS:
        _, cfg = _tiny(version)
        assert fused_variant_eligible(cfg), version
        # the V2 family keeps its own (faster) backends — 2.0's learned PE
        # is the one V2 member that routes through the variant kernels
        if version not in (None, "2.0") or version is None:
            assert not fused_decode_eligible(cfg), version
    # not covered: KAN experts, GQA, separated heads
    _, kan = _tiny("2.3")
    assert not fused_variant_eligible(kan)
    _, gqa = _tiny("2.2", kv_heads=1)
    assert not fused_variant_eligible(gqa)
    _, sep = _tiny(None, separated=True)
    assert not fused_variant_eligible(sep)


@pytest.mark.parametrize("version", VARIANT_VERSIONS)
def test_variant_step_logits_match_unfused(rng, version):
    """Feed the same token stream through the variant fused kernels
    (interpret mode) and the flax decode_step; logits must agree at every
    position — covers the RPR shift-matmul bias, differential two-softmax
    + per-head subln, ReLU/MLP-expert FFNs, shared-less MoE combines,
    RMSNorm, pre-norm residuals, and the learned/sinusoidal PE glue."""
    model, cfg = _tiny(version)
    feats = _feats(rng)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_variant_step(variables["params"], cfg,
                                          interpret=True)
    fused_caches = init_fused_variant_caches(variables["params"], cfg,
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
                                   err_msg=f"version={version} pos={pos}")


def test_variant_step_chord_embed_table(rng):
    """V1's frozen Word2Vec chord-table embedding (chord_embed=True) rides
    in the glue: fused logits must match the flax decode_step that looks
    the token up in chord_embedding (reference
    video_music_transformer.py:47-50,984-1001)."""
    model, cfg = _tiny("1.1", chord_embed=True, chord_embed_dim=16,
                       chord_table="deterministic")
    feats = _feats(rng)
    variables = _init(model, feats)
    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])
    step_logits = make_fused_variant_step(variables["params"], cfg,
                                          interpret=True)
    fused_caches = init_fused_variant_caches(variables["params"], cfg,
                                             primed["cache"])
    tokens = rng.integers(0, C.CHORD_END, 6)
    key = feats["key"]
    flax_cache = primed["cache"]
    for pos in range(6):
        t = jnp.asarray([[tokens[pos]]], jnp.int32)
        want, mutated = model.apply(
            {**variables, "cache": flax_cache}, t, t, t, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, fused_caches = step_logits(fused_caches, t, t, t, key,
                                        jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=f"pos={pos}")


@pytest.mark.parametrize("version", [None, "1.2.3", "3.0", "3.2"])
def test_variant_generate_matches_unfused(rng, version):
    """Whole constrained generate through the sampler routing: fused='on'
    (variant kernels) and fused='off' emit identical token sequences."""
    model, cfg = _tiny(version)
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
                                      np.asarray(out_ref[k]),
                                      err_msg=f"{version} {k}")


@pytest.mark.parametrize("version", [None, "1.0", "1.2.3", "3.0", "3.2"])
def test_variant_int8_step_matches_fake_quant_oracle(rng, version):
    """Int8 weight-only decode on the VARIANT kernels: fused kernels
    reading int8 weights + per-column scales must agree with the unfused
    XLA step run on fake-quantized params — covers the base-AMT ReLU MLP
    (Dense_0/Dense_1), V1 MLP experts with and without the shared expert,
    and V3 differential projections (per-column scales commute with every
    output-channel matmul; RPR Er / lambda / subln stay full precision)."""
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

    step_logits = make_fused_variant_step(variables["params"], cfg,
                                          interpret=True, quantize="int8")
    fused_caches = init_fused_variant_caches(variables["params"], cfg,
                                             primed["cache"])
    fq_variables = {**variables,
                    "params": fake_quantize_decoder_params(
                        variables["params"], cfg)}

    tokens = rng.integers(0, C.CHORD_END, 6)
    roots = rng.integers(0, 13, 6)
    attrs = rng.integers(0, 14, 6)
    key = feats["key"]

    flax_cache = primed["cache"]
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
                                   err_msg=f"version={version} pos={pos}")


@pytest.mark.parametrize("version", [None, "3.0"])
def test_variant_int8_generate_matches_unfused_fake_quant(rng, version):
    """Sampler routing for variant int8 at B=1: fused='on' +
    quantize='int8' (variant kernels, int8 weights) and fused='off' +
    quantize='int8' (fake-quant XLA oracle) emit identical tokens."""
    model, cfg = _tiny(version)
    feats = _feats(rng)
    variables = _init(model, feats)
    primer = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
    kw = dict(semantic=feats["semantic"], key=feats["key"],
              scene_offset=feats["scene_offset"], motion=feats["motion"],
              emotion=feats["emotion"], primer=primer, primer_root=primer,
              primer_attr=primer, num_primer=2,
              gcfg=GenerateConfig(target_seq_length=12))
    out_ref = generate_chords(model, variables, rng=jax.random.PRNGKey(7),
                              fused="off", quantize="int8", **kw)
    seq = np.asarray(out_ref["gen_seq"])[0, 2:]
    assert ((seq >= 0) & (seq < C.CHORD_END)).all()
    out_fused = generate_chords(model, variables, rng=jax.random.PRNGKey(7),
                                fused="on", interpret=True,
                                quantize="int8", **kw)
    for k in ("gen_seq", "gen_seq_root", "gen_seq_attr"):
        np.testing.assert_array_equal(np.asarray(out_fused[k]),
                                      np.asarray(out_ref[k]),
                                      err_msg=f"{version} {k}")


@pytest.mark.parametrize("version", VARIANT_VERSIONS)
def test_batch_variant_step_logits_match_unfused(rng, version):
    """Batched (B>1) variant kernels (ops/pallas_decode_batch_variant,
    interpret mode) vs the flax decode_step on the same token streams:
    covers the wide block-diagonal attention with the RPR shift-matmul
    bias, the differential 2H-column softmax + pair-combine + vectorized
    subln, the weight-stationary variant MoE kernel (GLU + MLP experts,
    shared and shared-less), and the RMSNorm/pre-norm wirings."""
    from video2music_tpu.decode.fused import (
        init_fused_batch_variant_caches, make_fused_batch_variant_step)

    B = 3
    model, cfg = _tiny(version)
    feats = _feats(rng, B=B)
    variables = _init(model, feats)

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_batch_variant_step(variables["params"], cfg,
                                                interpret=True)
    fused_caches = init_fused_batch_variant_caches(variables["params"], cfg,
                                                   B, primed["cache"])

    tokens = rng.integers(0, C.CHORD_END, (B, 6))
    roots = rng.integers(0, 13, (B, 6))
    attrs = rng.integers(0, 14, (B, 6))
    key = feats["key"]

    flax_cache = primed["cache"]
    for pos in range(6):
        t = jnp.asarray(tokens[:, pos:pos + 1], jnp.int32)
        r = jnp.asarray(roots[:, pos:pos + 1], jnp.int32)
        a = jnp.asarray(attrs[:, pos:pos + 1], jnp.int32)
        want, mutated = model.apply(
            {**variables, "cache": flax_cache}, t, r, a, key,
            jnp.asarray(pos, jnp.int32), method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        flax_cache = mutated["cache"]
        got, fused_caches = step_logits(fused_caches, t, r, a, key,
                                        jnp.asarray(pos, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"version={version} pos={pos}")


@pytest.mark.parametrize("version", [None, "1.2.3", "3.0", "3.2"])
def test_batch_variant_generate_matches_unfused(rng, version):
    """Whole batched generate through the sampler routing: at B>1 a
    variant config now auto-routes to the batched variant kernels;
    fused='on' and fused='off' must emit identical token sequences."""
    B = 2
    model, cfg = _tiny(version)
    feats = _feats(rng, B=B)
    variables = _init(model, feats)
    primer = jnp.zeros((B, 4), jnp.int32).at[:, 0].set(1)
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
                                      np.asarray(out_ref[k]),
                                      err_msg=f"{version} {k}")


def test_batch_variant_kv_quant_warns_and_runs_full_precision(rng):
    """kv_quant='int8' stays a V2-family batched feature: a variant config
    at B>1 warns and decodes fused with full-precision caches (same tokens
    as kv_quant=None)."""
    B = 2
    model, cfg = _tiny(None)
    feats = _feats(rng, B=B)
    variables = _init(model, feats)
    primer = jnp.zeros((B, 4), jnp.int32).at[:, 0].set(1)
    kw = dict(semantic=feats["semantic"], key=feats["key"],
              scene_offset=feats["scene_offset"], motion=feats["motion"],
              emotion=feats["emotion"], primer=primer, primer_root=primer,
              primer_attr=primer, num_primer=2,
              gcfg=GenerateConfig(target_seq_length=12))
    out_plain = generate_chords(model, variables, rng=jax.random.PRNGKey(0),
                                fused="on", interpret=True, **kw)
    with pytest.warns(UserWarning, match="full-precision KV"):
        out = generate_chords(model, variables, rng=jax.random.PRNGKey(0),
                              fused="on", interpret=True, kv_quant="int8",
                              **kw)
    np.testing.assert_array_equal(np.asarray(out["gen_seq"]),
                                  np.asarray(out_plain["gen_seq"]))


def test_variant_rejects_v2_only_backends(rng):
    """Explicit V2-only backends on a variant config are a clear error,
    not a silent wrong-kernel route."""
    model, cfg = _tiny(None)
    feats = _feats(rng)
    variables = _init(model, feats)
    primer = jnp.zeros((1, 2), jnp.int32)
    kw = dict(semantic=feats["semantic"], key=feats["key"],
              scene_offset=feats["scene_offset"], motion=feats["motion"],
              emotion=feats["emotion"], primer=primer, primer_root=primer,
              primer_attr=primer, num_primer=1,
              gcfg=GenerateConfig(target_seq_length=12))
    with pytest.raises(ValueError, match="V2-family"):
        generate_chords(model, variables, rng=jax.random.PRNGKey(0),
                        fused="ends", interpret=True, **kw)
