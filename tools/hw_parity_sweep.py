"""Hardware kernel-parity sweep: run every fused-vs-XLA decode parity on
the REAL TPU and write a JSON artifact.

The pytest suite runs all Pallas kernels in interpreter mode (CPU
backend), which cannot catch Mosaic-lowering divergences — the class of
bug that produced the cross-attention RoPE table mismatch cache
segmentation exposed on hardware. This tool closes that gap once per
round: for each (backend, wiring) pair it drives the fused step and the
XLA ``decode_step`` with the same tokens on the chip and records the worst
logits divergence, normalized against the established bf16 noise floor
(the B=1 V2 kernel's own divergence, shipped and trusted since round 2).

Also times the VARIANT fused decode (ops/pallas_decode_variant — base-AMT
RPR and the V3 differential wirings) at full size against its XLA
fallback, recording ms/clip for the families that previously decoded
unfused (VERDICT r3 item 2).

Writes ``HWPARITY_r{N}.json`` at the repo root. Run from /root/repo (axon
plugin cwd requirement); ONE TPU process at a time.

Usage: python tools/hw_parity_sweep.py [parity|timing|both] [--out FILE]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from video2music_tpu.core.config import amt_config
from video2music_tpu.models import VideoMusicTransformer

L_SMALL = 16


def _feats(rng, B, L, sem=7, emo=2):
    return dict(
        semantic=jnp.asarray(
            rng.standard_normal((B, L, sem)).astype(np.float32)),
        key=jnp.ones((B, 1), jnp.float32),
        scene_offset=jnp.asarray(
            rng.integers(0, 5, (B, L)).astype(np.float32)),
        motion=jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        emotion=jnp.asarray(
            rng.uniform(size=(B, L, emo)).astype(np.float32)),
    )


def _bf16(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def _build(version, *, d_ff=64, L=L_SMALL, bf16=True, **overrides):
    """Small-but-Mosaic-eligible model (d_model=128 covers the lane tile;
    d_ff chosen per family so the GLU split / ReLU widths stay aligned)."""
    rng = np.random.default_rng(0)
    cfg = amt_config(version, n_layers=4, num_heads=4, d_model=128,
                     d_ff=d_ff, max_seq_video=L, max_seq_chord=L,
                     total_vf_dim=7 + 1 + 1 + 2, dropout=0.0, **overrides)
    model = VideoMusicTransformer(cfg=cfg)
    feats = _feats(rng, 1, L)
    z = jnp.zeros((1, L - 1), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, z, z, z,
                           feats["semantic"], feats["key"],
                           feats["scene_offset"], feats["motion"],
                           feats["emotion"])
    if bf16:
        variables, feats = _bf16(variables), _bf16(feats)
    return model, cfg, variables, feats, rng


def _prime(model, variables, feats):
    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])
    return primed["cache"]


def _xla_step(model, variables):
    def step(cache, t, r, a, k, pos):
        logits, mutated = model.apply(
            {**variables, "cache": cache}, t, r, a, k, pos,
            method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        return logits, mutated["cache"]
    return jax.jit(step)


def _drive(model, variables, feats, step_logits, fused_cache, *, n_pos=6,
           oracle_variables=None):
    """Max |fused - xla| logits divergence over n_pos steps (hardware)."""
    rng = np.random.default_rng(1)
    B = int(feats["semantic"].shape[0])
    jit_fused = jax.jit(step_logits)
    jit_xla = _xla_step(model, oracle_variables or variables)
    flax_cache = _prime(model, oracle_variables or variables, feats)
    worst = 0.0
    scale = 1e-9
    for pos in range(n_pos):
        t = jnp.asarray(rng.integers(0, 157, (B, 1)), jnp.int32)
        r = jnp.asarray(rng.integers(0, 13, (B, 1)), jnp.int32)
        a = jnp.asarray(rng.integers(0, 14, (B, 1)), jnp.int32)
        p = jnp.asarray(pos, jnp.int32)
        want, flax_cache = jit_xla(flax_cache, t, r, a, feats["key"], p)
        got, fused_cache = jit_fused(fused_cache, t, r, a, feats["key"], p)
        w = np.asarray(want, np.float32)
        g = np.asarray(got, np.float32)
        worst = max(worst, float(np.max(np.abs(g - w))))
        scale = max(scale, float(np.max(np.abs(w))))
    return worst, scale


def run_parity():
    from video2music_tpu.decode import fused as F

    results = []

    def record(name, worst, scale):
        rel = worst / scale
        results.append(dict(case=name, max_abs_diff=round(worst, 6),
                            logit_scale=round(scale, 3),
                            rel_diff=round(rel, 6)))
        print(f"  {name}: max|diff|={worst:.5f} scale={scale:.2f} "
              f"rel={rel:.2e}", flush=True)

    # ---- V2 family backends (noise floor = the trusted 'layer' backend)
    print("V2 2.2 backends (d_model=128, d_ff=64, bf16):", flush=True)
    model, cfg, variables, feats, _ = _build("2.2")
    cross = _prime(model, variables, feats)
    cases = [
        ("v2/layer", F.make_fused_step(variables["params"], cfg),
         F.init_fused_caches(variables["params"], cfg, cross)),
        ("v2/ends", F.make_fused_ends_step(variables["params"], cfg),
         F.init_fused_caches(variables["params"], cfg, cross)),
        ("v2/stack", F.make_fused_stack_step(variables["params"], cfg),
         F.init_fused_stack_caches(variables["params"], cfg, cross)),
        ("v2/monolith",
         F.make_fused_monolith_step(variables["params"], cfg),
         F.init_fused_monolith_caches(variables["params"], cfg, cross)),
    ]
    for name, step, cache in cases:
        worst, scale = _drive(model, variables, feats, step, cache)
        record(name, worst, scale)
    # int8 vs its fake-quant oracle
    from video2music_tpu.ops.pallas_decode import \
        fake_quantize_decoder_params
    fq = {**variables,
          "params": fake_quantize_decoder_params(variables["params"], cfg)}
    worst, scale = _drive(
        model, variables, feats,
        F.make_fused_step(variables["params"], cfg, quantize="int8"),
        F.init_fused_caches(variables["params"], cfg, cross),
        oracle_variables=fq)
    record("v2/layer-int8-vs-fakequant", worst, scale)

    # batched kernels at B=4 (plain + ends)
    rngb = np.random.default_rng(0)
    B = 4
    featsb = _bf16(_feats(rngb, B, L_SMALL))
    zb = jnp.zeros((B, L_SMALL - 1), jnp.int32)
    variablesb = _bf16(model.init(
        {"params": jax.random.PRNGKey(0)}, zb, zb, zb, featsb["semantic"],
        featsb["key"], featsb["scene_offset"], featsb["motion"],
        featsb["emotion"]))
    crossb = _prime(model, variablesb, featsb)
    for ends in (False, True):
        step = F.make_fused_batch_step(variablesb["params"], cfg, ends=ends)
        cache = F.init_fused_batch_caches(variablesb["params"], cfg, B,
                                          crossb)
        jit_fused = jax.jit(step)
        jit_xla = _xla_step(model, variablesb)
        flax_cache = crossb
        worst, scale = 0.0, 1e-9
        r1 = np.random.default_rng(1)
        for pos in range(6):
            t = jnp.asarray(r1.integers(0, 157, (B, 1)), jnp.int32)
            r = jnp.asarray(r1.integers(0, 13, (B, 1)), jnp.int32)
            a = jnp.asarray(r1.integers(0, 14, (B, 1)), jnp.int32)
            p = jnp.asarray(pos, jnp.int32)
            want, flax_cache = jit_xla(flax_cache, t, r, a, featsb["key"], p)
            got, cache = jit_fused(cache, t, r, a, featsb["key"], p)
            worst = max(worst, float(np.max(np.abs(
                np.asarray(got, np.float32) - np.asarray(want, np.float32)))))
            scale = max(scale, float(np.max(np.abs(np.asarray(want,
                                                              np.float32)))))
        record(f"v2/batch-{'ends' if ends else 'plain'}-B4", worst, scale)

    # ---- variant kernels (base AMT / V1 / V3 families)
    for version, d_ff, overrides in [
            (None, 128, {}),             # RPR + ReLU FFN + sinusoidal PE
            ("1.2.3", 64, {}),           # RoPE + MLP experts + shared
            ("1.1", 64, {}),             # GLU experts, NO shared expert
            ("2.0", 64, {}),             # learned PE + V2 stack
            ("3.0", 64, {}),             # differential + RMSNorm
            ("3.2", 64, {}),             # pre-norm differential
    ]:
        name = f"variant/{version or 'base'}"
        print(f"{name} (d_model=128, d_ff={d_ff}, bf16):", flush=True)
        model, cfg, variables, feats, _ = _build(version, d_ff=d_ff,
                                                 **overrides)
        from video2music_tpu.ops.pallas_decode_variant import (
            fused_variant_eligible, fused_variant_mosaic_ok)
        assert fused_variant_eligible(cfg) and fused_variant_mosaic_ok(cfg)
        cross = _prime(model, variables, feats)
        step = F.make_fused_variant_step(variables["params"], cfg)
        cache = F.init_fused_variant_caches(variables["params"], cfg, cross)
        worst, scale = _drive(model, variables, feats, step, cache)
        record(name, worst, scale)

        # batched variant kernels (ops/pallas_decode_batch_variant) at B=4
        rngv = np.random.default_rng(0)
        Bv = 4
        featsv = _bf16(_feats(rngv, Bv, L_SMALL))
        zv = jnp.zeros((Bv, L_SMALL - 1), jnp.int32)
        variablesv = _bf16(model.init(
            {"params": jax.random.PRNGKey(0)}, zv, zv, zv,
            featsv["semantic"], featsv["key"], featsv["scene_offset"],
            featsv["motion"], featsv["emotion"]))
        crossv = _prime(model, variablesv, featsv)
        stepv = F.make_fused_batch_variant_step(variablesv["params"], cfg)
        cachev = F.init_fused_batch_variant_caches(variablesv["params"],
                                                   cfg, Bv, crossv)
        worst, scale = _drive(model, variablesv, featsv, stepv, cachev)
        record(f"{name}-batch-B4", worst, scale)

    return results


def _time_decode(model, variables, feats, *, fused, n_lo=2, n_hi=12,
                 repeats=3, T=300):
    """Per-clip 300-token decode seconds by the slope method (one
    dependent combine sync per block — see bench.py)."""
    from video2music_tpu.decode.sampler import GenerateConfig, \
        generate_chords

    gcfg = GenerateConfig(target_seq_length=T)
    primer = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(1)

    def run(variables, feats, seed):
        return generate_chords(
            model, variables, semantic=feats["semantic"], key=feats["key"],
            scene_offset=feats["scene_offset"], motion=feats["motion"],
            emotion=feats["emotion"], primer=primer, primer_root=primer,
            primer_attr=primer, num_primer=1, rng=jax.random.PRNGKey(seed),
            gcfg=gcfg, fused=fused)

    jitted = jax.jit(run)
    combine = jax.jit(lambda seqs: jnp.stack(seqs).sum())
    np.asarray(jitted(variables, feats, 0)["gen_seq"])  # compile + sync

    def timed(n, base):
        t0 = time.perf_counter()
        outs = [jitted(variables, feats, base + i) for i in range(n)]
        np.asarray(combine([o["gen_seq"] for o in outs]))
        return time.perf_counter() - t0

    timed(n_lo, 9000), timed(n_hi, 9500)  # warm combine per N
    slopes = []
    for r in range(repeats):
        t_lo = timed(n_lo, 100 * r)
        t_hi = timed(n_hi, 100 * r + 50)
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    slopes.sort()
    return slopes[len(slopes) // 2]


def run_timing():
    """Full-size variant decode ms/clip, fused vs XLA, for the families
    that decoded unfused before round 4 (base AMT and V3.0)."""
    results = []
    for version in (None, "3.0"):
        name = version or "base"
        rng = np.random.default_rng(0)
        cfg = amt_config(version, total_vf_dim=1287)
        model = VideoMusicTransformer(cfg=cfg)
        feats = dict(
            semantic=jnp.asarray(
                rng.standard_normal((1, 300, 768)).astype(np.float32)),
            key=jnp.ones((1, 1), jnp.float32),
            scene_offset=jnp.asarray(
                rng.integers(0, 30, (1, 300)).astype(np.float32)),
            motion=jnp.asarray(
                rng.standard_normal((1, 300, 512)).astype(np.float32)),
            emotion=jnp.asarray(
                rng.uniform(size=(1, 300, 6)).astype(np.float32)))
        z = jnp.zeros((1, 299), jnp.int32)
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)}, z, z, z, feats["semantic"],
            feats["key"], feats["scene_offset"], feats["motion"],
            feats["emotion"])
        variables, feats = _bf16(variables), _bf16(feats)
        row = {"model": name}
        for fused in ("on", "off"):
            sec = _time_decode(model, variables, feats, fused=fused)
            row[f"ms_clip_fused_{fused}"] = round(sec * 1000, 2)
            print(f"variant timing {name} fused={fused}: "
                  f"{sec * 1000:.2f} ms/clip", flush=True)
        row["speedup"] = round(row["ms_clip_fused_off"]
                               / row["ms_clip_fused_on"], 2)
        results.append(row)
    return results


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = "HWPARITY_r04.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    artifact = {"device": str(jax.devices()[0])}
    if mode in ("parity", "both"):
        artifact["parity"] = run_parity()
        floor = max(r["rel_diff"] for r in artifact["parity"]
                    if r["case"] == "v2/layer")
        # pass = within 20x of the trusted backend's own bf16 noise
        for r in artifact["parity"]:
            r["ok"] = bool(r["rel_diff"] <= max(20 * floor, 2e-2))
        artifact["all_ok"] = all(r["ok"] for r in artifact["parity"])
    if mode in ("timing", "both"):
        artifact["variant_timing"] = run_timing()
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items()
                      if k in ("all_ok", "variant_timing")}), flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
