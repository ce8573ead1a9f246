"""Batched (B>1) decode cost of the NON-V2 wirings on their current path.

VERDICT r4 item 5: B>1 fused decode covers the V2 family; base-AMT and V3
batched serving fall back to the XLA step with no recorded cost. This tool
records it: ms/clip at B in {4, 16, 32} for base AMT (RPR) and V3.0
(differential), seg-auto, bf16, slope method with one dependent sync per
block (bench.py discipline, GC paused). Two modes per (version, B):
"off" = the XLA step fallback (the pre-round-5 batched variant path) and
"auto" = the batched variant kernels (ops/pallas_decode_batch_variant),
which the sampler now routes to at B>1. Compare against the V2 fused
numbers (BACKLOG: B=4 11.8, B=16 8.5, B=32 7.4 ms/clip).

-parity additionally runs a full-size f32 (uncast) B=4 teacher-forced
step-logits comparison against the flax decode_step (rel-diff <= 1e-4)
— the on-chip Mosaic parity check the CPU interpreter tests cannot
provide (token-identical generates are over-strict in f32: reduction-
order LSBs flip categorical near-ties; see parity() docstring).

Run from /root/repo; ONE TPU process at a time, idle host.
"""

import argparse
import gc
import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench


def build(version):
    from video2music_tpu.core.config import amt_config
    from video2music_tpu.models import VideoMusicTransformer

    cfg = amt_config(version, total_vf_dim=1287)
    model = VideoMusicTransformer(cfg=cfg)
    feats = bench._feats(1)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 299), jnp.int32), jnp.zeros((1, 299), jnp.int32),
        jnp.zeros((1, 299), jnp.int32), feats["semantic"], feats["key"],
        feats["scene_offset"], feats["motion"], feats["emotion"])
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    return model, cast(variables), cast, variables


def measure(model, variables, cast, B, fused, n_lo=1, n_hi=4, repeats=5):
    from video2music_tpu.decode.sampler import GenerateConfig, generate_chords

    gcfg = GenerateConfig(target_seq_length=300, temperature=1.0)
    feats = cast(bench._feats(B))
    primer = jnp.zeros((B, 8), jnp.int32).at[:, 0].set(1)
    temps = jnp.full((B,), 1.0, jnp.float32)

    def run(variables, feats, seed):
        return generate_chords(
            model, variables, semantic=feats["semantic"], key=feats["key"],
            scene_offset=feats["scene_offset"], motion=feats["motion"],
            emotion=feats["emotion"], primer=primer, primer_root=primer,
            primer_attr=primer, num_primer=1, temperature=temps,
            rng=jax.random.PRNGKey(seed), gcfg=gcfg, fused=fused)

    jitted = jax.jit(run)
    combine = jax.jit(lambda seqs: jnp.stack(seqs).sum())
    t0 = time.perf_counter()
    np.asarray(jitted(variables, feats, 0)["gen_seq"])
    compile_s = time.perf_counter() - t0

    def timed(n, base):
        t0 = time.perf_counter()
        outs = [jitted(variables, feats, base + i) for i in range(n)]
        np.asarray(combine([o["gen_seq"] for o in outs]))
        return time.perf_counter() - t0

    timed(n_lo, 9000), timed(n_hi, 9500)
    timed(n_hi, 9600)
    gc.collect()
    gc.disable()
    try:
        slopes = []
        for r in range(repeats):
            t_lo = timed(n_lo, 100 * r)
            t_hi = timed(n_hi, 100 * r + 50)
            slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    finally:
        gc.enable()
    slopes.sort()
    med = slopes[len(slopes) // 2]
    return dict(ms_per_clip=round(med / B * 1000, 2),
                tok_s=round(300.0 * B / med, 0),
                spread_pct=round(
                    100 * (slopes[-1] - slopes[0]) / med, 1),
                compile_s=round(compile_s, 1))


def parity(model, variables, B=4, n_pos=6, rel_tol=1e-4):
    """On-chip Mosaic parity at FULL model size: teacher-forced step
    logits of the batched variant kernels vs the flax ``decode_step``,
    f32, max rel-diff over ``n_pos`` steps — the same contract as
    tools/hw_parity_sweep (which covers the wirings at d_model=128) but
    at the real d_model=512 shapes, so size-dependent Mosaic lowering
    bugs (e.g. the f32 VMEM footprint of the weight-stationary MoE
    kernel) surface here. Token-identical f32 generates are NOT the bar:
    the wide slab matmuls reduce in a different order than XLA's
    einsums, and an LSB-level f32 difference legitimately flips a
    categorical near-tie (measured 2/240 tokens on base AMT with
    logits rel-diff at the f32 noise floor).

    Runs under ``jax.default_matmul_precision("highest")``: at the TPU's
    DEFAULT precision an f32 matmul runs single-pass bf16 on the MXU, so
    both sides carry ~5e-3 rel bf16 noise that differs with reduction
    order and swamps the 1e-4 bar (measured: base 5.8e-3 / V3 1.4e-2 at
    DEFAULT; 6.4e-7 / 1.3e-6 at highest). HIGHEST makes f32 mean f32 in
    the flax einsums AND inside the Pallas kernels (precision threads
    through Mosaic dots), so a real lowering bug cannot hide in MXU
    rounding."""
    from video2music_tpu.decode.fused import (
        init_fused_batch_variant_caches, make_fused_batch_variant_step)

    with jax.default_matmul_precision("highest"):
        feats = bench._feats(B)
        memory, _ = model.apply(variables, feats["semantic"],
                                feats["scene_offset"], feats["motion"],
                                feats["emotion"], method=model.encode,
                                mutable=["metrics", "moe_state"])
        _, primed = model.apply(variables, memory, method=model.prime,
                                mutable=["cache"])
        step = jax.jit(make_fused_batch_variant_step(variables["params"],
                                                     model.cfg))
        cache = init_fused_batch_variant_caches(variables["params"],
                                                model.cfg, B,
                                                primed["cache"])

        def xla_step(fcache, t, r, a, k, pos):
            logits, mutated = model.apply(
                {**variables, "cache": fcache}, t, r, a, k, pos,
                method=model.decode_step,
                mutable=["cache", "metrics", "moe_state"])
            return logits, mutated["cache"]

        jit_xla = jax.jit(xla_step)
        rng = np.random.default_rng(1)
        flax_cache = primed["cache"]
        worst, scale = 0.0, 1e-9
        for pos in range(n_pos):
            t = jnp.asarray(rng.integers(0, 157, (B, 1)), jnp.int32)
            r = jnp.asarray(rng.integers(0, 13, (B, 1)), jnp.int32)
            a = jnp.asarray(rng.integers(0, 14, (B, 1)), jnp.int32)
            p = jnp.asarray(pos, jnp.int32)
            want, flax_cache = jit_xla(flax_cache, t, r, a, feats["key"], p)
            got, cache = step(cache, t, r, a, feats["key"], p)
            w = np.asarray(want, np.float32)
            g = np.asarray(got, np.float32)
            worst = max(worst, float(np.max(np.abs(g - w))))
            scale = max(scale, float(np.max(np.abs(w))))
    rel = worst / scale
    ok = rel <= rel_tol
    print(json.dumps({"parity_f32_logits": bool(ok), "B": B,
                      "worst_abs_diff": round(worst, 6),
                      "logit_scale": round(scale, 3),
                      "rel_diff": float(f"{rel:.3e}")}), flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-versions", default="base,3.0")
    ap.add_argument("-batches", default="4,16,32")
    ap.add_argument("-modes", default="off,auto",
                    help="off = XLA fallback, auto = batched variant "
                         "kernels")
    ap.add_argument("-parity", action="store_true",
                    help="f32 B=4 token-parity check per version first")
    args = ap.parse_args()

    for vname in args.versions.split(","):
        version = None if vname in ("base", "none") else vname
        model, variables, cast, f32_vars = build(version)
        if args.parity:
            parity(model, f32_vars, B=4)
        for B in [int(b) for b in args.batches.split(",") if b]:
            for fused in args.modes.split(","):
                res = measure(model, variables, cast, B, fused)
                print(json.dumps({"version": vname, "B": B,
                                  "fused": fused, **res}), flush=True)


if __name__ == "__main__":
    main()
