"""Validate + time the BATCHED fused decode kernels on the real TPU.

Two phases (each skippable):
  parity: a small-but-Mosaic-eligible AMT 2.2 (d_model=128, d_ff=64)
    drives make_fused_batch_step vs the flax decode_step for 6 positions
    at B=4 on the hardware — proves the kernels LOWER through Mosaic
    (interpreter-mode tests can't) and match the XLA path numerically.
  timing: full-size AMT 2.2 bf16 at B=32 — jitted 300-step decode scans,
    fused-batch vs XLA, slope-timed (blocks of N dependent-chained calls,
    ONE fetch per block; see bench.py docstring for why).

Run from /root/repo (axon plugin cwd requirement); ONE TPU process at a
time. Usage: python tools/batch_decode_bench.py [parity|timing|both]
"""

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


def _feats(rng, B, L, vf_sem, vf_extra):
    return dict(
        semantic=jnp.asarray(
            rng.standard_normal((B, L, vf_sem)).astype(np.float32)),
        key=jnp.ones((B, 1), jnp.float32),
        scene_offset=jnp.asarray(
            rng.integers(0, 5, (B, L)).astype(np.float32)),
        motion=jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
        emotion=jnp.asarray(
            rng.uniform(size=(B, L, vf_extra)).astype(np.float32)),
    )


def parity():
    from video2music_tpu.decode.fused import (init_fused_batch_caches,
                                              init_fused_caches,
                                              make_fused_batch_step,
                                              make_fused_step)
    rng = np.random.default_rng(0)
    L = 16
    cfg = amt_config("2.2", n_layers=4, num_heads=4, d_model=128, d_ff=64,
                     max_seq_video=L, max_seq_chord=L,
                     total_vf_dim=7 + 1 + 1 + 2, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    B = 4
    feats = _feats(rng, B, L, 7, 2)
    z = jnp.zeros((B, L - 1), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, z, z, z,
                           feats["semantic"], feats["key"],
                           feats["scene_offset"], feats["motion"],
                           feats["emotion"])
    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])

    step_logits = make_fused_batch_step(variables["params"], cfg)
    fused_caches = init_fused_batch_caches(variables["params"], cfg, B,
                                           primed["cache"])
    jit_fused = jax.jit(step_logits)

    def xla_step(cache, t, r, a, k, pos):
        logits, mutated = model.apply(
            {**variables, "cache": cache}, t, r, a, k, pos,
            method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        return logits, mutated["cache"]

    jit_xla = jax.jit(xla_step)
    # reference discipline: the B=1 fused kernel (shipped since round 2)
    # on element 0 — its dots run at the same MXU precision as the
    # batched kernels, so its hardware divergence from the XLA step is
    # the established noise level for "fused kernel vs XLA" at this dtype
    step1 = make_fused_step(variables["params"], cfg)
    el0 = jax.tree_util.tree_map(lambda a: a[:1], primed["cache"])
    fused1_caches = init_fused_caches(variables["params"], cfg, el0)
    jit_fused1 = jax.jit(step1)

    flax_cache = primed["cache"]
    worst, floor = 0.0, 0.0
    for pos in range(6):
        t = jnp.asarray(rng.integers(0, 157, (B, 1)), jnp.int32)
        r = jnp.asarray(rng.integers(0, 13, (B, 1)), jnp.int32)
        a = jnp.asarray(rng.integers(0, 14, (B, 1)), jnp.int32)
        p = jnp.asarray(pos, jnp.int32)
        want, flax_cache = jit_xla(flax_cache, t, r, a, feats["key"], p)
        got, fused_caches = jit_fused(fused_caches, t, r, a, feats["key"], p)
        got1, fused1_caches = jit_fused1(fused1_caches, t[:1], r[:1], a[:1],
                                         feats["key"][:1], p)
        scale = float(jnp.max(jnp.abs(np.asarray(want))))
        diff = float(jnp.max(jnp.abs(np.asarray(got) - np.asarray(want))))
        nf = float(jnp.max(jnp.abs(np.asarray(got1)
                                   - np.asarray(want[:1]))))
        worst = max(worst, diff / max(scale, 1e-6))
        floor = max(floor, nf / max(scale, 1e-6))
        print(f"pos={pos} rel(batchfused-xla)={diff / max(scale, 1e-6):.3e} "
              f"rel(b1fused-xla)={nf / max(scale, 1e-6):.3e}", flush=True)
    assert worst < max(5 * floor, 5e-3), \
        f"parity FAILED: rel={worst} b1_fused_floor={floor}"
    print(f"parity OK (worst rel {worst:.1e}, B=1 fused-kernel floor "
          f"{floor:.1e})", flush=True)


def timing(B=32, reps=5, n_lo=1, n_hi=4):
    """Fused-vs-XLA batched decode at batch size B (argv: timing [B])."""
    from video2music_tpu.decode.sampler import (GenerateConfig,
                                                generate_chords)
    rng = np.random.default_rng(1)
    cfg = amt_config("2.2", total_vf_dim=768 + 1 + 1 + 6, dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    feats = _feats(rng, B, 300, 768, 6)
    z = jnp.zeros((B, 299), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, z, z, z,
                           feats["semantic"], feats["key"],
                           feats["scene_offset"], feats["motion"],
                           feats["emotion"])
    variables = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables),
        jax.devices()[0])
    feats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x.astype(jnp.bfloat16), jax.devices()[0]),
        feats)
    primer = jnp.zeros((B, 8), jnp.int32).at[:, 0].set(1)
    gcfg = GenerateConfig(target_seq_length=300)

    def run(fused):
        def f(variables, feats, seed):
            return generate_chords(
                model, variables, semantic=feats["semantic"],
                key=feats["key"], scene_offset=feats["scene_offset"],
                motion=feats["motion"], emotion=feats["emotion"],
                primer=primer, primer_root=primer, primer_attr=primer,
                num_primer=1, temperature=1.0, rng=jax.random.PRNGKey(seed),
                gcfg=gcfg, fused=fused)
        return jax.jit(f)

    combine = jax.jit(lambda seqs: jnp.stack(seqs).sum())

    for fused in ("off", "on"):
        jitted = run(fused)
        t0 = time.perf_counter()
        np.asarray(jitted(variables, feats, 0)["gen_seq"])
        print(f"fused={fused}: compile+first {time.perf_counter()-t0:.1f} s",
              flush=True)

        def timed(n, base):
            t0 = time.perf_counter()
            outs = [jitted(variables, feats, base + i) for i in range(n)]
            np.asarray(combine([o["gen_seq"] for o in outs]))
            return time.perf_counter() - t0

        timed(n_lo, 900), timed(n_hi, 950)
        slopes = []
        for r_i in range(reps):
            t_lo = timed(n_lo, 100 * r_i)
            t_hi = timed(n_hi, 100 * r_i + 50)
            slopes.append((t_hi - t_lo) / (n_hi - n_lo))
        med = sorted(slopes)[len(slopes) // 2]
        print(f"fused={fused}: {med*1000:.1f} ms/call, "
              f"{med/B*1000:.2f} ms/clip, {300.0*B/med:.0f} tok/s aggregate "
              f"(spread {(max(slopes)-min(slopes))/med*100:.0f}%)",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("parity", "both"):
        parity()
    if mode in ("timing", "both"):
        timing(B=int(sys.argv[2]) if len(sys.argv) > 2 else 32)
