"""Diagnose the BENCH_r04 43.1% spread on the B=32 batched-decode headline.

VERDICT r4 item 1: round 3's splice-kernel headline had 0.3% spread with
the SAME bench_batched harness shape (n_lo=1, n_hi=6, 5 repeats); round 4
switched the default attention form to the wide kernel and the spread blew
up to 43.1%. This tool separates harness noise from kernel behavior:

  * per-CALL times: 20 single-call blocks (one combine sync each) for both
    attention forms — if individual wide calls vary, it's the kernel/device;
    if singles are stable but slopes vary, it's the harness arithmetic;
  * slope blocks at the bench's shape (1/6) and a wider shape (2/12);
  * gc counters around each phase (the 1-core host's cyclic GC passes cost
    ~2 s per 60-iteration allocation loop when jax is live — CLAUDE.md);
  * a repeat with gc.disable() to isolate collector pauses.

Run from /root/repo; ONE TPU process at a time, idle host.
"""

import gc
import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

import bench


def setup(wide):
    from video2music_tpu.decode.sampler import GenerateConfig, generate_chords

    model, variables, feats = bench._build()
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    variables = cast(variables)
    B = 32
    feats = cast(bench._feats(B))
    gcfg = GenerateConfig(target_seq_length=300, temperature=1.0)
    primer = jnp.zeros((B, 8), jnp.int32).at[:, 0].set(1)
    temps = jnp.linspace(0.8, 1.2, B)

    def run(variables, feats, seed):
        return generate_chords(
            model, variables, semantic=feats["semantic"], key=feats["key"],
            scene_offset=feats["scene_offset"], motion=feats["motion"],
            emotion=feats["emotion"], primer=primer, primer_root=primer,
            primer_attr=primer, num_primer=1, temperature=temps,
            rng=jax.random.PRNGKey(seed), gcfg=gcfg, wide=wide)

    jitted = jax.jit(run)
    combine = jax.jit(lambda seqs: jnp.stack(seqs).sum())
    t0 = time.perf_counter()
    np.asarray(jitted(variables, feats, 0)["gen_seq"])
    print(f"# wide={wide} compile+first: {time.perf_counter() - t0:.1f} s",
          flush=True)
    return jitted, combine, variables, feats


def block(jitted, combine, variables, feats, n, base):
    t0 = time.perf_counter()
    outs = [jitted(variables, feats, base + i) for i in range(n)]
    np.asarray(combine([o["gen_seq"] for o in outs]))
    return time.perf_counter() - t0


def phase(jitted, combine, variables, feats, label):
    out = {"label": label}
    # warm each distinct-N combine + two untimed passes
    for n in (1, 2, 6, 12):
        block(jitted, combine, variables, feats, n, 9000 + n)
    g0 = gc.get_stats()[2]["collections"]
    singles = [block(jitted, combine, variables, feats, 1, 100 + i)
               for i in range(20)]
    out["singles_ms"] = [round(t * 1000, 1) for t in singles]
    s = sorted(singles)
    out["singles_spread_pct"] = round(
        100 * (s[-1] - s[0]) / s[len(s) // 2], 1)
    slopes_16, slopes_212 = [], []
    for r in range(7):
        t1 = block(jitted, combine, variables, feats, 1, 300 + 10 * r)
        t6 = block(jitted, combine, variables, feats, 6, 400 + 10 * r)
        slopes_16.append((t6 - t1) / 5)
        t2 = block(jitted, combine, variables, feats, 2, 500 + 10 * r)
        t12 = block(jitted, combine, variables, feats, 12, 600 + 10 * r)
        slopes_212.append((t12 - t2) / 10)
    for name, sl in (("slope_1_6_ms", slopes_16),
                     ("slope_2_12_ms", slopes_212)):
        ss = sorted(sl)
        out[name] = [round(t * 1000, 1) for t in sl]
        out[name + "_spread_pct"] = round(
            100 * (ss[-1] - ss[0]) / ss[len(ss) // 2], 1)
    out["gen2_collections"] = gc.get_stats()[2]["collections"] - g0
    print(json.dumps(out), flush=True)
    return out


def main():
    for wide in (True, False):
        jitted, combine, variables, feats = setup(wide)
        phase(jitted, combine, variables, feats, f"wide={wide} gc=on")
        gc.collect()
        gc.disable()
        try:
            phase(jitted, combine, variables, feats, f"wide={wide} gc=off")
        finally:
            gc.enable()
        del jitted, combine
    print("done", flush=True)


if __name__ == "__main__":
    main()
