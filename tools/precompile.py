"""Serving cold-start prewarmer + measurer (VERDICT r4 item 4).

A fresh serving process must compile every decode program it will
dispatch before it can answer: the B=1 "ends" program plus one batched
program per DynamicBatcher bucket width. Round 4 recorded the wide
batched kernel's cold Mosaic compile as ~15 min; re-measured in round 5
a cold compile+first-result of the full B=32 seg-auto ends wiring is
~41 s (tools/batch_spread_diag.py) — but a server warming every bucket
in (1, 2, 4, 8, 16, 32) serially still pays the sum on its first
requests. This tool does that warm-up AHEAD of traffic:

  * run it on the serving box before starting ``cli/serve.py`` — it
    compiles each requested width against the persistent compile cache
    (``.jax_cache``) and, where the axon cache cooperates across
    processes, the server's own compiles become cache hits;
  * even where cross-process cache hits do NOT materialize (CLAUDE.md:
    unreliable through this tunnel), the per-width timings it prints ARE
    the cold-start budget — operators can bound
    cold-start-to-first-batch and pick ``-widths`` accordingly (serve
    only widths you prewarmed/afford; the batcher pads to the next
    bucket, so a width-32-only policy costs one compile).

Prints one JSON line per program: {"program": ..., "seconds": ...} and a
final total. Run from /root/repo; ONE TPU process at a time.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-widths", default="1,16,32",
                    help="comma-separated batch widths to precompile "
                         "(DynamicBatcher buckets); 1 uses the B=1 ends "
                         "program, >1 the batched wide kernels")
    ap.add_argument("-cache", default=".jax_cache",
                    help="persistent compile cache dir to populate")
    ap.add_argument("-version", default="2.2")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", args.cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import bench
    from video2music_tpu.decode.sampler import (GenerateConfig,
                                                generate_chords)

    t0 = time.perf_counter()
    model, variables, _ = bench._build()
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    variables = cast(variables)
    print(json.dumps({"program": "model_build+init",
                      "seconds": round(time.perf_counter() - t0, 1)}),
          flush=True)

    gcfg = GenerateConfig(target_seq_length=300, temperature=1.0)
    total = time.perf_counter()
    for w in [int(x) for x in args.widths.split(",") if x]:
        feats = cast(bench._feats(w))
        primer = jnp.zeros((w, 8), jnp.int32).at[:, 0].set(1)
        temps = jnp.full((w,), 1.0, jnp.float32)

        def run(variables, feats, seed):
            return generate_chords(
                model, variables, semantic=feats["semantic"],
                key=feats["key"], scene_offset=feats["scene_offset"],
                motion=feats["motion"], emotion=feats["emotion"],
                primer=primer, primer_root=primer, primer_attr=primer,
                num_primer=1, temperature=temps,
                rng=jax.random.PRNGKey(seed), gcfg=gcfg)

        t0 = time.perf_counter()
        np.asarray(jax.jit(run)(variables, feats, 0)["gen_seq"])
        print(json.dumps({"program": f"decode_b{w}",
                          "seconds": round(time.perf_counter() - t0, 1)}),
              flush=True)
    print(json.dumps({"program": "total_decode_warmup",
                      "seconds": round(time.perf_counter() - total, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
