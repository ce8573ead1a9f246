#!/usr/bin/env python
"""Sustained serving throughput on real hardware.

Drives the production serving stack — ``pipeline.serving.DynamicBatcher``
over ``Video2music.generate_batch`` on the FULL-SIZE flagship (AMT 2.2 +
regression heads, bf16, random weights — timing is architecture-true) —
with N concurrent client threads submitting precomputed-feature requests
(the reference's own serving deployment decodes from precomputed features
one gradio request at a time, reference: ``video2music.py:1``). Reports
sustained clips/s and per-request latency percentiles for the FULL
product path: queue + coalesce + one batched decode program + per-clip
regression post-processing + host MIDI render on the 1-core host.

    python tools/serving_bench.py --clients 32 --seconds 60 --max_batch 16

The decode-only ceiling is bench.py's ``amt_decode_300_b32`` (~40k tok/s
aggregate = ~135 clips/s of pure decode); the gap to the number printed
here is host-side per-clip rendering, which parallel serving replicas
would scale out, not the TPU.
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _feats(n_sec: int, seed: int):
    r = np.random.default_rng(seed)
    return {
        "semantic": r.standard_normal((n_sec, 768)).astype(np.float32),
        "emotion": r.uniform(size=(n_sec, 6)).astype(np.float32),
        "scene_offset": np.arange(n_sec, dtype=np.float32),
        "motion": r.standard_normal((n_sec,)).astype(np.float32),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--seconds", type=int, default=60,
                   help="measurement window after warmup")
    p.add_argument("--clip_seconds", type=int, default=60,
                   help="length of each synthetic clip's feature track")
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=int, default=30)
    p.add_argument("--out", default="/tmp/v2m_serving_bench")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video2music_tpu.pipeline import Video2music
    from video2music_tpu.pipeline.serving import DynamicBatcher

    v2m = Video2music(music_gen_version="2.2", motion_type=0)
    # buckets (1, max_batch): exactly two compiled decode widths — ramp
    # gathers pad straight to max_batch instead of minting per-width
    # programs (full-size decode compiles cost ~30 s each here)
    batcher = DynamicBatcher(
        v2m, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        output_dir=args.out, buckets=(1, args.max_batch))

    feats = [_feats(args.clip_seconds, s) for s in range(8)]
    req = lambda i: dict(features=feats[i % len(feats)], primer="C Am F G",
                         key="C major")

    print("warmup: compiling width-1 and width-"
          f"{args.max_batch} programs...", flush=True)
    t0 = time.perf_counter()
    batcher.submit(req(0)).result()
    futs = [batcher.submit(req(i)) for i in range(args.max_batch)]
    for f in futs:
        f.result()
    print(f"warmup done in {time.perf_counter() - t0:.1f} s", flush=True)

    stop = threading.Event()
    lat, done = [], [0]
    lock = threading.Lock()

    def client(cid: int):
        n = 0
        while not stop.is_set():
            t = time.perf_counter()
            try:
                batcher.submit(req(cid * 1000 + n),
                               temperature=0.9 + 0.2 * (cid % 3)).result()
            except Exception:
                continue  # shed under overload — keep driving
            dt = time.perf_counter() - t
            n += 1
            with lock:
                lat.append(dt)
                done[0] += 1

    threads = [threading.Thread(target=client, args=(c,), daemon=True)
               for c in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    wall = time.perf_counter() - t0

    ls = np.sort(np.asarray(lat))
    st = batcher.stats
    print(f"clients={args.clients} window={wall:.1f}s  "
          f"completed={done[0]}  sustained={done[0] / wall:.2f} clips/s",
          flush=True)
    if len(ls):
        print(f"latency p50={ls[len(ls) // 2]:.2f}s "
              f"p95={ls[int(len(ls) * 0.95)]:.2f}s max={ls[-1]:.2f}s",
              flush=True)
    print(f"batches={st['batches']} batched_requests="
          f"{st['batched_requests']} (mean width "
          f"{st['batched_requests'] / max(st['batches'], 1):.1f}, max "
          f"{st['max_batch_size']}), shed={st['shed']}", flush=True)
    batcher.stop()


if __name__ == "__main__":
    main()
