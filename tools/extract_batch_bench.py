#!/usr/bin/env python
"""Aggregate feature-extraction throughput: per-clip vs cross-clip batched.

Measures ``Video2music.extract_features`` (one clip per call, chunks
dispatched inside the decode loop) against ``extract_features_batch``
(frames from K clips coalesced into shared CLIP/MaxViT programs — the
serving path under ``pipeline.serving.DynamicBatcher`` for requests
carrying raw videos). Reports seconds per clip and aggregate frames/s.

Matches-and-beats context: the reference runs ONE frame per CLIP forward
(``video2music.py:160-165``) and decodes the clip once per feature script.

    python tools/extract_batch_bench.py --clips 4 --seconds 30
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from e2e_timing import synthesize_video  # noqa: E402 (same tools/ dir)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=4)
    p.add_argument("--seconds", type=int, default=30)
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--size", default="640x360")
    p.add_argument("--out", default="/tmp/v2m_xbench")
    p.add_argument("--repeat", type=int, default=3)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from video2music_tpu.features.clip import CLIP, clip_vit_l14_336_config
    from video2music_tpu.features.maxvit import MaxViT, maxvit_t_config
    from video2music_tpu.pipeline.api import Video2music

    w, h = (int(v) for v in args.size.split("x"))
    os.makedirs(args.out, exist_ok=True)
    paths = []
    for i in range(args.clips):
        path = os.path.join(args.out, f"clip{i}.mp4")
        synthesize_video(path, args.seconds, args.fps, w, h,
                         n_scenes=3 + i % 3)
        paths.append(path)

    rng = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    clip_model = CLIP(cfg=clip_vit_l14_336_config())
    text = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1),
                                        (6, 768)), np.float32)
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        clip_params = jax.jit(
            lambda r, px, t: clip_model.init(
                r, px, t, method=CLIP.emotion_probs), device=cpu,
        )(rng, jnp.zeros((1, 336, 336, 3), jnp.float32),
          jnp.asarray(text))["params"]
        mv = MaxViT(cfg=maxvit_t_config())
        mv_params = jax.jit(mv.init, device=cpu)(
            jax.random.fold_in(rng, 2),
            jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
    print(f"extractor init: {time.perf_counter() - t0:.0f}s", flush=True)
    v2m = Video2music(motion_type=1, clip_params=clip_params,
                      emotion_text_embeds=text, maxvit_params=mv_params)

    n_frames = args.clips * int(args.seconds * args.fps)
    # warm both paths (compiles)
    v2m.extract_features(paths[0])
    v2m.extract_features_batch(paths[:2])

    for r in range(args.repeat):
        t0 = time.perf_counter()
        singles = [v2m.extract_features(p) for p in paths]
        t_serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        batched = v2m.extract_features_batch(paths)
        t_batch = time.perf_counter() - t0
        for s, b in zip(singles, batched):
            np.testing.assert_allclose(s["semantic"], b["semantic"],
                                       atol=2e-2)  # bf16 chunk-width drift
        print(f"rep {r}: serial {t_serial:.2f}s "
              f"({t_serial / args.clips:.2f}s/clip, "
              f"{n_frames / t_serial:.0f} frames/s)   "
              f"batched {t_batch:.2f}s ({t_batch / args.clips:.2f}s/clip, "
              f"{n_frames / t_batch:.0f} frames/s, "
              f"{t_serial / t_batch:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
