#!/usr/bin/env python
"""End-to-end product-pipeline wall-clock on real hardware.

Times the full ``Video2music.generate(video)`` path — host video decode,
batched CLIP semantic+emotion, scene detection, MaxViT motion, the one
compiled decode+regression program, and host MIDI rendering — on a
synthetic N-second clip (reference flow: ``video2music.py:661-1053``,
which runs CLIP/MaxViT one frame at a time and re-forwards the decoder
per token). Feature-extractor weights are RANDOM unless checkpoints are
passed: timing is architecture-true either way; outputs are musical
nonsense with random weights.

    python tools/e2e_timing.py --seconds 60 --fps 24 --size 640x360
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthesize_video(path: str, seconds: int, fps: float, w: int, h: int,
                     n_scenes: int = 6) -> None:
    """Multi-scene moving-gradient clip (scene cuts exercise the
    detector)."""
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        raise RuntimeError("cv2.VideoWriter could not open " + path)
    n = int(seconds * fps)
    rng = np.random.default_rng(0)
    base = [rng.integers(0, 255, 3) for _ in range(n_scenes)]
    xs = np.linspace(0, 2 * np.pi, w, dtype=np.float32)[None, :, None]
    for i in range(n):
        scene = min(i * n_scenes // n, n_scenes - 1)
        phase = 2 * np.pi * i / fps
        wave = (np.sin(xs + phase) * 0.5 + 0.5)
        img = (wave * np.asarray(base[scene], np.float32)).astype(np.uint8)
        writer.write(np.broadcast_to(img, (h, w, 3)).copy())
    writer.release()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=int, default=60)
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--size", default="640x360")
    p.add_argument("--video", default=None,
                   help="existing clip instead of the synthetic one")
    p.add_argument("--out", default="/tmp/v2m_e2e")
    p.add_argument("--repeat", type=int, default=2,
                   help="time this many full runs (first includes compile)")
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

    video = args.video
    if video is None:
        w, h = (int(v) for v in args.size.split("x"))
        video = os.path.join(args.out, "synthetic.mp4")
        os.makedirs(args.out, exist_ok=True)
        t0 = time.perf_counter()
        synthesize_video(video, args.seconds, args.fps, w, h)
        print(f"synth video: {args.seconds}s @{args.fps}fps {w}x{h} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    clip_model = CLIP(cfg=clip_vit_l14_336_config())
    text_embeds = np.asarray(
        jax.random.normal(jax.random.fold_in(rng, 1), (6, 768)), np.float32)
    # init on the host CPU: random weights don't need a TPU compile of the
    # init program (real deployments load converted checkpoints anyway).
    # init through emotion_probs: creates the vision tower + logit scale
    # (the text tower is unused at serving time — embeddings are
    # precomputed, reference: video2music.py:189-198)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        clip_params = jax.jit(
            lambda r, p, t: clip_model.init(r, p, t,
                                            method=CLIP.emotion_probs),
            device=cpu,
        )(rng, jnp.zeros((1, 336, 336, 3), jnp.float32),
          jnp.asarray(text_embeds))["params"]
        mv = MaxViT(cfg=maxvit_t_config())
        maxvit_params = jax.jit(mv.init, device=cpu)(
            jax.random.fold_in(rng, 2),
            jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
    print(f"extractor init (random weights, host): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    v2m = Video2music(motion_type=1, clip_params=clip_params,
                      emotion_text_embeds=text_embeds,
                      maxvit_params=maxvit_params)

    for r in range(args.repeat):
        t0 = time.perf_counter()
        feats = v2m.extract_features(video)
        t_feat = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = v2m.generate(primer="C Am F G", key="C major",
                           features=feats,
                           output_dir=os.path.join(args.out, f"run{r}"))
        t_gen = time.perf_counter() - t0
        tag = "cold (incl. compile)" if r == 0 else "warm"
        stages = "  ".join(f"{k}={v:.2f}" for k, v in
                           getattr(v2m, "last_extract_timings", {}).items())
        print(f"run {r} [{tag}]: features {t_feat:.2f}s + "
              f"generate+render {t_gen:.2f}s = {t_feat + t_gen:.2f}s "
              f"({len(res.chords)} chords, midi={res.midi_path})\n"
              f"  feature stages: {stages}", flush=True)


if __name__ == "__main__":
    main()
