#!/usr/bin/env python
"""Measure the train step's input-bound fraction at production size.

Answers: does host batch assembly + H2D transfer add wall-clock on top of
the ~54 ms/step device time at B=16 (full AMT 2.2, bf16, donated state),
and does ``data.loader.device_prefetch`` hide it? Three configurations
over the SAME jitted step (reference comparison point: torch
``DataLoader(num_workers=4, pin_memory-less)``, train.py:132-134):

  A. device-resident — one pre-staged batch, N steps (pure compute floor);
  B. naive host feed — a fresh numpy batch ``jax.device_put`` per step,
     synchronously before each dispatch (no overlap);
  C. prefetch feed — the same numpy batches through ``device_prefetch``
     (H2D for batch i+1 dispatched while step i computes) — what
     ``train/loop.py:_epoch_pass`` actually does.

All three time N steps with ONE final loss fetch (slope method not needed:
the fixed fetch RTT is identical across configurations and amortized over
N). Prints ms/step for each + the input-bound fraction (B-A)/A and what
prefetch recovers.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def host_batches(n, B=16, L=300, seed=0):
    """n distinct numpy batches (pre-built: host RNG cost is NOT what is
    being measured — the loader's thread pool hides assembly; transfer
    and staging are the question)."""
    from video2music_tpu.core.vocab import emotion_chord_targets

    rng = np.random.default_rng(seed)
    rows = emotion_chord_targets()
    out = []
    for _ in range(n):
        eid = rng.integers(0, 6, (B, L - 1))
        out.append(dict(
            x=rng.integers(0, 157, (B, L - 1)),
            x_root=rng.integers(0, 13, (B, L - 1)),
            x_attr=rng.integers(0, 14, (B, L - 1)),
            tgt=rng.integers(0, 157, (B, L - 1)),
            tgt_emotion=rows[eid],
            tgt_emotion_prob=rng.uniform(0.5, 1, (B, L - 1)).astype(
                np.float32),
            semantic=rng.standard_normal((B, L, 768)).astype(np.float32),
            key=np.ones((B, 1), np.float32),
            scene_offset=rng.integers(0, 30, (B, L)).astype(np.float32),
            motion=rng.standard_normal((B, L, 512)).astype(np.float32),
            emotion=rng.uniform(size=(B, L, 6)).astype(np.float32)))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video2music_tpu.core.config import TrainConfig, amt_config
    from video2music_tpu.data.loader import device_prefetch
    from video2music_tpu.models import VideoMusicTransformer
    from video2music_tpu.train import (create_train_state,
                                       make_amt_train_step, make_optimizer)

    cfg = amt_config("2.2", total_vf_dim=1287)
    model = VideoMusicTransformer(cfg=cfg)
    batches = host_batches(args.steps, args.batch_size)
    nbytes = sum(v.nbytes for v in batches[0].values())
    print(f"batch: {nbytes / 1e6:.0f} MB host-side", flush=True)

    tcfg = TrainConfig(optimizer="adamw", lr=1e-4, mixed_precision=True)
    tx = make_optimizer(tcfg, d_model=cfg.d_model)
    staged0 = jax.device_put(batches[0])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), staged0)
    step = jax.jit(make_amt_train_step(model, tx, tcfg),
                   donate_argnums=(0,))
    state, m = step(state, staged0)
    float(m["loss"])  # compile + warm

    def timed(feed):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for b in feed:
            state, m = step(state, b)
        float(m["loss"])
        return (time.perf_counter() - t0) / args.steps * 1000

    from video2music_tpu.train.step import wire_bf16_batch

    # warm the bf16-input program variant (wire_bf16_batch changes the
    # float input avals -> one extra compile)
    state, m = step(state, jax.device_put(wire_bf16_batch(batches[0])))
    float(m["loss"])

    staged = jax.device_put(batches[0])
    legs = {
        "A device-resident": lambda: (staged for _ in range(args.steps)),
        "B naive f32 feed": lambda: (jax.device_put(bb) for bb in batches),
        "C prefetch f32": lambda: device_prefetch(iter(batches)),
        "D naive bf16 wire": lambda: (
            jax.device_put(wire_bf16_batch(bb)) for bb in batches),
        "E prefetch bf16 wire": lambda: device_prefetch(
            (wire_bf16_batch(bb) for bb in batches)),
    }
    # two passes each, keep the better (shakes one-off effects)
    results = {k: min(timed(mk()), timed(mk())) for k, mk in legs.items()}
    a = results["A device-resident"]
    for name, t in results.items():
        extra = f"  (input adds {(t - a) / a * 100:.0f}%)" if t > a else ""
        print(f"{name}: {t:.1f} ms/step{extra}")


if __name__ == "__main__":
    main()
