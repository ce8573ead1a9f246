#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step or the decode loop.

The TPU-native replacement for the reference's tracing story (per-batch
wall-clock prints + globally-enabled autograd anomaly mode, reference:
``utilities/run_model_vevo.py:29,182-193``, ``train.py:28``):

    python tools/profile_step.py --what train --out /tmp/v2m_trace
    python tools/profile_step.py --what decode --out /tmp/v2m_trace

View with TensorBoard's profile plugin or xprof. Also prints the compiled
step's FLOPs / bytes-accessed cost analysis (roofline inputs).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_batch(B=16, L=300):
    import jax.numpy as jnp
    from video2music_tpu.core.vocab import emotion_chord_targets

    rng = np.random.default_rng(0)
    rows = emotion_chord_targets()
    eid = rng.integers(0, 6, (B, L - 1))
    return dict(
        x=jnp.asarray(rng.integers(0, 157, (B, L - 1))),
        x_root=jnp.asarray(rng.integers(0, 13, (B, L - 1))),
        x_attr=jnp.asarray(rng.integers(0, 14, (B, L - 1))),
        tgt=jnp.asarray(rng.integers(0, 157, (B, L - 1))),
        tgt_emotion=jnp.asarray(rows[eid]),
        tgt_emotion_prob=jnp.asarray(
            rng.uniform(0.5, 1, (B, L - 1)).astype(np.float32)),
        semantic=jnp.asarray(
            rng.standard_normal((B, L, 768)).astype(np.float32)),
        key=jnp.ones((B, 1), jnp.float32),
        scene_offset=jnp.asarray(
            rng.integers(0, 30, (B, L)).astype(np.float32)),
        motion=jnp.asarray(
            rng.standard_normal((B, L, 512)).astype(np.float32)),
        emotion=jnp.asarray(rng.uniform(size=(B, L, 6)).astype(np.float32)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["train", "decode"], default="train")
    p.add_argument("--out", default="/tmp/v2m_trace")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--version", default="2.2")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from video2music_tpu.core.config import TrainConfig, amt_config
    from video2music_tpu.models import VideoMusicTransformer

    cfg = amt_config(args.version, total_vf_dim=1287)
    model = VideoMusicTransformer(cfg=cfg)
    batch = make_batch(args.batch_size)

    if args.what == "train":
        from video2music_tpu.train import (create_train_state,
                                           make_amt_train_step,
                                           make_optimizer)
        tcfg = TrainConfig(optimizer="adamw", lr=1e-4)
        tx = make_optimizer(tcfg, d_model=cfg.d_model)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_amt_train_step(model, tx, tcfg))
        compiled = step.lower(state, batch).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"flops: {ca.get('flops', 0)/1e9:.1f} GF   "
              f"bytes: {ca.get('bytes accessed', 0)/1e9:.2f} GB")
        state, m = step(state, batch)
        float(m["loss"])  # warm

        def run():
            nonlocal state
            for _ in range(args.steps):
                state, mm = step(state, batch)
            return float(mm["loss"])
    else:
        from video2music_tpu.decode.sampler import (GenerateConfig,
                                                    generate_chords)
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)}, batch["x"], batch["x_root"],
            batch["x_attr"], batch["semantic"], batch["key"],
            batch["scene_offset"], batch["motion"], batch["emotion"])
        primer = jnp.zeros((args.batch_size, 8), jnp.int32).at[:, 0].set(1)
        gcfg = GenerateConfig()
        gen = jax.jit(lambda v, f, s: generate_chords(
            model, v, semantic=f["semantic"], key=f["key"],
            scene_offset=f["scene_offset"], motion=f["motion"],
            emotion=f["emotion"], primer=primer, primer_root=primer,
            primer_attr=primer, num_primer=1, rng=jax.random.PRNGKey(s),
            gcfg=gcfg))
        np.asarray(gen(variables, batch, 0)["gen_seq"])  # warm

        def run():
            out = None
            for i in range(args.steps):
                out = gen(variables, batch, i + 1)
            return int(np.asarray(out["gen_seq"])[0, 5])

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
    print(f"{args.steps} {args.what} iterations in {dt:.2f}s "
          f"({dt/args.steps*1000:.1f} ms each); trace -> {args.out}")


if __name__ == "__main__":
    main()
