"""Measure what actually bounds the batched fused decode-attention kernel.

VERDICT r3 item 1: the B=32 fused step ran ~3x above its cache-read floor;
the named levers were int8/bucketed KV reads and bf16 attention
intermediates. Before plumbing int8 caches through the sampler, this probe
times the ATTENTION KERNEL IN ISOLATION (the unit all those levers act on)
on the real chip, across variants:

  bf16          — the shipped kernel's math (bf16 slabs, f32 softmax)
  int8          — int8 K/V slabs + per-row f32 scales folded into the
                  logits (k) and p_full (v) products: half the HBM cache
                  bytes, same math up to quantization
  floor         — a copy-only kernel that just reads the same slabs and
                  reduces them (the pure HBM-traffic lower bound)
  noattn        — the kernel with the two slab reads removed (weights/
                  QKV/cross only): the non-cache share of the cell

Each timed by an N-iteration fori_loop around the pallas_call with one
fetch (tunnel RTT excluded by construction). Prints a JSON summary; decide
from the numbers whether int8-KV plumbing pays or record the negative
result + accounting in BACKLOG.

Run from /root/repo; ONE TPU process at a time.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

sys.path.insert(0, ".")

from video2music_tpu.ops.pallas_decode import NEG_INF, _head_map
from video2music_tpu.ops.pallas_decode_batch import _row_map

B, S, D, H = 32, 300, 512, 8
BLOCK_B = 8
VMEM_LIMIT = 48 * 1024 * 1024


def _attend_core(q, k_slab, v_slab, seg, *, pos, k_scale=None,
                 v_scale=None):
    rows = k_slab.shape[0]
    Bb = rows // seg
    hd = D // H
    R = _head_map(D, H)
    M = _row_map(rows, seg, Bb)
    cd = jnp.bfloat16
    qx = jnp.dot(M.astype(cd), q.astype(cd),
                 preferred_element_type=jnp.float32)
    prod = qx * k_slab.astype(jnp.float32)
    logits = jnp.dot(prod.astype(cd), R.astype(cd),
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    if k_scale is not None:
        logits = logits * k_scale
    in_seg = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) % seg
    logits = jnp.where(in_seg <= pos, logits, NEG_INF)
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.dot(M.T, p, preferred_element_type=jnp.float32)
    p = p / jnp.dot(M, denom, preferred_element_type=jnp.float32)
    p_full = jnp.dot(p, R.T, preferred_element_type=jnp.float32)
    if v_scale is not None:
        p_full = p_full * v_scale
    pv = p_full * v_slab.astype(jnp.float32)
    return jnp.dot(M.astype(cd).T, pv.astype(cd),
                   preferred_element_type=jnp.float32)


def _kernel(pos_ref, q_ref, k_ref, v_ref, *rest, mode):
    if mode == "int8":
        ks_ref, vs_ref, o_ref = rest
    else:
        (o_ref,) = rest
    pos = pos_ref[0]
    q = q_ref[:].astype(jnp.float32)
    if mode == "floor":
        # pure traffic: touch every slab byte, one cheap reduction
        o_ref[:] = (jnp.sum(k_ref[:].astype(jnp.float32), axis=0,
                            keepdims=True)
                    + jnp.sum(v_ref[:].astype(jnp.float32), axis=0,
                              keepdims=True)
                    + q).astype(o_ref.dtype)[:q.shape[0]]
        return
    if mode == "noattn":
        # everything except the slab reads: self-product stand-in
        o_ref[:] = (q * 1.0001).astype(o_ref.dtype)
        return
    ks = rest[0][:] if mode == "int8" else None
    vs = rest[1][:] if mode == "int8" else None
    out = _attend_core(q, k_ref[:], v_ref[:], S, pos=pos,
                       k_scale=ks, v_scale=vs)
    o_ref[:] = out.astype(o_ref.dtype)


def build(mode):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    if mode == "int8":
        k = jnp.asarray(rng.integers(-127, 128, (B * S, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (B * S, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (B * S, 1)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (B * S, 1)), jnp.float32)
        extra = [ks, vs]
    else:
        k = jnp.asarray(rng.standard_normal((B * S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B * S, D)), jnp.bfloat16)
        extra = []

    grid = (B // BLOCK_B,)
    slab = lambda w, dt: pl.BlockSpec((BLOCK_B * S, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    rowb = pl.BlockSpec((BLOCK_B, D), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), rowb,
                slab(D, k.dtype), slab(D, v.dtype)]
    if mode == "int8":
        in_specs += [slab(1, jnp.float32), slab(1, jnp.float32)]

    call = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
        in_specs=in_specs,
        out_specs=rowb,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
    )

    def run_n(q, k, v, extra, n):
        def body(i, acc):
            pos = jnp.asarray(S - 1, jnp.int32).reshape(1)
            out = call(pos, acc, k, v, *extra)
            return out
        return jax.lax.fori_loop(0, n, body, q)

    jitted = jax.jit(run_n, static_argnums=(4,))
    return jitted, (q, k, v, extra)


def time_mode(mode, n=300, reps=3):
    jitted, (q, k, v, extra) = build(mode)
    np.asarray(jitted(q, k, v, extra, 8))  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jitted(q, k, v, extra, n))
        ts.append((time.perf_counter() - t0) / n)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    out = {}
    for mode in ("bf16", "int8", "floor", "noattn"):
        try:
            us = time_mode(mode) * 1e6
        except Exception as exc:  # noqa: BLE001 — record which lowering failed
            out[mode] = f"FAILED: {type(exc).__name__}: {str(exc)[:200]}"
            print(f"{mode}: FAILED {exc}", flush=True)
            continue
        out[mode] = round(us, 1)
        print(f"{mode}: {us:.1f} us/kernel-call (B={B}, S={S}, D={D})",
              flush=True)
    # context: bytes per call
    bf16_bytes = 2 * B * S * D * 2
    int8_bytes = B * S * D * 2 + B * S * 2 * 4
    out["slab_bytes_bf16"] = bf16_bytes
    out["slab_bytes_int8"] = int8_bytes
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
