"""Fused attention with IN-KERNEL dropout — forward and backward in Pallas.

This is the training-path kernel the jnp attention cannot match: torch (and
the jnp fallback) materialize the (B, H, L, S) probability tensor, apply
dropout to it, and save it for backward — at B=16, L=300 that tensor is the
train step's dominant HBM traffic (measured: step is bandwidth-bound at
~80% of peak). Here

  * the forward computes softmax + dropout entirely in VMEM using the TPU
    PRNG (``pltpu.prng_seed`` / ``prng_random_bits``) and writes ONLY the
    (L, D) output;
  * the backward is a second Pallas kernel that RE-GENERATES the identical
    dropout mask from the same per-cell seed and recomputes the softmax,
    producing dq/dk/dv (and the bias gradient via dlogits) without the
    probability tensor ever being stored;
  * a ``jax.custom_vjp`` stitches them together.

Sequence lengths here are <= 300 (padded to 384), so one (batch*head) grid
cell holds the full panel in VMEM — no streaming passes needed.

Mask regeneration contract: the forward seeds the PRNG as
``seed + cell_index`` per (batch*head, q-block) cell and draws one
(q_block, Sp) uint32 tile per q-block; the backward replays the same
sequence. Tests verify gradients exactly against a jnp oracle driven by the
extracted mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _probs_block(q, k, bias, *, scale, causal, row0, kv_len):
    """(Bq, Sp) softmax probabilities for one q block (f32)."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = cols < kv_len
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        valid = jnp.logical_and(valid, cols <= rows + row0)
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _drop_mask(shape, rate: float, seed, bh, row0: int):
    """Counter-based dropout keep-mask, scaled by 1/(1-rate).

    Bits come from a murmur3-style integer hash of (seed, batch*head index,
    absolute row, column) — deterministic by construction, so the backward
    kernel replays the identical mask with zero bookkeeping, and the same
    code runs on hardware and in the CPU interpreter (whose pltpu PRNG is
    stubbed to zeros). Avalanche quality is ample for dropout.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (rows * jnp.uint32(0x9E3779B1)
         ^ cols * jnp.uint32(0x85EBCA6B)
         ^ (jnp.uint32(seed) + jnp.uint32(bh) * jnp.uint32(0xC2B2AE35)))
    # fmix32 finalizer
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(rate, 1.0) * 0xFFFFFFFF)
    keep = x > threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                scale, causal, q_block, kv_len, rate):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    w = _probs_block(q_ref[0], k_ref[0],
                     None if bias_ref is None else bias_ref[0],
                     scale=scale, causal=causal, row0=qi * q_block,
                     kv_len=kv_len)
    if rate > 0.0:
        w = w * _drop_mask(w.shape, rate, seed_ref[0], bh, qi * q_block)
    out_ref[0] = jax.lax.dot_general(
        w.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale, causal, q_block, kv_len, rate, n_q):
    """One (batch*head) cell: full-panel backward with mask replay."""
    bh = pl.program_id(0)
    q = q_ref[0]          # (Lp, D)
    k = k_ref[0]          # (Sp, D)
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    Lp = q.shape[0]

    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)

    for qi in range(n_q):  # static unroll; row offsets are python ints
        r0, r1 = qi * q_block, (qi + 1) * q_block
        qb = q[r0:r1]
        bias_b = None if bias_ref is None else bias_ref[0, r0:r1]
        w = _probs_block(qb, k, bias_b, scale=scale, causal=causal,
                         row0=qi * q_block, kv_len=kv_len)  # (Bq, Sp) f32
        if rate > 0.0:
            mask = _drop_mask(w.shape, rate, seed_ref[0], bh, qi * q_block)
        else:
            mask = 1.0
        wd = w * mask
        do_b = do[r0:r1]
        # dv += wd^T @ do
        dv_acc = dv_acc + jax.lax.dot_general(
            wd, do_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d(wd) = do @ v^T ; dw = d(wd) * mask ; softmax backward
        dwd = jax.lax.dot_general(
            do_b, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw = dwd * mask
        dlogits = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        if dbias_ref is not None:
            dbias_ref[0, r0:r1] = dlogits.astype(dbias_ref.dtype)
        # dq = dlogits @ k * scale ; dk += dlogits^T @ q * scale
        dq_ref[0, r0:r1] = (jax.lax.dot_general(
            dlogits, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            dlogits, qb.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _pad_inputs(q, k, v, bias):
    B, H, L, D = q.shape
    S = k.shape[2]
    q_block = min(128, _round_up(L, 8))
    Lp = _round_up(L, q_block)
    Sp = _round_up(S, 128)
    # v's feature dim may differ from q/k's (extract_dropped_probs feeds
    # identity values); pad both to a common lane multiple
    Dp = _round_up(max(D, v.shape[3]), 128)
    pad4 = lambda x, l, d: jnp.pad(
        x, ((0, 0), (0, 0), (0, l - x.shape[2]), (0, d - x.shape[3])))
    qp = pad4(q, Lp, Dp).reshape(B * H, Lp, Dp)
    kp = pad4(k, Sp, Dp).reshape(B * H, Sp, Dp)
    vp = pad4(v, Sp, Dp).reshape(B * H, Sp, Dp)
    bp = None
    if bias is not None:
        bp = jnp.pad(bias, ((0, 0), (0, 0), (0, Lp - L), (0, Sp - S)))
        bp = bp.reshape(B * H, Lp, Sp)
    return qp, kp, vp, bp, (q_block, Lp, Sp, Dp)


def _fwd_call(q, k, v, bias, seed, causal, rate, interpret):
    B, H, L, D = q.shape
    S = k.shape[2]
    scale = D ** -0.5
    qp, kp, vp, bp, (q_block, Lp, Sp, Dp) = _pad_inputs(q, k, v, bias)
    n_q = Lp // q_block
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (B * H, n_q)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, q_block, Dp), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [seed_arr, qp, kp, vp]
    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               q_block=q_block, kv_len=S, rate=rate)
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, q_block, Sp),
                                     lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bp)
        wrapped = lambda s, q_, k_, v_, b_, o_: kernel(s, q_, k_, v_, b_, o_)
    else:
        wrapped = lambda s, q_, k_, v_, o_: kernel(s, q_, k_, v_, None, o_)
    out = pl.pallas_call(
        wrapped, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_block, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, Lp, Dp)[:, :, :L, :v.shape[3]]


def _bwd_call(q, k, v, bias, seed, causal, rate, interpret, do):
    B, H, L, D = q.shape
    S = k.shape[2]
    scale = D ** -0.5
    qp, kp, vp, bp, (q_block, Lp, Sp, Dp) = _pad_inputs(q, k, v, bias)
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - D)))
    dop = dop.reshape(B * H, Lp, Dp)
    n_q = Lp // q_block
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (B * H,)
    vmem = lambda shape: pl.BlockSpec((1,) + shape, lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                vmem((Lp, Dp)), vmem((Sp, Dp)), vmem((Sp, Dp))]
    args = [seed_arr, qp, kp, vp]
    out_shapes = [jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype),
                  jax.ShapeDtypeStruct((B * H, Sp, Dp), k.dtype),
                  jax.ShapeDtypeStruct((B * H, Sp, Dp), v.dtype)]
    out_specs = [vmem((Lp, Dp)), vmem((Sp, Dp)), vmem((Sp, Dp))]
    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               q_block=q_block, kv_len=S, rate=rate, n_q=n_q)
    if bias is not None:
        in_specs.append(vmem((Lp, Sp)))
        args.append(bp)
        out_shapes.append(jax.ShapeDtypeStruct((B * H, Lp, Sp), jnp.float32))
        out_specs.append(vmem((Lp, Sp)))
        wrapped = lambda s, q_, k_, v_, b_, do_, dq_, dk_, dv_, db_: kernel(
            s, q_, k_, v_, b_, do_, dq_, dk_, dv_, db_)
    else:
        wrapped = lambda s, q_, k_, v_, do_, dq_, dk_, dv_: kernel(
            s, q_, k_, v_, None, do_, dq_, dk_, dv_, None)
    in_specs.append(vmem((Lp, Dp)))
    args.append(dop)
    outs = pl.pallas_call(
        wrapped, grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes), interpret=interpret,
    )(*args)
    dq = outs[0].reshape(B, H, Lp, Dp)[:, :, :L, :D]
    dk = outs[1].reshape(B, H, Sp, Dp)[:, :, :S, :D]
    dv = outs[2].reshape(B, H, Sp, Dp)[:, :, :S, :D]
    dbias = None
    if bias is not None:
        dbias = outs[3].reshape(B, H, Lp, Sp)[:, :, :L, :S]
        dbias = dbias.astype(bias.dtype)
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# custom_vjp wrappers (bias / no-bias variants to keep pytrees static)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fa_nobias(q, k, v, seed, causal, rate, interpret):
    return _fwd_call(q, k, v, None, seed, causal, rate, interpret)


def _fa_nobias_fwd(q, k, v, seed, causal, rate, interpret):
    return _fa_nobias(q, k, v, seed, causal, rate, interpret), (q, k, v, seed)


def _fa_nobias_bwd(causal, rate, interpret, res, g):
    q, k, v, seed = res
    dq, dk, dv, _ = _bwd_call(q, k, v, None, seed, causal, rate, interpret, g)
    return dq, dk, dv, None


_fa_nobias.defvjp(_fa_nobias_fwd, _fa_nobias_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fa_bias(q, k, v, bias, seed, causal, rate, interpret):
    return _fwd_call(q, k, v, bias, seed, causal, rate, interpret)


def _fa_bias_fwd(q, k, v, bias, seed, causal, rate, interpret):
    return (_fa_bias(q, k, v, bias, seed, causal, rate, interpret),
            (q, k, v, bias, seed))


def _fa_bias_bwd(causal, rate, interpret, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv, dbias = _bwd_call(q, k, v, bias, seed, causal, rate,
                                  interpret, g)
    return dq, dk, dv, dbias, None


_fa_bias.defvjp(_fa_bias_fwd, _fa_bias_bwd)


def flash_attention_dropout(q, k, v, *, bias=None, causal=False,
                            dropout_rate=0.0, seed=0, interpret=False):
    """Training-path fused attention: softmax + dropout + output in one
    kernel, full Pallas backward with mask replay. ``seed`` is an int32
    scalar (array or python int) deriving the dropout mask."""
    if causal and q.shape[2] != k.shape[2]:
        # Same L == S requirement as flash_attention: the kernel's causal
        # mask is start-aligned, the jnp fallback is end-aligned.
        raise ValueError(
            f"causal flash_attention_dropout requires L == S, got "
            f"L={q.shape[2]} S={k.shape[2]}")
    if bias is None:
        return _fa_nobias(q, k, v, seed, causal, float(dropout_rate),
                          interpret)
    return _fa_bias(q, k, v, bias, seed, causal, float(dropout_rate),
                    interpret)


def extract_dropped_probs(q, k, *, bias=None, causal=False,
                          dropout_rate=0.0, seed=0, interpret=False):
    """TEST ONLY: materialize the post-dropout probability matrix by running
    the forward kernel against identity 'values'. Lets tests reconstruct the
    exact mask the kernel drew."""
    B, H, L, D = q.shape
    S = k.shape[2]
    eye = jnp.broadcast_to(jnp.eye(S, dtype=q.dtype), (B, H, S, S))
    # value dim must carry S columns: pad/reshape via D=S 'values'
    out = _fwd_call(q, k, eye, bias, seed, causal, float(dropout_rate),
                    interpret)
    return out  # (B, H, L, S) == dropped probabilities
