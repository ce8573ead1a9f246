"""Fused Pallas attention kernel for TPU.

One kernel serves the framework's attention flavors (the epilogues —
RPR bias, differential-pair subtraction, GQA head broadcast — are applied
by the caller, see ops/attention.py): it computes
``softmax(q k^T / sqrt(d) + bias + causal_mask) v`` with the whole
(logits -> softmax -> weighted sum) pipeline fused in VMEM, replacing the
reference's four torch attention forks that materialize (L, S) probability
tensors in HBM (reference: model/rpr.py:387-414,
model/custom_transformer.py:1150-1208, model/grouped_query_attention.py).

Shapes here are small (L, S <= 300 padded to lane multiples), so each
(batch*head, q-block) grid cell holds its full K/V panel in VMEM — no
streaming passes needed; the win is fusion (no HBM round-trip for the
(L, S) weights) and fp32 softmax on the VPU with matmuls on the MXU.

``flash_attention`` pads to (128, 128)-aligned tiles, masks padding, and
falls back to the jnp path automatically off-TPU (tests run the kernel in
interpreter mode).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float,
                 causal: bool, q_block: int, kv_len: int):
    qi = pl.program_id(1)
    q = q_ref[0]  # (Bq, d)
    k = k_ref[0]  # (S, d)
    v = v_ref[0]  # (S, d)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Bq, S)
    if bias_ref is not None:
        logits = logits + bias_ref[0].astype(jnp.float32)
    S = logits.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = cols < kv_len
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        valid = jnp.logical_and(valid, cols <= rows + qi * q_block)
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    out_ref[0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def flash_attention(q, k, v, *, bias=None, causal: bool = False,
                    interpret: bool = False):
    """Fused attention (differentiable).

    Forward runs the Pallas kernel; backward rematerializes through the jnp
    reference (custom VJP) — exact gradients at one extra forward's cost,
    the standard flash-attention remat trade.

    Args:
      q: (B, H, L, D); k, v: (B, H, S, D) (same head count — do GQA
        broadcasting before the call); bias: optional (B, H, L, S) additive
        logits bias (RPR skew, etc.).
    Returns:
      (B, H, L, D) attention output in q's dtype.
    """
    if causal and q.shape[2] != k.shape[2]:
        # The Pallas kernel's causal mask is start-aligned while the jnp
        # fallback/backward is end-aligned; they only agree when L == S.
        raise ValueError(
            f"causal flash_attention requires L == S, got L={q.shape[2]} "
            f"S={k.shape[2]} (use an explicit bias mask for L != S)")
    if bias is None:
        return _flash_nobias(q, k, v, causal, interpret)
    return _flash_bias(q, k, v, bias, causal, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_nobias(q, k, v, causal, interpret):
    return _flash_forward(q, k, v, None, causal, interpret)


def _flash_nobias_fwd(q, k, v, causal, interpret):
    return _flash_nobias(q, k, v, causal, interpret), (q, k, v)


def _flash_nobias_bwd(causal, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: reference_attention(q_, k_, v_, causal=causal),
        q, k, v)
    return vjp(g)


_flash_nobias.defvjp(_flash_nobias_fwd, _flash_nobias_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_bias(q, k, v, bias, causal, interpret):
    return _flash_forward(q, k, v, bias, causal, interpret)


def _flash_bias_fwd(q, k, v, bias, causal, interpret):
    return _flash_bias(q, k, v, bias, causal, interpret), (q, k, v, bias)


def _flash_bias_bwd(causal, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: reference_attention(q_, k_, v_, bias=b_,
                                                   causal=causal),
        q, k, v, bias)
    return vjp(g)


_flash_bias.defvjp(_flash_bias_fwd, _flash_bias_bwd)


def _flash_forward(q, k, v, bias, causal: bool, interpret: bool):
    B, H, L, D = q.shape
    S = k.shape[2]
    scale = D ** -0.5

    q_block = min(128, _round_up(L, 8))
    Lp = _round_up(L, q_block)
    Sp = _round_up(S, 128)
    Dp = _round_up(D, 128)

    pad4 = lambda x, l, d: jnp.pad(
        x, ((0, 0), (0, 0), (0, l - x.shape[2]), (0, d - x.shape[3])))
    qp = pad4(q, Lp, Dp).reshape(B * H, Lp, Dp)
    kp = pad4(k, Sp, Dp).reshape(B * H, Sp, Dp)
    vp = pad4(v, Sp, Dp).reshape(B * H, Sp, Dp)

    grid = (B * H, Lp // q_block)
    in_specs = [
        pl.BlockSpec((1, q_block, Dp), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        bp = jnp.pad(bias, ((0, 0), (0, 0), (0, Lp - L), (0, Sp - S)))
        args.append(bp.reshape(B * H, Lp, Sp))
        in_specs.append(pl.BlockSpec((1, q_block, Sp), lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM))
        kernel = functools.partial(_attn_kernel, scale=scale, causal=causal,
                                   q_block=q_block, kv_len=S)
        wrapped = kernel
    else:
        base = functools.partial(_attn_kernel, scale=scale, causal=causal,
                                 q_block=q_block, kv_len=S)
        wrapped = lambda q_, k_, v_, o_: base(q_, k_, v_, None, o_)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_block, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, Lp, Dp)[:, :, :L, :D]


def reference_attention(q, k, v, *, bias=None, causal: bool = False):
    """jnp oracle with identical semantics (used by tests and as the
    non-TPU fallback)."""
    D = q.shape[-1]
    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    if bias is not None:
        logits = logits + bias
    if causal:
        L, S = logits.shape[-2:]
        mask = jnp.arange(S)[None, :] <= jnp.arange(L)[:, None] + (S - L)
        logits = jnp.where(mask[None, None], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bhsd->bhld", w, v)
