"""Unified multi-head attention for every variant in the framework.

The reference carries four forked attention implementations totalling ~1.7k
lines: RPR attention (model/rpr.py:201-424), CustomMultiheadAttention with
RoPE (model/custom_transformer.py:51-321,864-1218), grouped-query attention
(model/grouped_query_attention.py:19-358) and differential attention
(model/custom_transformer.py:610-834). On TPU they are all the same fused
softmax-attention kernel with different epilogues, so they collapse into one
module parameterized by :class:`~video2music_tpu.core.config.AttentionConfig`:

  * ``kind="rpr"``          adds the Shaw/Huang relative bias (ops/rpr.py)
  * ``kind="differential"`` computes 2H query/key heads and subtracts the
                            paired softmax maps with the learned lambda
  * ``rope=True``           rotates q/k per head (ops/embeddings.py)
  * ``kv_heads < num_heads``  grouped-query attention via KV head broadcast

Two execution modes:
  * full-sequence (training / encoder) — one dense attention over (L, S)
  * KV-cached decode — query length 1, cache buffers carried in the flax
    "cache" variable collection; cross-attention K/V are computed once at
    cache-prime time instead of once per token (the reference re-runs the
    FULL prefix forward per generated token with no cache at all,
    model/video_music_transformer.py:1069-1071).

Documented deviation from the reference: DifferentialMultiheadAttention's
output reshape (custom_transformer.py:823-825) applies ``view(tgt_len, bsz,
H*hd)`` to a ``(bsz, H, tgt_len, hd)`` tensor without transposing first,
which scrambles sequence positions into feature channels (and breaks decoder
causality). We perform the correct transpose-then-reshape.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import AttentionConfig
from .embeddings import apply_rope
from .norms import RMSNorm
from .rpr import rpr_bias_decode, rpr_bias_full

NEG_INF = -1e9


def lambda_init_fn(depth: int) -> float:
    """DIFF-Transformer lambda schedule (reference:
    custom_transformer.py:607-608)."""
    return 0.8 - 0.6 * math.exp(-0.3 * depth)


def _use_pallas() -> bool:
    import os
    flag = os.environ.get("V2M_USE_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


def dot_product_attention(q, k, v, *, bias=None, mask=None, causal=False,
                          dropout_rng=None, dropout_rate=0.0):
    """Core attention: q (B,H,L,D), k (B,Hk,S,D), v (B,Hv,S,D).

    Hk and Hv may divide H (GQA / differential pairing), in which case each
    group of H/Hk (H/Hv) consecutive query heads shares one key (value)
    head. ``bias`` is added to the scaled logits; ``mask`` is boolean
    (True = may attend); ``causal=True`` is the structured form of the
    causal mask and enables the fused Pallas kernel on TPU.
    """
    H, D = q.shape[1], q.shape[-1]
    if k.shape[1] != H:
        k = jnp.repeat(k, H // k.shape[1], axis=1)
    if v.shape[1] != H:
        v = jnp.repeat(v, H // v.shape[1], axis=1)

    # Fused Pallas paths: full-sequence, no irregular mask.
    if mask is None and q.shape[2] > 1 and _use_pallas():
        if dropout_rate == 0.0:
            from .pallas_attention import flash_attention
            out = flash_attention(q, k, v, bias=bias, causal=causal)
            return out, None
        if dropout_rng is not None:
            # training path: softmax + dropout + output fused in VMEM,
            # full Pallas backward with deterministic mask replay — the
            # (B, H, L, S) probability tensor never reaches HBM.
            from .pallas_attention_dropout import flash_attention_dropout
            seed = jax.random.randint(dropout_rng, (), 0, 2 ** 31 - 1)
            out = flash_attention_dropout(
                q, k, v, bias=bias, causal=causal,
                dropout_rate=dropout_rate, seed=seed)
            return out, None

    logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (D ** -0.5)
    if bias is not None:
        logits = logits + bias
    if causal:
        L, S = logits.shape[-2:]
        cmask = jnp.arange(S)[None, :] <= jnp.arange(L)[:, None] + (S - L)
        logits = jnp.where(cmask[None, None], logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhls,bhsd->bhld", weights, v), weights


def causal_mask(L: int, S: int):
    """True where key j may be attended by query l (j - l <= S - L)."""
    offset = S - L
    rows = jnp.arange(L)[:, None]
    cols = jnp.arange(S)[None, :]
    return cols <= rows + offset


class MultiHeadAttention(nn.Module):
    """One attention module serving vanilla / RPR / RoPE / GQA / differential.

    ``__call__`` modes:
      - "full": dense attention over the whole sequence (training/encoder).
      - "prime" (cross-attention only): project encoder memory K/V into the
        "cache" collection; returns None.
      - "step": single-query decode. Self-attention writes the new K/V at
        ``decode_pos`` into its rolling cache; cross-attention reads the
        primed memory K/V.
    """

    cfg: AttentionConfig
    d_model: int
    is_cross: bool = False
    dropout_rate: float = 0.0
    depth: int = 0  # layer index, used by differential lambda init
    max_cache_len: int = 300
    # RoPE table length for QUERY positions. Cross-attention queries are
    # chord positions (0..max_seq_chord-1) while its K/V cache is memory
    # rows (max_seq_video), so the two lengths differ whenever the configs
    # do; rope_cache values per position do not depend on table length, so
    # oversizing is bit-exact. 0 = same as max_cache_len.
    max_query_len: int = 0
    remat: bool = False  # checkpoint the attention core (see AMTConfig)

    @nn.compact
    def __call__(self, query, key_value=None, *, causal=False,
                 deterministic=True, mode="full", decode_pos=None):
        cfg = self.cfg
        H = cfg.num_heads
        hd = self.d_model // H
        diff = cfg.kind == "differential"
        q_heads = 2 * H if diff else H
        kv_heads = cfg.kv_heads or H
        k_heads = 2 * kv_heads if diff else kv_heads

        dense = lambda feats, name: nn.Dense(
            feats, use_bias=cfg.bias, name=name,
            kernel_init=nn.initializers.xavier_uniform())
        q_proj = dense(q_heads * hd, "q_proj")
        k_proj = dense(k_heads * hd, "k_proj")
        v_proj = dense(kv_heads * hd, "v_proj")
        out_proj = dense(self.d_model, "out_proj")

        def split_heads(x, n):
            B, L, _ = x.shape
            return x.reshape(B, L, n, hd).transpose(0, 2, 1, 3)  # (B,n,L,hd)

        def project_kv(x):
            k = split_heads(k_proj(x), k_heads)
            v = split_heads(v_proj(x), kv_heads)
            if cfg.rope:
                k = apply_rope(k, max_len=self.max_cache_len)
            return k, v

        # KV caches live in the computation dtype (bf16 under bf16 weights):
        # per-step cache traffic dominates decode, so halving it matters.
        if mode == "prime":
            assert self.is_cross, "prime mode only applies to cross-attention"
            k, v = project_kv(key_value)
            B = key_value.shape[0]
            ck = self.variable("cache", "k", jnp.zeros, k.shape, k.dtype)
            cv = self.variable("cache", "v", jnp.zeros, v.shape, v.dtype)
            ck.value = k
            cv.value = v
            return None

        # --- query path ---
        q = split_heads(q_proj(query), q_heads)
        if cfg.rope:
            q_pos = None if mode == "full" else jnp.asarray(decode_pos)[None]
            q = apply_rope(q, positions=q_pos,
                           max_len=max(self.max_cache_len,
                                       self.max_query_len))

        # --- key/value path ---
        if mode == "full":
            kv_input = key_value if self.is_cross else query
            k, v = project_kv(kv_input)
        elif self.is_cross:  # step: read primed memory K/V
            ck = self.variable("cache", "k", jnp.zeros,
                               (query.shape[0], k_heads, self.max_cache_len, hd),
                               query.dtype)
            cv = self.variable("cache", "v", jnp.zeros,
                               (query.shape[0], kv_heads, self.max_cache_len, hd),
                               query.dtype)
            k = ck.value.astype(query.dtype)
            v = cv.value.astype(query.dtype)
        else:  # step: self-attention, append at decode_pos
            B = query.shape[0]
            S = self.max_cache_len
            ck = self.variable("cache", "k", jnp.zeros, (B, k_heads, S, hd),
                               query.dtype)
            cv = self.variable("cache", "v", jnp.zeros, (B, kv_heads, S, hd),
                               query.dtype)
            k_new = split_heads(k_proj(query), k_heads)
            v_new = split_heads(v_proj(query), kv_heads)
            if cfg.rope:
                k_new = apply_rope(k_new, positions=jnp.asarray(decode_pos)[None],
                                   max_len=self.max_cache_len)
            ck.value = jax.lax.dynamic_update_slice(
                ck.value, k_new.astype(ck.value.dtype), (0, 0, decode_pos, 0))
            cv.value = jax.lax.dynamic_update_slice(
                cv.value, v_new.astype(cv.value.dtype), (0, 0, decode_pos, 0))
            k = ck.value.astype(query.dtype)
            v = cv.value.astype(query.dtype)
        kv_len = k.shape[2]

        # --- bias / mask ---
        bias = None
        if cfg.kind == "rpr":
            er = self.param("Er", nn.initializers.normal(stddev=hd ** -0.5),
                            (cfg.er_len, hd))
            q_scaled = q * (hd ** -0.5)
            if mode == "full":
                bias = rpr_bias_full(q_scaled, er)
            else:
                bias = rpr_bias_decode(q_scaled, er, decode_pos, kv_len)

        mask = None
        causal_flag = False
        if mode == "full":
            causal_flag = bool(causal)
        elif not self.is_cross:
            mask = (jnp.arange(kv_len) <= decode_pos)[None, None, None, :]
        # cross-attention at decode time attends all memory positions

        dropout_rng, rate = None, 0.0
        if not deterministic and self.dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")
            rate = self.dropout_rate

        base = functools.partial(dot_product_attention, causal=causal_flag,
                                 dropout_rate=rate)
        if self.remat and mode == "full":
            rematted = jax.checkpoint(
                lambda q_, k_, v_, b_, m_, rng_: base(
                    q_, k_, v_, bias=b_, mask=m_, dropout_rng=rng_))
            attn, _ = rematted(q, k, v, bias, mask, dropout_rng)
        else:
            attn, _ = base(q, k, v, bias=bias, mask=mask,
                           dropout_rng=dropout_rng)

        if diff:
            # pair heads (2h, 2h+1) and subtract with learned lambda
            # (reference: custom_transformer.py:806-824). Subtraction after
            # multiplying by the shared value head is equivalent by linearity.
            B, _, L, _ = attn.shape
            lam_q1 = self.param("lambda_q1", nn.initializers.normal(0.1), (hd,))
            lam_k1 = self.param("lambda_k1", nn.initializers.normal(0.1), (hd,))
            lam_q2 = self.param("lambda_q2", nn.initializers.normal(0.1), (hd,))
            lam_k2 = self.param("lambda_k2", nn.initializers.normal(0.1), (hd,))
            lam_init = lambda_init_fn(self.depth)
            lam = (jnp.exp(jnp.sum(lam_q1 * lam_k1))
                   - jnp.exp(jnp.sum(lam_q2 * lam_k2)) + lam_init)
            attn = attn.reshape(B, H, 2, L, hd)
            attn = attn[:, :, 0] - lam * attn[:, :, 1]
            attn = RMSNorm(dim=hd, eps=1e-5, name="subln")(attn)
            attn = attn * (1.0 - lam_init)

        if cfg.kv_heads is not None and cfg.kv_heads != H:
            # MAGNETO-style pre-out-projection LayerNorm used by the
            # reference GQA module (grouped_query_attention.py:352-354)
            attn = nn.LayerNorm(name="gqa_norm")(attn)

        B, _, L, _ = attn.shape
        out = attn.transpose(0, 2, 1, 3).reshape(B, L, H * hd)
        return out_proj(out)
