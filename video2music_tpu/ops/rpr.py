"""Relative position representation (RPR) bias — Shaw et al. attention with
the Huang et al. "skew" trick.

The reference adds ``srel = skew(q @ Er^T)`` to the attention logits inside a
forked torch MHA (reference: model/rpr.py:390-395, ``_get_valid_embedding``
:426-437, ``_skew`` :439-455). Semantics: with Er of shape (er_len, head_dim),
query position l attending key position j (j <= l) receives bias

    bias[l, j] = q[l] . Er[er_len - 1 - (l - j)]

i.e. relative distance r = l - j indexes Er back-to-front, clipped to the
er_len window. Positions with j > l get zero bias (they are causally masked
anyway in the decoder).

Two implementations with identical semantics:
  * ``rpr_bias_full`` — training/full-sequence path using the pad-reshape
    skew (no (L, L, D) intermediate; XLA fuses this well).
  * ``rpr_bias_decode`` — single-query path for the KV-cached sampler: the
    bias over all key slots is a length-L dynamic slice of q @ Er^T, indexed
    by the absolute decode position. Parity between the two is covered by
    tests (tests/test_rpr.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(qe: jnp.ndarray) -> jnp.ndarray:
    """Huang et al. skew: (..., L, L) qe -> (..., L, L) srel.

    qe[..., l, m] holds q[l] . Er_valid[m]; output srel[..., l, j] equals
    qe[..., l, j - l + L - 1] for j <= l and 0 otherwise (matches
    reference model/rpr.py:439-455 including the flipped-triangle mask).
    """
    *lead, L, M = qe.shape
    assert L == M, "skew expects square (len_q, len_q) relative logits"
    # mask[l, m] = 1 iff m >= L - 1 - l  (triu flipped vertically)
    rows = jnp.arange(L)[:, None]
    cols = jnp.arange(L)[None, :]
    mask = (cols >= L - 1 - rows).astype(qe.dtype)
    qe = qe * mask
    qe = jnp.pad(qe, [(0, 0)] * len(lead) + [(0, 0), (1, 0)])
    qe = qe.reshape(*lead, L + 1, L)
    return qe[..., 1:, :]


def rpr_bias_full(q: jnp.ndarray, er: jnp.ndarray) -> jnp.ndarray:
    """(..., L, D) queries + (er_len, D) Er -> (..., L, L) additive bias.

    Uses the last ``L`` rows of Er (reference ``_get_valid_embedding``).
    """
    L = q.shape[-2]
    er_len = er.shape[0]
    start = max(0, er_len - L)
    er_valid = er[start:, :]
    qe = jnp.einsum("...ld,md->...lm", q, er_valid)
    return skew(qe)


def rpr_bias_decode(q: jnp.ndarray, er: jnp.ndarray, pos, kv_len: int) -> jnp.ndarray:
    """Single-step bias for a query at absolute position ``pos``.

    Args:
      q: (..., 1, D) the current query.
      er: (er_len, D) relative embedding table.
      pos: scalar int array — absolute decode position of the query.
      kv_len: static length of the (padded) KV cache.

    Returns:
      (..., 1, kv_len) bias where slot j gets q . Er[er_len - 1 - (pos - j)]
      for 0 <= pos - j < er_len and 0 elsewhere.
    """
    er_len = er.shape[0]
    qr = jnp.einsum("...ld,md->...lm", q, er)  # (..., 1, er_len)
    # bias[j] = qr[er_len - 1 - pos + j]; realize as a dynamic slice of qr
    # padded with zeros on both sides so out-of-window j reads 0.
    pad_lo = kv_len  # enough headroom for start offset >= 0
    qr_padded = jnp.pad(qr, [(0, 0)] * (qr.ndim - 1) + [(pad_lo, kv_len)])
    start = pad_lo + er_len - 1 - pos
    start = jnp.clip(start, 0, qr_padded.shape[-1] - kv_len)
    return jax.lax.dynamic_slice_in_dim(qr_padded, start, kv_len, axis=-1)
