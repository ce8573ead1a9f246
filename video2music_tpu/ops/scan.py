"""Sequence-scan primitives: linear recurrences, selective scan, RNN cells.

The reference ships two hand-rolled scan engines — a Blelloch work-efficient
parallel scan with a hand-derived backward (model/pscan.py:37-226) and the
Heinsen log-space scan (model/minGRU.py:13-17) — plus cuDNN GRU/LSTM for the
regression backbones (model/video_regression.py:124-141). On TPU:

  * the first-order recurrence ``h[t] = a[t] * h[t-1] + x[t]`` maps exactly
    onto ``jax.lax.associative_scan`` with the affine-composition combinator;
    autodiff is free (no hand-written backward);
  * the Heinsen scan is a cumsum + logcumsumexp, both associative scans;
  * GRU/LSTM become ``jax.lax.scan`` cells with torch gate order/semantics so
    reference checkpoints can be ported weight-for-weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_recurrence(a, x, axis: int = 1):
    """All-prefix solution of h[t] = a[t] * h[t-1] + x[t] (h[-1] = 0).

    Equivalent to the reference's PScan (model/pscan.py:153-188) but via
    ``associative_scan``: the pairs (a, x) compose as
    (a2, x2) o (a1, x1) = (a1*a2, a2*x1 + x2).
    """

    def combine(c1, c2):
        a1, x1 = c1
        a2, x2 = c2
        return a1 * a2, a2 * x1 + x2

    _, h = jax.lax.associative_scan(combine, (a, x), axis=axis)
    return h


def selective_scan(x, delta, A, B, C, D):
    """Mamba selective SSM scan (reference: model/mamba.py:336-357).

    Args:
      x:     (b, L, ED) post-conv activations
      delta: (b, L, ED) softplus'd timestep
      A:     (ED, N) negative state matrix
      B:     (b, L, N) input matrix
      C:     (b, L, N) output matrix
      D:     (ED,) skip
    Returns:
      y: (b, L, ED)
    """
    deltaA = jnp.exp(delta[..., None] * A)  # (b, L, ED, N)
    deltaBX = delta[..., None] * B[:, :, None, :] * x[..., None]  # (b, L, ED, N)
    hs = linear_recurrence(deltaA, deltaBX, axis=1)
    y = jnp.einsum("blen,bln->ble", hs, C)
    return y + D * x


def selective_scan_step(h, x_t, delta_t, A, B_t, C_t, D):
    """Single recurrent step for O(1) decode (reference: mamba.py:407-470).

    h: (b, ED, N) carried state. Returns (h_next, y_t) with y_t (b, ED).
    """
    deltaA = jnp.exp(delta_t[..., None] * A)  # (b, ED, N)
    deltaBX = delta_t[..., None] * B_t[:, None, :] * x_t[..., None]
    h_next = deltaA * h + deltaBX
    y = jnp.einsum("ben,bn->be", h_next, C_t) + D * x_t
    return h_next, y


def logcumsumexp(x, axis: int = 1):
    """Numerically-stable running log-sum-exp along ``axis``."""

    def combine(a, b):
        mx = jnp.maximum(a, b)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)  # both -inf -> avoid nan
        return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))

    return jax.lax.associative_scan(combine, x, axis=axis)


def heinsen_log_scan(log_coeffs, log_values, axis: int = 1):
    """Heinsen associative scan in log space (reference: minGRU.py:13-17).

    Computes h[t] = exp(a*[t] + logcumsumexp(log_values - a*)) where
    a* = cumsum(log_coeffs); i.e. h[t] = a[t]*h[t-1] + v[t] for positive
    coefficients/values.
    """
    a_star = jnp.cumsum(log_coeffs, axis=axis)
    log_h = a_star + logcumsumexp(log_values - a_star, axis=axis)
    return jnp.exp(log_h)


# ---------------------------------------------------------------------------
# RNN cells with torch gate semantics (for reference-checkpoint parity).
# torch.nn.GRU weights: W_ih rows [r; z; n], W_hh rows [r; z; n];
#   n = tanh(W_in x + b_in + r * (W_hn h + b_hn)); h' = (1-z)*n + z*h.
# torch.nn.LSTM weights: rows [i; f; g; o];
#   c' = f*c + i*g ; h' = o * tanh(c').
# ---------------------------------------------------------------------------

def gru_scan(x, h0, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """x: (B, L, I); h0: (B, H); weights in torch layout (3H, I)/(3H, H)."""
    H = h0.shape[-1]

    def cell(h, x_t):
        gi = x_t @ w_ih.T + b_ih  # (B, 3H)
        gh = h @ w_hh.T + b_hh
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    xs = jnp.swapaxes(x, 0, 1)  # (L, B, I)
    _, ys = jax.lax.scan(cell, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (B, L, H)


def lstm_scan(x, h0, c0, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """x: (B, L, I); h0/c0: (B, H); weights in torch layout (4H, I)/(4H, H)."""
    H = h0.shape[-1]

    def cell(carry, x_t):
        h, c = carry
        g = x_t @ w_ih.T + b_ih + h @ w_hh.T + b_hh  # (B, 4H)
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    xs = jnp.swapaxes(x, 0, 1)
    _, ys = jax.lax.scan(cell, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)
