"""RPR relative-bias: skew trick vs naive gather, and full vs decode parity."""

import jax.numpy as jnp
import numpy as np

from video2music_tpu.ops.rpr import rpr_bias_decode, rpr_bias_full, skew


def naive_rpr_bias(q, er):
    """Direct O(L^2 D) evaluation of bias[l, j] = q[l] . Er[len-1-(l-j)]."""
    L, D = q.shape[-2:]
    er_len = er.shape[0]
    out = np.zeros(q.shape[:-1] + (L,), dtype=np.float32)
    for l in range(L):
        for j in range(L):
            r = l - j
            if 0 <= r < er_len:
                out[..., l, j] = np.asarray(q[..., l, :] @ er[er_len - 1 - r])
    return out


def test_skew_matches_naive(rng):
    H, L, D = 3, 7, 4
    q = rng.standard_normal((H, L, D)).astype(np.float32)
    er = rng.standard_normal((L, D)).astype(np.float32)
    got = np.asarray(rpr_bias_full(jnp.asarray(q), jnp.asarray(er)))
    want = naive_rpr_bias(q, er)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_er_longer_than_query(rng):
    H, L, D, er_len = 2, 5, 4, 12
    q = rng.standard_normal((H, L, D)).astype(np.float32)
    er = rng.standard_normal((er_len, D)).astype(np.float32)
    got = np.asarray(rpr_bias_full(jnp.asarray(q), jnp.asarray(er)))
    want = naive_rpr_bias(q, er)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_decode_matches_full(rng):
    """Single-query decode bias must equal row `pos` of the full bias."""
    B, H, L, D = 2, 3, 10, 4
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    er = rng.standard_normal((L, D)).astype(np.float32)
    full = np.asarray(rpr_bias_full(jnp.asarray(q), jnp.asarray(er)))
    for pos in [0, 1, 5, 9]:
        q_step = jnp.asarray(q[:, :, pos: pos + 1, :])
        dec = np.asarray(
            rpr_bias_decode(q_step, jnp.asarray(er), jnp.asarray(pos), L)
        )[:, :, 0, :]
        # decode path fills all kv slots; compare the causally-valid prefix
        np.testing.assert_allclose(
            dec[..., : pos + 1], full[:, :, pos, : pos + 1], rtol=1e-5, atol=1e-5
        )


def test_skew_zero_above_diagonal(rng):
    L, D = 6, 3
    q = rng.standard_normal((1, L, D)).astype(np.float32)
    er = rng.standard_normal((L, D)).astype(np.float32)
    bias = np.asarray(rpr_bias_full(jnp.asarray(q), jnp.asarray(er)))[0]
    for l in range(L):
        for j in range(l + 1, L):
            assert bias[l, j] == 0.0
