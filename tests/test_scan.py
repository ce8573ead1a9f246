"""Scan primitives vs sequential references and torch RNN parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.ops.scan import (
    gru_scan,
    heinsen_log_scan,
    linear_recurrence,
    logcumsumexp,
    lstm_scan,
    selective_scan,
    selective_scan_step,
)


def test_linear_recurrence_matches_loop(rng):
    B, L, D = 2, 17, 5
    a = rng.uniform(0.5, 1.0, (B, L, D)).astype(np.float32)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    got = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(x)))
    h = np.zeros((B, D), np.float32)
    for t in range(L):
        h = a[:, t] * h + x[:, t]
        np.testing.assert_allclose(got[:, t], h, rtol=1e-5, atol=1e-5)


def test_selective_scan_matches_sequential(rng):
    """Parallel selective scan == sequential recurrence (reference
    selective_scan vs selective_scan_seq, model/mamba.py:336-380)."""
    B, L, ED, N = 2, 9, 6, 4
    x = rng.standard_normal((B, L, ED)).astype(np.float32)
    delta = rng.uniform(0.01, 0.2, (B, L, ED)).astype(np.float32)
    A = -rng.uniform(0.1, 1.0, (ED, N)).astype(np.float32)
    Bm = rng.standard_normal((B, L, N)).astype(np.float32)
    C = rng.standard_normal((B, L, N)).astype(np.float32)
    D = rng.standard_normal((ED,)).astype(np.float32)

    y = np.asarray(selective_scan(*map(jnp.asarray, (x, delta, A, Bm, C, D))))

    h = np.zeros((B, ED, N), np.float32)
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A)
        dBX = delta[:, t, :, None] * Bm[:, t, None, :] * x[:, t, :, None]
        h = dA * h + dBX
        y_t = np.einsum("ben,bn->be", h, C[:, t]) + D * x[:, t]
        np.testing.assert_allclose(y[:, t], y_t, rtol=1e-4, atol=1e-4)


def test_selective_scan_step_matches_full(rng):
    B, L, ED, N = 1, 6, 4, 3
    x = rng.standard_normal((B, L, ED)).astype(np.float32)
    delta = rng.uniform(0.01, 0.2, (B, L, ED)).astype(np.float32)
    A = -rng.uniform(0.1, 1.0, (ED, N)).astype(np.float32)
    Bm = rng.standard_normal((B, L, N)).astype(np.float32)
    C = rng.standard_normal((B, L, N)).astype(np.float32)
    D = rng.standard_normal((ED,)).astype(np.float32)

    y_full = np.asarray(selective_scan(*map(jnp.asarray, (x, delta, A, Bm, C, D))))
    h = jnp.zeros((B, ED, N))
    for t in range(L):
        h, y_t = selective_scan_step(
            h, jnp.asarray(x[:, t]), jnp.asarray(delta[:, t]), jnp.asarray(A),
            jnp.asarray(Bm[:, t]), jnp.asarray(C[:, t]), jnp.asarray(D))
        np.testing.assert_allclose(np.asarray(y_t), y_full[:, t],
                                   rtol=1e-4, atol=1e-4)


def test_logcumsumexp(rng):
    x = rng.standard_normal((2, 11, 3)).astype(np.float32)
    got = np.asarray(logcumsumexp(jnp.asarray(x), axis=1))
    want = np.log(np.cumsum(np.exp(x), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_heinsen_log_scan(rng):
    """h[t] = a[t] h[t-1] + v[t] with positive a, v via log space."""
    B, L, D = 2, 8, 3
    a = rng.uniform(0.2, 0.9, (B, L, D)).astype(np.float32)
    v = rng.uniform(0.1, 2.0, (B, L, D)).astype(np.float32)
    got = np.asarray(heinsen_log_scan(jnp.log(a), jnp.log(v)))
    h = np.zeros((B, D), np.float32)
    for t in range(L):
        h = a[:, t] * h + v[:, t]
        np.testing.assert_allclose(got[:, t], h, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_matches_torch(rng, reverse):
    torch = pytest.importorskip("torch")
    B, L, I, H = 2, 7, 5, 4
    x = rng.standard_normal((B, L, I)).astype(np.float32)
    cell = torch.nn.GRU(I, H, batch_first=True)
    w_ih = cell.weight_ih_l0.detach().numpy()
    w_hh = cell.weight_hh_l0.detach().numpy()
    b_ih = cell.bias_ih_l0.detach().numpy()
    b_hh = cell.bias_hh_l0.detach().numpy()
    xt = torch.tensor(np.flip(x, 1).copy() if reverse else x)
    want, _ = cell(xt)
    want = want.detach().numpy()
    if reverse:
        want = np.flip(want, 1)
    got = np.asarray(gru_scan(jnp.asarray(x), jnp.zeros((B, H)),
                              *map(jnp.asarray, (w_ih, w_hh, b_ih, b_hh)),
                              reverse=reverse))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_matches_torch(rng, reverse):
    torch = pytest.importorskip("torch")
    B, L, I, H = 2, 7, 5, 4
    x = rng.standard_normal((B, L, I)).astype(np.float32)
    cell = torch.nn.LSTM(I, H, batch_first=True)
    w_ih = cell.weight_ih_l0.detach().numpy()
    w_hh = cell.weight_hh_l0.detach().numpy()
    b_ih = cell.bias_ih_l0.detach().numpy()
    b_hh = cell.bias_hh_l0.detach().numpy()
    xt = torch.tensor(np.flip(x, 1).copy() if reverse else x)
    want, _ = cell(xt)
    want = want.detach().numpy()
    if reverse:
        want = np.flip(want, 1)
    got = np.asarray(lstm_scan(jnp.asarray(x), jnp.zeros((B, H)),
                               jnp.zeros((B, H)),
                               *map(jnp.asarray, (w_ih, w_hh, b_ih, b_hh)),
                               reverse=reverse))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rosc_matches_reference_formula(rng):
    """rosc == x*cos + rotate_half(x)*sin with duplicated angle
    (reference rotate_operation.py:7-16,40-47)."""
    import jax.numpy as jnp

    from video2music_tpu.ops.embeddings import rosc, rotate_half

    x = rng.standard_normal((2, 5, 8)).astype("float32")
    angle = rng.standard_normal((2, 5, 4)).astype("float32")
    got = np.asarray(rosc(jnp.asarray(x), jnp.asarray(angle)))
    emb = np.concatenate([angle, angle], -1)
    rh = np.concatenate([-x[..., 4:], x[..., :4]], -1)
    want = x * np.cos(emb) + rh * np.sin(emb)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # zero angle = identity
    ident = np.asarray(rosc(jnp.asarray(x), jnp.zeros((2, 5, 4), "float32")))
    np.testing.assert_allclose(ident, x, rtol=1e-6)
