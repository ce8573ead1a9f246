"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.ops.pallas_attention import (flash_attention,
                                                  reference_attention)
from video2music_tpu.ops.pallas_scan import selective_scan_pallas
from video2music_tpu.ops.scan import selective_scan


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_parity(rng, causal):
    B, H, L, S, D = 2, 2, 37, 37, 24
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=causal, interpret=True)
    want = reference_attention(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_flash_attention_with_bias(rng):
    B, H, L, D = 1, 2, 20, 16
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    bias = rng.standard_normal((B, H, L, L)).astype(np.float32)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          bias=jnp.asarray(bias), causal=True,
                          interpret=True)
    want = reference_attention(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), bias=jnp.asarray(bias),
                               causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_flash_attention_multiblock(rng):
    # L > q_block exercises the causal offset per q block
    B, H, L, D = 1, 1, 300, 64
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=True, interpret=True)
    want = reference_attention(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_selective_scan_pallas_parity(rng):
    b, L, ED, N = 2, 23, 48, 8
    x = rng.standard_normal((b, L, ED)).astype(np.float32)
    delta = rng.uniform(0.01, 0.2, (b, L, ED)).astype(np.float32)
    A = -rng.uniform(0.1, 1.0, (ED, N)).astype(np.float32)
    B = rng.standard_normal((b, L, N)).astype(np.float32)
    C = rng.standard_normal((b, L, N)).astype(np.float32)
    D = rng.standard_normal((ED,)).astype(np.float32)
    got = selective_scan_pallas(*map(jnp.asarray, (x, delta, A, B, C, D)),
                                ed_block=128, interpret=True)
    want = selective_scan(*map(jnp.asarray, (x, delta, A, B, C, D)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_flash_attention_gradients(rng):
    B, H, L, D = 1, 2, 20, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_causal_requires_square():
    """Causal masks are start-aligned in the kernel but end-aligned in the
    jnp fallback/backward — only identical for L == S, so L != S must be
    rejected loudly."""
    import pytest
    from video2music_tpu.ops.pallas_attention import flash_attention
    from video2music_tpu.ops.pallas_attention_dropout import (
        flash_attention_dropout)
    q = jnp.zeros((1, 1, 4, 8))
    k = v = jnp.zeros((1, 1, 6, 8))
    with pytest.raises(ValueError, match="L == S"):
        flash_attention(q, k, v, causal=True, interpret=True)
    with pytest.raises(ValueError, match="L == S"):
        flash_attention_dropout(q, k, v, causal=True, interpret=True)
