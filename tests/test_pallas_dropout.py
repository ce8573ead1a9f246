"""Flash attention with in-kernel dropout: forward semantics + exact
gradient parity against a jnp oracle driven by the extracted mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from video2music_tpu.ops.pallas_attention import reference_attention
from video2music_tpu.ops.pallas_attention_dropout import (
    extract_dropped_probs, flash_attention_dropout)

# the CPU-side TPU interpreter supports pltpu PRNG ops; plain interpret=True
# does not
INTERP = pltpu.InterpretParams()


def test_zero_rate_matches_reference(rng):
    B, H, L, D = 2, 2, 20, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    got = flash_attention_dropout(q, k, v, causal=True, dropout_rate=0.0,
                                  interpret=INTERP)
    want = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_dropout_statistics(rng):
    B, H, L, D = 1, 1, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    rate = 0.3
    probs = np.asarray(extract_dropped_probs(q, k, dropout_rate=rate,
                                             seed=5, interpret=INTERP))
    # kept entries are scaled by 1/(1-rate); rows sum to ~1 in expectation
    kept = probs > 0
    keep_frac = kept.mean()
    assert abs(keep_frac - (1 - rate)) < 0.05
    np.testing.assert_allclose(probs.sum(-1).mean(), 1.0, atol=0.15)


def test_mask_replay_is_deterministic(rng):
    B, H, L, D = 1, 2, 20, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    p1 = np.asarray(extract_dropped_probs(q, k, dropout_rate=0.2, seed=7,
                                          interpret=INTERP))
    p2 = np.asarray(extract_dropped_probs(q, k, dropout_rate=0.2, seed=7,
                                          interpret=INTERP))
    p3 = np.asarray(extract_dropped_probs(q, k, dropout_rate=0.2, seed=8,
                                          interpret=INTERP))
    np.testing.assert_array_equal(p1, p2)
    assert (p1 != p3).any()


@pytest.mark.parametrize("use_bias", [False, True])
def test_gradients_match_mask_oracle(rng, use_bias):
    """Custom Pallas backward == jax.grad of the jnp function that applies
    the exact mask the kernel drew (extracted via identity values)."""
    B, H, L, D = 1, 2, 20, 16
    rate, seed = 0.25, 11
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    bias = (jnp.asarray(rng.standard_normal((B, H, L, L)), jnp.float32)
            if use_bias else None)

    dropped = extract_dropped_probs(q, k, bias=bias, causal=True,
                                    dropout_rate=rate, seed=seed,
                                    interpret=INTERP)
    mask = (np.asarray(dropped) > 0).astype(np.float32) / (1 - rate)
    mask = jnp.asarray(mask)

    def oracle(q, k, v, bias):
        logits = jnp.einsum("bhld,bhsd->bhls", q, k) * (D ** -0.5)
        if bias is not None:
            logits = logits + bias
        cm = jnp.arange(L)[None, :] <= jnp.arange(L)[:, None]
        logits = jnp.where(cm[None, None], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1) * mask
        return jnp.sum(jnp.einsum("bhls,bhsd->bhld", w, v) ** 2)

    def kernel_loss(q, k, v, bias):
        out = flash_attention_dropout(q, k, v, bias=bias, causal=True,
                                      dropout_rate=rate, seed=seed,
                                      interpret=INTERP)
        return jnp.sum(out ** 2)

    argnums = (0, 1, 2) if bias is None else (0, 1, 2, 3)
    g_oracle = jax.grad(oracle, argnums=argnums)(q, k, v, bias)
    g_kernel = jax.grad(kernel_loss, argnums=argnums)(q, k, v, bias)
    names = ["dq", "dk", "dv", "dbias"]
    for name, a, b in zip(names, g_kernel, g_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=3e-5, err_msg=name)


def test_multi_qblock_gradients(rng):
    """L > 128 exercises per-q-block seeding in both fwd and bwd."""
    B, H, L, D = 1, 1, 300, 32
    rate, seed = 0.1, 3
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    dropped = extract_dropped_probs(q, k, causal=True, dropout_rate=rate,
                                    seed=seed, interpret=INTERP)
    mask = jnp.asarray((np.asarray(dropped) > 0).astype(np.float32)
                       / (1 - rate))

    def oracle(q, k, v):
        logits = jnp.einsum("bhld,bhsd->bhls", q, k) * (D ** -0.5)
        cm = jnp.arange(L)[None, :] <= jnp.arange(L)[:, None]
        logits = jnp.where(cm[None, None], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1) * mask
        return jnp.sum(jnp.einsum("bhls,bhsd->bhld", w, v) ** 2)

    def kernel_loss(q, k, v):
        out = flash_attention_dropout(q, k, v, causal=True,
                                      dropout_rate=rate, seed=seed,
                                      interpret=INTERP)
        return jnp.sum(out ** 2)

    g_o = jax.grad(oracle, argnums=(0, 1, 2))(q, k, v)
    g_k = jax.grad(kernel_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_k, g_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=3e-5)
