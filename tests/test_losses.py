"""Loss parity against torch implementations (torch is CPU-only here)."""

import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.ops import losses

torch = pytest.importorskip("torch")

PAD = 158
V = 159


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((4, 7, V)).astype(np.float32)
    tgt = rng.integers(0, V, (4, 7))
    tgt[0, :3] = PAD
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(tgt),
                                     ignore_index=PAD, label_smoothing=0.1))
    want = torch.nn.CrossEntropyLoss(ignore_index=PAD, label_smoothing=0.1)(
        torch.tensor(logits).permute(0, 2, 1), torch.tensor(tgt)
    ).item()
    assert abs(got - want) < 1e-5


def test_smooth_cross_entropy_matches_formula(rng):
    logits = rng.standard_normal((10, V)).astype(np.float32)
    tgt = rng.integers(0, V, (10,))
    tgt[:2] = PAD
    got = float(losses.smooth_cross_entropy(
        jnp.asarray(logits), jnp.asarray(tgt), vocab_size=V,
        label_smoothing=0.1, ignore_index=PAD))
    # direct formula
    logp = torch.log_softmax(torch.tensor(logits), -1).numpy()
    onehot = np.eye(V)[tgt]
    q = 0.9 * onehot + 0.1 / V
    q[tgt == PAD] = 0
    want = (-(q * logp).sum(-1)).sum() / (tgt != PAD).sum()
    assert abs(got - want) < 1e-5


def test_bce_with_logits_matches_torch(rng):
    logits = rng.standard_normal((3, 5, V)).astype(np.float32)
    tgt = (rng.uniform(size=(3, 5, V)) > 0.5).astype(np.float32)
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(tgt)))
    want = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                        torch.tensor(tgt)).item()
    assert abs(got - want) < 1e-6


def test_bce_matches_torch(rng):
    p = rng.uniform(0.01, 0.99, (6, 40)).astype(np.float32)
    tgt = (rng.uniform(size=(6, 40)) > 0.5).astype(np.float32)
    got = float(losses.bce(jnp.asarray(p), jnp.asarray(tgt)))
    want = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(tgt)).item()
    assert abs(got - want) < 1e-5


def test_smooth_l1_matches_torch(rng):
    a = rng.standard_normal((8, 2)).astype(np.float32)
    b = rng.standard_normal((8, 2)).astype(np.float32)
    got = float(losses.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    want = torch.nn.SmoothL1Loss()(torch.tensor(a), torch.tensor(b)).item()
    assert abs(got - want) < 1e-6


def test_topk_aux_loss_zero_when_confident(rng):
    """If the model puts ~all mass on the true class, aux loss ~ 0."""
    tgt = rng.integers(0, V, (5,))
    logits = np.full((5, V), -10.0, np.float32)
    logits[np.arange(5), tgt] = 10.0
    got = float(losses.topk_auxiliary_loss(
        jnp.asarray(logits), jnp.asarray(tgt), k=3, weight=3.0,
        vocab_size=V, ignore_index=PAD))
    assert got < 1e-6


def test_focal_loss_finite(rng):
    logits = rng.standard_normal((5, V)).astype(np.float32)
    tgt = rng.integers(0, V, (5,))
    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(tgt),
                                  vocab_size=V, ignore_index=PAD))
    assert np.isfinite(got) and got > 0
