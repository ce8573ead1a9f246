"""Loss functions (reference: model/loss.py, utilities/run_model_vevo.py:101-119,
utilities/run_model_regression.py:39).

All losses are pure jnp functions of (logits, targets) returning scalars, so
they compose freely inside a jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, targets, *, ignore_index: int,
                  label_smoothing: float = 0.0):
    """torch.nn.CrossEntropyLoss semantics with ignore_index + label smoothing.

    logits: (..., V); targets: (...) int. Mean over non-ignored targets.
    (reference: train.py:216-221)
    """
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, V - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = (targets != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


def smooth_cross_entropy(logits, targets, *, vocab_size: int,
                         label_smoothing: float, ignore_index: int):
    """The reference's SmoothCrossEntropyLoss (model/loss.py:9-48): uniform
    smoothing q' = (1-eps)*onehot + eps/V, ignored rows zeroed, mean over
    non-ignored count."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(targets, 0, vocab_size - 1), vocab_size)
    q = (1.0 - label_smoothing) * onehot + label_smoothing / vocab_size
    mask = (targets != ignore_index).astype(jnp.float32)
    q = q * mask[..., None]
    ce = -jnp.sum(q * logp, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(ce) / denom


def focal_loss(logits, targets, *, vocab_size: int, weight: float = 0.1,
               gamma: float = 2.0, ignore_index: int = -100):
    """FocalLoss (model/loss.py:50-83)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    prob = jnp.exp(logp)
    onehot = jax.nn.one_hot(jnp.clip(targets, 0, vocab_size - 1), vocab_size)
    mask = (targets != ignore_index).astype(jnp.float32)
    onehot = onehot * mask[..., None]
    loss = jnp.sum(-((1.0 - prob) ** gamma) * logp * onehot, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss) / denom * weight


def topk_auxiliary_loss(logits, targets, *, k: int, weight: float,
                        vocab_size: int, ignore_index: int):
    """TopKAuxiliaryLoss (model/loss.py:85-120):
    relu(mean(top-k softmax probs) - p_true), pad-masked mean."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topk, _ = jax.lax.top_k(probs, k)
    mean_topk = jnp.mean(topk, axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(targets, 0, vocab_size - 1), vocab_size)
    mask = (targets != ignore_index).astype(jnp.float32)
    true_score = jnp.sum(probs * onehot * mask[..., None], axis=-1)
    loss = jax.nn.relu(mean_topk - true_score) * mask
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss) / denom * weight


def combined_chord_loss(logits, targets, *, vocab_size: int,
                        ignore_index: int, label_smoothing: float = 0.1,
                        auxiliary: bool = False):
    """CE (+ optional TopK aux pair, averaged over active terms) — mirrors
    the CombinedLoss wiring in train.py:222-229 with type='avg'."""
    ce = cross_entropy(logits, targets, ignore_index=ignore_index,
                       label_smoothing=label_smoothing)
    if not auxiliary:
        return ce
    a3 = topk_auxiliary_loss(logits, targets, k=3, weight=3.0,
                             vocab_size=vocab_size, ignore_index=ignore_index)
    a5 = topk_auxiliary_loss(logits, targets, k=5, weight=5.0,
                             vocab_size=vocab_size, ignore_index=ignore_index)
    total = ce + a3 + a5
    count = ((ce > 1e-10).astype(jnp.float32)
             + (a3 > 1e-10).astype(jnp.float32)
             + (a5 > 1e-10).astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)


def bce_with_logits(logits, targets):
    """torch.nn.BCEWithLogitsLoss default (mean over all elements). Used for
    the emotion-quality target (run_model_vevo.py:107) — the reference does
    NOT pad-mask this term; we reproduce that."""
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def bce(probs, targets, eps: float = 1e-7):
    """torch.nn.BCELoss on probabilities (regression instrument head,
    run_model_regression.py:39 uses sigmoid outputs + BCELoss)."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def smooth_l1(pred, target, beta: float = 1.0):
    """torch.nn.SmoothL1Loss (run_model_regression.py:39)."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))
