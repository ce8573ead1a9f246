"""Jitted train/eval steps for the AMT and regression models.

One compiled function per step — the reference's per-batch host work
(``.to(device)`` copies per tensor, ``.item()`` syncs, globally-enabled
autograd anomaly mode, reference: ``utilities/run_model_vevo.py:20-196``,
``train.py:28``) disappears: the loss, backward pass, optimizer update and
metric sums all run on device.

AMT loss (reference: run_model_vevo.py:101-119):
    total = lambda * CE(chord logits, tgt) + (1-lambda) * BCE(chord logits,
            tgt_emotion map),  lambda = 0.4
with optional stochastic ``drop_loss`` term selection and optional TopK
auxiliary losses (reference: train.py:222-229).

Regression loss (reference: run_model_regression.py:39):
    SmoothL1((note_density, loudness)) + BCE(instrument probabilities).

MoE functional state (balancing bias, top-k scheduler step) lives in the
``moe_state`` collection and is threaded through the step explicitly; expert
load metrics come back in the ``metrics`` collection.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core import constants as C
from ..core.config import TrainConfig
from ..ops.losses import bce, bce_with_logits, combined_chord_loss, smooth_l1
from . import metrics as M


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    moe_state: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(model, tx, rng, sample_batch,
                       init_fn: Optional[Callable] = None) -> TrainState:
    """Initialize variables from one (host) sample batch and wrap them with
    optimizer state. ``init_fn(model, rngs, batch)`` may override how the
    model is initialized (defaults to the AMT calling convention)."""
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    rngs = {"params": p_rng, "dropout": d_rng}
    if init_fn is None:
        variables = model.init(
            rngs, sample_batch["x"], sample_batch["x_root"],
            sample_batch["x_attr"], sample_batch["semantic"],
            sample_batch["key"], sample_batch["scene_offset"],
            sample_batch["motion"], sample_batch["emotion"])
    else:
        variables = init_fn(model, rngs, sample_batch)
    params = variables["params"]
    moe_state = variables.get("moe_state", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      moe_state=moe_state, opt_state=tx.init(params),
                      rng=s_rng)


def _cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def _maybe_bf16(params, tcfg: TrainConfig):
    """Mixed precision: run fwd/bwd in bf16 off f32 master weights. The cast
    is differentiable, so jax.grad still yields f32 gradients.

    NOTE: float batch inputs must be cast too (see _maybe_bf16_batch) —
    flax Dense promotes a bf16 kernel back to f32 when the input is f32,
    silently undoing the savings."""
    if not tcfg.mixed_precision:
        return params
    return _cast_bf16(params)


# targets stay f32 — losses reduce in f32
_F32_TARGET_KEYS = frozenset({
    "tgt", "tgt_root", "tgt_attr", "tgt_emotion", "tgt_emotion_prob",
    "note_density", "loudness", "instrument"})


def _maybe_bf16_batch(batch, tcfg: TrainConfig):
    if not tcfg.mixed_precision:
        return batch
    return {k: (v if k in _F32_TARGET_KEYS else _cast_bf16(v))
            for k, v in batch.items()}


def wire_bf16_batch(batch: dict) -> dict:
    """Host-side bf16 cast of the float inputs a mixed-precision step
    casts in-graph anyway (``_maybe_bf16_batch``) — numerically identical,
    half the H2D bytes. Matters through tunneled devices where transfer
    dominates: at B=16 the full AMT batch is 28 MB (semantic 14.7 MB +
    motion 9.8 MB f32) against a ~55 MB/s H2D link, ~13x the 54 ms step.
    Target keys stay f32 (losses reduce in f32)."""
    import ml_dtypes  # jax dependency; numpy-compatible bfloat16 dtype

    return {k: (v.astype(ml_dtypes.bfloat16)
                if k not in _F32_TARGET_KEYS
                and hasattr(v, "dtype") and v.dtype == np.float32 else v)
            for k, v in batch.items()}


def _amt_forward(model, params, moe_state, batch, *, deterministic, rngs):
    variables = {"params": params, "moe_state": moe_state}
    out, mutated = model.apply(
        variables, batch["x"], batch["x_root"], batch["x_attr"],
        batch["semantic"], batch["key"], batch["scene_offset"],
        batch["motion"], batch["emotion"], deterministic=deterministic,
        rngs=rngs, mutable=["moe_state", "metrics"])
    return out, mutated


def amt_loss(logits, batch, tcfg: TrainConfig, rng=None):
    """lambda*CE + (1-lambda)*BCE with optional drop_loss branch selection."""
    loss_chord = combined_chord_loss(
        logits, batch["tgt"], vocab_size=C.CHORD_SIZE,
        ignore_index=C.CHORD_PAD,
        label_smoothing=(tcfg.ce_smoothing or 0.0),
        auxiliary=tcfg.auxiliary_loss)
    loss_emotion = bce_with_logits(logits, batch["tgt_emotion"])
    lam = tcfg.loss_lambda
    combined = lam * loss_chord + (1.0 - lam) * loss_emotion
    if rng is None:
        total = combined
    else:
        # drop_loss: p<0.6 combined, p<0.8 chord only, else emotion only
        # (reference: run_model_vevo.py:110-119)
        p = jax.random.uniform(rng)
        total = jnp.where(p < 0.6, combined,
                          jnp.where(p < 0.8, loss_chord, loss_emotion))
    return total, (loss_chord, loss_emotion)


def amt_separated_loss(logits_root, logits_attr, batch, tcfg: TrainConfig):
    """IS_SEPERATED path: CE(root) + CE(attr), no emotion term
    (reference: run_model_vevo.py:49-78)."""
    lr_ = combined_chord_loss(
        logits_root, batch["tgt_root"], vocab_size=C.CHORD_ROOT_SIZE,
        ignore_index=C.CHORD_ROOT_PAD,
        label_smoothing=(tcfg.ce_smoothing or 0.0),
        auxiliary=tcfg.auxiliary_loss)
    la_ = combined_chord_loss(
        logits_attr, batch["tgt_attr"], vocab_size=C.CHORD_ATTR_SIZE,
        ignore_index=C.CHORD_ATTR_PAD,
        label_smoothing=(tcfg.ce_smoothing or 0.0),
        auxiliary=tcfg.auxiliary_loss)
    return lr_ + la_


def make_amt_train_step(model, tx, tcfg: TrainConfig, drop_loss: bool = False):
    """Returns jittable ``train_step(state, batch) -> (state, metrics)``."""
    separated = getattr(model.cfg, "separated", False)

    def train_step(state: TrainState, batch):
        rng, d_rng, l_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            logits, mutated = _amt_forward(
                model, _maybe_bf16(params, tcfg), state.moe_state,
                _maybe_bf16_batch(batch, tcfg),
                deterministic=False, rngs={"dropout": d_rng})
            if separated:
                total = amt_separated_loss(logits[0], logits[1], batch, tcfg)
                lc, le = total, jnp.asarray(-1.0)
            else:
                total, (lc, le) = amt_loss(
                    logits, batch, tcfg, rng=(l_rng if drop_loss else None))
            return total, (total, lc, le, mutated)

        grads, (total, lc, le, mutated) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            moe_state=mutated.get("moe_state", state.moe_state),
            opt_state=opt_state, rng=rng)
        # "loss" is the value actually optimized this step (for separated
        # models the -1.0 loss_emotion sentinel must not leak into it, and
        # under drop_loss the optimized branch may be chord- or emotion-only).
        metrics = {"loss": total, "loss_chord": lc, "loss_emotion": le}
        return new_state, metrics

    return train_step


def make_amt_eval_step(model, tcfg: TrainConfig):
    """Returns jittable ``eval_step(params, moe_state, batch) -> metrics``
    covering the reference's eval_model statistics
    (reference: run_model_vevo.py:198-566). Separated models score through
    the root x attr product reconstruction (``_root_attr`` metric variants,
    reference: vevo_dataset.py:703-745,812-963)."""
    separated = getattr(model.cfg, "separated", False)

    def eval_step(params, moe_state, batch):
        logits, _ = _amt_forward(model, params, moe_state, batch,
                                 deterministic=True, rngs=None)
        if separated:
            lr_, la_ = logits
            total = amt_separated_loss(lr_, la_, batch, tcfg)
            probs = M.root_attr_to_chord_logits(lr_, la_)
            chord_logits = jnp.log(probs + 1e-20)
            lc, le = total, jnp.asarray(-1.0)
        else:
            total, (lc, le) = amt_loss(logits, batch, tcfg)
            chord_logits = logits
        return {
            "loss": total, "loss_chord": lc, "loss_emotion": le,
            "accuracy": M.compute_vevo_accuracy(chord_logits, batch["tgt"]),
            "hits@1": M.compute_hits_k(chord_logits, batch["tgt"], 1),
            "hits@3": M.compute_hits_k(chord_logits, batch["tgt"], 3),
            "hits@5": M.compute_hits_k(chord_logits, batch["tgt"], 5),
            "correspondence": M.compute_vevo_correspondence(
                chord_logits, batch["tgt"], batch["tgt_emotion"],
                batch["tgt_emotion_prob"]),
        }

    return eval_step


# ---------------------------------------------------------------------------
# MusicTransformer (no-video baseline, reference: run_model_vevo.py:135-180)
# ---------------------------------------------------------------------------

def music_transformer_init(model, rngs, batch):
    return model.init(rngs, batch["x"], batch["x_root"], batch["x_attr"],
                      batch["key"])


def make_music_transformer_train_step(model, tx, tcfg: TrainConfig):
    """Chord-only CE loss (no emotion term, reference :171-175)."""

    def train_step(state: TrainState, batch):
        rng, d_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits = model.apply(
                {"params": _maybe_bf16(params, tcfg)},
                batch["x"], batch["x_root"],
                batch["x_attr"], batch["key"], deterministic=False,
                rngs={"dropout": d_rng})
            loss = combined_chord_loss(
                logits, batch["tgt"], vocab_size=C.CHORD_SIZE,
                ignore_index=C.CHORD_PAD,
                label_smoothing=(tcfg.ce_smoothing or 0.0),
                auxiliary=tcfg.auxiliary_loss)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), {"loss": loss}

    return train_step


def make_music_transformer_eval_step(model, tcfg: TrainConfig):
    def eval_step(params, moe_state, batch):
        del moe_state
        logits = model.apply({"params": params}, batch["x"],
                             batch["x_root"], batch["x_attr"], batch["key"],
                             deterministic=True)
        loss = combined_chord_loss(
            logits, batch["tgt"], vocab_size=C.CHORD_SIZE,
            ignore_index=C.CHORD_PAD,
            label_smoothing=(tcfg.ce_smoothing or 0.0),
            auxiliary=tcfg.auxiliary_loss)
        return {
            "loss": loss,
            "accuracy": M.compute_vevo_accuracy(logits, batch["tgt"]),
            "hits@1": M.compute_hits_k(logits, batch["tgt"], 1),
            "hits@3": M.compute_hits_k(logits, batch["tgt"], 3),
            "hits@5": M.compute_hits_k(logits, batch["tgt"], 5),
        }

    return eval_step


# ---------------------------------------------------------------------------
# Regression model
# ---------------------------------------------------------------------------

def regression_init(model, rngs, batch):
    return model.init(rngs, batch["semantic"], batch["scene_offset"],
                      batch["motion"], batch["emotion"])


def _reg_forward(model, params, moe_state, batch, *, deterministic, rngs):
    variables = {"params": params, "moe_state": moe_state}
    out, mutated = model.apply(
        variables, batch["semantic"], batch["scene_offset"], batch["motion"],
        batch["emotion"], deterministic=deterministic, rngs=rngs,
        mutable=["moe_state", "metrics"])
    return out, mutated


def regression_loss(ln_nd, inst, batch):
    """SmoothL1((nd, loudness)) + BCE(instrument)
    (reference: run_model_regression.py:33-39 — note the target order is
    (note_density, loudness) after the cat)."""
    target = jnp.stack([batch["note_density"], batch["loudness"]], axis=-1)
    reg = smooth_l1(ln_nd, target)
    cls = bce(inst, batch["instrument"])
    return reg + cls, (reg, cls)


def make_regression_train_step(model, tx, tcfg: TrainConfig):
    def train_step(state: TrainState, batch):
        rng, d_rng = jax.random.split(state.rng)

        def loss_fn(params):
            (ln_nd, inst), mutated = _reg_forward(
                model, _maybe_bf16(params, tcfg), state.moe_state,
                _maybe_bf16_batch(batch, tcfg),
                deterministic=False, rngs={"dropout": d_rng})
            total, (reg, cls) = regression_loss(ln_nd, inst, batch)
            return total, (reg, cls, mutated)

        grads, (reg, cls, mutated) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            moe_state=mutated.get("moe_state", state.moe_state),
            opt_state=opt_state, rng=rng)
        return new_state, {"loss": reg + cls, "loss_reg": reg,
                           "loss_bce": cls}

    return train_step


def make_regression_eval_step(model):
    def eval_step(params, moe_state, batch):
        (ln_nd, inst), _ = _reg_forward(model, params, moe_state, batch,
                                        deterministic=True, rngs=None)
        total, (reg, cls) = regression_loss(ln_nd, inst, batch)
        out = M.regression_eval(ln_nd, batch["note_density"],
                                batch["loudness"], inst, batch["instrument"])
        out.update({"loss": total, "loss_reg": reg, "loss_bce": cls})
        return out

    return eval_step
