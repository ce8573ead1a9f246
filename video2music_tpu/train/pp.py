"""Pipeline-parallel AMT train step (dp x pp over a ("data", "model") mesh).

Parallelizes the same training semantics as ``make_amt_train_step``
(reference loop: ``utilities/run_model_vevo.py:20-196``) with the model's
encoder and decoder layer stacks run as GPipe pipelines over the "model"
mesh axis (see parallel/pipeline.py) while the batch stays sharded over
"data". The reference has no distributed training at all (SURVEY §2.5);
this is a strategy the TPU framework adds.

Scope: homogeneous layer stacks — the base AMT (``amt_config(None)``) whose
n encoder and n decoder layers are identical modules (reference:
``model/video_music_transformer.py:956-971``). Variant stacks with
shallow/deep splits (V2), depth-dependent attention (V3 differential
lambda), or MoE functional state are rejected — they use the TP/EP
shardings of parallel/mesh.py instead.

Dropout note: the pipeline step folds per-microbatch, per-layer PRNG keys
(independent streams, same distribution) rather than flax's module-path
derivation, so a pipelined step equals the single-device step exactly when
dropout=0 and in distribution otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core.config import TrainConfig
from ..models.layers import DecoderLayer, EncoderLayer
from ..parallel.mesh import MODEL_AXIS
from ..parallel.pipeline import (microbatch, pipeline_apply,
                                 stack_layer_params, unmicrobatch)
from .step import TrainState, _maybe_bf16, _maybe_bf16_batch, amt_loss


def _check_pipelineable(cfg, n_stages: int) -> None:
    for name, specs in (("encoder", cfg.encoder_layers),
                        ("decoder", cfg.decoder_layers)):
        if any(s != specs[0] for s in specs):
            raise ValueError(
                f"{name} stack is not homogeneous (shallow/deep split) — "
                "pipeline parallelism needs identical stages; use TP/EP")
        if specs[0].ffn == "moe":
            raise ValueError(
                "MoE stacks carry functional moe_state which the pipeline "
                "step does not thread; use EP sharding instead")
        if specs[0].attn.kind == "differential":
            raise ValueError(
                "differential attention is depth-dependent (lambda_init) — "
                "stages are not homogeneous")
        if len(specs) % n_stages:
            raise ValueError(
                f"{len(specs)} {name} layers not divisible by "
                f"{n_stages} stages")


def make_amt_pp_train_step(model, tx, tcfg: TrainConfig, mesh: Mesh,
                           n_microbatches: int = 4,
                           drop_loss: bool = False,
                           remat: bool = False):
    """Returns jittable ``train_step(state, batch) -> (state, metrics)``
    running the layer stacks as pipelines over the "model" mesh axis."""
    cfg = model.cfg
    if getattr(cfg, "separated", False):
        raise ValueError("separated heads not supported in the pp step")
    n_stages = mesh.shape[MODEL_AXIS]
    _check_pipelineable(cfg, n_stages)
    n_enc, n_dec = len(cfg.encoder_layers), len(cfg.decoder_layers)
    residual_dropout = cfg.version is None
    enc_layer = EncoderLayer(spec=cfg.encoder_layers[0], cfg=cfg, depth=0,
                             residual_dropout=residual_dropout)
    dec_layer = DecoderLayer(spec=cfg.decoder_layers[0], cfg=cfg, depth=0,
                             residual_dropout=residual_dropout)

    def enc_fn(w, h, ride, rng):
        del ride
        return enc_layer.apply(
            {"params": w}, h, deterministic=rng is None,
            rngs=None if rng is None else {"dropout": rng})

    def dec_fn(w, h, ride, rng):
        return dec_layer.apply(
            {"params": w}, h, ride["memory"], deterministic=rng is None,
            rngs=None if rng is None else {"dropout": rng})

    def forward(params, batch, d_rng: Optional[jax.Array]):
        det = d_rng is None
        rngs = None if det else {"dropout": d_rng}
        apply = lambda method, *a: model.apply(
            {"params": params}, *a, deterministic=det, rngs=rngs,
            method=method)
        vf = apply("embed_video_input", batch["semantic"],
                   batch["scene_offset"], batch["motion"], batch["emotion"])
        xf = apply("embed_decoder_input", batch["x"], batch["x_root"],
                   batch["x_attr"], batch["key"])

        if det:
            enc_keys = dec_keys = None
        else:
            mk = lambda tag: jax.vmap(
                lambda i: jax.random.fold_in(
                    jax.random.fold_in(d_rng, tag), i))(
                        jnp.arange(n_microbatches))
            enc_keys, dec_keys = mk(1), mk(2)

        mem_mb = pipeline_apply(
            enc_fn, stack_layer_params(params, "enc_", n_enc),
            microbatch(vf, n_microbatches), rngs=enc_keys, mesh=mesh,
            remat=remat)
        memory = model.apply({"params": params}, unmicrobatch(mem_mb),
                             method="finalize_encoder")
        out_mb = pipeline_apply(
            dec_fn, stack_layer_params(params, "dec_", n_dec),
            microbatch(xf, n_microbatches),
            ride={"memory": microbatch(memory, n_microbatches)},
            rngs=dec_keys, mesh=mesh, remat=remat)
        return model.apply({"params": params}, unmicrobatch(out_mb),
                           method="head")

    def train_step(state: TrainState, batch):
        rng, d_rng, l_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            logits = forward(_maybe_bf16(params, tcfg),
                             _maybe_bf16_batch(batch, tcfg), d_rng)
            total, (lc, le) = amt_loss(
                logits, batch, tcfg, rng=(l_rng if drop_loss else None))
            return total, (total, lc, le)

        grads, (total, lc, le) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng)
        return new_state, {"loss": total, "loss_chord": lc,
                           "loss_emotion": le}

    return train_step
