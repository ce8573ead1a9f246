"""Pipeline-parallel AMT train step (dp x pp over a ("data", "model") mesh).

Parallelizes the same training semantics as ``make_amt_train_step``
(reference loop: ``utilities/run_model_vevo.py:20-196``) with the model's
encoder and decoder layer stacks run as GPipe pipelines over the "model"
mesh axis (see parallel/pipeline.py) while the batch stays sharded over
"data". The reference has no distributed training at all (SURVEY §2.5);
this is a strategy the TPU framework adds.

Stacks are split into HOMOGENEOUS SEGMENTS of consecutive identical layer
specs and each segment is pipelined separately: the base AMT is one
segment of n identical layers (reference:
``model/video_music_transformer.py:956-971``); the V2 family's 3 shallow
SwiGLU + 3 deep SharedMoE split (``:411-419``) becomes two segments, each
of whose length must divide the pipeline-stage count (e.g. "model"=3 for
the reference's 6-layer models).

MoE functional state (balancing bias, schedulers — ``moe.py:66-97,
256-280``) threads through the pipeline as STAGE-LOCAL layer state: each
stage sees its microbatches in order, so state steps once per microbatch
— the same per-forward-call semantics as the reference, with M
microbatches behaving like M small-batch forwards. Depth-dependent stacks
(V3 differential attention lambda_init) are rejected — use TP/EP.

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
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from ..parallel.pipeline import (microbatch, pipeline_apply, stack_subtrees,
                                 unmicrobatch, unstack_subtrees)
from .step import TrainState, _maybe_bf16, _maybe_bf16_batch, amt_loss


def _segments(specs):
    """Split a layer-spec tuple into (spec, [layer indices]) runs of
    consecutive identical specs."""
    segs = []
    for i, spec in enumerate(specs):
        if segs and segs[-1][0] == spec:
            segs[-1][1].append(i)
        else:
            segs.append((spec, [i]))
    return segs


def _check_pipelineable(cfg, n_stages: int) -> None:
    for name, specs in (("encoder", cfg.encoder_layers),
                        ("decoder", cfg.decoder_layers)):
        for spec, idxs in _segments(specs):
            if spec.attn.kind == "differential":
                raise ValueError(
                    "differential attention is depth-dependent "
                    "(lambda_init) — stages are not homogeneous; use TP/EP")
            if len(idxs) % n_stages:
                raise ValueError(
                    f"{name} segment of {len(idxs)} identical layers not "
                    f"divisible by {n_stages} pipeline stages (the V2 "
                    "3 shallow + 3 deep split pipelines on a model axis "
                    "of 3 or 1)")


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
    residual_dropout = cfg.version is None
    enc_segments = [
        (EncoderLayer(spec=spec, cfg=cfg, depth=0,
                      residual_dropout=residual_dropout),
         [f"enc_{i}" for i in idxs], spec.ffn == "moe")
        for spec, idxs in _segments(cfg.encoder_layers)]
    dec_segments = [
        (DecoderLayer(spec=spec, cfg=cfg, depth=0,
                      residual_dropout=residual_dropout),
         [f"dec_{i}" for i in idxs], spec.ffn == "moe")
        for spec, idxs in _segments(cfg.decoder_layers)]

    def _layer_fns(layer_module, is_dec):
        def apply(w, ms, h, ride, rng, mutable):
            args = (h, ride["memory"]) if is_dec else (h,)  # enc: no ride
            variables = {"params": w}
            if ms is not None:
                variables["moe_state"] = ms
            return layer_module.apply(
                variables, *args, deterministic=rng is None,
                rngs=None if rng is None else {"dropout": rng},
                mutable=mutable)

        def stateless(w, h, ride, rng):
            out, _ = apply(w, None, h, ride, rng, ["metrics"])
            return out

        def stateful(w, ms, h, ride, rng):
            out, mutated = apply(w, ms, h, ride, rng,
                                 ["moe_state", "metrics"])

            # Inside shard_map the MoE layer saw only this device's batch
            # shard, so its balancing update used LOCAL expert counts. The
            # GSPMD (non-pp) step psums counts globally; recover that here:
            # the bias update is additive in the counts error, so psum the
            # DELTA over "data". Scheduler step counters advance by the
            # same amount on every replica and stay as-is.
            def fix(path, new, old):
                name = getattr(path[-1], "key", None)
                if name == "balance_bias":
                    return old + jax.lax.psum(new - old, DATA_AXIS)
                return new

            new_ms = jax.tree_util.tree_map_with_path(
                fix, mutated["moe_state"], ms)
            return out, new_ms

        return stateless, stateful

    def _run_stack(segments, params, moe_state, x_mb, ride, base_rng, tag,
                   is_dec, new_moe):
        for si, (layer_module, names, is_moe) in enumerate(segments):
            # MoE segments are stateful only when the config actually
            # creates moe_state vars (balancing / schedulers) — 2.2
            # proper has none and runs the stateless path
            has_state = is_moe and all(n in moe_state for n in names)
            stateless, stateful = _layer_fns(layer_module, is_dec)
            keys = None
            if base_rng is not None:
                seg_rng = jax.random.fold_in(
                    jax.random.fold_in(base_rng, tag), si)
                keys = jax.vmap(
                    lambda i, r=seg_rng: jax.random.fold_in(r, i))(
                        jnp.arange(n_microbatches))
            stacked = stack_subtrees(params, names)
            if has_state:
                x_mb, new_ls = pipeline_apply(
                    stateful, stacked, x_mb, ride=ride, rngs=keys,
                    mesh=mesh, remat=remat,
                    layer_state=stack_subtrees(moe_state, names))
                new_moe.update(unstack_subtrees(new_ls, names))
            else:
                x_mb = pipeline_apply(
                    stateless, stacked, x_mb, ride=ride, rngs=keys,
                    mesh=mesh, remat=remat)
        return x_mb

    def forward(params, moe_state, batch, d_rng: Optional[jax.Array]):
        det = d_rng is None
        rngs = None if det else {"dropout": d_rng}
        apply = lambda method, *a: model.apply(
            {"params": params}, *a, deterministic=det, rngs=rngs,
            method=method)
        vf = apply("embed_video_input", batch["semantic"],
                   batch["scene_offset"], batch["motion"], batch["emotion"])
        xf = apply("embed_decoder_input", batch["x"], batch["x_root"],
                   batch["x_attr"], batch["key"])

        new_moe = {}
        vf_mb = _run_stack(enc_segments, params, moe_state,
                           microbatch(vf, n_microbatches), None,
                           d_rng, 1, False, new_moe)
        memory = model.apply({"params": params}, unmicrobatch(vf_mb),
                             method="finalize_encoder")
        out_mb = _run_stack(dec_segments, params, moe_state,
                            microbatch(xf, n_microbatches),
                            {"memory": microbatch(memory, n_microbatches)},
                            d_rng, 2, True, new_moe)
        logits = model.apply({"params": params}, unmicrobatch(out_mb),
                             method="head")
        return logits, new_moe

    def train_step(state: TrainState, batch):
        rng, d_rng, l_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            logits, new_moe = forward(
                _maybe_bf16(params, tcfg), state.moe_state,
                _maybe_bf16_batch(batch, tcfg), d_rng)
            total, (lc, le) = amt_loss(
                logits, batch, tcfg, rng=(l_rng if drop_loss else None))
            return total, (total, lc, le, new_moe)

        grads, (total, lc, le, new_moe) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        moe_state = dict(state.moe_state)
        moe_state.update(new_moe)
        new_state = state.replace(step=state.step + 1, params=params,
                                  moe_state=moe_state,
                                  opt_state=opt_state, rng=rng)
        return new_state, {"loss": total, "loss_chord": lc,
                           "loss_emotion": le}

    return train_step
