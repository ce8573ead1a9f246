"""Epoch-loop drivers: the re-build of ``train.py`` / ``train_regression.py``.

Reproduces the reference's training protocol (reference: ``train.py:262-380``):
per-epoch train pass, eval on a train subset (skipped under augmentation) and
the val split, CSV results row per epoch with the same header, best-val-loss
checkpointing plus periodic epoch snapshots — minus the things the rebuild
must not inherit (globally-enabled autograd anomaly mode ``train.py:28``,
per-batch host syncs).

Device strategy: batches stream as stacked numpy dicts; one jitted train
step; optional (data, model) mesh sharding via ``parallel.mesh``.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..core import constants as C
from ..core.config import TrainConfig
from ..data.dataset import batches as make_batches
from ..data.loader import PrefetchLoader, device_prefetch
from . import checkpoint as ckpt
from .optim import make_optimizer, noam_schedule
from .step import (TrainState, create_train_state, make_amt_eval_step,
                   make_amt_train_step, make_regression_eval_step,
                   make_regression_train_step, regression_init)

CSV_HEADER = [
    "Epoch", "Learn rate",
    "Avg Train loss (total)", "Avg Train loss (chord)",
    "Avg Train loss (emotion)",
    "Avg Train h1", "Avg Train h3", "Avg Train h5",
    "Avg Eval loss (total)", "Avg Eval loss (chord)",
    "Avg Eval loss (emotion)",
    "Avg Eval h1", "Avg Eval h3", "Avg Eval h5",
]

REG_CSV_HEADER = [
    "Epoch", "Learn rate", "Avg Train loss (total)",
    "Avg Eval loss (total)", "Eval RMSE (note density)",
    "Eval RMSE (loudness)", "Eval BCE (instrument)",
]


def _mean_metrics(rows) -> Dict[str, float]:
    """Average per-batch metric dicts; correspondence ignores -1 batches
    (no frame passed the emotion filter), matching the reference's eval
    accumulation (run_model_vevo.py:428-435)."""
    if not rows:
        return {}
    out = {}
    keys = rows[0].keys()
    for k in keys:
        vals = np.asarray([float(r[k]) for r in rows])
        if k == "correspondence":
            vals = vals[vals >= 0.0]
            out[k] = float(vals.mean()) if vals.size else -1.0
        else:
            out[k] = float(vals.mean())
    return out


@dataclass
class LoopConfig:
    epochs: int = 50
    batch_size: int = 32
    output_dir: str = "./saved_models"
    weight_modulus: int = 1          # epoch snapshot period (train.py:359)
    eval_train_subset: bool = True   # skipped when augmentation is on
    seed: int = 0
    continue_from: Optional[str] = None
    # LR-schedule offset for weights-only resumes (the reference's
    # init_step = epoch * len(loader), train.py:188-193). Ignored on a full
    # TrainState restore, whose own step counter already carries the offset.
    init_steps: int = 0
    # Resume from the newest epoch_NNNN snapshot in output_dir/weights when
    # present (a robustness upgrade over the reference's manual
    # -continue_weights/-continue_epoch pair); epoch numbering continues.
    auto_resume: bool = False
    # -profile N: capture a jax.profiler trace of train steps 1..N (step 0
    # is the compile step) into profile_dir — the TPU-native replacement
    # for the reference's always-on torch anomaly mode + per-batch prints
    # (train.py:28, run_model_vevo.py:182-193). View with TensorBoard's
    # profile plugin / xprof.
    profile_steps: int = 0
    profile_dir: str = "./profile"
    # TensorBoard scalar stream (reference: train.py:90-96,349-357 — on by
    # default there, opt-out via --no_tensorboard). Event files come from
    # the first-party writer in obs/tensorboard.py (no tensorboard dep);
    # None disables. The same reference tags are written per epoch.
    tensorboard_dir: Optional[str] = None
    log_fn: Callable[[str], None] = print


def _make_tb(loop: "LoopConfig"):
    if not loop.tensorboard_dir:
        return None
    from ..obs.tensorboard import SummaryWriter

    return SummaryWriter(loop.tensorboard_dir)


class StepProfiler:
    """Traces steps [1, 1+n) of the first epoch pass it sees, once."""

    def __init__(self, n_steps: int, out_dir: str, log_fn=print):
        self.n = n_steps
        self.dir = out_dir
        self.log_fn = log_fn
        self._active = False
        self._done = n_steps <= 0

    def maybe_start(self, i: int) -> None:
        if self._done or self._active or i != 1:
            return
        os.makedirs(self.dir, exist_ok=True)
        jax.profiler.start_trace(self.dir)
        self._active = True

    def maybe_stop(self, i: int, metrics) -> None:
        if not self._active or i < self.n:
            return
        # the dispatched steps must finish before the trace flushes, or
        # the device timeline is truncated
        jax.block_until_ready(metrics)
        jax.profiler.stop_trace()
        self._active, self._done = False, True
        self.log_fn(f"profiled steps 1..{i} -> {self.dir} "
                    "(TensorBoard profile plugin / xprof)")


def _make_profiler(loop: "LoopConfig"):
    return (StepProfiler(loop.profile_steps, loop.profile_dir, loop.log_fn)
            if loop.profile_steps > 0 else None)


def _latest_epoch_snapshot(weights_dir: str):
    """(path, epoch) of the newest epoch_NNNN checkpoint, or (None, 0)."""
    best, best_epoch = None, 0
    if os.path.isdir(weights_dir):
        for name in os.listdir(weights_dir):
            if name.startswith("epoch_"):
                try:
                    e = int(name.split("_", 1)[1])
                except ValueError:
                    continue
                if e > best_epoch:
                    best, best_epoch = os.path.join(weights_dir, name), e
    return best, best_epoch


def _restore_continue(loop: LoopConfig, state, tcfg: TrainConfig):
    """continue_from restore with LR-schedule awareness: a params-only
    fallback restarts optimizer state/step at 0, so unless the caller
    offset the schedule via LoopConfig.init_steps the Noam warmup silently
    restarts — surface that instead of hiding it."""
    state, full = ckpt.restore_checkpoint(loop.continue_from, state,
                                          return_full=True)
    if not full and loop.init_steps == 0 and tcfg.lr is None:
        loop.log_fn(
            "warning: params-only checkpoint restore from "
            f"{loop.continue_from!r} — optimizer state and the Noam warmup "
            "restarted at step 0; set LoopConfig.init_steps to offset the "
            "LR schedule (reference train.py:188-193 semantics)")
    return state


def _train_put(tcfg, device_put):
    """Train-pass staging: with mixed precision, float inputs ship bf16
    (``wire_bf16_batch`` — the step casts them in-graph anyway, so this is
    numerically identical at half the H2D bytes; at B=16 the AMT batch is
    28 MB and transfer dominates the 54 ms step through a tunneled
    device). Eval passes keep the plain put — eval forwards run f32."""
    if not getattr(tcfg, "mixed_precision", False):
        return device_put
    from .step import wire_bf16_batch

    base = device_put if device_put is not None else jax.device_put
    return lambda b: base(wire_bf16_batch(b))


def _epoch_pass(step_fn, state, batches_iter, device_put=None,
                profiler: Optional[StepProfiler] = None):
    # device_prefetch stages the next batch's H2D copy while the current
    # step computes (async dispatch); device_put=None uses jax.device_put
    losses = []
    for i, batch in enumerate(device_prefetch(batches_iter, device_put)):
        if profiler is not None:
            profiler.maybe_start(i)
        state, m = step_fn(state, batch)
        losses.append(m)
        if profiler is not None:
            profiler.maybe_stop(i, m)
    return state, losses


def _full_batches(batches_iter, batch_size: int, log_fn):
    """Drop ragged trailing batches (mesh runs need every batch divisible
    by the data axis / microbatch count — sharded device_put rejects a
    partial batch mid-epoch otherwise). The reference's DataLoader keeps
    partial batches (drop_last defaults False); single-device runs here do
    too — only mesh runs drop, with a one-time notice."""
    warned = False
    for batch in batches_iter:
        n = next(iter(batch.values())).shape[0]
        if n != batch_size:
            if not warned:
                log_fn(f"mesh run: dropping ragged batch of {n} "
                       f"(< batch_size {batch_size}) — sharded steps need "
                       "full batches")
                warned = True
            continue
        yield batch


def _eval_pass(eval_fn, state, dataset, batch_size, device_put=None,
               full_only=False, log_fn=print):
    rows = []
    batches = make_batches(dataset, batch_size, shuffle=False)
    if full_only:
        batches = _full_batches(batches, batch_size, log_fn)
    for batch in device_prefetch(batches, device_put):
        rows.append(eval_fn(state.params, state.moe_state, batch))
    return _mean_metrics(rows)


def _place_sharded(state: TrainState, mesh, *, tp: bool) -> TrainState:
    """Replicate/shard a TrainState for a (data, model) mesh: params per
    ``param_shardings`` (EP always; Megatron TP when ``tp``), everything
    else replicated."""
    from ..parallel import param_shardings, replicated

    p_sh = param_shardings(mesh, state.params, tp=tp)
    rep = replicated(mesh)
    return state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, p_sh),
        moe_state=jax.device_put(state.moe_state, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        rng=jax.device_put(state.rng, rep),
        step=jax.device_put(state.step, rep))


def train_amt(model, tcfg: TrainConfig, loop: LoopConfig, train_ds, val_ds,
              *, drop_loss: bool = False, device_put=None, mesh=None,
              parallel: str = "dp", n_microbatches: int = 4) -> TrainState:
    """Full AMT training run. Returns the final state; writes
    ``results.csv``, ``best_loss_weights``, ``epoch_NNNN`` under
    loop.output_dir (reference: train.py:86-103,262-373).

    Multi-chip: pass a ``parallel.create_mesh`` mesh plus a strategy —
    "dp" (batch over "data"; EP expert stacks over "model"), "tp"
    (+ Megatron column/row weight shardings), "sp" (tp + sequence-parallel
    residual stream; the model cfg must set ``sequence_parallel=True``),
    or "pp" (GPipe pipeline stages over "model", homogeneous stacks only).
    The reference is strictly single-device (SURVEY §2.5)."""
    if mesh is not None:
        from ..parallel import shard_batch

        if parallel not in ("dp", "tp", "sp", "pp"):
            raise ValueError(f"unknown parallel strategy {parallel!r}")
        if parallel == "sp" and not model.cfg.sequence_parallel:
            raise ValueError(
                "parallel='sp' needs AMTConfig.sequence_parallel=True")
        data = mesh.shape["data"]
        if loop.batch_size % data:
            raise ValueError(
                f"batch_size {loop.batch_size} not divisible by the "
                f"data-axis size {data}")
        if parallel == "pp" and (
                loop.batch_size % n_microbatches
                or (loop.batch_size // n_microbatches) % data):
            raise ValueError(
                f"pp needs batch_size divisible by n_microbatches "
                f"({n_microbatches}) and each microbatch divisible by the "
                f"data axis ({data}); got {loop.batch_size}")
        if device_put is None:
            device_put = lambda b: shard_batch(mesh, b)
    mesh_ctx = (jax.sharding.set_mesh(mesh)
                if mesh is not None and parallel == "sp"
                else contextlib.nullcontext())
    with mesh_ctx:
        return _train_amt_body(model, tcfg, loop, train_ds, val_ds,
                               drop_loss=drop_loss, device_put=device_put,
                               mesh=mesh, parallel=parallel,
                               n_microbatches=n_microbatches)


def _train_amt_body(model, tcfg, loop, train_ds, val_ds, *, drop_loss,
                    device_put, mesh, parallel, n_microbatches) -> TrainState:
    os.makedirs(loop.output_dir, exist_ok=True)
    results_file = os.path.join(loop.output_dir, "results.csv")
    weights_dir = os.path.join(loop.output_dir, "weights")
    os.makedirs(weights_dir, exist_ok=True)

    tx = make_optimizer(tcfg, d_model=model.cfg.d_model,
                        init_steps=loop.init_steps)
    first = next(make_batches(train_ds, loop.batch_size, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(tcfg.seed),
                               first)
    start_epoch = 0
    if not loop.continue_from and loop.auto_resume:
        snap, start_epoch = _latest_epoch_snapshot(weights_dir)
        if snap:
            loop = dataclasses.replace(loop, continue_from=snap)
            loop.log_fn(f"auto-resume: epoch {start_epoch} from {snap}")
    if loop.continue_from:
        state = _restore_continue(loop, state, tcfg)
    if mesh is not None:
        state = _place_sharded(state, mesh, tp=parallel in ("tp", "sp"))

    # donate the train state: params/opt buffers update in place instead
    # of being copied every step (ignored with a warning on CPU)
    if mesh is not None and parallel == "pp":
        from .pp import make_amt_pp_train_step

        train_step = jax.jit(
            make_amt_pp_train_step(model, tx, tcfg, mesh,
                                   n_microbatches=n_microbatches,
                                   drop_loss=drop_loss),
            donate_argnums=(0,))
    else:
        train_step = jax.jit(make_amt_train_step(model, tx, tcfg,
                                                 drop_loss=drop_loss),
                             donate_argnums=(0,))
    eval_step = jax.jit(make_amt_eval_step(model, tcfg))
    sched = noam_schedule(model.cfg.d_model, tcfg.warmup_steps)

    if not os.path.isfile(results_file):
        with open(results_file, "w", newline="") as f:
            csv.writer(f).writerow(CSV_HEADER)

    best_eval_loss, best_epoch = float("inf"), -1
    # threaded prefetch: file parsing (C++ fast path) overlaps device compute
    loader = PrefetchLoader(train_ds, loop.batch_size, shuffle=True,
                            seed=loop.seed)
    sharded = mesh is not None
    profiler = _make_profiler(loop)
    tb = _make_tb(loop)
    for epoch in range(start_epoch, loop.epochs):
        t0 = time.time()
        train_iter = (_full_batches(loader, loop.batch_size, loop.log_fn)
                      if sharded else loader)
        state, _ = _epoch_pass(train_step, state, train_iter,
                               device_put=_train_put(tcfg, device_put),
                               profiler=profiler)
        train_m = (_eval_pass(eval_step, state, train_ds, loop.batch_size,
                              device_put, full_only=sharded,
                              log_fn=loop.log_fn)
                   if loop.eval_train_subset else {})
        eval_m = _eval_pass(eval_step, state, val_ds, loop.batch_size,
                            device_put, full_only=sharded,
                            log_fn=loop.log_fn)
        lr = (float(sched(int(state.step))) if tcfg.lr is None else tcfg.lr)
        loop.log_fn(
            f"epoch {epoch + 1}/{loop.epochs} "
            f"val_loss={eval_m['loss']:.4f} h1={eval_m['hits@1']:.4f} "
            f"h3={eval_m['hits@3']:.4f} h5={eval_m['hits@5']:.4f} "
            f"({time.time() - t0:.1f}s)")
        if tb is not None:
            # same tags and 1-based step as the reference (train.py:349-357;
            # its train-side lines are commented out there too)
            tb.add_scalar("Avg_CE_loss/eval", eval_m["loss"], epoch + 1)
            tb.add_scalar("Avg_CE_loss_chord/eval", eval_m["loss_chord"],
                          epoch + 1)
            tb.add_scalar("Avg_CE_loss_emotion/eval",
                          eval_m["loss_emotion"], epoch + 1)
            tb.add_scalar("Learn_rate/train", lr, epoch + 1)
            tb.flush()

        if eval_m["loss"] < best_eval_loss:
            best_eval_loss, best_epoch = eval_m["loss"], epoch + 1
            ckpt.save_checkpoint(
                os.path.join(weights_dir, "best_loss_weights"), state)
            with open(os.path.join(loop.output_dir, "best_epochs.txt"),
                      "w") as f:
                f.write(f"Best val loss epoch: {best_epoch}\n"
                        f"Best val loss: {best_eval_loss}\n")
        if (epoch + 1) % loop.weight_modulus == 0:
            ckpt.save_checkpoint(
                os.path.join(weights_dir, f"epoch_{epoch + 1:04d}"), state)

        with open(results_file, "a", newline="") as f:
            csv.writer(f).writerow([
                epoch + 1, lr,
                train_m.get("loss", ""), train_m.get("loss_chord", ""),
                train_m.get("loss_emotion", ""),
                train_m.get("hits@1", ""), train_m.get("hits@3", ""),
                train_m.get("hits@5", ""),
                eval_m["loss"], eval_m["loss_chord"], eval_m["loss_emotion"],
                eval_m["hits@1"], eval_m["hits@3"], eval_m["hits@5"],
            ])
    if tb is not None:
        tb.close()
    return state


def train_regression(model, tcfg: TrainConfig, loop: LoopConfig, train_ds,
                     val_ds, *, device_put=None) -> TrainState:
    """Regression training run (reference: train_regression.py:35-236).
    Best checkpoint is chosen by total RMSE (reference: :213-217)."""
    os.makedirs(loop.output_dir, exist_ok=True)
    results_file = os.path.join(loop.output_dir, "results.csv")
    weights_dir = os.path.join(loop.output_dir, "weights")
    os.makedirs(weights_dir, exist_ok=True)

    tx = make_optimizer(tcfg, d_model=model.cfg.d_model,
                        init_steps=loop.init_steps)
    first = next(make_batches(train_ds, loop.batch_size, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(tcfg.seed),
                               first, init_fn=regression_init)
    if loop.continue_from:
        state = _restore_continue(loop, state, tcfg)

    train_step = jax.jit(make_regression_train_step(model, tx, tcfg),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_regression_eval_step(model))

    if not os.path.isfile(results_file):
        with open(results_file, "w", newline="") as f:
            csv.writer(f).writerow(REG_CSV_HEADER)

    best_rmse = float("inf")
    loader = PrefetchLoader(train_ds, loop.batch_size, shuffle=True,
                            seed=loop.seed)
    profiler = _make_profiler(loop)
    for epoch in range(loop.epochs):
        state, train_rows = _epoch_pass(
            train_step, state, loader,
            device_put=_train_put(tcfg, device_put), profiler=profiler)
        train_loss = float(np.mean([float(r["loss"]) for r in train_rows]))

        rows = []
        for batch in make_batches(val_ds, loop.batch_size, shuffle=False):
            if device_put is not None:
                batch = device_put(batch)
            rows.append(eval_step(state.params, state.moe_state, batch))
        se_nd = sum(float(r["se_note_density"]) for r in rows)
        se_ln = sum(float(r["se_loudness"]) for r in rows)
        n = sum(float(r["count"]) for r in rows)
        rmse_nd = float(np.sqrt(se_nd / max(n, 1.0)))
        rmse_ln = float(np.sqrt(se_ln / max(n, 1.0)))
        bce = float(np.mean([float(r["bce_instrument"]) for r in rows]))
        eval_loss = float(np.mean([float(r["loss"]) for r in rows]))
        loop.log_fn(f"epoch {epoch + 1}/{loop.epochs} "
                    f"rmse_nd={rmse_nd:.4f} rmse_loud={rmse_ln:.4f} "
                    f"bce={bce:.4f}")

        total_rmse = rmse_nd + rmse_ln
        if total_rmse < best_rmse:
            best_rmse = total_rmse
            ckpt.save_checkpoint(
                os.path.join(weights_dir, "best_rmse_weights"), state)
        with open(results_file, "a", newline="") as f:
            csv.writer(f).writerow([epoch + 1, tcfg.lr or "", train_loss,
                                    eval_loss, rmse_nd, rmse_ln, bce])
    return state


def train_music_transformer(model, tcfg: TrainConfig, loop: LoopConfig,
                            train_ds, val_ds, *,
                            device_put=None) -> TrainState:
    """MusicTransformer (no-video) training run — the reference's
    IS_VIDEO=False branch (reference: run_model_vevo.py:135-180,
    utilities/constants.py IS_VIDEO). Chord-only CE; same CSV shape with
    empty emotion columns."""
    from .step import (make_music_transformer_eval_step,
                       make_music_transformer_train_step,
                       music_transformer_init)

    os.makedirs(loop.output_dir, exist_ok=True)
    results_file = os.path.join(loop.output_dir, "results.csv")
    weights_dir = os.path.join(loop.output_dir, "weights")
    os.makedirs(weights_dir, exist_ok=True)

    tx = make_optimizer(tcfg, d_model=model.cfg.d_model,
                        init_steps=loop.init_steps)
    first = next(make_batches(train_ds, loop.batch_size, shuffle=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(tcfg.seed),
                               first, init_fn=music_transformer_init)
    if loop.continue_from:
        state = _restore_continue(loop, state, tcfg)

    train_step = jax.jit(make_music_transformer_train_step(model, tx, tcfg),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_music_transformer_eval_step(model, tcfg))

    if not os.path.isfile(results_file):
        with open(results_file, "w", newline="") as f:
            csv.writer(f).writerow(CSV_HEADER)

    best_eval_loss = float("inf")
    loader = PrefetchLoader(train_ds, loop.batch_size, shuffle=True,
                            seed=loop.seed)
    profiler = _make_profiler(loop)
    for epoch in range(loop.epochs):
        t0 = time.time()
        state, _ = _epoch_pass(train_step, state, loader,
                               device_put=_train_put(tcfg, device_put),
                               profiler=profiler)
        eval_m = _eval_pass(eval_step, state, val_ds, loop.batch_size,
                            device_put)
        loop.log_fn(f"epoch {epoch + 1}/{loop.epochs} "
                    f"val_loss={eval_m['loss']:.4f} "
                    f"h1={eval_m['hits@1']:.4f} ({time.time() - t0:.1f}s)")
        if eval_m["loss"] < best_eval_loss:
            best_eval_loss = eval_m["loss"]
            ckpt.save_checkpoint(
                os.path.join(weights_dir, "best_loss_weights"), state)
        with open(results_file, "a", newline="") as f:
            csv.writer(f).writerow([
                epoch + 1, "", "", "", "", "", "", "",
                eval_m["loss"], eval_m["loss"], "",
                eval_m["hits@1"], eval_m["hits@3"], eval_m["hits@5"]])
    return state
