"""Checkpoint save/restore via orbax.

The reference saves bare ``model.state_dict()`` pickles (best-val-loss file +
periodic epoch snapshots, reference: ``train.py:337-341,359-362``) and does
NOT save optimizer state, so resume restarts the LR schedule from a step
offset (``train.py:188-193``). Here a checkpoint is the full train state —
params, MoE functional state, optimizer state, step — so resume is exact;
the ``params_only=True`` mode reproduces the reference's weights-only file
for interop/eval.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _path(path: str) -> str:
    return os.path.abspath(os.fspath(path))


def save_checkpoint(path: str, state, *, params_only: bool = False,
                    config_json: Optional[dict] = None) -> None:
    """Write a checkpoint directory. ``state`` is a TrainState (or any
    pytree when params_only)."""
    tree = {"params": state.params} if params_only else {
        "params": state.params, "moe_state": state.moe_state,
        "opt_state": state.opt_state, "step": state.step}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_path(path), tree, force=True)
    if config_json is not None:
        with open(os.path.join(_path(path), "config.json"), "w") as f:
            json.dump(config_json, f, indent=2, default=str)


def restore_checkpoint(path: str, target_state, *, return_full: bool = False):
    """Restore into the structure of ``target_state`` (a freshly created
    TrainState). Falls back to params-only when the stored optimizer/step
    structure doesn't match the target (e.g. weights-only checkpoints, or
    eval restoring a state trained with a different optimizer).

    With ``return_full=True`` returns ``(state, was_full_restore)`` so
    callers can tell the exact-resume path from the params-only fallback
    (where optimizer state and the step counter restart at 0 — the LR
    schedule must then be offset, reference: train.py:188-193).
    """
    p = _path(path)
    full = {"params": target_state.params,
            "moe_state": target_state.moe_state,
            "opt_state": target_state.opt_state,
            "step": target_state.step}
    try:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(p, full)
        state, was_full = target_state.replace(**restored), True
    except Exception:
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                p, args=ocp.args.PyTreeRestore(
                    item={"params": target_state.params},
                    partial_restore=True))
        state, was_full = target_state.replace(params=restored["params"]), False
    return (state, was_full) if return_full else state


def load_params(path: str, params_like):
    """Restore only params, given a matching abstract/concrete tree."""
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_path(path), {"params": params_like})
    return restored["params"]
