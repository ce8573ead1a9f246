"""GPipe-style SPMD pipeline parallelism over a mesh axis.

The reference has no distributed machinery at all (single ``cuda:0``,
reference: ``utilities/device.py:6-13``); pipeline parallelism is one of the
strategies this TPU-native framework adds on top of parity (SURVEY §2.5).
The design is the standard TPU recipe: pipeline **stages live along a mesh
axis**, microbatches stream through the stage ring with
``jax.lax.ppermute`` over ICI, and the whole schedule is a single
differentiable ``jax.shard_map`` region inside the jitted train step —
reverse-mode AD flips the ring automatically, so the backward pass is the
mirrored pipeline with no hand-written adjoint.

Schedule: GPipe with M microbatches over S stages — M + S - 1 ticks, bubble
fraction (S-1)/(M+S-1). Each device holds ``n_layers / S`` consecutive
layers as one stacked parameter slice and applies them with a
``lax.scan``.

Composes with data parallelism: the microbatch sample axis stays sharded
over the "data" mesh axis while stages occupy the "model" axis (the same
axis used for TP/EP in non-pipelined steps — at AMT scale you pick one use
of the axis per step).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def stack_subtrees(tree: Any, names) -> Any:
    """Stack the named subtrees of ``tree`` into one tree with a leading
    (len(names), ...) axis. All subtrees must share an identical structure
    (homogeneous stack). Pure ``jnp.stack`` per leaf — differentiable, and
    gradients w.r.t. the stacked tree unstack transparently."""
    subtrees = [tree[n] for n in names]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *subtrees)


def unstack_subtrees(stacked: Any, names) -> Any:
    """Inverse of :func:`stack_subtrees`: leading-axis slices back into a
    ``{name: subtree}`` dict."""
    return {n: jax.tree_util.tree_map(lambda s, j=j: s[j], stacked)
            for j, n in enumerate(names)}


def stack_layer_params(params: Any, prefix: str, n_layers: int) -> Any:
    """Stack per-layer parameter subtrees ``{prefix}0..{prefix}{n-1}`` into
    one tree with a leading (n_layers, ...) axis (see
    :func:`stack_subtrees`) — e.g. the base AMT's n identical
    encoder/decoder layers (reference:
    ``model/video_music_transformer.py:956-971``)."""
    return stack_subtrees(params, [f"{prefix}{i}" for i in range(n_layers)])


def microbatch(tree: Any, n_microbatches: int) -> Any:
    """Split the leading batch axis B into (M, B // M) on every leaf."""

    def split(x):
        b = x.shape[0]
        if b % n_microbatches:
            raise ValueError(
                f"batch {b} not divisible by {n_microbatches} microbatches")
        return x.reshape((n_microbatches, b // n_microbatches) + x.shape[1:])

    return jax.tree_util.tree_map(split, tree)


def unmicrobatch(tree: Any) -> Any:
    """Inverse of :func:`microbatch`: merge the leading (M, mb) axes."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), tree)


def pipeline_apply(layer_fn: Callable,
                   stacked_params: Any,
                   x_mb: jax.Array,
                   ride: Any = None,
                   rngs: Optional[jax.Array] = None,
                   *,
                   mesh: Mesh,
                   axis: str = MODEL_AXIS,
                   data_axis: str = DATA_AXIS,
                   remat: bool = False,
                   layer_state: Any = None):
    """Run a homogeneous layer stack as a GPipe pipeline over ``axis``.

    Args:
      layer_fn: applies ONE layer. Stateless stacks:
        ``layer_fn(layer_params, x, ride, rng) -> x``. With
        ``layer_state``: ``layer_fn(layer_params, state, x, ride, rng) ->
        (x, new_state)`` — e.g. flax mutables like the MoE balancing bias.
        ``x`` is (mb, L, D); ``ride`` is the per-microbatch side input
        pytree (e.g. cross-attention memory) riding through the ring
        unchanged; ``rng`` is a PRNG key (dropout) or None.
      stacked_params: pytree with leading (n_layers, ...) axis;
        ``n_layers`` must be divisible by the axis size S. Device ``s``
        holds layers ``[s*k, (s+1)*k)`` (consecutive — matching the
        sequential layer order).
      x_mb: (M, mb, L, D) microbatched activations (see :func:`microbatch`);
        the ``mb`` axis may be sharded over ``data_axis``.
      ride: pytree of (M, mb, ...) side inputs, or None.
      rngs: (M,) stacked PRNG keys, one per microbatch, or None. Inside a
        stage each layer folds in its global layer index so dropout streams
        are independent across layers.
      remat: rematerialize each stage application in the backward pass
        (GPipe's activation-memory trade).
      layer_state: optional pytree with leading (n_layers, ...) axis of
        per-layer mutable state. State is STAGE-LOCAL: each stage sees its
        microbatches in order and commits updates only on real (non-bubble)
        ticks, so per-call state stepping (the reference's per-forward MoE
        buffer updates, ``moe.py:274-280``) is preserved — M microbatches
        = M sequential state steps, like M small-batch forwards.

    Returns:
      (M, mb, L, D) outputs (same sharding as ``x_mb``), or a tuple
      ``(outputs, new_layer_state)`` when ``layer_state`` is given.
    """
    n_stages = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers not divisible by {n_stages} pipeline stages")
    layers_per_stage = n_layers // n_stages
    n_micro = x_mb.shape[0]
    have_ride = ride is not None
    have_rng = rngs is not None
    have_state = layer_state is not None
    ride = ride if have_ride else ()
    rngs = rngs if have_rng else jnp.zeros((n_micro, 2), jnp.uint32)
    layer_state = layer_state if have_state else ()

    def stage_apply(w_stage, ls_stage, x, r, rng, stage_idx):
        """Apply this device's ``layers_per_stage`` consecutive layers."""

        def body(h, wl):
            w_layer, ls_layer, local_idx = wl
            layer_rng = jax.random.fold_in(
                rng, stage_idx * layers_per_stage + local_idx)
            args = (h, r if have_ride else None,
                    layer_rng if have_rng else None)
            if have_state:
                h, new_ls = layer_fn(w_layer, ls_layer, *args)
            else:
                h, new_ls = layer_fn(w_layer, *args), ls_layer
            return h, new_ls

        if remat:
            body = jax.checkpoint(body)
        h, new_ls = jax.lax.scan(
            body, x, (w_stage, ls_stage, jnp.arange(layers_per_stage)))
        return h, new_ls

    def pipelined(w_stage, ls_stage, xs, rides, keys):
        # w_stage: (layers_per_stage, ...) local slice; xs: (M, mb, L, D)
        stage = jax.lax.axis_index(axis)
        state_x = jnp.zeros_like(xs[0])
        state_r = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a[0]),
                                         rides)
        state_k = jnp.zeros_like(keys[0])
        out = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state_x, state_r, state_k, ls, out = carry
            # stage 0 injects microbatch t for the first M ticks
            inj = jnp.minimum(t, n_micro - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, inj, 0, keepdims=False)
            use_inject = jnp.logical_and(stage == 0, t < n_micro)
            state_x = jnp.where(use_inject, take(xs), state_x)
            state_r = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use_inject, take(a), b), rides,
                state_r)
            state_k = jnp.where(use_inject, take(keys), state_k)
            h, new_ls = stage_apply(w_stage, ls, state_x, state_r, state_k,
                                    stage)
            # this tick processed a REAL microbatch iff 0 <= t-stage < M;
            # bubble ticks ran on garbage — discard their state updates
            valid = jnp.logical_and(t - stage >= 0, t - stage < n_micro)
            ls = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old), new_ls, ls)
            # the last stage finishes microbatch t - (S-1) at tick t
            out_idx = t - (n_stages - 1)
            write = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            safe = jnp.clip(out_idx, 0, n_micro - 1)
            prev = jax.lax.dynamic_index_in_dim(out, safe, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, h, prev), safe, 0)
            # rotate the ring: activation, ride, and rng move together
            # (layer state stays put — it belongs to the stage)
            state_x = jax.lax.ppermute(h, axis, perm)
            state_r = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, perm), state_r)
            state_k = jax.lax.ppermute(state_k, axis, perm)
            return (state_x, state_r, state_k, ls, out), None

        (_, _, _, ls, out), _ = jax.lax.scan(
            tick, (state_x, state_r, state_k, ls_stage, out),
            jnp.arange(n_micro + n_stages - 1))
        # only the last stage holds real outputs (zeros elsewhere) — one
        # psum replicates them over the pipe axis
        return jax.lax.psum(out, axis), ls

    mb_spec = P(None, data_axis)
    ride_specs = jax.tree_util.tree_map(lambda _: mb_spec, ride)
    state_specs = jax.tree_util.tree_map(lambda _: P(axis), layer_state)
    out, new_state = jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(P(axis), state_specs, mb_spec, ride_specs, P(None)),
        out_specs=(mb_spec, state_specs), check_vma=False,
    )(stacked_params, layer_state, x_mb, ride, rngs)
    return (out, new_state) if have_state else out
