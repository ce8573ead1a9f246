"""Pallas selective-scan kernel (the Mamba recurrence) for TPU.

The reference's only acknowledged custom kernel is the optional
``mamba_ssm`` CUDA ``selective_scan_fn`` import (reference:
``model/mamba.py:242-248,308-317``), with a Blelloch-scan torch fallback
(``model/pscan.py``). The jnp path here (ops/scan.py:selective_scan) uses
``jax.lax.associative_scan``, which materializes (B, L, ED, N)
intermediates in HBM — ~2 * L * ED * N * 4 bytes of extra traffic.

This kernel instead keeps the running state h (ED_block, N) resident in
VMEM and walks the sequence once: per (batch, ED-block) grid cell it
streams x/delta/B/C tiles and writes y tiles, touching each input exactly
once. For the framework's shapes (L=300, ED<=2048, N=16) the whole panel
fits in VMEM, so the time loop is a register-resident fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scan_kernel(x_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, y_ref, *,
                 seq_len: int):
    """One (batch, ED-block) cell: sequential scan over L.

    x/delta: (1, L, EDb); a: (EDb, N); b/c: (1, L, N); d: (1, EDb)
    y: (1, L, EDb)
    """
    A = a_ref[:]                       # (EDb, N)
    D = d_ref[0]                       # (EDb,)
    EDb = A.shape[0]
    N = A.shape[1]

    def step(t, h):
        x_t = x_ref[0, t]              # (EDb,)
        dt = delta_ref[0, t]           # (EDb,)
        B_t = b_ref[0, t]              # (N,)
        C_t = c_ref[0, t]              # (N,)
        dA = jnp.exp(dt[:, None] * A)  # (EDb, N)
        dBx = (dt * x_t)[:, None] * B_t[None, :]
        h = dA * h + dBx
        y_t = jnp.sum(h * C_t[None, :], axis=1) + D * x_t
        y_ref[0, t] = y_t.astype(y_ref.dtype)
        return h

    h0 = jnp.zeros((EDb, N), jnp.float32)
    jax.lax.fori_loop(0, seq_len, step, h0)


def selective_scan_pallas(x, delta, A, B, C, D, *, ed_block: int = 256,
                          interpret: bool = False):
    """Drop-in replacement for ops.scan.selective_scan (same signature):
    x/delta (b, L, ED), A (ED, N), B/C (b, L, N), D (ED,) -> y (b, L, ED)."""
    b, L, ED = x.shape
    N = A.shape[1]
    EDb = min(ed_block, _round_up(ED, 128))
    EDp = _round_up(ED, EDb)
    Np = _round_up(N, 128)

    pad_ed = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, EDp - ED)))
    x_p = pad_ed(x)
    d_p = pad_ed(delta)
    A_p = jnp.pad(A, ((0, EDp - ED), (0, Np - N)))
    B_p = jnp.pad(B, ((0, 0), (0, 0), (0, Np - N)))
    C_p = jnp.pad(C, ((0, 0), (0, 0), (0, Np - N)))
    D_p = jnp.pad(D, (0, EDp - ED))[None]

    grid = (b, EDp // EDb)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, seq_len=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, EDb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, EDb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDb, Np), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Np), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Np), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EDb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, EDb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, L, EDp), x.dtype),
        interpret=interpret,
    )(x_p, d_p, A_p, B_p, C_p, D_p)
    return out[:, :, :ED]
