"""Probe: do the dot_general forms the wide batched-attention kernel
needs lower under Mosaic on the real chip?

  * NT  — logits = dot_general(k_slab (rows, D), q_cat (C, D),
          contract (1,1)) -> (rows, C)
  * TN  — pv = dot_general(p (rows, C), v_slab (rows, D),
          contract (0,0)) -> (C, D)

Run from /root/repo with the TPU live; prints ok/error per form.
"""

import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, *, dims):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)


def run(name, a_shape, b_shape, out_shape, dims, dtype):
    a = jnp.asarray(np.random.RandomState(0).randn(*a_shape), dtype)
    b = jnp.asarray(np.random.RandomState(1).randn(*b_shape), dtype)
    try:
        out = pl.pallas_call(
            functools.partial(_kernel, dims=dims),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(a, b)
        want = jax.lax.dot_general(
            a.astype(jnp.float32), b.astype(jnp.float32),
            dimension_numbers=(dims, ((), ())))
        err = float(jnp.max(jnp.abs(out - want)) /
                    (jnp.max(jnp.abs(want)) + 1e-9))
        print(f"{name}: ok, rel_err={err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL — {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    rows, D, C = 2400, 512, 64
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        run(f"NT logits {tag}", (rows, D), (C, D), (rows, C),
            ((1,), (1,)), dt)
        run(f"TN pv {tag}", (rows, C), (rows, D), (C, D),
            ((0,), (0,)), dt)
        run(f"NT tiny-diag {tag}", (C, D), (C, D), (C, C),
            ((1,), (1,)), dt)
