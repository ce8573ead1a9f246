"""Per-tensor HBM-traffic audit of the full-size AMT train step.

VERDICT r3 item 3: the B=16 train step has sat at ~54 ms since round 1
with CLAUDE.md's hand count (~45 GB bytes-accessed) implying it is AT the
v5e HBM roofline — but the hand count ignores XLA fusion (counted bytes
overestimate true traffic), so "at the roofline" was never proven. This
tool asks the COMPILER instead:

  * ``compiled.cost_analysis()`` — XLA's post-optimization estimate of
    total bytes accessed and FLOPs for the step executable;
  * the measured step time (same slope method as bench.py);
  * utilization = (bytes / 819 GB/s nominal) / measured — how close the
    step runs to the compiler-counted traffic floor;
  * an analytic per-tensor table of the dominant activation flows
    (attention saves, FFN/MoE intermediates, residual/LN round-trips) so
    the budget is inspectable, not just a total.

Decision rule (recorded in BACKLOG): utilization >= ~0.9 -> the step is
traffic-bound and flat-54ms is the hardware talking; below that, the gap
names the fusion worth building (fold LN/residual into the attention
kernels' fwd/bwd so saves stop round-tripping HBM).

Run from /root/repo; ONE TPU process at a time.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np


def build_step(B=16, mixed=True, **cfg_overrides):
    from video2music_tpu.core.config import TrainConfig, amt_config
    from video2music_tpu.models import VideoMusicTransformer
    from video2music_tpu.train import (create_train_state,
                                       make_amt_train_step, make_optimizer)
    sys.path.insert(0, ".")
    import bench

    cfg = amt_config("2.2", total_vf_dim=1287, **cfg_overrides)
    model = VideoMusicTransformer(cfg=cfg)
    batch = bench._train_batch(B)
    tcfg = TrainConfig(optimizer="adamw", lr=1e-4, mixed_precision=mixed)
    tx = make_optimizer(tcfg, d_model=cfg.d_model)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_amt_train_step(model, tx, tcfg),
                   donate_argnums=(0,))
    return step, state, batch, cfg


def measured_ms(step, state, batch, n_lo=5, n_hi=30, reps=3):
    def timed(state, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, batch)
        float(m["loss"])
        return time.perf_counter() - t0, state

    state, m = step(state, batch)
    float(m["loss"])
    slopes = []
    for _ in range(reps):
        t_lo, state = timed(state, n_lo)
        t_hi, state = timed(state, n_hi)
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    slopes.sort()
    return slopes[len(slopes) // 2] * 1000


def analytic_table(B=16, L=300, D=512, F=1024, E=6, H=8, n_enc=6, n_dec=6):
    """Dominant per-step activation flows, counted by hand (fwd write +
    bwd read of each saved tensor, bf16 = 2 bytes), for inspectability.
    XLA fuses many of these away — the compiler total is the authority;
    this table says WHERE the bytes live."""
    mb = 1 / (1024 ** 2)
    Lc = L - 1
    deep = 3 + 3  # MoE layers (enc + dec at reference depth split)
    shallow = (n_enc - 3) + (n_dec - 3)
    rows = []

    def add(name, count, elems):
        rows.append((name, count, round(elems * 2 * 2 * count * mb, 1)))

    add("attn qkv+out proj saves (per attn)", n_enc + 2 * n_dec,
        4 * B * L * D)
    add("flash-attn saved out+lse (per attn)", n_enc + 2 * n_dec,
        B * L * D + B * H * L)
    add("residual+LN saves (per layer, 3 streams)", n_enc + n_dec,
        3 * B * L * D)
    add("SwiGLU h,g saves (shallow)", shallow, 2 * B * L * F)
    add("MoE dense h,g saves (B,L,E,F)!", deep, 2 * B * Lc * E * F)
    add("MoE dense expert_out (B,L,E,D)", deep, B * Lc * E * D)
    add("logits f32 (B,L,159) + softmax", 1, 2 * B * Lc * 159 * 2)
    total = sum(r[2] for r in rows)
    return rows, total


def main():
    step, state, batch, cfg = build_step()
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    bytes_accessed = float(ca.get("bytes accessed", float("nan")))
    flops = float(ca.get("flops", float("nan")))
    ms = measured_ms(step, state, batch)

    hbm_gbs = 819e9  # v5e nominal
    floor_ms = bytes_accessed / hbm_gbs * 1000
    mxu_floor_ms = flops / 197e12 * 1000  # v5e bf16 peak
    rows, analytic_total = analytic_table()

    print(f"measured step: {ms:.2f} ms")
    print(f"compiler bytes accessed: {bytes_accessed / 1e9:.2f} GB "
          f"-> traffic floor {floor_ms:.2f} ms at 819 GB/s "
          f"({floor_ms / ms * 100:.0f}% of measured)")
    print(f"compiler flops: {flops / 1e12:.2f} TF "
          f"-> MXU floor {mxu_floor_ms:.2f} ms "
          f"({mxu_floor_ms / ms * 100:.0f}% of measured)")
    print("\nanalytic save-tensor table (fwd write + bwd read, bf16):")
    for name, count, mbytes in rows:
        print(f"  {name:<48} x{count:<3} {mbytes:>9.1f} MB")
    print(f"  analytic activation total: {analytic_total / 1024:.2f} GB "
          "(excl. weights/optimizer/grads ~0.5 GB)")
    print(json.dumps({
        "measured_ms": round(ms, 2),
        "compiler_bytes_gb": round(bytes_accessed / 1e9, 2),
        "traffic_floor_ms": round(floor_ms, 2),
        "mxu_floor_ms": round(mxu_floor_ms, 2),
        "roofline_utilization": round(max(floor_ms, mxu_floor_ms) / ms, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
