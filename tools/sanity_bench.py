import dataclasses, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from video2music_tpu.core.config import amt_config, TrainConfig
from video2music_tpu.models import VideoMusicTransformer
from video2music_tpu.train import (create_train_state, make_optimizer,
                                   make_amt_train_step)
from video2music_tpu.core.vocab import emotion_chord_targets
from video2music_tpu.core import constants as C

rng = np.random.default_rng(0)
B, L = 16, 300
rows = emotion_chord_targets()
eid = rng.integers(0, 6, (B, L - 1))
bf = jnp.bfloat16
batch = dict(
    x=jnp.asarray(rng.integers(0, C.CHORD_END, (B, L - 1))),
    x_root=jnp.asarray(rng.integers(0, 13, (B, L - 1))),
    x_attr=jnp.asarray(rng.integers(0, 14, (B, L - 1))),
    tgt=jnp.asarray(rng.integers(0, C.CHORD_END, (B, L - 1))),
    tgt_emotion=jnp.asarray(rows[eid]),
    tgt_emotion_prob=jnp.asarray(rng.uniform(0.5, 1, (B, L - 1)).astype(np.float32)).astype(bf),
    semantic=jnp.asarray(rng.standard_normal((B, L, 768)).astype(np.float32)).astype(bf),
    key=jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32)).astype(bf),
    scene_offset=jnp.asarray(rng.integers(0, 12, (B, L)).astype(np.float32)).astype(bf),
    motion=jnp.asarray(rng.standard_normal((B, L, 512)).astype(np.float32)).astype(bf),
    emotion=jnp.asarray(rng.uniform(size=(B, L, 6)).astype(np.float32)).astype(bf))

cfg = amt_config("2.2", total_vf_dim=1287)
model = VideoMusicTransformer(cfg=cfg)
tcfg = TrainConfig(optimizer="adamw", lr=None)
tx = make_optimizer(tcfg, d_model=cfg.d_model)
state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
state = state.replace(params=jax.tree_util.tree_map(
    lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, state.params))
step = jax.jit(make_amt_train_step(model, tx, tcfg), donate_argnums=(0,))
t0 = time.perf_counter()
state, m = step(state, batch)
np.asarray(m["loss"])
print(f"compiled+first in {time.perf_counter()-t0:.0f}s", flush=True)
def run_n(state, n):
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    np.asarray(m["loss"])
    return time.perf_counter() - t0, state
t10, state = run_n(state, 10)
t50, state = run_n(state, 50)
print(f"train step: {(t50-t10)/40*1e3:.1f} ms/step (was 50.4 yesterday)", flush=True)
