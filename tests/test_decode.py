"""KV-cached decode must reproduce full-forward logits exactly, and the
constrained sampler must honor the reference's rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.core.config import amt_config
from video2music_tpu.core.vocab import chord_to_root_attr_tables
from video2music_tpu.decode import GenerateConfig, generate_chords
from video2music_tpu.models import VideoMusicTransformer

TINY = dict(n_layers=2, num_heads=2, d_model=16, d_ff=32,
            max_seq_video=12, max_seq_chord=12, total_vf_dim=11, dropout=0.0)


def _features(rng, B=1, Lv=12):
    return dict(
        semantic=jnp.asarray(rng.standard_normal((B, Lv, 7)).astype(np.float32)),
        key=jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32)),
        scene_offset=jnp.asarray(rng.integers(0, 12, (B, Lv)).astype(np.float32)),
        motion=jnp.asarray(rng.standard_normal((B, Lv)).astype(np.float32)),
        emotion=jnp.asarray(rng.uniform(size=(B, Lv, 2)).astype(np.float32)),
    )


@pytest.mark.parametrize("version", [None, "2.1", "3.1"])
def test_cached_decode_matches_full_forward(rng, version):
    """The load-bearing parity test: for every position, the single-query
    cached step must produce the same logits as the full-prefix forward
    (covers RPR bias indexing, RoPE positions, and differential attn)."""
    cfg = amt_config(version, **TINY)
    model = VideoMusicTransformer(cfg)
    B, L = 1, 8
    feats = _features(rng, B)
    x = jnp.asarray(rng.integers(0, C.CHORD_END, (B, L)))
    x_root = jnp.asarray(rng.integers(0, C.CHORD_ROOT_END, (B, L)))
    x_attr = jnp.asarray(rng.integers(0, C.CHORD_ATTR_END, (B, L)))

    variables = model.init(jax.random.PRNGKey(0), x, x_root, x_attr,
                           feats["semantic"], feats["key"],
                           feats["scene_offset"], feats["motion"],
                           feats["emotion"])
    full, _ = model.apply(variables, x, x_root, x_attr, feats["semantic"],
                          feats["key"], feats["scene_offset"],
                          feats["motion"], feats["emotion"],
                          mutable=["metrics", "moe_state"])

    memory, _ = model.apply(variables, feats["semantic"],
                            feats["scene_offset"], feats["motion"],
                            feats["emotion"], method=model.encode,
                            mutable=["metrics", "moe_state"])
    _, primed = model.apply(variables, memory, method=model.prime,
                            mutable=["cache"])
    cache = primed["cache"]
    for pos in range(L):
        logits, mutated = model.apply(
            {**variables, "cache": cache},
            x[:, pos:pos + 1], x_root[:, pos:pos + 1],
            x_attr[:, pos:pos + 1], feats["key"], pos,
            method=model.decode_step,
            mutable=["cache", "metrics", "moe_state"])
        cache = mutated["cache"]
        np.testing.assert_allclose(
            np.asarray(logits[0]), np.asarray(full[0, pos]),
            rtol=2e-4, atol=2e-4,
            err_msg=f"version={version} pos={pos}")


def test_generate_respects_constraints(rng):
    cfg = amt_config(None, **TINY)
    model = VideoMusicTransformer(cfg)
    feats = _features(rng, B=1)
    primer = jnp.asarray([[1, 5, 1]])
    root_tab, attr_tab = chord_to_root_attr_tables()
    pr = jnp.asarray(root_tab)[primer]
    pa = jnp.asarray(attr_tab)[primer]
    variables = model.init(
        jax.random.PRNGKey(0), primer, pr, pa, feats["semantic"],
        feats["key"], feats["scene_offset"], feats["motion"],
        feats["emotion"])
    gcfg = GenerateConfig(target_seq_length=12, max_conseq_N=0,
                          max_conseq_chord=2)
    out = generate_chords(
        model, variables, **feats, primer=primer, primer_root=pr,
        primer_attr=pa, num_primer=3, rng=jax.random.PRNGKey(7), gcfg=gcfg)
    seq = np.asarray(out["gen_seq"][0])
    roots = np.asarray(out["gen_seq_root"][0])
    attrs = np.asarray(out["gen_seq_attr"][0])
    # primer preserved
    np.testing.assert_array_equal(seq[:3], [1, 5, 1])
    # all sampled ids < CHORD_END, never N (id 0), no 3-in-a-row
    assert (seq[3:] < C.CHORD_END).all()
    assert (seq[3:] != 0).all()
    for t in range(2, len(seq)):
        assert not (seq[t] == seq[t - 1] == seq[t - 2]), seq
    # root/attr consistent with tables
    np.testing.assert_array_equal(roots[3:], np.asarray(root_tab)[seq[3:]])
    np.testing.assert_array_equal(attrs[3:], np.asarray(attr_tab)[seq[3:]])


def test_generate_is_jittable(rng):
    cfg = amt_config(None, **TINY)
    model = VideoMusicTransformer(cfg)
    feats = _features(rng, B=1)
    primer = jnp.asarray([[1, 5]])
    root_tab, attr_tab = chord_to_root_attr_tables()
    pr = jnp.asarray(root_tab)[primer]
    pa = jnp.asarray(attr_tab)[primer]
    variables = model.init(
        jax.random.PRNGKey(0), primer, pr, pa, feats["semantic"],
        feats["key"], feats["scene_offset"], feats["motion"],
        feats["emotion"])

    gcfg = GenerateConfig(target_seq_length=12)
    fn = jax.jit(lambda v, f, rng: generate_chords(
        model, v, **f, primer=primer, primer_root=pr, primer_attr=pa,
        num_primer=2, rng=rng, gcfg=gcfg)["gen_seq"])
    out1 = fn(variables, feats, jax.random.PRNGKey(3))
    out2 = fn(variables, feats, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_traced_temperature_matches_static(rng):
    """temperature passed as a TRACED array must sample identically to the
    same value baked statically into GenerateConfig (same rng), so the
    serving path can reuse one compiled program across temperatures."""
    cfg = amt_config(None, **TINY)
    model = VideoMusicTransformer(cfg)
    feats = _features(rng, B=2)
    primer = jnp.asarray([[1, 5], [2, 7]])
    root_tab, attr_tab = chord_to_root_attr_tables()
    pr = jnp.asarray(root_tab)[primer]
    pa = jnp.asarray(attr_tab)[primer]
    variables = model.init(
        jax.random.PRNGKey(0), primer, pr, pa, feats["semantic"],
        feats["key"], feats["scene_offset"], feats["motion"],
        feats["emotion"])
    common = dict(primer=primer, primer_root=pr, primer_attr=pa,
                  num_primer=2, rng=jax.random.PRNGKey(11))
    static = generate_chords(
        model, variables, **feats, **common,
        gcfg=GenerateConfig(target_seq_length=12, temperature=0.5))
    traced = generate_chords(
        model, variables, **feats, **common,
        gcfg=GenerateConfig(target_seq_length=12),
        temperature=jnp.asarray([[0.5], [0.5]]))
    np.testing.assert_array_equal(np.asarray(static["gen_seq"]),
                                  np.asarray(traced["gen_seq"]))
    # and per-element temperatures actually differ in effect
    hot = generate_chords(
        model, variables, **feats, **common,
        gcfg=GenerateConfig(target_seq_length=12),
        temperature=jnp.asarray([[0.5], [50.0]]))
    np.testing.assert_array_equal(np.asarray(hot["gen_seq"][0]),
                                  np.asarray(traced["gen_seq"][0]))


def test_generate_batch_sharded_over_data_mesh(rng):
    """Multi-chip serving (dryrun leg 6, __graft_entry__.py): the batched
    decode program with the batch sharded over a "data" mesh axis must
    produce EXACTLY the tokens of the unsharded program (params
    replicated, same rng) — GSPMD partitioning of the KV-cached scan
    cannot change what gets sampled."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video2music_tpu.parallel import create_mesh, replicated

    cfg = amt_config("2.2", **TINY)
    model = VideoMusicTransformer(cfg)
    B = 4
    feats = _features(rng, B=B)
    primer = jnp.tile(jnp.asarray([[1, 5]]), (B, 1))
    root_tab, attr_tab = chord_to_root_attr_tables()
    pr = jnp.asarray(root_tab)[primer]
    pa = jnp.asarray(attr_tab)[primer]
    variables = model.init(
        jax.random.PRNGKey(0), primer, pr, pa, feats["semantic"],
        feats["key"], feats["scene_offset"], feats["motion"],
        feats["emotion"])
    gcfg = GenerateConfig(target_seq_length=12)
    temps = jnp.linspace(0.8, 1.2, B)

    def run(v, f, primer, pr, pa, temps):
        return generate_chords(
            model, v, **f, primer=primer, primer_root=pr, primer_attr=pa,
            num_primer=2, temperature=temps, rng=jax.random.PRNGKey(7),
            gcfg=gcfg, fused="off")["gen_seq"]

    want = np.asarray(jax.jit(run)(variables, feats, primer, pr, pa, temps))

    mesh = create_mesh((2, 1), devices=jax.devices()[:2])

    def dsh(x):
        return jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    got = np.asarray(jax.jit(run)(
        jax.device_put(variables, replicated(mesh)),
        {k: dsh(v) for k, v in feats.items()},
        dsh(primer), dsh(pr), dsh(pa), dsh(temps)))
    np.testing.assert_array_equal(got, want)
