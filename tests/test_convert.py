"""Checkpoint-converter parity vs live torch modules with random weights.

Builds the same module graphs the reference uses (torch ``nn.Transformer``,
``nn.LSTM`` regression head) with random init, converts their state dicts,
and requires numerical agreement with our flax modules — validating the
name map, the (out,in)->(in,out) transposes, and the packed-qkv split.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen

from video2music_tpu.core.config import (AttentionConfig, LayerSpec,
                                         RegressionConfig, amt_config)
from video2music_tpu.models import VideoRegression
from video2music_tpu.models.layers import DecoderLayer, EncoderLayer
from video2music_tpu.train.convert import (convert_reference_regression,
                                           convert_transformer_core)

D, H, L, FF = 16, 2, 6, 32


class _CoreStack(linen.Module):
    """enc/dec stacks named to match convert_transformer_core output."""

    n_layers: int = 2

    def setup(self):
        cfg = amt_config(None, n_layers=self.n_layers, num_heads=H,
                         d_model=D, d_ff=FF, dropout=0.0)
        att = AttentionConfig(num_heads=H)
        spec = LayerSpec(attn=att, ffn="relu_mlp", cross_attn=att)
        self.encoder = [EncoderLayer(spec=spec, cfg=cfg, name=f"enc_{i}")
                        for i in range(self.n_layers)]
        self.decoder = [DecoderLayer(spec=spec, cfg=cfg, name=f"dec_{i}")
                        for i in range(self.n_layers)]
        self.encoder_norm = linen.LayerNorm(name="encoder_norm")
        self.decoder_norm = linen.LayerNorm(name="decoder_norm")

    def __call__(self, src, tgt):
        mem = src
        for layer in self.encoder:
            mem = layer(mem)
        mem = self.encoder_norm(mem)
        out = tgt
        for layer in self.decoder:
            out = layer(out, mem)
        return self.decoder_norm(out)


def test_transformer_core_parity():
    torch.manual_seed(0)
    t = torch.nn.Transformer(d_model=D, nhead=H, num_encoder_layers=2,
                             num_decoder_layers=2, dim_feedforward=FF,
                             dropout=0.0).eval()
    rng = np.random.default_rng(0)
    src = rng.standard_normal((L, 1, D)).astype(np.float32)
    tgt = rng.standard_normal((L, 1, D)).astype(np.float32)
    mask = torch.nn.Transformer.generate_square_subsequent_mask(L)
    with torch.no_grad():
        want = t(torch.from_numpy(src), torch.from_numpy(tgt),
                 tgt_mask=mask).numpy()

    params = convert_transformer_core(t.state_dict(), 2, prefix="",
                                      rpr_decoder=False)
    model = _CoreStack(n_layers=2)
    got = model.apply({"params": params},
                      jnp.asarray(src.transpose(1, 0, 2)),
                      jnp.asarray(tgt.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(got)[0], want[:, 0], rtol=2e-4,
                               atol=2e-5)


class _TorchReg(torch.nn.Module):
    """Mirror of the reference VideoRegression bilstm wiring
    (video_regression.py:185-245)."""

    def __init__(self, vf, d):
        super().__init__()
        self.in_proj = torch.nn.Sequential(torch.nn.Linear(vf, d),
                                           torch.nn.Dropout(0.0))
        self.model = torch.nn.LSTM(d, d, num_layers=2, bidirectional=True,
                                   batch_first=True)
        self.regressor = torch.nn.Linear(d * 2, 2)
        self.classifier = torch.nn.Sequential(torch.nn.Linear(d * 2, 40),
                                              torch.nn.Sigmoid())

    def forward(self, sem, emo):
        vf = torch.cat([sem, emo], dim=-1)
        out, _ = self.model(self.in_proj(vf))
        return self.regressor(out), self.classifier(out)


def test_regression_bilstm_parity():
    torch.manual_seed(1)
    vf_sem, vf_emo, d = 7, 2, 8
    t = _TorchReg(vf_sem + vf_emo, d).eval()
    rng = np.random.default_rng(1)
    sem = rng.standard_normal((2, 10, vf_sem)).astype(np.float32)
    emo = rng.standard_normal((2, 10, vf_emo)).astype(np.float32)
    with torch.no_grad():
        want_reg, want_cls = t(torch.from_numpy(sem), torch.from_numpy(emo))

    cfg = RegressionConfig(reg_model="bilstm", n_layers=2, d_model=d,
                           total_vf_dim=vf_sem + vf_emo, dropout=0.0)
    model = VideoRegression(cfg=cfg)
    params = convert_reference_regression(t.state_dict(), "bilstm")
    got_reg, got_cls = model.apply(
        {"params": params}, jnp.asarray(sem),
        jnp.zeros((2, 10), jnp.float32),
        jnp.zeros((2, 10), jnp.float32), jnp.asarray(emo))
    np.testing.assert_allclose(np.asarray(got_reg), want_reg.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=2e-4, atol=2e-5)


class _TorchGLU(torch.nn.Module):
    """Mirror of GLUExpert (reference moe.py:36-49), eval mode."""

    def __init__(self, d, ff):
        super().__init__()
        self.linear1 = torch.nn.Linear(d, ff)
        self.linear2 = torch.nn.Linear(ff, d)
        self.gate = torch.nn.Linear(d, ff)

    def forward(self, x):
        return self.linear2(self.linear1(x)
                            * torch.nn.functional.silu(self.gate(x)))


class _TorchSharedMoE(torch.nn.Module):
    """Mirror of SharedMoELayer eval-path routing (reference moe.py:249-302):
    top-k over gate logits, softmax over selected, + shared expert / k."""

    def __init__(self, d, ff, n_experts=4, k=2):
        super().__init__()
        self.experts = torch.nn.ModuleList(
            [_TorchGLU(d, ff) for _ in range(n_experts)])
        self.shared_expert = _TorchGLU(d, ff)
        self.gate = torch.nn.Linear(d, n_experts)
        self.k = k

    def forward(self, x):
        logits = self.gate(x)
        topv, topi = torch.topk(logits, self.k, dim=-1)
        weights = torch.softmax(topv, dim=-1)
        out = torch.zeros_like(x)
        for slot in range(self.k):
            for e, expert in enumerate(self.experts):
                mask = (topi[..., slot] == e).unsqueeze(-1).float()
                out = out + mask * weights[..., slot:slot + 1] * expert(x)
        return out + self.shared_expert(x) / self.k


class _TorchV2Layer(torch.nn.Module):
    """Mirror of the fork's TransformerEncoderLayer (post-norm, no residual
    dropout; reference custom_transformer.py:1220-1248)."""

    def __init__(self, d, heads, ff_mod):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(d, heads)
        self.ff = ff_mod
        self.norm1 = torch.nn.LayerNorm(d)
        self.norm2 = torch.nn.LayerNorm(d)

    def forward(self, x):  # x: (L, B, D)
        x = self.norm1(x + self.self_attn(x, x, x)[0])
        return self.norm2(x + self.ff(x))


def test_v2_encoder_layer_parity():
    """SwiGLU and SharedMoE encoder layers: torch mirror -> converter ->
    our EncoderLayer, numerical agreement (validates _glu_expert,
    _glu_expert_stack, _shared_moe and the MoE dense-dispatch math)."""
    from video2music_tpu.train.convert import (_glu_expert, _mha, _norm,
                                               _shared_moe)

    torch.manual_seed(3)
    d, heads, ff, L = 16, 2, 32, 10
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, L, d)).astype(np.float32)

    for kind in ("swiglu", "moe"):
        ff_mod = (_TorchGLU(d, ff) if kind == "swiglu"
                  else _TorchSharedMoE(d, ff))
        t = _TorchV2Layer(d, heads, ff_mod).eval()
        with torch.no_grad():
            want = t(torch.from_numpy(x.transpose(1, 0, 2))).numpy()

        sd = t.state_dict()
        if kind == "swiglu":
            ffn = _glu_expert(sd, "ff")
            moe_cfg = {}
        else:
            ffn = _shared_moe(sd, "ff", n_experts=4)
        params = {"self_attn": _mha(sd, "self_attn"), "ffn": ffn,
                  "norm1": _norm(sd, "norm1"), "norm2": _norm(sd, "norm2")}

        from dataclasses import replace as dc_replace

        from video2music_tpu.core.config import MoEConfig
        cfg = amt_config("2.2", n_layers=2, num_heads=heads, d_model=d,
                         d_ff=ff, dropout=0.0)
        # the version branch sets its own MoEConfig; shrink it for the test
        cfg = dc_replace(cfg, moe=MoEConfig(
            n_experts=4, n_experts_per_token=2, expert="glu",
            shared_expert=True, topk_schedule=False))
        att = AttentionConfig(num_heads=heads)  # no RoPE, like version 2.0
        spec = LayerSpec(attn=att, ffn=kind)
        layer = EncoderLayer(spec=spec, cfg=cfg)
        got, _ = layer.apply({"params": params}, jnp.asarray(x),
                             mutable=["metrics", "moe_state"])
        np.testing.assert_allclose(np.asarray(got)[0], want[:, 0],
                                   rtol=5e-4, atol=5e-5, err_msg=kind)


def test_v2_full_tree_structure(rng):
    """A synthetic reference-named state_dict converts to EXACTLY the param
    tree of VideoMusicTransformer(amt_config('2.2')) — names, shapes, all."""
    import jax.tree_util as jtu

    from video2music_tpu.core import constants as CC
    from video2music_tpu.models import VideoMusicTransformer
    from video2music_tpu.train.convert import convert_reference_amt_v2

    d, ff, heads, n_layers, E, vf = 16, 32, 2, 4, 6, 11
    cfg = amt_config("2.2", n_layers=n_layers, num_heads=heads, d_model=d,
                     d_ff=ff, dropout=0.0, max_seq_video=12,
                     max_seq_chord=12, total_vf_dim=vf)
    model = VideoMusicTransformer(cfg=cfg)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 11), jnp.int32), jnp.zeros((1, 11), jnp.int32),
        jnp.zeros((1, 11), jnp.int32),
        jnp.zeros((1, 12, 7), jnp.float32), jnp.zeros((1, 1), jnp.float32),
        jnp.zeros((1, 12), jnp.float32), jnp.zeros((1, 12), jnp.float32),
        jnp.zeros((1, 12, 2), jnp.float32))

    f = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    sd = {
        "embedding_root.weight": f(CC.CHORD_ROOT_SIZE, d),
        "embedding_attr.weight": f(CC.CHORD_ATTR_SIZE, d),
        "Linear_chord.weight": f(d, d + 1), "Linear_chord.bias": f(d),
        "Linear_vis.weight": f(d, vf), "Linear_vis.bias": f(d),
        "Wout.weight": f(CC.CHORD_SIZE, d), "Wout.bias": f(CC.CHORD_SIZE),
        "transformer.encoder.norm.weight": f(d),
        "transformer.encoder.norm.bias": f(d),
        "transformer.decoder.norm.weight": f(d),
        "transformer.decoder.norm.bias": f(d),
    }

    def add_mha(p):
        sd[p + ".in_proj_weight"] = f(3 * d, d)
        sd[p + ".in_proj_bias"] = f(3 * d)
        sd[p + ".out_proj.weight"] = f(d, d)
        sd[p + ".out_proj.bias"] = f(d)

    def add_glu(p):
        sd[p + ".linear1.weight"] = f(ff, d)
        sd[p + ".linear1.bias"] = f(ff)
        sd[p + ".gate.weight"] = f(ff, d)
        sd[p + ".gate.bias"] = f(ff)
        sd[p + ".linear2.weight"] = f(d, ff)
        sd[p + ".linear2.bias"] = f(d)

    def add_moe(p):
        sd[p + ".gate.weight"] = f(E, d)
        sd[p + ".gate.bias"] = f(E)
        for e in range(E):
            add_glu(f"{p}.experts.{e}")
        add_glu(p + ".shared_expert")

    rate = min(3, n_layers - 1)
    for i in range(n_layers):
        e = f"transformer.encoder.layers.{i}"
        add_mha(e + ".self_attn")
        (add_glu if i < rate else add_moe)(e + ".ff")
        for nrm in ("norm1", "norm2"):
            sd[f"{e}.{nrm}.weight"] = f(d)
            sd[f"{e}.{nrm}.bias"] = f(d)
        dd = f"transformer.decoder.layers.{i}"
        add_mha(dd + ".self_attn")
        add_mha(dd + ".cross_attn")
        (add_glu if i < rate else add_moe)(dd + ".ff")
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{dd}.{nrm}.weight"] = f(d)
            sd[f"{dd}.{nrm}.bias"] = f(d)

    params = convert_reference_amt_v2(sd, n_layers=n_layers, n_experts=E)
    want = {jtu.keystr(p): v.shape
            for p, v in jtu.tree_leaves_with_path(init["params"])}
    got = {jtu.keystr(p): np.asarray(v).shape
           for p, v in jtu.tree_leaves_with_path(params)}
    assert sorted(want) == sorted(got), (
        sorted(set(want) ^ set(got))[:8])
    for k in want:
        assert want[k] == got[k], (k, want[k], got[k])


class _TorchDiffAttn(torch.nn.Module):
    """Mirror of DifferentialMultiheadAttention (reference
    custom_transformer.py:610-832) with the documented reshape fix applied
    (transpose-then-reshape; the upstream view scrambles positions, see
    ops/attention.py module docstring). Batch-first, causal, no RoPE."""

    def __init__(self, d, heads, depth):
        super().__init__()
        hd = d // heads
        self.heads, self.hd = heads, hd
        self.q_proj = torch.nn.Linear(d, 2 * d, bias=False)
        self.k_proj = torch.nn.Linear(d, 2 * d, bias=False)
        self.v_proj = torch.nn.Linear(d, d, bias=False)
        self.out_proj = torch.nn.Linear(d, d, bias=False)
        self.lambda_q1 = torch.nn.Parameter(torch.randn(hd) * 0.1)
        self.lambda_k1 = torch.nn.Parameter(torch.randn(hd) * 0.1)
        self.lambda_q2 = torch.nn.Parameter(torch.randn(hd) * 0.1)
        self.lambda_k2 = torch.nn.Parameter(torch.randn(hd) * 0.1)
        self.subln = torch.nn.RMSNorm(hd, eps=1e-5)
        from video2music_tpu.ops.attention import lambda_init_fn
        self.lambda_init = lambda_init_fn(depth)

    def forward(self, x):
        B, L, D = x.shape
        H, hd = self.heads, self.hd
        q = self.q_proj(x).view(B, L, 2 * H, hd).transpose(1, 2)
        k = self.k_proj(x).view(B, L, 2 * H, hd).transpose(1, 2)
        v = self.v_proj(x).view(B, L, H, hd).transpose(1, 2)
        q = q * hd ** -0.5
        w = torch.matmul(q, k.transpose(-1, -2))
        mask = torch.triu(torch.full((L, L), float("-inf")), 1)
        w = torch.softmax(w + mask, dim=-1, dtype=torch.float32).type_as(w)
        lam = (torch.exp(torch.sum(self.lambda_q1 * self.lambda_k1))
               - torch.exp(torch.sum(self.lambda_q2 * self.lambda_k2))
               + self.lambda_init)
        w = w.view(B, H, 2, L, L)
        w = w[:, :, 0] - lam * w[:, :, 1]
        attn = torch.matmul(w, v)               # (B, H, L, hd)
        attn = self.subln(attn) * (1 - self.lambda_init)
        attn = attn.transpose(1, 2).reshape(B, L, D)
        return self.out_proj(attn)


def test_v3_differential_attention_parity():
    """_diff_mha converter vs a live torch differential-attention mirror:
    validates projections, lambda wiring, subln, pairing order."""
    from video2music_tpu.ops.attention import MultiHeadAttention
    from video2music_tpu.train.convert import _diff_mha

    torch.manual_seed(5)
    d, heads, depth, L = 16, 2, 3, 9
    t = _TorchDiffAttn(d, heads, depth).eval()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, L, d)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy()

    cfg = AttentionConfig(num_heads=heads, kind="differential", bias=False,
                          rope=False)
    attn = MultiHeadAttention(cfg=cfg, d_model=d, depth=depth,
                              dropout_rate=0.0)
    params = _diff_mha(t.state_dict(), "")
    got = attn.apply({"params": params}, jnp.asarray(x), causal=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-5)


def _synthetic_v1_sd(rng, version, d, ff, heads, n_layers, E, vf):
    from video2music_tpu.core import constants as CC

    f = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    sd = {
        "embedding_root.weight": f(CC.CHORD_ROOT_SIZE, d),
        "embedding_attr.weight": f(CC.CHORD_ATTR_SIZE, d),
        "Linear_chord.weight": f(d, d + 1), "Linear_chord.bias": f(d),
        "Linear_vis.weight": f(d, vf), "Linear_vis.bias": f(d),
        "Wout.weight": f(CC.CHORD_SIZE, d), "Wout.bias": f(CC.CHORD_SIZE),
        "positional_embedding.weight": f(12, d),
        "positional_embedding_video.weight": f(12, d),
        "transformer.encoder.norm.weight": f(d),
        "transformer.encoder.norm.bias": f(d),
        "transformer.decoder.norm.weight": f(d),
        "transformer.decoder.norm.bias": f(d),
    }

    def add_mha(p):
        sd[p + ".in_proj_weight"] = f(3 * d, d)
        sd[p + ".in_proj_bias"] = f(3 * d)
        sd[p + ".out_proj.weight"] = f(d, d)
        sd[p + ".out_proj.bias"] = f(d)

    def add_glu(p):
        for name, (o, i) in (("linear1", (ff, d)), ("gate", (ff, d)),
                             ("linear2", (d, ff))):
            sd[f"{p}.{name}.weight"] = f(o, i)
            sd[f"{p}.{name}.bias"] = f(o)

    def add_mlp(p):
        sd[p + ".0.weight"] = f(2 * d, d)
        sd[p + ".0.bias"] = f(2 * d)
        sd[p + ".3.weight"] = f(d, 2 * d)
        sd[p + ".3.bias"] = f(d)

    glu = version in ("1.1", "1.3")
    shared = version not in ("1.0", "1.1", "1.3.4")
    split = version in ("1.3.3", "1.3.4")
    rate = min(3, max(0, n_layers - 1))
    add_expert = add_glu if glu else add_mlp

    def add_moe(p):
        sd[p + ".gate.weight"] = f(E, d)
        sd[p + ".gate.bias"] = f(E)
        for e in range(E):
            add_expert(f"{p}.experts.{e}")
        if shared:
            add_expert(p + ".shared_expert")

    for i in range(n_layers):
        add_ff = add_glu if (split and i < rate) else add_moe
        e = f"transformer.encoder.layers.{i}"
        add_mha(e + ".self_attn")
        add_ff(e + ".ff")
        for nrm in ("norm1", "norm2"):
            sd[f"{e}.{nrm}.weight"] = f(d)
            sd[f"{e}.{nrm}.bias"] = f(d)
        dd = f"transformer.decoder.layers.{i}"
        add_mha(dd + ".self_attn")
        add_mha(dd + ".cross_attn")
        add_ff(dd + ".ff")
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{dd}.{nrm}.weight"] = f(d)
            sd[f"{dd}.{nrm}.bias"] = f(d)
    return sd


def _init_amt(cfg):
    from video2music_tpu.models import VideoMusicTransformer

    model = VideoMusicTransformer(cfg=cfg)
    return model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 11), jnp.int32), jnp.zeros((1, 11), jnp.int32),
        jnp.zeros((1, 11), jnp.int32),
        jnp.zeros((1, 12, 7), jnp.float32), jnp.zeros((1, 1), jnp.float32),
        jnp.zeros((1, 12), jnp.float32), jnp.zeros((1, 12), jnp.float32),
        jnp.zeros((1, 12, 2), jnp.float32))


def _assert_same_tree(init_params, params):
    import jax.tree_util as jtu

    want = {jtu.keystr(p): v.shape
            for p, v in jtu.tree_leaves_with_path(init_params)}
    got = {jtu.keystr(p): np.asarray(v).shape
           for p, v in jtu.tree_leaves_with_path(params)}
    assert sorted(want) == sorted(got), sorted(set(want) ^ set(got))[:8]
    for k in want:
        assert want[k] == got[k], (k, want[k], got[k])


@pytest.mark.parametrize("version", ["1.0", "1.1", "1.2", "1.3.4"])
def test_v1_full_tree_structure(rng, version):
    """convert_reference_amt_v1 produces EXACTLY the param tree of
    VideoMusicTransformer(amt_config('1.x')) for each expert/shared
    combination."""
    from video2music_tpu.train.convert import convert_reference_amt_v1

    d, ff, heads, n_layers, E, vf = 16, 32, 2, 4, 6, 11
    cfg = amt_config(version, n_layers=n_layers, num_heads=heads, d_model=d,
                     d_ff=ff, dropout=0.0, max_seq_video=12,
                     max_seq_chord=12, total_vf_dim=vf)
    init = _init_amt(cfg)
    sd = _synthetic_v1_sd(rng, version, d, ff, heads, n_layers, E, vf)
    params = convert_reference_amt_v1(sd, version, n_layers=n_layers,
                                      n_experts=E)
    _assert_same_tree(init["params"], params)


def test_v3_full_tree_structure(rng):
    """convert_reference_amt_v3 + convert_reference_moe_state produce the
    param and moe_state trees of amt_config('3.1')."""
    import jax.tree_util as jtu

    from video2music_tpu.core import constants as CC
    from video2music_tpu.train.convert import (convert_reference_amt_v3,
                                               convert_reference_moe_state)

    d, ff, heads, n_layers, E, vf = 16, 32, 2, 4, 6, 11
    cfg = amt_config("3.1", n_layers=n_layers, num_heads=heads, d_model=d,
                     d_ff=ff, dropout=0.0, max_seq_video=12,
                     max_seq_chord=12, total_vf_dim=vf)
    variables = _init_amt(cfg)

    f = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    sd = {
        "embedding_root.weight": f(CC.CHORD_ROOT_SIZE, d),
        "embedding_attr.weight": f(CC.CHORD_ATTR_SIZE, d),
        "Linear_chord.weight": f(d, d + 1), "Linear_chord.bias": f(d),
        "Linear_vis.weight": f(d, vf), "Linear_vis.bias": f(d),
        "Wout.weight": f(CC.CHORD_SIZE, d), "Wout.bias": f(CC.CHORD_SIZE),
        "transformer.encoder.norm.weight": f(d),
        "transformer.decoder.norm.weight": f(d),
    }
    hd = d // heads

    def add_diff(p):
        sd[p + ".q_proj.weight"] = f(2 * d, d)
        sd[p + ".k_proj.weight"] = f(2 * d, d)
        sd[p + ".v_proj.weight"] = f(d, d)
        sd[p + ".out_proj.weight"] = f(d, d)
        for lam in ("lambda_q1", "lambda_k1", "lambda_q2", "lambda_k2"):
            sd[f"{p}.{lam}"] = f(hd)
        sd[p + ".subln.weight"] = f(hd)

    def add_glu(p):
        for name, (o, i) in (("linear1", (ff, d)), ("gate", (ff, d)),
                             ("linear2", (d, ff))):
            sd[f"{p}.{name}.weight"] = f(o, i)
            sd[f"{p}.{name}.bias"] = f(o)

    def add_moe(p):
        sd[p + ".gate.weight"] = f(E, d)
        sd[p + ".gate.bias"] = f(E)
        for e in range(E):
            add_glu(f"{p}.experts.{e}")
        add_glu(p + ".shared_expert")
        sd[p + ".bias"] = f(E, 1)  # balancing buffer

    rate = min(3, n_layers - 1)
    for i in range(n_layers):
        e = f"transformer.encoder.layers.{i}"
        add_diff(e + ".self_attn")
        (add_glu if i < rate else add_moe)(e + ".ff")
        sd[e + ".norm1.weight"] = f(d)
        sd[e + ".norm2.weight"] = f(d)
        dd = f"transformer.decoder.layers.{i}"
        add_diff(dd + ".self_attn")
        add_diff(dd + ".cross_attn")
        (add_glu if i < rate else add_moe)(dd + ".ff")
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{dd}.{nrm}.weight"] = f(d)

    params = convert_reference_amt_v3(sd, "3.1", n_layers=n_layers,
                                      n_experts=E)
    _assert_same_tree(variables["params"], params)

    moe_state = convert_reference_moe_state(sd, n_layers=n_layers)
    want = {jtu.keystr(p): v.shape for p, v in
            jtu.tree_leaves_with_path(variables["moe_state"])}
    got = {jtu.keystr(p): np.asarray(v).shape for p, v in
           jtu.tree_leaves_with_path(moe_state)}
    assert sorted(want) == sorted(got), sorted(set(want) ^ set(got))[:8]


# ---------------------------------------------------------------------------
# Full-stack V2.2 cross-check: a torch mirror of the flagship forward with
# reference state_dict names, numerically compared through the converter.
# RoPE follows this framework's documented per-head convention
# (ops/embeddings.py docstring — the upstream cache reshape is a bug).
# ---------------------------------------------------------------------------

def _torch_rope(x, positions=None, base=10000.0):
    """Pairwise rope on (B, H, L, hd), mirroring ops/embeddings.apply_rope."""
    B, H, L, hd = x.shape
    theta = 1.0 / (base ** (torch.arange(0, hd, 2).float() / hd))
    pos = (torch.arange(L).float() if positions is None
           else torch.as_tensor(positions).float())
    ang = pos[:, None] * theta[None, :]          # (L, hd/2)
    cos, sin = torch.cos(ang), torch.sin(ang)
    xs = x.float().reshape(B, H, L, hd // 2, 2)
    x0, x1 = xs[..., 0], xs[..., 1]
    out = torch.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], dim=-1)
    return out.reshape(B, H, L, hd).type_as(x)


class _TorchRoPEMHA(torch.nn.Module):
    """Packed-projection MHA with per-head RoPE; exposes the reference's
    in_proj_weight/in_proj_bias/out_proj state_dict names."""

    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        self.in_proj_weight = torch.nn.Parameter(torch.randn(3 * d, d) * 0.07)
        self.in_proj_bias = torch.nn.Parameter(torch.randn(3 * d) * 0.02)
        self.out_proj = torch.nn.Linear(d, d)

    def forward(self, q_in, kv_in, causal=False):
        B, L, D = q_in.shape
        S = kv_in.shape[1]
        H = self.heads
        hd = D // H
        w, b = self.in_proj_weight, self.in_proj_bias
        q = torch.nn.functional.linear(q_in, w[:D], b[:D])
        k = torch.nn.functional.linear(kv_in, w[D:2 * D], b[D:2 * D])
        v = torch.nn.functional.linear(kv_in, w[2 * D:], b[2 * D:])
        split = lambda t, n: t.reshape(B, n, H, hd).transpose(1, 2)
        q, k, v = split(q, L), split(k, S), split(v, S)
        q = _torch_rope(q)
        k = _torch_rope(k)
        logits = (q.float() @ k.float().transpose(-1, -2)) * hd ** -0.5
        if causal:
            mask = torch.triu(torch.full((L, S), float("-inf")), 1)
            logits = logits + mask
        p = torch.softmax(logits, dim=-1).type_as(v)
        out = (p @ v).transpose(1, 2).reshape(B, L, D)
        return self.out_proj(out)


class _TorchV22EncLayer(torch.nn.Module):
    def __init__(self, d, heads, ff_mod):
        super().__init__()
        self.self_attn = _TorchRoPEMHA(d, heads)
        self.ff = ff_mod
        self.norm1 = torch.nn.LayerNorm(d)
        self.norm2 = torch.nn.LayerNorm(d)

    def forward(self, x):
        x = self.norm1(x + self.self_attn(x, x))
        return self.norm2(x + self.ff(x))


class _TorchV22DecLayer(torch.nn.Module):
    def __init__(self, d, heads, ff_mod):
        super().__init__()
        self.self_attn = _TorchRoPEMHA(d, heads)
        self.cross_attn = _TorchRoPEMHA(d, heads)
        self.ff = ff_mod
        self.norm1 = torch.nn.LayerNorm(d)
        self.norm2 = torch.nn.LayerNorm(d)
        self.norm3 = torch.nn.LayerNorm(d)

    def forward(self, x, mem):
        x = self.norm1(x + self.self_attn(x, x, causal=True))
        x = self.norm2(x + self.cross_attn(x, mem))
        return self.norm3(x + self.ff(x))


def test_v22_full_model_parity(rng):
    """Whole flagship forward (embeddings, key concat, feature concat,
    3 SwiGLU + deep SharedMoE encoder/decoder, RoPE, head) through
    convert_reference_amt_v2 against a live torch mirror with reference
    state_dict names."""
    from video2music_tpu.core import constants as CC
    from video2music_tpu.models import VideoMusicTransformer
    from video2music_tpu.train.convert import convert_reference_amt_v2

    torch.manual_seed(11)
    d, ff, heads, n_layers, E = 16, 32, 2, 4, 6
    Lv, Lc, sem, emo = 12, 11, 7, 2
    vf = sem + 1 + 1 + emo

    class _Stack(torch.nn.Module):
        def __init__(self, make_layer):
            super().__init__()
            rate = min(3, n_layers - 1)
            self.layers = torch.nn.ModuleList([
                make_layer(_TorchGLU(d, ff) if i < rate
                           else _TorchSharedMoE(d, ff, n_experts=E))
                for i in range(n_layers)])
            self.norm = torch.nn.LayerNorm(d)

    class _Transformer(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _Stack(lambda m: _TorchV22EncLayer(d, heads, m))
            self.decoder = _Stack(lambda m: _TorchV22DecLayer(d, heads, m))

    class _TorchV22(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding_root = torch.nn.Embedding(CC.CHORD_ROOT_SIZE, d)
            self.embedding_attr = torch.nn.Embedding(CC.CHORD_ATTR_SIZE, d)
            self.Linear_chord = torch.nn.Linear(d + 1, d)
            self.Linear_vis = torch.nn.Linear(vf, d)
            self.Wout = torch.nn.Linear(d, CC.CHORD_SIZE)
            self.transformer = _Transformer()

        def forward(self, x_root, x_attr, key, semf, scene, motion, emotion):
            xe = self.embedding_root(x_root) + self.embedding_attr(x_attr)
            keyp = key[:, None, :].expand(-1, xe.shape[1], 1)
            xf = self.Linear_chord(torch.cat([xe, keyp], dim=-1))
            vfc = torch.cat([semf, scene[..., None], motion[..., None],
                             emotion], dim=-1)
            vfe = self.Linear_vis(vfc)
            mem = vfe
            for layer in self.transformer.encoder.layers:
                mem = layer(mem)
            mem = self.transformer.encoder.norm(mem)
            out = xf
            for layer in self.transformer.decoder.layers:
                out = layer(out, mem)
            out = self.transformer.decoder.norm(out)
            return self.Wout(out)

    t = _TorchV22().eval()
    x_root = rng.integers(0, 13, (1, Lc))
    x_attr = rng.integers(0, 14, (1, Lc))
    key = np.ones((1, 1), np.float32)
    semf = rng.standard_normal((1, Lv, sem)).astype(np.float32)
    scene = rng.integers(0, 5, (1, Lv)).astype(np.float32)
    motion = rng.standard_normal((1, Lv)).astype(np.float32)
    emotion = rng.uniform(size=(1, Lv, emo)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x_root), torch.from_numpy(x_attr),
                 torch.from_numpy(key), torch.from_numpy(semf),
                 torch.from_numpy(scene), torch.from_numpy(motion),
                 torch.from_numpy(emotion)).numpy()

    cfg = amt_config("2.2", n_layers=n_layers, num_heads=heads, d_model=d,
                     d_ff=ff, dropout=0.0, max_seq_video=Lv,
                     max_seq_chord=Lc + 1, total_vf_dim=vf)
    model = VideoMusicTransformer(cfg=cfg)
    params = convert_reference_amt_v2(t.state_dict(), n_layers=n_layers,
                                      n_experts=E)
    got, _ = model.apply(
        {"params": params}, jnp.asarray(x_root.astype(np.int32)),
        jnp.asarray(x_root.astype(np.int32)),
        jnp.asarray(x_attr.astype(np.int32)), jnp.asarray(semf),
        jnp.asarray(key), jnp.asarray(scene), jnp.asarray(motion),
        jnp.asarray(emotion), deterministic=True,
        mutable=["moe_state", "metrics"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
