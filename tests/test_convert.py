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
