"""MusicTransformer — the no-video baseline (reference:
model/music_transformer.py:13-171).

Encoder-only over chord tokens: root+attr embeddings summed, key scalar
appended, Linear_chord, sinusoidal PE, then n_layers of (optionally RPR)
self-attention; the torch decoder is a DummyDecoder returning memory.

QUIRK (reproduced as an option): the reference passes its causal mask as
``tgt_mask`` to torch's nn.Transformer (:88), which the DummyDecoder ignores
— the encoder therefore runs UNMASKED during training while generation only
ever feeds the grown prefix. ``causal=True`` (our default) applies the mask
the code plainly intended; ``causal=False`` reproduces the reference
behavior. KV-cached decode requires ``causal=True`` (non-causal prefixes
change retroactively); the sampler falls back to prefix re-forwarding for
``causal=False``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core import constants as C
from ..core.config import AttentionConfig, MusicTransformerConfig
from ..ops.attention import MultiHeadAttention
from ..ops.embeddings import SinusoidalPE, sinusoidal_table


class _MTLayer(nn.Module):
    cfg: MusicTransformerConfig

    def setup(self):
        cfg = self.cfg
        attn_cfg = AttentionConfig(
            num_heads=cfg.num_heads,
            kind="rpr" if cfg.rpr else "vanilla",
            er_len=cfg.max_seq_chord)
        self.self_attn = MultiHeadAttention(
            cfg=attn_cfg, d_model=cfg.d_model, dropout_rate=cfg.dropout,
            max_cache_len=cfg.max_seq_chord, name="self_attn")
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.ff1 = nn.Dense(cfg.d_ff)
        self.ff2 = nn.Dense(cfg.d_model)
        self.drop = nn.Dropout(cfg.dropout)

    def __call__(self, x, causal=True, deterministic=True, mode="full",
                 decode_pos=None):
        d = deterministic
        h = self.self_attn(x, causal=causal, deterministic=d, mode=mode,
                           decode_pos=decode_pos)
        x = self.norm1(x + self.drop(h, deterministic=d))
        h = self.ff2(self.drop(nn.relu(self.ff1(x)), deterministic=d))
        x = self.norm2(x + self.drop(h, deterministic=d))
        return x


class MusicTransformer(nn.Module):
    cfg: MusicTransformerConfig
    causal: bool = True

    def setup(self):
        cfg = self.cfg
        self.embedding_root = nn.Embed(C.CHORD_ROOT_SIZE, cfg.d_model)
        self.embedding_attr = nn.Embed(C.CHORD_ATTR_SIZE, cfg.d_model)
        self.linear_chord = nn.Dense(cfg.d_model, name="Linear_chord")
        self.pe = SinusoidalPE(cfg.d_model, cfg.max_seq_chord, cfg.dropout)
        self.layers = [
            _MTLayer(cfg, name=f"layer_{i}") for i in range(cfg.n_layers)
        ]
        self.final_norm = nn.LayerNorm(epsilon=1e-5)
        self.w_out = nn.Dense(C.CHORD_SIZE, name="Wout")

    def _embed(self, x_root, x_attr, key):
        emb = self.embedding_root(x_root) + self.embedding_attr(x_attr)
        key = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
        key = jnp.broadcast_to(key, (emb.shape[0], emb.shape[1], 1))
        return self.linear_chord(jnp.concatenate([emb, key], axis=-1))

    def __call__(self, x, x_root, x_attr, key, deterministic: bool = True):
        xf = self._embed(x_root, x_attr, key)
        xf = self.pe(xf, deterministic=deterministic)
        for layer in self.layers:
            xf = layer(xf, causal=self.causal, deterministic=deterministic)
        xf = self.final_norm(xf)
        return self.w_out(xf)

    def decode_step(self, token, token_root, token_attr, key, pos):
        xf = self._embed(token_root, token_attr, key)
        table = jnp.asarray(sinusoidal_table(self.cfg.max_seq_chord,
                                             self.cfg.d_model))
        xf = xf + table[pos][None, None, :].astype(xf.dtype)
        for layer in self.layers:
            xf = layer(xf, causal=True, mode="step", decode_pos=pos)
        xf = self.final_norm(xf)
        return self.w_out(xf)[:, 0]
