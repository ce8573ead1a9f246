"""VideoMusicTransformer — the Affective Multimodal Transformer family.

One model class covers the reference's four implementations (base AMT
model/video_music_transformer.py:910-1133, V1 :22-314, V2 :316-609,
V3 :611-908): the differences are entirely in the AMTConfig layer wiring
produced by :func:`video2music_tpu.core.config.amt_config`.

Forward semantics (reference :978-1044):
  * chord tokens embed as emb_root(x_root) + emb_attr(x_attr) — or a frozen
    512-d Word2Vec table when chord_embed — then the scalar key (major=0 /
    minor=1) is appended and projected by Linear_chord;
  * video features [semantic | scene_offset | motion | emotion] concat to
    total_vf_dim and project by Linear_vis (+ scene-offset embedding when
    scene_embed);
  * positional information per config; encoder over 300 video tokens;
    causal decoder over chord tokens with cross-attention to the memory;
  * 159-way chord head (or separate root/attr heads when separated).

The reference's per-batch-row ``.item()`` host syncs (:993) and per-call mask
allocation disappear — everything is traced once under jit. Decoding is a
KV-cached ``encode -> prime -> decode_step`` loop (see decode/sampler.py)
instead of the reference's ~300 full-prefix re-forwards (:1069-1071).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import constants as C
from ..core.config import AMTConfig
from ..ops.embeddings import LearnedPE, SinusoidalPE, sinusoidal_table
from ..ops.norms import make_norm
from .layers import DecoderLayer, EncoderLayer


def _dominant_emotion_ids(emotion):
    """(B, L, n_emo) probabilities -> (B, L) dominant-emotion ids, -1 where
    the row is all zero (PAD). Feeds the MoE expert-emotion attribution
    (functional form of third_party/log_experts.py:27-47)."""
    ids = jnp.argmax(emotion, axis=-1).astype(jnp.int32)
    all_zero = jnp.all(emotion == 0.0, axis=-1)
    return jnp.where(all_zero, -1, ids)


class VideoMusicTransformer(nn.Module):
    cfg: AMTConfig

    def setup(self):
        cfg = self.cfg
        self.embedding_root = nn.Embed(C.CHORD_ROOT_SIZE, cfg.d_model,
                                       name="embedding_root")
        self.embedding_attr = nn.Embed(C.CHORD_ATTR_SIZE, cfg.d_model,
                                       name="embedding_attr")
        if cfg.chord_embed:
            # frozen chord table (reference loads a gensim word2vec_filled.bin,
            # video_music_transformer.py:47-50). Default init: the
            # reference's TRAINED table, converted into
            # assets/chord_word2vec.npz and indexed per cfg.chord_table
            # (see AMTConfig — the positional default reproduces the
            # reference's frequency-order indexing quirk). "deterministic"
            # selects the synthetic music-theory table (any dim); a
            # checkpoint converter or train_skipgram table overrides all.
            from ..features.chord2vec import (deterministic_chord_table,
                                              word2vec_chord_table)

            def _chord_table_init(_rng, shape, dtype=jnp.float32):
                if cfg.chord_table == "deterministic":
                    table = deterministic_chord_table(shape[1])
                elif cfg.chord_table in ("word2vec", "word2vec_keyed"):
                    try:
                        table = word2vec_chord_table(
                            shape[1],
                            positional=cfg.chord_table == "word2vec")
                    except ValueError:
                        # trained artifact exists only at its native dim
                        # (512); non-matching dims (tiny test configs)
                        # fall back to the synthetic table
                        table = deterministic_chord_table(shape[1])
                else:
                    raise ValueError(
                        f"unknown chord_table {cfg.chord_table!r}")
                assert table.shape == tuple(shape), (table.shape, shape)
                return jnp.asarray(table, dtype)

            self.chord_embedding = nn.Embed(C.CHORD_SIZE, cfg.chord_embed_dim,
                                            embedding_init=_chord_table_init,
                                            name="chord_embedding")
        chord_in = (cfg.chord_embed_dim if cfg.chord_embed else cfg.d_model) + 1
        self.linear_chord = nn.Dense(cfg.d_model, name="Linear_chord")
        self.linear_vis = nn.Dense(cfg.d_model, name="Linear_vis")
        if cfg.scene_embed:
            self.scene_embedding = nn.Embed(C.SCENE_OFFSET_MAX, cfg.d_model,
                                            name="scene_embedding")
        del chord_in

        if cfg.pos_encoding == "sinusoidal":
            self.pe_chord = SinusoidalPE(cfg.d_model, cfg.max_seq_chord,
                                         cfg.dropout, name="pe_chord")
            self.pe_video = SinusoidalPE(cfg.d_model, cfg.max_seq_video,
                                         cfg.dropout, name="pe_video")
        elif cfg.pos_encoding == "learned":
            self.pe_chord = LearnedPE(cfg.d_model, cfg.max_seq_chord,
                                      name="pe_chord")
            self.pe_video = LearnedPE(cfg.d_model, cfg.max_seq_video,
                                      name="pe_video")

        residual_dropout = cfg.version is None
        self.encoder_stack = [
            EncoderLayer(spec=spec, cfg=cfg, depth=i,
                         residual_dropout=residual_dropout, name=f"enc_{i}")
            for i, spec in enumerate(cfg.encoder_layers)
        ]
        self.decoder_stack = [
            DecoderLayer(spec=spec, cfg=cfg, depth=i,
                         residual_dropout=residual_dropout, name=f"dec_{i}")
            for i, spec in enumerate(cfg.decoder_layers)
        ]
        self.encoder_norm = make_norm(cfg.norm, cfg.d_model)
        self.decoder_norm = make_norm(cfg.norm, cfg.d_model)

        if cfg.separated:
            self.w_out_root = nn.Dense(C.CHORD_ROOT_SIZE, name="Wout_root")
            self.w_out_attr = nn.Dense(C.CHORD_ATTR_SIZE, name="Wout_attr")
        else:
            self.w_out = nn.Dense(C.CHORD_SIZE, name="Wout")

    # ------------------------------------------------------------------
    # embedding helpers
    # ------------------------------------------------------------------
    def _embed_chords(self, x, x_root, x_attr, key):
        """(B, L) token ids + (B,) or (B,1) key -> (B, L, d_model)."""
        cfg = self.cfg
        if cfg.chord_embed:
            emb = jax.lax.stop_gradient(self.chord_embedding(x))
        else:
            emb = self.embedding_root(x_root) + self.embedding_attr(x_attr)
        key = jnp.reshape(key.astype(emb.dtype), (emb.shape[0], 1, 1))
        key = jnp.broadcast_to(key, (emb.shape[0], emb.shape[1], 1))
        return self.linear_chord(jnp.concatenate([emb, key], axis=-1))

    def _embed_video(self, semantic, scene_offset, motion, emotion,
                     deterministic=True):
        """Concat video features -> (B, L, d_model) (reference :1003-1024)."""
        cfg = self.cfg
        # float dtype follows `semantic` (bf16 under mixed precision /
        # bf16 inference); int-typed inputs are promoted to it
        dt = semantic.dtype if jnp.issubdtype(semantic.dtype,
                                              jnp.floating) else jnp.float32
        feats = [semantic.astype(dt)]
        if not cfg.scene_embed:
            feats.append(scene_offset[..., None].astype(dt))
        if motion.ndim == 2:
            motion = motion[..., None]
        feats.append(motion.astype(dt))
        feats.append(emotion.astype(dt))
        vf_concat = jnp.concatenate(feats, axis=-1)
        vf = self.linear_vis(vf_concat)
        if cfg.scene_embed:
            vf = vf + self.scene_embedding(scene_offset.astype(jnp.int32))
        if cfg.drop_token_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - cfg.drop_token_rate, vf.shape[:2])
            vf = vf * keep[..., None].astype(vf.dtype)
        return vf

    # ------------------------------------------------------------------
    # full forward (training / eval)
    # ------------------------------------------------------------------
    def __call__(self, x, x_root, x_attr, semantic, key, scene_offset,
                 motion, emotion, deterministic: bool = True):
        memory = self.encode(semantic, scene_offset, motion, emotion,
                             deterministic=deterministic)
        out = self.embed_decoder_input(x, x_root, x_attr, key,
                                       deterministic=deterministic)
        emotion_ids = _dominant_emotion_ids(emotion)
        for layer in self.decoder_stack:
            out = layer(out, memory, deterministic=deterministic,
                        emotion_ids=emotion_ids)
        return self.head(out)

    # ------------------------------------------------------------------
    # decomposed pieces (shared by the full forward, the KV-cached decode
    # path, and the pipeline-parallel train step which runs the layer
    # stacks through parallel/pipeline.py instead of the loops above)
    # ------------------------------------------------------------------
    def embed_video_input(self, semantic, scene_offset, motion, emotion,
                          deterministic: bool = True):
        """Video features -> positioned encoder input (B, L, d_model)."""
        vf = self._embed_video(semantic, scene_offset, motion, emotion,
                               deterministic=deterministic)
        if self.cfg.pos_encoding == "sinusoidal":
            vf = self.pe_video(vf, deterministic=deterministic)
        elif self.cfg.pos_encoding == "learned":
            vf = self.pe_video(vf)
        return vf

    def finalize_encoder(self, vf):
        return self.encoder_norm(vf)

    def embed_decoder_input(self, x, x_root, x_attr, key,
                            deterministic: bool = True):
        """Chord tokens + key -> positioned decoder input (B, L, d_model)."""
        xf = self._embed_chords(x, x_root, x_attr, key)
        if self.cfg.pos_encoding == "sinusoidal":
            xf = self.pe_chord(xf, deterministic=deterministic)
        elif self.cfg.pos_encoding == "learned":
            xf = self.pe_chord(xf)
        return xf

    def head(self, out):
        """Decoder output -> chord logits (reference :1040-1044)."""
        out = self.decoder_norm(out)
        if self.cfg.separated:
            return self.w_out_root(out), self.w_out_attr(out)
        return self.w_out(out)

    # ------------------------------------------------------------------
    # KV-cached decoding path
    # ------------------------------------------------------------------
    def encode(self, semantic, scene_offset, motion, emotion,
               deterministic: bool = True):
        vf = self.embed_video_input(semantic, scene_offset, motion, emotion,
                                    deterministic=deterministic)
        emotion_ids = _dominant_emotion_ids(emotion)
        for layer in self.encoder_stack:
            vf = layer(vf, deterministic=deterministic,
                       emotion_ids=emotion_ids)
        return self.finalize_encoder(vf)

    def prime(self, memory):
        """Fill every decoder layer's cross-attention K/V cache."""
        for layer in self.decoder_stack:
            layer.prime(memory)

    def decode_step(self, token, token_root, token_attr, key, pos):
        """One cached decode step.

        Args:
          token/token_root/token_attr: (B, 1) int ids of the *current* token.
          key: (B,) or (B, 1) float key conditioning.
          pos: scalar int — absolute position of the current token.
        Returns:
          (B, CHORD_SIZE) logits for the next token (or root/attr tuple).
        """
        xf = self._embed_chords(token, token_root, token_attr, key)
        if self.cfg.pos_encoding == "sinusoidal":
            table = jnp.asarray(sinusoidal_table(self.cfg.max_seq_chord,
                                                 self.cfg.d_model))
            xf = xf + table[pos][None, None, :].astype(xf.dtype)
        elif self.cfg.pos_encoding == "learned":
            xf = self.pe_chord(xf, position=pos)
        out = xf
        for layer in self.decoder_stack:
            out = layer(out, None, mode="step", decode_pos=pos)
        out = self.decoder_norm(out)
        if self.cfg.separated:
            return (self.w_out_root(out)[:, 0], self.w_out_attr(out)[:, 0])
        return self.w_out(out)[:, 0]
