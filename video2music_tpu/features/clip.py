"""JAX CLIP (vision + text towers) for semantic and emotion features.

The reference runs OpenAI CLIP ViT-L/14@336px one frame at a time for both
the 768-d semantic embedding and the 6-way zero-shot emotion probabilities
(reference: ``video2music.py:149-209``, ``script/semantic_feature.py``,
``script/emotion_feature.py``). Here the towers are flax modules whose whole
frame batch runs in ONE jitted forward on the MXU, with a converter from the
HuggingFace/OpenAI checkpoint layout.

Semantic features are the RAW (unnormalized) ``encode_image`` outputs, as in
the reference (video2music.py:160-165). Emotion probabilities are
``softmax(logit_scale * norm(img) @ norm(text).T)`` over the six prompts
["exciting", "fearful", "tense", "sad", "relaxing", "neutral"]
(video2music.py:183-198). Since BPE tokenization needs the vocab file, the
weight converter also exports the tokenized prompt ids / text embeddings so
the runtime has no tokenizer dependency.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# OpenAI CLIP preprocessing constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

EMOTION_PROMPTS = ("exciting", "fearful", "tense", "sad", "relaxing",
                   "neutral")


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    layers: int = 24
    heads: int = 16
    patch_size: int = 14
    image_size: int = 336
    mlp_ratio: int = 4
    projection_dim: int = 768


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    vocab_size: int = 49408
    context_length: int = 77
    mlp_ratio: int = 4
    projection_dim: int = 768


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    text: CLIPTextConfig = CLIPTextConfig()


def clip_vit_l14_336_config() -> CLIPConfig:
    """ViT-L/14@336px — the reference's checkpoint (video2music.py:151)."""
    return CLIPConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Block(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP."""

    d: int
    heads: int
    mlp_ratio: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        B, L, D = h.shape
        hd = D // self.heads
        q = nn.Dense(D, name="q_proj")(h)
        k = nn.Dense(D, name="k_proj")(h)
        v = nn.Dense(D, name="v_proj")(h)
        split = lambda t: t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
            logits = jnp.where(mask, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhls,bhsd->bhld", w, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(D * self.mlp_ratio, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(D, name="fc2")(h)
        return x


class VisionTower(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) normalized -> (B, projection_dim)."""
        c = self.cfg
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    name="patch_embed")(pixels)
        B, gh, gw, D = x.shape
        x = x.reshape(B, gh * gw, D)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (D,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], D))
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(c.layers):
            x = _Block(D, c.heads, c.mlp_ratio, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("projection", nn.initializers.normal(0.02),
                          (D, c.projection_dim))
        return x @ proj


class TextTower(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, token_ids):
        """token_ids: (B, L) int -> (B, projection_dim). Pools at each
        sequence's max token id (the EOT token, OpenAI convention)."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.hidden_size, name="token_embedding")
        x = emb(token_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.hidden_size))
        x = x + pos[: x.shape[1]]
        for i in range(c.layers):
            x = _Block(c.hidden_size, c.heads, c.mlp_ratio, causal=True,
                       name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("projection", nn.initializers.normal(0.01),
                          (c.hidden_size, c.projection_dim))
        return pooled @ proj


class CLIP(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTower(self.cfg.vision, name="visual")
        self.text = TextTower(self.cfg.text, name="text")
        self.logit_scale = self.param("logit_scale",
                                      lambda k: jnp.asarray(np.log(1 / 0.07),
                                                            jnp.float32))

    def encode_image(self, pixels):
        return self.visual(pixels)

    def encode_text(self, token_ids):
        return self.text(token_ids)

    def __call__(self, pixels, token_ids):
        """(logits_per_image, logits_per_text) as in OpenAI CLIP."""
        img = self.encode_image(pixels)
        txt = self.encode_text(token_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T

    def emotion_probs(self, pixels, text_embeds):
        """Zero-shot emotion probabilities against precomputed (unnormalized)
        text embeddings (reference: video2music.py:189-198)."""
        _, probs = self.semantic_and_emotion(pixels, text_embeds)
        return probs

    def semantic_and_emotion(self, pixels, text_embeds):
        """(raw image embeddings, zero-shot emotion probs) from ONE vision
        tower pass. The reference runs its two extraction scripts as two
        full CLIP forwards per frame (video2music.py:160-165 and :189-198
        share clip_model.encode_image on the same frame); fusing them
        halves the dominant extractor compute."""
        img = self.encode_image(pixels)
        n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1,
                                            keepdims=True)
        logits = jnp.exp(self.logit_scale) * n @ txt.T
        return img, jax.nn.softmax(logits, axis=-1)


def resize_crop_frames(frames: np.ndarray, image_size: int = 336,
                       backend: str = "pil") -> np.ndarray:
    """uint8 (B, H, W, 3) RGB -> uint8 (B, S, S, 3): resize shorter side to
    S (bicubic) + center crop, normalization deferred — ship these to the
    device (4x less H2D than f32) and finish with
    :func:`normalize_pixels` in-graph.

    backend="pil" reproduces the reference preprocessing exactly
    (torchvision Resize(BICUBIC) on PIL images, via clip.load —
    video2music.py:151). backend="cv2" is the serving fast path: SIMD
    INTER_AREA resize, ~10x faster per frame on 1-core hosts; pixel
    values differ from PIL's antialiased bicubic by a few LSBs
    (documented deviation — embeddings shift by O(1e-3), smaller than
    the bf16 serving cast)."""
    if backend == "cv2":
        return _resize_crop_cv2(frames, image_size)
    from PIL import Image

    out = np.empty((frames.shape[0], image_size, image_size, 3), np.uint8)
    for i, frame in enumerate(frames):
        im = Image.fromarray(frame)
        w, h = im.size
        scale = image_size / min(w, h)
        im = im.resize((int(round(w * scale)), int(round(h * scale))),
                       Image.BICUBIC)
        w, h = im.size
        left, top = (w - image_size) // 2, (h - image_size) // 2
        im = im.crop((left, top, left + image_size, top + image_size))
        out[i] = np.asarray(im, np.uint8)
    return out


def _resize_crop_cv2(frames: np.ndarray, image_size: int) -> np.ndarray:
    """cv2 shorter-side resize + center crop (same geometry as the PIL
    path; INTER_AREA ~ antialiased downscale, INTER_CUBIC upscale)."""
    import cv2

    # frames may be an (N, H, W, 3) array or a list of frames with
    # per-clip resolutions (extract_features_batch flattens clips)
    out = np.empty((len(frames), image_size, image_size, 3), np.uint8)
    for i, frame in enumerate(frames):
        h, w = frame.shape[:2]
        scale = image_size / min(w, h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        interp = cv2.INTER_AREA if scale < 1.0 else cv2.INTER_CUBIC
        im = cv2.resize(np.ascontiguousarray(frame), (nw, nh),
                        interpolation=interp)
        left, top = (nw - image_size) // 2, (nh - image_size) // 2
        out[i] = im[top:top + image_size, left:left + image_size]
    return out


def normalize_pixels(u8, mean=None, std=None):
    """uint8 frames -> CLIP-normalized float (jnp, runs in-graph)."""
    import jax.numpy as jnp

    mean = CLIP_MEAN if mean is None else mean
    std = CLIP_STD if std is None else std
    x = u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


def preprocess_frames(frames: np.ndarray, image_size: int = 336) -> np.ndarray:
    """uint8 (B, H, W, 3) RGB -> normalized float32 (B, S, S, 3).

    Reproduces the OpenAI preprocess: resize shorter side to S (bicubic),
    center crop SxS, scale to [0,1], normalize with CLIP mean/std
    (reference loads it via clip.load, video2music.py:151)."""
    u8 = resize_crop_frames(frames, image_size)
    return (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


# ---------------------------------------------------------------------------
# Weight conversion from the HuggingFace CLIPModel state dict
# ---------------------------------------------------------------------------

def _block_params(sd, prefix: str) -> Dict[str, Any]:
    t = lambda k: np.asarray(sd[prefix + k])
    lin = lambda k: {"kernel": t(k + ".weight").T, "bias": t(k + ".bias")}
    ln = lambda k: {"scale": t(k + ".weight"), "bias": t(k + ".bias")}
    return {
        "ln1": ln("layer_norm1"), "ln2": ln("layer_norm2"),
        "q_proj": lin("self_attn.q_proj"), "k_proj": lin("self_attn.k_proj"),
        "v_proj": lin("self_attn.v_proj"),
        "out_proj": lin("self_attn.out_proj"),
        "fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2"),
    }


def convert_hf_clip(state_dict, cfg: CLIPConfig) -> Dict[str, Any]:
    """HF ``CLIPModel.state_dict()`` -> flax params for :class:`CLIP`.

    Works with the openai/clip-vit-large-patch14-336 checkpoint (the
    reference's weights re-hosted on HF) and any smaller CLIPConfig for
    parity testing.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in state_dict.items()}
    vp = "vision_model."
    tp = "text_model."
    ln = lambda k: {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]}

    visual = {
        "patch_embed": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": np.transpose(
                sd[vp + "embeddings.patch_embedding.weight"], (2, 3, 1, 0)),
        },
        "class_embedding": sd[vp + "embeddings.class_embedding"],
        "position_embedding": sd[vp + "embeddings.position_embedding.weight"],
        "ln_pre": ln(vp + "pre_layrnorm"),
        "ln_post": ln(vp + "post_layernorm"),
        "projection": sd["visual_projection.weight"].T,
    }
    for i in range(cfg.vision.layers):
        visual[f"block_{i}"] = _block_params(sd, f"{vp}encoder.layers.{i}.")

    text = {
        "token_embedding": {
            "embedding": sd[tp + "embeddings.token_embedding.weight"]},
        "position_embedding": sd[tp + "embeddings.position_embedding.weight"],
        "ln_final": ln(tp + "final_layer_norm"),
        "projection": sd["text_projection.weight"].T,
    }
    for i in range(cfg.text.layers):
        text[f"block_{i}"] = _block_params(sd, f"{tp}encoder.layers.{i}.")

    return {"visual": visual, "text": text,
            "logit_scale": np.asarray(sd["logit_scale"], np.float32)}
