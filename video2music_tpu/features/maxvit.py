"""MaxViT-T feature extractor for motion embeddings.

The reference embeds per-second frame-diff images with torchvision's
``maxvit_t`` whose classifier is replaced by global average pooling,
yielding 512-d motion features (reference: ``video2music.py:298-341``,
``script/motion_feature.py:43-50``) — one frame per forward. Here the whole
diff-image batch runs in one jitted forward.

Architecture follows MaxViT (Tu et al. 2022) as instantiated by
torchvision's T configuration: conv stem (64ch), four stages of
[MBConv -> block(window) attention -> grid attention] with channels
(64, 128, 256, 512), depths (2, 2, 5, 2), squeeze-excitation MBConv,
partition size 7 at 224x224 input, relative position biases. BatchNorms are
folded to inference form (scale/bias computed from running stats) by the
torchvision weight converter; training this tower is out of scope (the
reference only ever runs it frozen).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class MaxViTConfig:
    channels: tuple = (64, 128, 256, 512)
    depths: tuple = (2, 2, 5, 2)
    stem_channels: int = 64
    partition: int = 7
    head_dim: int = 32
    mbconv_expansion: int = 4
    se_ratio: float = 0.25
    mlp_ratio: int = 4
    image_size: int = 224


def maxvit_t_config() -> MaxViTConfig:
    return MaxViTConfig()


class FoldedBN(nn.Module):
    """Inference-form BatchNorm: y = x * scale + bias (folded stats)."""

    ch: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        return x * scale + bias


class SqueezeExcite(nn.Module):
    ch: int
    se_ch: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_ch, (1, 1), name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(self.ch, (1, 1), name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    """Pre-norm MBConv with SE (torchvision MaxVit layout)."""

    in_ch: int
    out_ch: int
    stride: int
    expansion: int = 4
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch * self.expansion
        res = x
        if self.stride == 2:
            # torch AvgPool2d(3, stride 2, padding 1, count_include_pad) —
            # explicit (1, 1) padding; XLA "SAME" would pad (0, 1) and shift
            # every window by one pixel.
            res = nn.avg_pool(res, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)),
                              count_include_pad=True)
            res = nn.Conv(self.out_ch, (1, 1), name="down_proj")(res)
        elif self.in_ch != self.out_ch:
            res = nn.Conv(self.out_ch, (1, 1), name="down_proj")(res)
        h = FoldedBN(self.in_ch, name="pre_norm")(x)
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_a")(h)
        h = FoldedBN(mid, name="bn_a")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, name="conv_b")(h)
        h = FoldedBN(mid, name="bn_b")(h)
        h = nn.gelu(h, approximate=False)
        h = SqueezeExcite(mid, max(1, int(self.out_ch * self.se_ratio)),
                          name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), name="conv_proj")(h)
        return res + h


def _rel_position_index(p: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(p), np.arange(p),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (p - 1)
    return (rel[..., 0] * (2 * p - 1) + rel[..., 1]).astype(np.int32)


class PartitionAttention(nn.Module):
    """Window ("block") or grid attention with relative position bias."""

    ch: int
    partition: int
    head_dim: int
    grid: bool  # False: window partition; True: grid partition
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.partition
        heads = C // self.head_dim
        n_tok = p * p  # attention ALWAYS runs over p*p tokens (see below)

        # torchvision (0.18, models/maxvit.py PartitionAttentionLayer)
        # partitions with window size p in window mode, and with window size
        # g = H//p in grid mode followed by a (-2, -3) axis swap — so grid
        # attention attends over the p*p grid positions (tokens strided by
        # g across the image), with g*g groups. Both modes therefore share
        # the ((2p-1)^2, heads) relative-position-bias table.
        g = H // p

        def to_windows(t):
            if self.grid:
                # axes: (B, h//g, h%g, w//g, w%g, C) -> groups (h%g, w%g),
                # tokens (h//g, w//g) == the swapped torchvision layout
                t = t.reshape(B, p, g, p, g, C)
                t = t.transpose(0, 2, 4, 1, 3, 5)  # (B, g, g, p, p, C)
                return t.reshape(B * g * g, p * p, C)
            t = t.reshape(B, H // p, p, W // p, p, C)
            t = t.transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(B * (H // p) * (W // p), p * p, C)

        def from_windows(t):
            if self.grid:
                t = t.reshape(B, g, g, p, p, C)
                t = t.transpose(0, 3, 1, 4, 2, 5)  # (B, p, g, p, g, C)
            else:
                t = t.reshape(B, H // p, W // p, p, p, C)
                t = t.transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(B, H, W, C)

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        w = to_windows(h)
        qkv = nn.Dense(3 * C, name="qkv")(w)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(t.shape[0], n_tok, heads,
                                    self.head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                            preferred_element_type=jnp.float32)
        # torchvision scales by the FULL channel dim (feat_dim ** -0.5
        # applied to K), not per-head
        logits = logits * (C ** -0.5)
        bias_table = self.param(
            "rel_bias", nn.initializers.normal(0.02),
            ((2 * p - 1) ** 2, heads))
        idx = jnp.asarray(_rel_position_index(p).reshape(-1))
        bias = bias_table[idx].reshape(n_tok, n_tok, heads)
        logits = logits + bias.transpose(2, 0, 1)[None]
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n_tok, C)
        out = nn.Dense(C, name="proj")(out)
        x = shortcut + from_windows(out)

        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(C * self.mlp_ratio, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2")(h)
        return x + h


class MaxViT(nn.Module):
    cfg: MaxViTConfig
    num_classes: int = 0  # 0 = feature extractor (the reference's use)

    @nn.compact
    def __call__(self, pixels):
        c = self.cfg
        x = nn.Conv(c.stem_channels, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="stem_conv1")(pixels)
        x = FoldedBN(c.stem_channels, name="stem_bn")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(c.stem_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="stem_conv2")(x)
        in_ch = c.stem_channels
        for s, (ch, depth) in enumerate(zip(c.channels, c.depths)):
            for d in range(depth):
                stride = 2 if d == 0 else 1
                x = MBConv(in_ch, ch, stride, c.mbconv_expansion, c.se_ratio,
                           name=f"s{s}_b{d}_mbconv")(x)
                in_ch = ch
                x = PartitionAttention(ch, c.partition, c.head_dim,
                                       grid=False, mlp_ratio=c.mlp_ratio,
                                       name=f"s{s}_b{d}_window")(x)
                x = PartitionAttention(ch, c.partition, c.head_dim,
                                       grid=True, mlp_ratio=c.mlp_ratio,
                                       name=f"s{s}_b{d}_grid")(x)
        feats = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool -> 512-d
        if self.num_classes:
            h = nn.LayerNorm(epsilon=1e-5, name="head_ln")(feats)
            h = jnp.tanh(nn.Dense(feats.shape[-1], name="head_fc")(h))
            return nn.Dense(self.num_classes, use_bias=False,
                            name="head_out")(h)
        return feats


def resize_crop_diff_frames(frames: np.ndarray, image_size: int = 224,
                            backend: str = "pil") -> np.ndarray:
    """uint8 RGB diff images -> uint8 (B, 224, 224, 3) (resize + crop only;
    normalize on device via :func:`normalize_diff_pixels`).

    backend: "pil" = reference-exact (torchvision transforms on PIL);
    "cv2" = serving fast path (see features.clip.resize_crop_frames)."""
    if backend == "cv2":
        from .clip import _resize_crop_cv2
        return _resize_crop_cv2(frames, image_size)
    from PIL import Image

    out = np.empty((frames.shape[0], image_size, image_size, 3), np.uint8)
    for i, frame in enumerate(frames):
        im = Image.fromarray(frame)
        w, h = im.size
        scale = image_size / min(w, h)  # MaxVit_T transforms: resize_size=224
        im = im.resize((int(round(w * scale)), int(round(h * scale))),
                       Image.BICUBIC)
        w, h = im.size
        left, top = (w - image_size) // 2, (h - image_size) // 2
        im = im.crop((left, top, left + image_size, top + image_size))
        out[i] = np.asarray(im, np.uint8)
    return out


def normalize_diff_pixels(u8):
    """uint8 diff frames -> ImageNet-normalized float (jnp, in-graph)."""
    import jax.numpy as jnp

    x = u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def preprocess_diff_frames(frames: np.ndarray,
                           image_size: int = 224) -> np.ndarray:
    """uint8 RGB diff images -> ImageNet-normalized (B, 224, 224, 3)
    (torchvision MaxVit_T_Weights.IMAGENET1K_V1.transforms: resize 224
    bicubic + center crop + normalize)."""
    u8 = resize_crop_diff_frames(frames, image_size)
    return (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def motion_diff_frames(frame_pairs: list) -> np.ndarray:
    """|cur - prev| RGB diff images with a leading zero row, matching the
    reference's capture loop (video2music.py:311-335). ``frame_pairs``:
    list of (prev, cur) CONSECUTIVE-frame BGR pairs at 1-second boundaries
    (see pipeline.video_io.second_boundary_pairs) — each diff spans ~1/fps,
    not a full second."""
    import cv2

    if not frame_pairs:
        return np.zeros((1, 2, 2, 3), np.uint8)
    diffs = [np.zeros_like(frame_pairs[0][0])[..., ::-1]]
    for prev, cur in frame_pairs:
        diff = cv2.absdiff(cur, prev)
        diffs.append(cv2.cvtColor(diff, cv2.COLOR_BGR2RGB))
    return np.stack(diffs)


def scalar_motion(frame_pairs: list) -> np.ndarray:
    """motion_type=0 scalar motion: mean RGB absdiff of consecutive frames
    at each second boundary, with a leading zero (reference:
    video2music.py:269-295 'origin' path that produced the dataset's
    motion .lab files)."""
    import cv2

    vals = [0.0]
    for prev, cur in frame_pairs:
        diff = cv2.absdiff(cur, prev)
        vals.append(float(cv2.cvtColor(diff, cv2.COLOR_BGR2RGB).mean()))
    return np.asarray(vals, np.float32)


# ---------------------------------------------------------------------------
# torchvision weight conversion (run where torchvision + weights exist)
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix, eps=1e-3):
    """BatchNorm running stats -> inference scale/bias. MaxVit constructs
    its BatchNorm2d with eps=1e-3 (torchvision MaxVit.__init__ default),
    not the torch-wide 1e-5."""
    w = np.asarray(sd[prefix + ".weight"])
    b = np.asarray(sd[prefix + ".bias"])
    mean = np.asarray(sd[prefix + ".running_mean"])
    var = np.asarray(sd[prefix + ".running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def convert_torchvision_maxvit(state_dict,
                               cfg: MaxViTConfig = MaxViTConfig()
                               ) -> Dict[str, Any]:
    """torchvision ``maxvit_t().state_dict()`` -> flax params for MaxViT.

    Cite: torchvision.models.maxvit (stem 'stem.0/1', blocks
    'blocks.{s}.layers.{d}.layers.{MBconv,window_attention,grid_attention}').
    Conversion folds every BatchNorm into scale/bias (inference form).
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    conv = lambda k: {"kernel": np.transpose(sd[k + ".weight"], (2, 3, 1, 0))}
    conv_b = lambda k: {**conv(k), "bias": sd[k + ".bias"]}
    dconv = lambda k: {"kernel": np.transpose(sd[k + ".weight"], (2, 3, 1, 0))}
    lin = lambda k: {"kernel": sd[k + ".weight"].T, "bias": sd[k + ".bias"]}
    ln = lambda k: {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]}

    params: Dict[str, Any] = {
        "stem_conv1": conv("stem.0.0"),
        "stem_bn": _fold_bn(sd, "stem.0.1"),
        "stem_conv2": conv_b("stem.1.0"),
    }

    def attention(prefix, name_ln1, out):
        a = f"{prefix}.attn_layer"
        out[name_ln1 + "ln1"] = ln(f"{a}.0")  # pre-attn LayerNorm
        qkv_w = sd[f"{a}.1.to_qkv.weight"]
        out[name_ln1 + "qkv"] = {"kernel": qkv_w.T,
                                 "bias": sd[f"{a}.1.to_qkv.bias"]}
        out[name_ln1 + "rel_bias"] = sd[
            f"{a}.1.relative_position_bias_table"]
        out[name_ln1 + "proj"] = lin(f"{a}.1.merge")
        out[name_ln1 + "ln2"] = ln(f"{prefix}.mlp_layer.0")
        out[name_ln1 + "fc1"] = lin(f"{prefix}.mlp_layer.1")
        out[name_ln1 + "fc2"] = lin(f"{prefix}.mlp_layer.3")

    for s, depth in enumerate(cfg.depths):
        for d in range(depth):
            base = f"blocks.{s}.layers.{d}.layers"
            mb = f"{base}.MBconv"
            m: Dict[str, Any] = {"pre_norm": _fold_bn(sd, f"{mb}.layers.pre_norm")}
            if f"{mb}.proj.1.weight" in sd:  # downsample: avgpool+conv
                m["down_proj"] = conv_b(f"{mb}.proj.1")
            elif f"{mb}.proj.weight" in sd:
                m["down_proj"] = conv_b(f"{mb}.proj")
            m["conv_a"] = conv(f"{mb}.layers.conv_a.0")
            m["bn_a"] = _fold_bn(sd, f"{mb}.layers.conv_a.1")
            m["conv_b"] = dconv(f"{mb}.layers.conv_b.0")
            m["bn_b"] = _fold_bn(sd, f"{mb}.layers.conv_b.1")
            m["se"] = {"fc1": conv_b(f"{mb}.layers.squeeze_excitation.fc1"),
                       "fc2": conv_b(f"{mb}.layers.squeeze_excitation.fc2")}
            m["conv_proj"] = conv_b(f"{mb}.layers.conv_c")
            params[f"s{s}_b{d}_mbconv"] = m

            for kind, tvname in (("window", "window_attention"),
                                 ("grid", "grid_attention")):
                out: Dict[str, Any] = {}
                attention(f"{base}.{tvname}", "", out)
                params[f"s{s}_b{d}_{kind}"] = out
    return params
