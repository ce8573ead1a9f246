"""Torch mirror of torchvision 0.18.1 ``torchvision.models.maxvit``.

torchvision is not installed in this image, but torch is — so the MaxViT-T
weight converter (``video2music_tpu/features/maxvit.py``) is validated the
same way the V2 checkpoint converter was: build the exact module graph the
reference loads (reference: ``video2music.py:298-305`` builds
``torchvision.models.maxvit_t`` and replaces the classifier with
AdaptiveAvgPool2d+Flatten; ``requirements.txt:2`` pins torchvision 0.18.1),
give it random weights, convert its ``state_dict()``, and require numerical
agreement with the flax model.

This file reconstructs the torchvision graph component by component —
module names, state_dict keys, padding/eps/scale conventions — from the
published torchvision 0.18 source layout:

  * stem: two ``Conv2dNormActivation`` blocks — 3x3 s2 conv + BN + GELU
    (bias=False), then 3x3 s1 conv with bias, no norm/act.
  * ``MBConv``: residual ``proj`` (AvgPool2d(3, s2, pad 1) + 1x1 conv when
    stride 2), body = BN pre_norm -> 1x1 conv+BN+GELU -> 3x3 depthwise
    (stride) conv+BN+GELU -> SqueezeExcitation(SiLU) -> 1x1 conv.
  * ``PartitionAttentionLayer``: WindowPartition with window size p
    (window mode) or with size ``grid_size//p`` followed by a (-2, -3) axis
    swap (grid mode) so attention ALWAYS runs over p*p tokens; pre-LN
    attention with a ((2p-1)^2, heads) relative-position-bias table; pre-LN
    MLP (ratio 4, GELU).
  * ``RelativePositionalMultiHeadAttention``: packed to_qkv Linear, scale
    factor ``feat_dim ** -0.5`` applied to K (torchvision's convention —
    NOT per-head), merge Linear.
  * BatchNorm eps=1e-3, momentum=0.01 (torchvision ``MaxVit.__init__``
    default); LayerNorm eps 1e-5 (torch default).
  * maxvit_t config: stem 64, channels (64, 128, 256, 512), depths
    (2, 2, 5, 2), head_dim 32, partition 7, expansion 4, squeeze 0.25,
    input 224.

Inference-only: dropout/stochastic-depth are identity in eval and carry no
parameters, so the state_dict layout is unaffected.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from functools import partial

import torch
import torch.nn.functional as F
from torch import Tensor, nn


class Conv2dNormActivation(nn.Sequential):
    """torchvision.ops.misc.Conv2dNormActivation: [conv, norm?, act?]."""

    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, padding=None,
                 groups=1, norm_layer=nn.BatchNorm2d,
                 activation_layer=nn.ReLU, bias=None):
        if padding is None:
            padding = (kernel_size - 1) // 2
        if bias is None:
            bias = norm_layer is None
        layers = [nn.Conv2d(in_ch, out_ch, kernel_size, stride, padding,
                            groups=groups, bias=bias)]
        if norm_layer is not None:
            layers.append(norm_layer(out_ch))
        if activation_layer is not None:
            layers.append(activation_layer())
        super().__init__(*layers)


class SqueezeExcitation(nn.Module):
    """torchvision.ops.SqueezeExcitation (avgpool/fc1/act/fc2/sigmoid)."""

    def __init__(self, input_ch, squeeze_ch, activation=nn.ReLU):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, input_ch, 1)
        self.activation = activation()
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.scale_activation(self.fc2(self.activation(self.fc1(s))))
        return x * s


def _get_conv_output_shape(input_size, kernel_size, stride, padding):
    return ((input_size[0] - kernel_size + 2 * padding) // stride + 1,
            (input_size[1] - kernel_size + 2 * padding) // stride + 1)


def _get_relative_position_index(height: int, width: int) -> Tensor:
    coords = torch.stack(
        torch.meshgrid([torch.arange(height), torch.arange(width)],
                       indexing="ij"))
    coords_flat = torch.flatten(coords, 1)
    relative_coords = coords_flat[:, :, None] - coords_flat[:, None, :]
    relative_coords = relative_coords.permute(1, 2, 0).contiguous()
    relative_coords[:, :, 0] += height - 1
    relative_coords[:, :, 1] += width - 1
    relative_coords[:, :, 0] *= 2 * width - 1
    return relative_coords.sum(-1)


class MBConv(nn.Module):
    def __init__(self, in_channels, out_channels, expansion_ratio,
                 squeeze_ratio, stride, activation_layer, norm_layer):
        super().__init__()
        should_proj = stride != 1 or in_channels != out_channels
        if should_proj:
            proj = [nn.Conv2d(in_channels, out_channels, 1, stride=1,
                              bias=True)]
            if stride == 2:
                proj = [nn.AvgPool2d(3, stride=stride, padding=1)] + proj
            self.proj = nn.Sequential(*proj)
        else:
            self.proj = nn.Identity()

        mid_channels = int(out_channels * expansion_ratio)
        sqz_channels = int(out_channels * squeeze_ratio)

        _layers = OrderedDict()
        _layers["pre_norm"] = norm_layer(in_channels)
        _layers["conv_a"] = Conv2dNormActivation(
            in_channels, mid_channels, kernel_size=1, stride=1, padding=0,
            activation_layer=activation_layer, norm_layer=norm_layer)
        _layers["conv_b"] = Conv2dNormActivation(
            mid_channels, mid_channels, kernel_size=3, stride=stride,
            padding=1, activation_layer=activation_layer,
            norm_layer=norm_layer, groups=mid_channels)
        _layers["squeeze_excitation"] = SqueezeExcitation(
            mid_channels, sqz_channels, activation=nn.SiLU)
        _layers["conv_c"] = nn.Conv2d(mid_channels, out_channels, 1,
                                      bias=True)
        self.layers = nn.Sequential(_layers)

    def forward(self, x):
        return self.proj(x) + self.layers(x)


class RelativePositionalMultiHeadAttention(nn.Module):
    def __init__(self, feat_dim, head_dim, max_seq_len):
        super().__init__()
        if feat_dim % head_dim != 0:
            raise ValueError("feat_dim must be divisible by head_dim")
        self.n_heads = feat_dim // head_dim
        self.head_dim = head_dim
        self.size = int(math.sqrt(max_seq_len))
        self.max_seq_len = max_seq_len

        self.to_qkv = nn.Linear(feat_dim, self.n_heads * head_dim * 3)
        # torchvision scales by the FULL channel dim, not head_dim
        self.scale_factor = feat_dim ** -0.5

        self.merge = nn.Linear(head_dim * self.n_heads, feat_dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * self.size - 1) ** 2, self.n_heads) * 0.02)
        self.register_buffer(
            "relative_position_index",
            _get_relative_position_index(self.size, self.size))

    def get_relative_positional_bias(self) -> Tensor:
        bias_index = self.relative_position_index.view(-1)
        relative_bias = self.relative_position_bias_table[bias_index].view(
            self.max_seq_len, self.max_seq_len, -1)
        return relative_bias.permute(2, 0, 1).contiguous().unsqueeze(0)

    def forward(self, x):
        B, G, P, D = x.shape
        H, DH = self.n_heads, self.head_dim
        qkv = self.to_qkv(x)
        q, k, v = torch.chunk(qkv, 3, dim=-1)
        q = q.reshape(B, G, P, H, DH).permute(0, 1, 3, 2, 4)
        k = k.reshape(B, G, P, H, DH).permute(0, 1, 3, 2, 4)
        v = v.reshape(B, G, P, H, DH).permute(0, 1, 3, 2, 4)
        k = k * self.scale_factor
        dot_prod = torch.einsum("bghid,bghjd->bghij", q, k)
        dot_prod = F.softmax(dot_prod + self.get_relative_positional_bias(),
                             dim=-1)
        out = torch.einsum("bghij,bghjd->bghid", dot_prod, v)
        out = out.permute(0, 1, 3, 2, 4).reshape(B, G, P, D)
        return self.merge(out)


class SwapAxes(nn.Module):
    def __init__(self, a, b):
        super().__init__()
        self.a, self.b = a, b

    def forward(self, x):
        return torch.swapaxes(x, self.a, self.b)


class WindowPartition(nn.Module):
    """(B, C, H, W) -> (B, H/P * W/P, P*P, C)."""

    def forward(self, x, p):
        B, C, H, W = x.shape
        P = p
        x = x.reshape(B, C, H // P, P, W // P, P)
        x = x.permute(0, 2, 4, 3, 5, 1)
        return x.reshape(B, (H // P) * (W // P), P * P, C)


class WindowDepartition(nn.Module):
    """(B, G, P*P, C) -> (B, C, H, W)."""

    def forward(self, x, p, h_partitions, w_partitions):
        B, G, PP, C = x.shape
        P, HP, WP = p, h_partitions, w_partitions
        x = x.reshape(B, HP, WP, P, P, C)
        x = x.permute(0, 5, 1, 3, 2, 4)
        return x.reshape(B, C, HP * P, WP * P)


class PartitionAttentionLayer(nn.Module):
    def __init__(self, in_channels, head_dim, partition_size, partition_type,
                 grid_size, mlp_ratio, activation_layer, norm_layer):
        super().__init__()
        self.n_partitions = grid_size[0] // partition_size
        self.partition_type = partition_type
        self.grid_size = grid_size
        if partition_type == "window":
            self.p, self.g = partition_size, self.n_partitions
        else:
            self.p, self.g = self.n_partitions, partition_size

        self.partition_op = WindowPartition()
        self.departition_op = WindowDepartition()
        self.partition_swap = (SwapAxes(-2, -3) if partition_type == "grid"
                               else nn.Identity())
        self.departition_swap = (SwapAxes(-2, -3) if partition_type == "grid"
                                 else nn.Identity())

        # attention always runs over partition_size**2 tokens because of
        # the axis swap in grid mode
        self.attn_layer = nn.Sequential(
            norm_layer(in_channels),
            RelativePositionalMultiHeadAttention(
                in_channels, head_dim, partition_size ** 2),
            nn.Dropout(0.0),
        )
        self.mlp_layer = nn.Sequential(
            nn.LayerNorm(in_channels),
            nn.Linear(in_channels, in_channels * mlp_ratio),
            activation_layer(),
            nn.Linear(in_channels * mlp_ratio, in_channels),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        gh, gw = (self.grid_size[0] // self.p, self.grid_size[1] // self.p)
        x = self.partition_op(x, self.p)
        x = self.partition_swap(x)
        x = x + self.attn_layer(x)
        x = x + self.mlp_layer(x)
        x = self.departition_swap(x)
        return self.departition_op(x, self.p, gh, gw)


class MaxVitLayer(nn.Module):
    def __init__(self, in_channels, out_channels, squeeze_ratio,
                 expansion_ratio, stride, norm_layer, activation_layer,
                 head_dim, mlp_ratio, partition_size, grid_size):
        super().__init__()
        layers: OrderedDict = OrderedDict()
        layers["MBconv"] = MBConv(
            in_channels, out_channels, expansion_ratio, squeeze_ratio,
            stride, activation_layer, norm_layer)
        layers["window_attention"] = PartitionAttentionLayer(
            out_channels, head_dim, partition_size, "window", grid_size,
            mlp_ratio, activation_layer, nn.LayerNorm)
        layers["grid_attention"] = PartitionAttentionLayer(
            out_channels, head_dim, partition_size, "grid", grid_size,
            mlp_ratio, activation_layer, nn.LayerNorm)
        self.layers = nn.Sequential(layers)

    def forward(self, x):
        return self.layers(x)


class MaxVitBlock(nn.Module):
    def __init__(self, in_channels, out_channels, squeeze_ratio,
                 expansion_ratio, norm_layer, activation_layer, head_dim,
                 mlp_ratio, partition_size, input_grid_size, n_layers):
        super().__init__()
        self.grid_size = _get_conv_output_shape(input_grid_size, 3, 2, 1)
        self.layers = nn.ModuleList()
        for idx in range(n_layers):
            stride = 2 if idx == 0 else 1
            self.layers += [MaxVitLayer(
                in_channels if idx == 0 else out_channels, out_channels,
                squeeze_ratio, expansion_ratio, stride, norm_layer,
                activation_layer, head_dim, mlp_ratio, partition_size,
                self.grid_size)]

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class MaxVit(nn.Module):
    def __init__(self, input_size=(224, 224), stem_channels=64,
                 partition_size=7, block_channels=(64, 128, 256, 512),
                 block_layers=(2, 2, 5, 2), head_dim=32,
                 expansion_ratio=4.0, squeeze_ratio=0.25, mlp_ratio=4,
                 num_classes=1000, norm_layer=None):
        super().__init__()
        if norm_layer is None:
            norm_layer = partial(nn.BatchNorm2d, eps=1e-3, momentum=0.01)
        activation_layer = nn.GELU

        self.stem = nn.Sequential(
            Conv2dNormActivation(3, stem_channels, 3, stride=2,
                                 norm_layer=norm_layer,
                                 activation_layer=activation_layer,
                                 bias=False),
            Conv2dNormActivation(stem_channels, stem_channels, 3, stride=1,
                                 norm_layer=None, activation_layer=None,
                                 bias=True),
        )
        input_size = _get_conv_output_shape(input_size, 3, 2, 1)

        self.blocks = nn.ModuleList()
        in_channels = [stem_channels] + list(block_channels[:-1])
        for in_c, out_c, n_layers in zip(in_channels, block_channels,
                                         block_layers):
            self.blocks.append(MaxVitBlock(
                in_c, out_c, squeeze_ratio, expansion_ratio, norm_layer,
                activation_layer, head_dim, mlp_ratio, partition_size,
                input_size, n_layers))
            input_size = self.blocks[-1].grid_size

        self.classifier = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Flatten(),
            nn.LayerNorm(block_channels[-1]),
            nn.Linear(block_channels[-1], block_channels[-1]),
            nn.Tanh(),
            nn.Linear(block_channels[-1], num_classes, bias=False),
        )

    def forward(self, x):
        x = self.stem(x)
        for block in self.blocks:
            x = block(x)
        return self.classifier(x)


def maxvit_t_mirror() -> MaxVit:
    """The maxvit_t graph the reference builds (video2music.py:298)."""
    return MaxVit(input_size=(224, 224), stem_channels=64, partition_size=7,
                  block_channels=(64, 128, 256, 512),
                  block_layers=(2, 2, 5, 2), head_dim=32)


def feature_extractor(model: MaxVit) -> MaxVit:
    """Replace the classifier exactly as the reference does
    (video2music.py:299-302): AdaptiveAvgPool2d + Flatten -> 512-d."""
    model.classifier = nn.Sequential(nn.AdaptiveAvgPool2d(1), nn.Flatten())
    return model
