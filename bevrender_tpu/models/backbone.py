"""Image backbones (flax.linen, NHWC): TPU rebuilds of model/img_backbone.py.

Three options selected by ``DAT_BACKBONE_TYPE`` (model/encoder.py:46-56):

* ``ResNet18WoFPN`` — from-scratch ResNet-18 with constant 64 channels and a
  stride schedule keyed to the stage-0 BEV size (img_backbone.py:429-454).
* ``PatchProjection`` — ViT-style conv stem for patch size 4/8/16
  (img_backbone.py:457-501).
* ``ResnetFPN`` — full ResNet + FPN P2-P5; present for parity but disabled in
  the default wiring, exactly like the reference (multiscale hookup commented
  at encoder.py:116,120).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevrender_tpu.models.layers import Conv


class BasicBlock(nn.Module):
    """ResNet basic block (img_backbone.py:95-161)."""

    out_channels: int
    stride: int = 1
    is_first_block: bool = False
    norm: Callable = None  # norm factory: norm(use_running_average) -> Module

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), name="conv1",
        )(x)
        y = self.norm(not train, name="bn1")(y)
        y = nn.relu(y)
        y = Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv2"
        )(y)
        y = self.norm(not train, name="bn2")(y)
        if self.is_first_block and self.stride != 1:
            identity = Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                name="down_conv",
            )(identity)
            identity = self.norm(not train, name="down_bn")(identity)
        return nn.relu(y + identity)


class BottleNeck(nn.Module):
    """ResNet bottleneck block, expansion 4 (img_backbone.py:11-92)."""

    out_channels: int
    stride: int = 1
    is_first_block: bool = False
    norm: Callable = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = Conv(self.out_channels, (1, 1), name="conv1")(x)
        y = self.norm(not train, name="bn1")(y)
        y = nn.relu(y)
        y = Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), name="conv2",
        )(y)
        y = self.norm(not train, name="bn2")(y)
        y = nn.relu(y)
        y = Conv(self.out_channels * self.expansion, (1, 1), name="conv3")(y)
        y = self.norm(not train, name="bn3")(y)
        if self.is_first_block:
            identity = Conv(
                self.out_channels * self.expansion, (1, 1),
                strides=(self.stride, self.stride), name="down_conv",
            )(identity)
            identity = self.norm(not train, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNetTrunk(nn.Module):
    """Stem + conv2_x..conv5_x (img_backbone.py:164-282). Returns either the
    final map or all four stage maps (for FPN)."""

    block: type
    n_blocks: Sequence[int] = (2, 2, 2, 2)
    out_channels: Sequence[int] = (64, 128, 256, 512)
    strides: Sequence[int] = (1, 1, 1, 1)
    norm: Callable = None
    return_stages: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="stem_conv")(x)
        x = self.norm(not train, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stages = []
        for si, (n, c, s) in enumerate(
            zip(self.n_blocks, self.out_channels, self.strides)
        ):
            for bi in range(n):
                x = self.block(
                    out_channels=c,
                    stride=s if bi == 0 else 1,
                    is_first_block=bi == 0,
                    norm=self.norm,
                    name=f"layer{si + 2}_block{bi}",
                )(x, train)
            stages.append(x)
        return tuple(stages) if self.return_stages else x


class ResNet18WoFPN(nn.Module):
    """Single-scale ResNet-18 feature extractor (img_backbone.py:429-454):
    constant 64 channels; strides keyed to the BEV size (56 -> all 1,
    28 -> stride 2 in conv3_x). Input (B, H, W, 3) -> (B, H/4 or H/8, ., 64)."""

    bev_dim: int
    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.bev_dim == 28:
            strides = (1, 2, 1, 1)
        else:  # 56 and the general case
            strides = (1, 1, 1, 1)
        return ResNetTrunk(
            block=BasicBlock,
            n_blocks=(2, 2, 2, 2),
            out_channels=(64, 64, 64, 64),
            strides=strides,
            norm=self.norm,
            name="resnet",
        )(x, train)


class PatchProjection(nn.Module):
    """Conv patch-embedding stem (img_backbone.py:457-501): a chain of
    stride-2 3x3 convs with channel-last LayerNorm + GELU, one conv per factor
    of 2 in ``patch_size``."""

    embed_dim: int
    patch_size: int  # 4 | 8 | 16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n_convs = {4: 2, 8: 3, 16: 4}[self.patch_size]
        for i in range(n_convs):
            out = self.embed_dim if i == n_convs - 1 else self.embed_dim // 2
            x = Conv(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"conv{i}")(x)
            x = nn.LayerNorm(name=f"norm{i}")(x)
            if i != n_convs - 1:
                x = nn.gelu(x)
        return x


class FPNBlock(nn.Module):
    """Lateral 1x1 + top-down upsample merge + 3x3 out (img_backbone.py:285-326)."""

    out_channels: int
    is_highest_block: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, top: jax.Array | None):
        x = Conv(self.out_channels, (1, 1), name="lateral")(x)
        if not self.is_highest_block and top is not None:
            B, H, W, C = top.shape
            up = jax.image.resize(top, (B, H * 2, W * 2, C), method="bilinear")
            x = x + Conv(self.out_channels, (1, 1), name="top_proj")(up)
        out = Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="out_conv"
        )(x)
        return x, out


class ResnetFPN(nn.Module):
    """ResNet-18/34/50/101/152 + FPN returning P2-P5
    (img_backbone.py:384-426). Kept for parity; not wired by default."""

    resnet_arch: str = "18"
    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        blocks = {
            "18": (BasicBlock, (2, 2, 2, 2)),
            "34": (BasicBlock, (3, 4, 6, 3)),
            "50": (BottleNeck, (3, 4, 6, 3)),
            "101": (BottleNeck, (3, 4, 23, 3)),
            "152": (BottleNeck, (3, 8, 36, 3)),
        }
        block, n_blocks = blocks[self.resnet_arch]
        expansion = 4 if block is BottleNeck else 1
        c2, c3, c4, c5 = ResNetTrunk(
            block=block,
            n_blocks=n_blocks,
            out_channels=(64, 128, 256, 512),
            strides=(1, 2, 2, 2),
            norm=self.norm,
            return_stages=True,
            name="resnet",
        )(x, train)
        chans = [64 * expansion, 128 * expansion, 256 * expansion, 512 * expansion]
        x5, p5 = FPNBlock(chans[3], is_highest_block=True, name="P5")(c5, None)
        x4, p4 = FPNBlock(chans[2], name="P4")(c4, x5)
        x3, p3 = FPNBlock(chans[1], name="P3")(c3, x4)
        _, p2 = FPNBlock(chans[0], name="P2")(c2, x3)
        return p2, p3, p4, p5


def build_backbone(backbone: str, embed_dim: int, bev_dim: int, img_height: int,
                   norm: Callable):
    """Backbone selection mirroring model/encoder.py:46-56. ``PatchProjection``
    patch size is derived from image/bev ratio (reference hardcodes 224/{56,28,14})."""
    if backbone == "ResNet18":
        return ResNet18WoFPN(bev_dim=bev_dim, norm=norm, name="img_backbone")
    if backbone == "PatchProjection":
        patch = max(2, img_height // bev_dim)
        return PatchProjection(embed_dim=embed_dim, patch_size=patch,
                               name="img_backbone")
    if backbone == "ResnetFPN":
        return ResnetFPN(norm=norm, name="img_backbone")
    raise ValueError(f"unknown backbone: {backbone}")
