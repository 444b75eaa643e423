"""BEV -> aerial-view RGB render decoder (model/decoder_img_render.py).

CNN that maps the final BEV feature map to a (224, 224) RGB aerial image in
[0, 1] via a sigmoid head. The layer list depends on the final BEV spatial dim
(14/28/56 -> enough x2 upsamples to reach 224), mirroring
decoder_img_render.py:50-88. Quirks kept for parity:

* the "BasicBlock" here has *no* residual connection (it is a plain conv
  stack, decoder_img_render.py:96-181);
* only the final conv stack ends in ReLU / Sigmoid; the intermediate convs are
  conv->norm chains without activations;
* the stem's BatchNorm is over ``hid_dim`` channels (the reference hardcodes
  64, decoder_img_render.py:14-16 — we use ``hid_dim``, identical for the
  default ``DECODER_HID_DIM=64``).

Upsampling is bilinear x2 with half-pixel centers (torch ``nn.Upsample``
default ``align_corners=False``), i.e. ``jax.image.resize(method="bilinear")``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevrender_tpu.models.layers import Conv


def _upsample2x(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


class DecoderConvBlock(nn.Module):
    """Four conv3x3+norm pairs ending in ReLU (decoder_img_render.py:96-181).
    No residual, despite the reference naming it BasicBlock."""

    hidden_dim: int
    out_channels: int
    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(3):
            x = Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, name=f"conv{i}")(x)
            x = self.norm(not train, name=f"bn{i}")(x)
        x = Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv3")(x)
        x = self.norm(not train, name="bn3")(x)
        return nn.relu(x)


class UpsampleBlock(nn.Module):
    """x2 bilinear upsample + two conv+norm, ReLU out
    (UpSampleLayer1, decoder_img_render.py:184-199)."""

    hidden_dim: int
    out_channels: int
    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = _upsample2x(x)
        x = Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv0")(x)
        x = self.norm(not train, name="bn0")(x)
        x = Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        x = self.norm(not train, name="bn1")(x)
        return nn.relu(x)


class UpsampleHead(nn.Module):
    """Final x2 upsample ending in a sigmoid RGB head
    (UpSampleLayer2, decoder_img_render.py:202-216)."""

    hidden_dim: int
    out_channels: int = 3
    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = _upsample2x(x)
        x = Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv0")(x)
        x = self.norm(not train, name="bn0")(x)
        x = Conv(self.out_channels, (1, 1), use_bias=False, name="conv1")(x)
        return nn.sigmoid(x)


class BEVImageRenderDecoder(nn.Module):
    """(B, bev, bev, model_dim) -> (B, 224, 224, 3) aerial render.

    Stage list per final BEV dim mirrors decoder_img_render.py:50-88:
    stem (conv7 s2) halves, conv blocks hold, then x2 upsamples to 8x the
    post-stem size for bev=56 (56->28->224), 16x for 28, 32x for 14.
    """

    bev_spatial_dim: int
    model_dim: int = 64
    hid_dim: int = 64
    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = self.norm
        # stem: conv7 stride 2 (decoder_img_render.py:12-18)
        x = Conv(self.hid_dim, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="stem_conv")(x)
        x = n(not train, name="stem_bn")(x)
        x = nn.relu(x)

        x = DecoderConvBlock(self.hid_dim, self.hid_dim, norm=n, name="block1")(
            x, train)
        x = DecoderConvBlock(self.hid_dim * 2, self.hid_dim * 2, norm=n,
                             name="block2")(x, train)
        x = DecoderConvBlock(self.model_dim, self.model_dim, norm=n,
                             name="block3")(x, train)

        n_upsamples = {56: 2, 28: 3, 14: 4}.get(self.bev_spatial_dim, 2)
        dims = [self.model_dim // 2, self.model_dim // 4]
        dims += [self.model_dim // 4] * max(0, n_upsamples - 2)
        prev = self.model_dim
        for i, dim in enumerate(dims[:n_upsamples]):
            x = UpsampleBlock(dim, dim, norm=n, name=f"up{i}")(x, train)
            prev = dim
        x = UpsampleHead(max(self.model_dim // 8, 4), 3, norm=n, name="head")(
            x, train)
        return x


class SimpleDecoder(nn.Module):
    """Minimal alternative decoder (decoder_img_render.py:219-232)."""

    norm: Callable = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 4 * H, 4 * W, C), method="bilinear")
        x = Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv0")(x)
        x = self.norm(not train, name="bn0")(x)
        x = Conv(3, (1, 1), use_bias=False, name="conv1")(x)
        return nn.relu(x)
