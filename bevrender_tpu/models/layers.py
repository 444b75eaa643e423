"""Shared model building blocks (flax.linen, NHWC layout).

TPU-native counterparts of model/model_utils.py and model/feedforward.py:

* ``LayerNorm2d`` — the reference's ``LayerNormProxy`` (model_utils.py:51-59)
  rearranges NCHW->NHWC to apply LayerNorm over channels; in NHWC layout it is
  just LayerNorm over the last axis.
* ``ConvMLP`` — ``TransformerMLPWithConv`` (model_utils.py:6-35): 1x1 expand,
  depthwise-3x3 residual branch, GELU, 1x1 project.
* ``DropPath`` — timm-style per-sample stochastic depth (used at
  encoder.py:278-280).
* ``LayerScale`` — parity with model_utils.py:38-48 (the reference constructs
  it but wires ``nn.Identity`` at encoder.py:274; kept for API completeness).
* ``FeedForwardLayer`` — parity with feedforward.py:4-21 (declared-but-unused
  in the reference's EncoderLayer; see encoder.py:291-296 vs 382-384).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevrender_tpu.parallel.annotate import hint


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel (last) axis of an NHWC tensor."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm()(x)


def make_norm(norm: str, *, axis_name: Optional[str] = None) -> Callable[..., nn.Module]:
    """Factory for the conv-net normalization layer.

    ``batch`` mirrors the reference's BatchNorm2d (SyncBN across ``axis_name``
    under data parallelism — train.py:129-137); ``group`` swaps in GroupNorm to
    keep the forward pass collective-free under SPMD (SURVEY section 7,
    "BatchNorm under SPMD").
    """
    if norm == "batch":

        def f(use_running_average: bool, name=None):
            return nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=axis_name,
                name=name,
            )

        return f
    if norm == "group":

        def f(use_running_average: bool, name=None):  # flag ignored
            return AdaptiveGroupNorm(name=name)

        return f
    raise ValueError(f"unknown norm: {norm}")


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm whose group size adapts to narrow layers (decoder heads can
    have 4 channels while trunk layers have 64+)."""

    max_group_size: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math

        c = x.shape[-1]
        gs = math.gcd(c, self.max_group_size)
        return nn.GroupNorm(num_groups=c // gs)(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class LayerScale(nn.Module):
    """Per-channel learned scale (model_utils.py:38-48); unused by default."""

    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init_value), (self.dim,)
        )
        return x * gamma


class ConvMLP(nn.Module):
    """1x1 conv MLP with a depthwise-3x3 branch (model_utils.py:6-35).

    x -> conv1x1 (C -> C*expansion) -> dropout -> (+ depthwise3x3) -> GELU
      -> conv1x1 (-> C) -> dropout
    """

    dim: int
    expansion: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        hidden = self.dim * self.expansion
        x = Conv(hidden, (1, 1), name="linear1")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        # depthwise conv: keep channels unsharded (GSPMD cannot split
        # feature_group_count); TP picks up after it
        x = hint(x, "data", None, None, None)
        x = x + Conv(
            hidden, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hidden,
            name="dwc",
        )(x)
        x = nn.gelu(x)
        x = hint(x, "data", None, None, "model")  # TP over MLP hidden channels
        x = Conv(self.dim, (1, 1), name="linear2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class FeedForwardLayer(nn.Module):
    """Linear FFN (feedforward.py:4-21). Parity-only: the reference constructs
    two of these per EncoderLayer but never calls them (encoder.py:382-384,
    403-404)."""

    in_dim: int
    hidden_dim: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        y = Dense(self.hidden_dim)(x)
        y = nn.gelu(y)
        y = nn.Dropout(self.drop_rate, deterministic=deterministic)(y)
        y = Dense(self.in_dim)(y)
        y = nn.Dropout(self.drop_rate, deterministic=deterministic)(y)
        return y


# Weight-init parity with BEVRender.init_weights (bevrender.py:152-173):
# Conv2d -> Kaiming normal (fan_out, relu); Linear -> Xavier uniform.
KAIMING_CONV = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
XAVIER_DENSE = nn.initializers.xavier_uniform()

# Process-wide compute dtype for conv/dense layers (params stay float32;
# norms and softmax auto-promote to f32). Set from ModelConfig.dtype at model
# build (BEVRenderModel.__init__); bf16 roughly doubles MXU rate and halves
# activation bandwidth on TPU.
_COMPUTE_DTYPE = [None]


def set_default_compute_dtype(dtype: Optional[str]) -> None:
    _COMPUTE_DTYPE[0] = (
        jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None
    )


def Conv(*args, **kw):
    kw.setdefault("kernel_init", KAIMING_CONV)
    kw.setdefault("dtype", _COMPUTE_DTYPE[0])
    return nn.Conv(*args, **kw)


def Dense(*args, **kw):
    kw.setdefault("kernel_init", XAVIER_DENSE)
    kw.setdefault("dtype", _COMPUTE_DTYPE[0])
    return nn.Dense(*args, **kw)


def trunc_normal_init(std: float):
    """timm ``trunc_normal_`` equivalent (used for rpe tables,
    SCA_deform_attn.py:165)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init
