"""Compact retrieval-embedding head (the explicit head SURVEY §3.4 calls for).

The reference's retrieval embedding is inconsistent by its own admission:
``Trainer.model_output_dim = 64*28*28`` sizes the recall buffers for a
flattened BEV feature while the metric losses are actually fed the flattened
decoder render, ``3*224*224 = 150,528`` dims (reference train.py:36-37 vs
train.py:224-232). The TPU build keeps the 150,528-D flatten as the
default-parity path (``ModelConfig.retrieval_embed_dim = 0``) and adds what
the reference implies but never ships: an explicit, configurable projection
head that embeds BOTH sides of the retrieval pair — the rendered aerial view
and the geo-registered map tile — into a compact L2-normalized space.

Why it matters at production scale (measured, REGISTER_SCALE_BENCH.json r4):
a 16k-tile database of 150,528-D flattens costs 4.9 GB HBM even at bf16 and
pins end-to-end registration at 6.1 fps; at D=256 the same database is
16 MB f32 and the match matmul is noise.

Design: a small strided conv trunk (stride-2 stages down to a few spatial
cells), global average pool, linear projection, L2 normalization. The head is
Siamese — ONE set of weights embeds renders and tiles alike, so the
contrastive geometry lives in a shared space (the reference's "map encoder"
slot is identity, train.py:207-211; this is its trained generalization).
Input is any (B, H, W, 3) image in [0, 1]; the trunk is size-agnostic (the
pool handles any spatial extent) so the same head serves the 224x224 decoder
of the full model and the smaller SimpleDecoder outputs of test configs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bevrender_tpu.models.layers import Conv, Dense


class RetrievalHead(nn.Module):
    """Conv-pool projection head: (B, H, W, 3) image -> (B, embed_dim) unit
    vector.

    ``widths`` are the channel counts of the stride-2 conv stages (each
    halves H and W); ``embed_dim`` is the output dimension. GroupNorm (not
    BatchNorm) keeps the head collective-free and batch-size independent —
    the database side embeds thousands of tiles in large batches while the
    query side embeds small windows, and running-stat coupling between the
    two would skew the shared space.
    """

    embed_dim: int = 256
    widths: Tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # The head runs in f32 REGARDLESS of the model compute dtype: the
        # discriminative signal between geographically adjacent tiles is a
        # ~1e-3-relative feature difference, and TPU-native bf16 GroupNorm
        # reductions quantize it away — measured r5: the identical warm-start
        # (300 InfoNCE steps on 32 tiles) trains to ~0 loss on CPU but stays
        # pinned at log N on the chip in bf16. The head is ~0.5 M params on
        # a few dozen images per call; f32 costs nothing that matters.
        x = images.astype(jnp.float32)
        for i, w in enumerate(self.widths):
            k = 5 if i == 0 else 3
            x = Conv(
                w, (k, k), strides=(2, 2), use_bias=False,
                dtype=jnp.float32,
            )(x)
            x = nn.GroupNorm(num_groups=min(8, w), dtype=jnp.float32)(x)
            x = nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2))  # (B, C) global average pool
        x = Dense(self.embed_dim, dtype=jnp.float32)(x)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )
