"""Sharding annotations for model internals.

GSPMD propagates shardings from inputs, but deliberate
``with_sharding_constraint`` annotations at the attention and MLP boundaries
pin the intended layout: data parallel over ``data``; attention heads and MLP
hidden channels over ``model`` (tensor parallel); the BEV spatial grid may
also ride ``model`` (sequence/spatial parallel — convs get halo exchange from
GSPMD). Model code calls :func:`hint`, which is a no-op unless a
:class:`sharding_hints` context is active, so single-device runs compile the
exact same graph with no constraints.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_state = threading.local()


class sharding_hints:
    """Context manager activating shard annotations.

    Args:
      mesh: the device mesh.
      data_axis: mesh axis for batch sharding.
      model_axis: mesh axis for head/channel sharding (None disables TP hints).
    """

    def __init__(self, mesh: Mesh, data_axis: str = "data",
                 model_axis: Optional[str] = None):
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis

    def __enter__(self):
        _state.ctx = self
        return self

    def __exit__(self, *exc):
        _state.ctx = None
        return False


def _ctx() -> Optional["sharding_hints"]:
    return getattr(_state, "ctx", None)


def hint(x: jax.Array, *axes: Optional[str]) -> jax.Array:
    """Constrain ``x``; each element of ``axes`` is "data", "model", or None.
    Axis names are resolved against the active context (missing axes degrade
    to None so a 1-D data mesh accepts TP hints)."""
    ctx = _ctx()
    if ctx is None:
        return x
    resolved = []
    for a in axes:
        if a == "data":
            resolved.append(ctx.data_axis)
        elif a == "model":
            resolved.append(ctx.model_axis if ctx.model_axis else None)
        else:
            resolved.append(None)
    spec = PartitionSpec(*resolved)
    return jax.lax.with_sharding_constraint(x, NamedSharding(ctx.mesh, spec))
