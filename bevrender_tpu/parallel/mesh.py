"""Device mesh + sharding helpers — the distributed runtime.

The reference's distributed layer is one-process-per-GPU DDP over NCCL with
explicit barriers (train.py:29-32, 128-141, 862-872). Here it is single-program
SPMD: build a mesh, shard the batch over the ``data`` axis, replicate (or
shard) params, and let GSPMD insert the collectives over ICI. Multi-host runs
call :func:`initialize_distributed` (DCN handled by jax.distributed); "rank 0"
work is ``jax.process_index() == 0``; barriers are implicit in SPMD.

Axes:
* ``data`` — batch sharding (DP). Gradient all-reduce is inserted by XLA.
* ``model`` — optional tensor/sequence axis: attention heads and MLP hidden
  channels (TP) and the BEV query token axis in the streamed attention (SP)
  are annotated with ``with_sharding_constraint`` so GSPMD propagates it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (replaces ddp_setup / init_process_group,
    train.py:29-32). Single-host is a no-op, but the reason is logged so a
    real multi-host misconfiguration can't silently degrade to 1 process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        import logging

        logging.getLogger("bevrender_tpu").info(
            "jax.distributed.initialize skipped (%s); continuing "
            "single-process with %d local device(s)", e, jax.local_device_count()
        )


def make_mesh(
    n_devices: Optional[int] = None,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh, or 2-D (data, model) when ``model_parallel > 1``."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_axis and model_parallel > 1:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by {model_parallel}")
        arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, (data_axis, model_axis))
    return Mesh(np.asarray(devs), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    s = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def constrain(x: jax.Array, mesh: Mesh, *spec) -> jax.Array:
    """``with_sharding_constraint`` helper; no-op outside a mesh context."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
