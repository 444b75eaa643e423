"""Checkpointing: Orbax save **and restore** (the reference only saves —
utils/utils.py:99-133 writes ``best_epoch_{e}.pth`` / ``last_epoch.pth``; no
load path exists anywhere, SURVEY 5.4).

Layout: ``<work_dir>/best_epoch_<e>/`` and ``<work_dir>/last_epoch/`` holding
``{epoch, params, batch_stats, opt_state}`` — same best/last naming policy,
plus the missing resume."""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _item(state: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(np.asarray, state)


def save_model(
    save_path: str,
    state: Dict[str, Any],
    epoch: int,
    best: bool = False,
) -> str:
    """Write a checkpoint; ``best`` controls the name exactly like
    utils/utils.py:108-111."""
    name = f"best_epoch_{epoch}" if best else "last_epoch"
    path = Path(save_path) / name
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.absolute(), _item({**state, "epoch": np.asarray(epoch)}))
    ckptr.wait_until_finished()
    return str(path)


def restore_model(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint written by :func:`save_model` (capability the
    reference lacks)."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = _item({**target, "epoch": np.asarray(0)})
        return ckptr.restore(Path(path).absolute(), target)
    return ckptr.restore(Path(path).absolute())


def latest_best(work_dir: str) -> Optional[str]:
    """Highest-epoch ``best_epoch_*`` checkpoint under ``work_dir``."""
    bests = sorted(
        Path(work_dir).glob("best_epoch_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    return str(bests[-1]) if bests else None
