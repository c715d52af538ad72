"""Checkpoint/resume for the fit loop (SURVEY.md §2b #29, §5).

Flat-npz snapshots of (params, optimizer state, step, RNG key): dependency-free
(orbax-style API without pulling orbax into the hot path), atomic via
write-to-temp + rename, and resumable after process death — the failure
recovery story from SURVEY.md §5 (fit restarts from latest on relaunch).
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> tuple[list[np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(x) for x in leaves], treedef


def save_ckpt(path: str, state: Any, step: int) -> str:
    """Write state (any pytree) to `{path}/ckpt_{step:08d}.npz` atomically."""
    os.makedirs(path, exist_ok=True)
    leaves, _ = _flatten(state)
    fname = os.path.join(path, f"ckpt_{step:08d}.npz")
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, step=step, **{f"leaf_{i}": x for i, x in enumerate(leaves)})
        os.replace(tmp, fname)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return fname


def latest_step(path: str) -> int | None:
    """Highest checkpointed step in `path`, or None."""
    if not os.path.isdir(path):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(path)
        if (m := re.fullmatch(r"ckpt_(\d+)\.npz", f))
    ]
    return max(steps) if steps else None


def restore_ckpt(path: str, like: Any, step: int | None = None) -> tuple[Any, int]:
    """Restore the pytree saved by save_ckpt into the structure of `like`.

    Returns (state, step). step=None -> latest.
    """
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {path}")
    data = np.load(os.path.join(path, f"ckpt_{step:08d}.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, restored), int(data["step"])
