"""Multi-host runtime: process setup and film gather (SURVEY.md §2b #23).

`jax.distributed.initialize` is the TPU-native replacement for an MPI/NCCL
bootstrap (the reference has none, SURVEY.md §0): one process per host, the
coordinator hands out global device ids, and every collective in dist/ then
spans hosts transparently (ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger("tpurt.dist")


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-process JAX. No-op for single-process runs.

    Args come from flags or the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); cloud TPU pods auto-detect all three.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator is None and num_processes in (None, 1):
        log.info("single-process run; skipping jax.distributed")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed init: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def gather_film(image: jax.Array) -> np.ndarray | None:
    """Materialize a (possibly cross-host sharded) film on process 0.

    Uses jax.experimental.multihost_utils when the array spans hosts;
    returns None on non-coordinator processes.
    """
    if jax.process_count() == 1:
        return np.asarray(image)
    from jax.experimental import multihost_utils

    full = multihost_utils.process_allgather(image, tiled=True)
    return np.asarray(full) if is_coordinator() else None
