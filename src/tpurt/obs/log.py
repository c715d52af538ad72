"""Structured logging with per-host prefixes (SURVEY.md §2b #28, §5).

Multi-host runs interleave stdout from every process; prefixing each record
with `[pN/M]` keeps them attributable. Plain std logging — no deps.
"""

from __future__ import annotations

import logging
import sys

def get_logger(name: str = "tpurt", level: int = logging.INFO) -> logging.Logger:
    """Process-aware logger: records carry a [pN/M] host prefix when
    jax.distributed is initialized (single-process: [p0/1])."""
    log = logging.getLogger(name)
    if not log.handlers:
        try:
            import jax

            pid, nproc = jax.process_index(), jax.process_count()
        except Exception:
            pid, nproc = 0, 1
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter(
                f"%(asctime)s [p{pid}/{nproc}] %(name)s %(levelname)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        log.addHandler(h)
        log.setLevel(level)
        log.propagate = False
    return log
