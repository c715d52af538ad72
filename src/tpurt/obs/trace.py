"""Tracing and profiling hooks (SURVEY.md §2b #28, §5).

Thin wrappers over `jax.profiler` so hot regions show up as named spans in
perfetto traces, plus wall-clock spans for host-side phases.  The reference
has no observability code to mirror (SURVEY.md §0).

Usage:
    with trace_span("bvh_build"):
        bvh = build_lbvh(tris)
    with profile_to("/tmp/trace"):     # perfetto-compatible dump
        renderer.render(cam)
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator

import jax

_log = logging.getLogger("tpurt")


@contextlib.contextmanager
def trace_span(name: str, log: bool = False) -> Iterator[None]:
    """Named span: appears in jax.profiler traces AND (optionally) the log.

    Spans measure host wall-clock; device work inside is only fully attributed
    if the caller blocks (see `blocking_span`)."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if log:
        _log.info("span %s: %.3f ms", name, 1e3 * (time.perf_counter() - t0))


@contextlib.contextmanager
def blocking_span(name: str, result_holder: dict | None = None) -> Iterator[dict]:
    """Span that records wall time into a dict; callers should
    block_until_ready inside so device time is attributed to the span."""
    out = result_holder if result_holder is not None else {}
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield out
    out[name] = time.perf_counter() - t0


@contextlib.contextmanager
def profile_to(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into `logdir` (view in perfetto /
    tensorboard). No-op contextmanager semantics if the profiler is busy."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # already tracing, unsupported backend, ...
        _log.warning("profiler trace not started: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def compiled_cost(fn, *args) -> dict:
    """XLA cost analysis (flops, bytes accessed) of `jax.jit(fn)` on args —
    the per-kernel cost source promised in SURVEY.md §5."""
    c = jax.jit(fn).lower(*args).compile()
    try:
        return dict(c.cost_analysis())
    except Exception:
        return {}
