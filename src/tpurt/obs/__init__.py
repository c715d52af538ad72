"""Observability: tracing spans, throughput meters, structured logs
(SURVEY.md §2b #28)."""

from tpurt.obs.log import get_logger
from tpurt.obs.meter import Meter, emit
from tpurt.obs.trace import blocking_span, compiled_cost, profile_to, trace_span

__all__ = [
    "get_logger",
    "Meter",
    "emit",
    "trace_span",
    "blocking_span",
    "profile_to",
    "compiled_cost",
]
