"""Tracing / profiling hooks (SURVEY.md §5 tracing row).

The reference crate has none; ours wraps jax.profiler so any encode/decode
can be captured to a TensorBoard/Perfetto trace, plus a lightweight
wall-clock annotation API that works without the profiler.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a device trace around the enclosed block.

    with profiling.trace("/tmp/tpz_trace"): tpz.api.compress(...)
    then `tensorboard --logdir /tmp/tpz_trace` or open in Perfetto.
    """
    import jax

    log_dir = log_dir or os.environ.get("TPZ_TRACE_DIR", "/tmp/tpz_trace")
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
