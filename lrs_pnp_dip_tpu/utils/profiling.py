"""Profiler hooks (jax.profiler) — SURVEY §5's tracing upgrade.

The reference's only tracing is tic/toc prints.  Here: a context manager
that captures an XLA/TPU profile trace viewable in TensorBoard/Perfetto,
and annotation helpers for the solver stages.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for a code region (shows in the timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
