"""Device tracing hooks (SURVEY.md §5: the reference has only print-based
wall-clock meters; we add first-class jax.profiler capture)."""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf. No-op when
    profile_dir is None."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for host-side phases."""
    import jax

    return jax.profiler.TraceAnnotation(name)
