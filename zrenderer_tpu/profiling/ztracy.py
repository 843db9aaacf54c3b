"""Profiling zones and frame marks — the ztracy analog.

Same API surface as the reference's Tracy bindings
(zrenderer/libs/ztracy/src/ztracy.zig:38-97: zone/zoneN/zoneNC returning a
ctx with .end(), frameMark), implemented over jax.profiler: zones become
TraceAnnotations (visible in xprof/TensorBoard and perfetto traces), frame
marks become named StepTraceAnnotations.  Like ztracy, everything
compiles to no-ops when disabled (the reference gates with -Dtracy,
build.zig:26; we gate at runtime via `enable()` or ZRENDERER_TRACE=1).
"""

from __future__ import annotations

import contextlib
import os
import time

_enabled = os.environ.get("ZRENDERER_TRACE", "0") not in ("0", "", "false")
_frame_index = 0
_step_annotation = None  # open StepTraceAnnotation between frame marks


def enable(value: bool = True) -> None:
    global _enabled
    _enabled = value


def is_enabled() -> bool:
    return _enabled


class _Zone:
    """Zone context: usable as `with zone(...)` or `z = zone(...); z.end()`
    (the ztracy ctx.end() style)."""

    __slots__ = ("_ann", "_t0", "name")

    def __init__(self, name: str, active: bool):
        self.name = name
        self._ann = None
        self._t0 = time.perf_counter()
        if active and _enabled:
            import jax.profiler

            self._ann = jax.profiler.TraceAnnotation(name)
            self._ann.__enter__()

    def end(self) -> None:
        if self._ann is not None:
            self._ann.__exit__(None, None, None)
            self._ann = None

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.end()
        return False


def zone(name: str = "zone", active: bool = True) -> _Zone:
    return _Zone(name, active)


def zone_n(name: str, active: bool = True) -> _Zone:
    return _Zone(name, active)


def zone_nc(name: str, color: int = 0, active: bool = True) -> _Zone:
    # Color is accepted for API parity; jax.profiler has no zone colors.
    return _Zone(name, active)


def frame_mark(name: str | None = None) -> None:
    """Per-frame marker (ztracy.frameMark, called at present time —
    zd3d12.zig:660).  While tracing is enabled, each inter-mark span becomes
    a jax.profiler.StepTraceAnnotation (the xprof step boundary — frames
    show up as steps in the trace viewer, the way Tracy renders frameMark
    spans); disabled, it is a free-running counter like Tracy's no-op."""
    global _frame_index, _step_annotation
    _frame_index += 1
    if _step_annotation is not None:
        _step_annotation.__exit__(None, None, None)
        _step_annotation = None
    if _enabled:
        import jax.profiler

        _step_annotation = jax.profiler.StepTraceAnnotation(
            name or "frame", step_num=_frame_index
        )
        _step_annotation.__enter__()


def frame_index() -> int:
    return _frame_index


@contextlib.contextmanager
def trace(log_dir: str):
    """Whole-program trace capture: `with ztracy.trace('/tmp/trace'):`
    wraps jax.profiler.start_trace/stop_trace."""
    import jax.profiler

    global _step_annotation
    was = _enabled
    enable(True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        if _step_annotation is not None:  # close the last open frame step
            _step_annotation.__exit__(None, None, None)
            _step_annotation = None
        jax.profiler.stop_trace()
        enable(was)
