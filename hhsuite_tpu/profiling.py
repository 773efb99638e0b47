"""JAX profiler hooks (SURVEY §5: the reference has no tracing beyond
log statements — vestigial timing calls are commented out,
src/hhalignment.cpp:2058,2109; the TPU build exposes the XLA profiler
instead).

Two affordances, both zero-cost when off:

* ``HHSUITE_TPU_PROFILE=<dir>`` — every CLI tool run is wrapped in
  ``jax.profiler.trace(dir)``; open the dump with TensorBoard or
  ``xprof`` to see per-kernel device timelines (the lanes sweep, the
  prefilter, the posterior batch all carry named annotations).
* ``annotate(name)`` — a ``jax.profiler.TraceAnnotation`` context used
  around the search funnel's stages so host phases (parsing, merge,
  writers) and device phases line up in one timeline.
"""

from __future__ import annotations

import contextlib
import os


def profile_dir() -> str | None:
    d = os.environ.get("HHSUITE_TPU_PROFILE", "").strip()
    return d or None


@contextlib.contextmanager
def trace_if_enabled():
    """Wrap a whole tool invocation in jax.profiler.trace when
    HHSUITE_TPU_PROFILE points at a dump directory."""
    d = profile_dir()
    if not d:
        yield
        return
    import jax

    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        yield


# wall-clock accumulation per annotated stage (enabled by
# enable_stage_timers(); used by bench.py for the host/device split)
_STAGE_TIMERS: dict | None = None


def enable_stage_timers() -> dict:
    """Start accumulating per-stage wall time; returns the live dict
    (stage name -> seconds).  Device stages block on their results
    inside the annotation, so these are end-to-end stage costs."""
    global _STAGE_TIMERS
    _STAGE_TIMERS = {}
    return _STAGE_TIMERS


def disable_stage_timers() -> None:
    global _STAGE_TIMERS
    _STAGE_TIMERS = None


def stage_add(name: str, seconds: float) -> None:
    """Accumulate ``seconds`` under ``name`` in the live stage-timer
    dict (no-op when timers are off).  For hot loops where a
    TraceAnnotation context per iteration would itself cost time."""
    timers = _STAGE_TIMERS
    if timers is not None:
        timers[name] = timers.get(name, 0.0) + seconds


@contextlib.contextmanager
def annotate(name: str):
    """Named host-side span visible in the profiler timeline.  Falls
    back to a no-op if jax is unavailable (pure host tools)."""
    timers = _STAGE_TIMERS
    if timers is not None:
        import time

        t0 = time.perf_counter()
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:
        ctx = contextlib.nullcontext()
    try:
        with ctx:
            yield
    finally:
        if timers is not None:
            timers[name] = (timers.get(name, 0.0)
                            + time.perf_counter() - t0)


@contextlib.contextmanager
def gc_paused():
    """Pause the cyclic garbage collector for a search's hot loop.

    A single 8192-template query allocates ~15k Hit objects plus their
    numpy views; CPython's generational GC then fires mid-search and
    showed up as 0.3-0.8 s spikes in host_hitbuild at the 8192 bench
    point (r5 measurement; the reference is C++ and has no analogous
    pause).  Allocation-rate-triggered collection is deferred until
    the search returns; re-entrant and exception-safe, and a no-op if
    the collector was already disabled by the caller.
    """
    import gc

    was_enabled = gc.isenabled()
    if was_enabled:
        gc.disable()
    try:
        yield
    finally:
        if was_enabled:
            gc.enable()


def gc_paused_fn(fn):
    """Decorator form of `gc_paused` for the search drivers."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with gc_paused():
            return fn(*args, **kwargs)
    return wrapper
