"""Timing / debug instrumentation (SURVEY §2.11 M1-M2).

Re-expresses the reference's wall-clock helpers — ``runtime(t)``
(gpstools.py:651-661, mm:ss pretty-printer) and the ``@timer`` /
``@debug`` decorators (diurnal.py:54-76) — plus the Spark-native
addition that actually matters on a cluster: ``action_timer`` times a
DataFrame ACTION (Spark is lazy, so timing the transformation call, as
the reference's decorator would, measures nothing).
"""

from __future__ import annotations

import functools
import time

__all__ = ["runtime_str", "runtime", "timer", "debug", "action_timer"]


def runtime_str(elapsed: float) -> str:
    """mm:ss over a minute, whole seconds under (reference formatting,
    gpstools.py:651-661)."""
    if elapsed > 60:
        minutes = int(elapsed // 60)
        # TRUNCATE the seconds remainder: :02.0f ROUNDS, so 119.7 s
        # rendered the impossible "01:60" instead of "01:59"
        return f"{minutes:02.0f}:{int(elapsed - minutes * 60):02d}"
    return f"{elapsed:02.0f} seconds"


def runtime(t: float | None) -> str | None:
    """Elapsed-since-``t`` report; no-op on falsy input like the
    reference. Returns the string (the reference prints) so callers and
    tests can route it."""
    if t:
        s = runtime_str(time.time() - t)
        print(f"Elapsed Time:\n{s}")
        return s
    return None


def timer(func):
    """Print the runtime of the decorated function (diurnal.py:54-64)."""
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        value = func(*args, **kwargs)
        run_time = time.perf_counter() - start
        print(f"Finished {func.__name__!r} in {run_time:.4f} secs")
        return value
    return wrapper


def debug(func):
    """Print the function signature and return value (diurnal.py:67-76)."""
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        parts = [repr(a) for a in args]
        parts += [f"{k}={v!r}" for k, v in kwargs.items()]
        print(f"Calling {func.__name__}({', '.join(parts)})")
        value = func(*args, **kwargs)
        print(f"{func.__name__!r} returned {value!r}")
        return value
    return wrapper


def action_timer(df, action: str = "count"):
    """Time a real Spark ACTION on ``df`` and return (result, seconds).

    The lazy-evaluation footgun the reference's decorator can't see:
    wrapping a transformation times plan construction (microseconds),
    not execution. This forces the named action (``count`` / ``collect``
    / ``write``-less materializations) and reports wall time for the
    whole job.
    """
    start = time.perf_counter()
    result = getattr(df, action)()
    return result, time.perf_counter() - start
