"""Plan-health audit (SURVEY §4): the scale anti-pattern checks the CI
plan-shape tests apply (tests/test_plan_shape.py), packaged as a
user-facing diagnostic so any pipeline can gate its own plans before a
100 TB run.

The checks are textual over the executed plan — the same surface
`.explain()` prints — so they see what will actually run (post-AQE
planning, post-pushdown):

- **cartesian**: a CartesianProduct / BroadcastNestedLoopJoin without a
  broadcast-sized side is the classic accidental O(n²).
- **python_udf**: BatchEvalPython = row-at-a-time Python in the hot
  path (ArrowEvalPython — vectorized pandas UDFs — is reported
  separately; it is the sanctioned escape hatch).
- **exchanges**: every `Exchange` is a shuffle barrier; the count is
  the first thing to explain in any slow job.
- **scan pushdown**: scans whose `PushedFilters` is empty while the
  plan filters above them, and `ReadSchema` width (column pruning).

`audit(df)` returns a plain dict; `assert_scale_safe(df)` raises with
the offending plan fragment — use it in tests exactly as this repo's
CI does.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["audit", "assert_scale_safe"]


def _plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def audit(df: DataFrame) -> dict:
    """Inspect the executed plan; returns
    ``{exchanges, cartesian, python_udf, arrow_udf, scans, wscg_spans,
    scan_details: [{read_schema, pushed_filters}, ...]}``."""
    p = _plan(df)
    scans = re.findall(r"FileScan \w+ (\[[^\]]*\]).*?"
                       r"PushedFilters: (\[[^\]]*\])", p)
    return {
        # SHUFFLE barriers only: a BroadcastExchange moves model-sized
        # data with no repartitioning, and a ReusedExchange re-reads a
        # shuffle already counted once — counting every 'Exchange'
        # substring rejected genuinely shuffle-free broadcast plans
        "exchanges": (p.count("Exchange") - p.count("BroadcastExchange")
                      - p.count("ReusedExchange")),
        "cartesian": ("CartesianProduct" in p
                      or "BroadcastNestedLoopJoin" in p),
        "python_udf": "BatchEvalPython" in p,
        "arrow_udf": "ArrowEvalPython" in p or "MapInPandas" in p
                     or "FlatMapGroupsInPandas" in p,
        "scans": p.count("FileScan"),
        "wscg_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", p))),
        "scan_details": [
            {"read_schema": cols, "pushed_filters": pf}
            for cols, pf in scans],
    }


def assert_scale_safe(df: DataFrame, max_exchanges: int | None = None,
                      allow_arrow_udf: bool = True) -> dict:
    """Raise AssertionError (with the plan) on any hard anti-pattern:
    cartesian joins and row-at-a-time Python UDFs always fail;
    ``max_exchanges`` optionally bounds shuffle count;
    ``allow_arrow_udf=False`` additionally bans vectorized Python.
    Returns the audit dict on success so callers can log it."""
    a = audit(df)
    p = None
    if a["cartesian"]:
        p = "cartesian/nested-loop join"
    elif a["python_udf"]:
        p = "row-at-a-time Python UDF (BatchEvalPython)"
    elif not allow_arrow_udf and a["arrow_udf"]:
        p = "Arrow/pandas UDF present but disallowed"
    elif max_exchanges is not None and a["exchanges"] > max_exchanges:
        p = f"{a['exchanges']} exchanges > bound {max_exchanges}"
    if p:
        raise AssertionError(f"plan not scale-safe: {p}\n{_plan(df)}")
    return a
