"""Velocity-kernel physical-plan chooser + plan inspection (SURVEY §4).

The §2.9 kernel has two DataFrame formulations (operators/velocity.py):

- **bucket-tiling** (default): each row maps arithmetically to exactly one
  stat bucket per offset; the only full-data shuffle is the per-bucket
  median. Valid when the stat windows tile the grid exactly — i.e. the
  grid step equals the stat width (the reference's own parameterization,
  gpstools.py:582-585 steps the grid by ``stat_window``).
- **range-join**: explicit grid × interval-predicate join. General —
  handles overlapping windows (step < width) and sparse grids — but
  shuffles both sides.

``choose_velocity_plan`` encodes the dispatch rule so facade callers get
the cheap plan whenever semantics allow, and tests can assert the rule.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..functions.timeutils import parse_duration_seconds
from ..operators.velocity import calc_velocity, calc_velocity_range_join

__all__ = ["choose_velocity_plan", "plan_string"]


def choose_velocity_plan(stat_window, grid_step=None) -> str:
    """Return ``'bucket'`` or ``'range_join'`` for the given kernel
    parameters. ``grid_step=None`` means the reference default (grid
    stepped by the stat window) — always tileable."""
    if grid_step is None:
        return "bucket"
    stat_s = parse_duration_seconds(stat_window) \
        if not isinstance(stat_window, (int, float)) else float(stat_window)
    step_s = parse_duration_seconds(grid_step) \
        if not isinstance(grid_step, (int, float)) else float(grid_step)
    # windows tile exactly only when the grid advances one full stat
    # width per point; anything finer overlaps → general plan
    return "bucket" if step_s == stat_s else "range_join"


def velocity(df: DataFrame, value_cols: Sequence[str], stat_window,
             separation_window, grid_step=None, **kw) -> DataFrame:
    """Dispatching front-end: build whichever physical variant
    :func:`choose_velocity_plan` selects (both are cross-checked equal in
    tests/test_velocity_variants.py on the reference parameterization,
    and the facade itself is equality-tested against direct calls).

    The rule is A/B-backed at 1e7 rows (bench/velocity_plan_ab.py,
    table in bench/SCALE_NOTES.md): when the grid tiles (step == stat)
    the bucket plan's single hash aggregate beats the bucketed range
    join's join+aggregate; when windows overlap (step < stat) only the
    range join is correct — its grid-side fan-out is ≤ 6 rows per grid
    point regardless of the overlap factor, where a generalized tiling
    explode would fan the FULL data out by 2·stat/step rows each."""
    if choose_velocity_plan(stat_window, grid_step) == "bucket":
        return calc_velocity(df, value_cols, stat_window,
                             separation_window, **kw)
    # the range-join variant supports a narrower kwarg surface than the
    # bucket plan; reject the unsupported ones HERE with the dispatch
    # context — otherwise the same facade call crashes or not depending
    # on which way the grid_step rule flips (TypeError deep inside)
    import inspect
    supported = set(
        inspect.signature(calc_velocity_range_join).parameters)
    extra = set(kw) - supported
    if extra:
        raise NotImplementedError(
            f"velocity: grid_step={grid_step!r} dispatches to the "
            f"range-join variant, which does not support {sorted(extra)} "
            "(bucket-plan-only options like partition_by/smoothing/"
            "median_mode); drop the option or use the tiling grid "
            "(grid_step=None / == stat_window)")
    return calc_velocity_range_join(df, value_cols, stat_window,
                                    separation_window,
                                    grid_step=grid_step, **kw)


def plan_string(df: DataFrame, formatted: bool = False) -> str:
    """Executed-plan text for CI plan-shape assertions (PushedFilters,
    WholeStageCodegen spans, Exchange counts, Python-eval absence)."""
    if formatted:
        mode = df.sparkSession._jvm.org.apache.spark.sql.execution \
            .ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)
    return df._jdf.queryExecution().executedPlan().toString()
