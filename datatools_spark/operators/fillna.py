"""Null handling: ffill / bfill / time-weighted linear interpolation.

Reference: ``fillna(method='ffill')`` melt_model.py:434-436, 537;
``fillna(0.)`` melt_model.py:541; ``interpolate('linear')``
melt_model.py:403-404 — SURVEY §2.2 F12 and §4 custom-helper (3).

Linear interpolation has no Spark built-in; it is a composition of four
window projections (previous/next non-null value + its timestamp) and a
time-weighted blend — pure expressions, one sort-shuffle on the series
key, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ffill", "bfill", "interpolate_linear"]


def _w(ts_col: str, partition_by: Sequence[str], desc: bool = False):
    order = F.col(ts_col).desc() if desc else F.col(ts_col).asc()
    return (Window.partitionBy(*[F.col(c) for c in partition_by])
            .orderBy(order).rowsBetween(Window.unboundedPreceding, 0))


def ffill(df: DataFrame, cols: Sequence[str], ts_col: str = "ts",
          partition_by: Sequence[str] = ()) -> DataFrame:
    """Last non-null carried forward (pandas ``ffill`` parity)."""
    w = _w(ts_col, partition_by)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def bfill(df: DataFrame, cols: Sequence[str], ts_col: str = "ts",
          partition_by: Sequence[str] = ()) -> DataFrame:
    """Next non-null carried backward."""
    w = _w(ts_col, partition_by, desc=True)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def interpolate_linear(df: DataFrame, cols: Sequence[str], ts_col: str = "ts",
                       partition_by: Sequence[str] = (),
                       limit_area: str | None = None) -> DataFrame:
    """Time-weighted linear interpolation of interior nulls
    (melt_model.py:403-404 parity; pandas ``interpolate('linear')`` on a
    DatetimeIndex interpolates by position, pandas ``method='time'`` by
    time — on regular grids they coincide; we implement time-weighted,
    the physically-intended semantics, SURVEY §5 divergence note).

    Leading nulls stay null (no previous anchor); trailing nulls stay null
    unless pandas' default (which ffills the tail) is wanted — pass
    ``limit_area=None`` for pandas parity (tail extended with last value),
    ``'inside'`` for interior-only.
    """
    fwd = _w(ts_col, partition_by)
    bwd = _w(ts_col, partition_by, desc=True)
    es = F.col(ts_col).cast("double")
    out = df
    for c in cols:
        v = F.col(c)
        prev_v = F.last(v, ignorenulls=True).over(fwd)
        prev_t = F.last(F.when(v.isNotNull(), es), ignorenulls=True).over(fwd)
        next_v = F.last(v, ignorenulls=True).over(bwd)
        next_t = F.last(F.when(v.isNotNull(), es), ignorenulls=True).over(bwd)
        # duplicate timestamps make next_t == prev_t: the 0/0 frac would
        # THROW under ANSI (every engine session here runs ANSI). The
        # CASE branch short-circuits the division; the bracketing values
        # share the instant, so the interpolant degenerates to prev_v.
        frac = (es - prev_t) / (next_t - prev_t)
        interp = F.when(next_t != prev_t,
                        prev_v + (next_v - prev_v) * frac).otherwise(prev_v)
        filled = F.when(v.isNotNull(), v)
        filled = filled.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        if limit_area != "inside":
            # pandas interpolate default: trailing gap filled with last value
            filled = filled.when(prev_v.isNotNull() & next_v.isNull(), prev_v)
        out = out.withColumn(c, filled)
    return out
