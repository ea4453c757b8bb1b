"""TimeSeriesFrame — the engine's core abstraction (SURVEY §7).

A thin, immutable wrapper holding a DataFrame + its time column + series
keys + a metadata dict. Every method builds a new lazy plan and returns a
new wrapper; nothing executes until the caller materializes. This is the
Spark re-founding of the reference's 'DatetimeIndex-ed frame' (SURVEY
§1.1): the index becomes an ordinary ``ts`` column, implicit alignment
becomes explicit joins, and the series key makes every operator scale-out
(partition-parallel across stations/sensors) for free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import extrema as _ex
from .operators.fillna import bfill as _bfill
from .operators.fillna import ffill as _ffill
from .operators.fillna import interpolate_linear as _interp
from .operators.intervals import (
    asof_join as _asof, clip_to_window, drop_timestamps, drop_windows,
    interval_lookup_join, union_keep_first,
)
from .operators.resample import resample_agg, resample_nearest
from .operators.rolling import c_rolling
from .operators.velocity import calc_velocity
from .operators.windowspec import normalize_window

__all__ = ["TimeSeriesFrame"]


class TimeSeriesFrame:
    """Chainable lazy time-series operations over a keyed DataFrame."""

    def __init__(self, df: DataFrame, ts_col: str = "ts",
                 series_keys: Sequence[str] = (),
                 meta: Mapping[str, Any] | None = None):
        self.df = df
        self.ts_col = ts_col
        self.series_keys = tuple(series_keys)
        self.meta = dict(meta or {})

    # ---- plumbing -------------------------------------------------------
    def _wrap(self, df: DataFrame) -> "TimeSeriesFrame":
        return TimeSeriesFrame(df, self.ts_col, self.series_keys, self.meta)

    def with_meta(self, **kv) -> "TimeSeriesFrame":
        out = TimeSeriesFrame(self.df, self.ts_col, self.series_keys, self.meta)
        out.meta.update(kv)
        return out

    # ---- subsetting (F3-F9) --------------------------------------------
    def clip(self, window, closed: str = "both") -> "TimeSeriesFrame":
        start, end = normalize_window(window, self.df, self.ts_col)
        return self._wrap(clip_to_window(self.df, start, end, self.ts_col, closed))

    def drop_windows(self, windows, closed: str = "both") -> "TimeSeriesFrame":
        return self._wrap(drop_windows(self.df, windows, self.ts_col, closed))

    def drop_times(self, timestamps, null_cols=None) -> "TimeSeriesFrame":
        return self._wrap(drop_timestamps(self.df, timestamps, self.ts_col, null_cols))

    def where(self, cond) -> "TimeSeriesFrame":
        return self._wrap(self.df.where(cond))

    # ---- nulls (F12) ----------------------------------------------------
    def ffill(self, cols) -> "TimeSeriesFrame":
        return self._wrap(_ffill(self.df, cols, self.ts_col, self.series_keys))

    def bfill(self, cols) -> "TimeSeriesFrame":
        return self._wrap(_bfill(self.df, cols, self.ts_col, self.series_keys))

    def interpolate(self, cols, limit_area=None) -> "TimeSeriesFrame":
        return self._wrap(_interp(self.df, cols, self.ts_col,
                                  self.series_keys, limit_area))

    # ---- windows / resampling (W1, A1) ---------------------------------
    def rolling(self, value_col: str, window, func: str = "mean",
                min_periods=None, out_col=None, center: bool = True,
                q: float | None = None) -> "TimeSeriesFrame":
        # full c_rolling surface: the facade used to omit q (making
        # func='quantile' unreachable — it always raised) and center
        # (trailing windows inaccessible)
        return self._wrap(c_rolling(self.df, value_col, window, func,
                                    self.ts_col, self.series_keys,
                                    min_periods, out_col,
                                    center=center, q=q))

    def resample(self, rule, aggs, value_cols=None) -> "TimeSeriesFrame":
        return self._wrap(resample_agg(self.df, rule, aggs, self.ts_col,
                                       self.series_keys, value_cols))

    def resample_nearest(self, rule, value_cols) -> "TimeSeriesFrame":
        return self._wrap(resample_nearest(self.df, rule, value_cols,
                                           self.ts_col, self.series_keys))

    def resample_gapfill(self, rule, aggs, value_cols=None,
                         fill=None) -> "TimeSeriesFrame":
        from .operators.resample import resample_gapfill
        return self._wrap(resample_gapfill(self.df, rule, aggs, self.ts_col,
                                           self.series_keys, value_cols,
                                           fill=fill))

    def sessionize(self, gap="30min", id_col=None) -> DataFrame:
        """Gap-based session ids (lag-gap + running sum; streaming twin:
        session_window — see queries.ts_sessionize)."""
        from pyspark.sql import Window as W
        from .functions.timeutils import parse_duration_seconds
        gap_s = parse_duration_seconds(gap)
        order = [self.ts_col] + ([id_col] if id_col else [])
        w = W.partitionBy(*self.series_keys).orderBy(*order)
        delta = (F.col(self.ts_col).cast("double")
                 - F.lag(F.col(self.ts_col)).over(w).cast("double"))
        new_s = F.when(delta.isNull() | (delta > gap_s), 1).otherwise(0)
        run = w.rowsBetween(W.unboundedPreceding, 0)
        return (self.df.withColumn("_new", new_s)
                .withColumn("session_n", F.sum("_new").over(run))
                .drop("_new"))

    def ewma(self, value_col: str = "value", alpha: float = 0.4,
             k: int = 8, id_col=None, out_col=None) -> "TimeSeriesFrame":
        """Truncated exponential smoothing (see rolling.ewma_cols)."""
        from .operators.rolling import ewma_cols
        order = [self.ts_col] + ([id_col] if id_col else [])
        col = ewma_cols(value_col, order, self.series_keys, alpha, k)
        return self._wrap(self.df.withColumn(out_col or f"{value_col}_ewma",
                                             col))

    def acf(self, value_col: str = "value", max_lag: int = 6,
            id_col=None) -> DataFrame:
        """Autocorrelation at lags 1..max_lag per series (one sorted
        frame, algebraic corr aggregates — see queries.ts_acf)."""
        from pyspark.sql import Window as W
        order = [self.ts_col] + ([id_col] if id_col else [])
        w = W.partitionBy(*self.series_keys).orderBy(*order)
        d = self.df.where(F.col(value_col).isNotNull())
        l = d.select(*self.series_keys, value_col,
                     *[F.lag(value_col, j).over(w).alias(f"_p{j}")
                       for j in range(1, max_lag + 1)])
        aggs = []
        for j in range(1, max_lag + 1):
            aggs += [F.corr(value_col, f"_p{j}").alias(f"_a{j}"),
                     F.count(f"_p{j}").alias(f"_n{j}")]
        wide = l.groupBy(*self.series_keys).agg(*aggs)
        stack = ", ".join(f"{j}, _a{j}, _n{j}" for j in range(1, max_lag + 1))
        return wide.select(
            *self.series_keys,
            F.expr(f"stack({max_lag}, {stack}) AS (lag, acf, n_pairs)"))

    # ---- analytics (A3-A9, §2.9) ---------------------------------------
    def daily_extrema(self, value_col: str = "value", **kw) -> DataFrame:
        return _ex.daily_extrema(self.df, value_col, self.ts_col,
                                 self.series_keys, **kw)

    def velocity(self, value_cols, **kw) -> DataFrame:
        return calc_velocity(self.df, value_cols, ts_col=self.ts_col,
                             partition_by=self.series_keys, **kw)

    # ---- alignment (J1-J2, J6) -----------------------------------------
    def asof_join(self, other: "TimeSeriesFrame | DataFrame",
                  value_cols=None, direction="backward",
                  tolerance=None) -> "TimeSeriesFrame":
        right = other.df if isinstance(other, TimeSeriesFrame) else other
        return self._wrap(_asof(self.df, right, self.ts_col,
                                self.series_keys, value_cols,
                                direction, tolerance))

    def join_schedule(self, schedule: DataFrame, closed="both") -> "TimeSeriesFrame":
        return self._wrap(interval_lookup_join(self.df, schedule, self.ts_col,
                                               closed=closed))

    def union_keep_first(self, *others: "TimeSeriesFrame") -> "TimeSeriesFrame":
        dfs = [self.df] + [o.df for o in others]
        keys = list(self.series_keys) + [self.ts_col]
        return self._wrap(union_keep_first(dfs, keys))

    # ---- materialization ------------------------------------------------
    def sorted(self) -> DataFrame:
        """Order only at the sink (SURVEY §2.6 stance)."""
        return self.df.orderBy(*self.series_keys, self.ts_col)

    def cache(self) -> "TimeSeriesFrame":
        return self._wrap(self.df.cache())

    def count(self) -> int:
        return self.df.count()
