"""Time-bucket resampling (reference: ``resample('1D').mean()`` gpstools.py:350-351,
``resample('15T').nearest()`` hydrotools.py:203-204).

pandas ``resample`` = fixed-width tumbling windows keyed on the index.
Spark-native: ``groupBy(window(ts, dur))`` — a single map-side-combinable
hash aggregate; Catalyst pushes partial aggregation before the shuffle, so
at 100 TB the shuffle carries one row per (series, bucket), not per input
row.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutils import parse_duration_seconds

__all__ = ["resample_agg", "resample_gapfill", "resample_nearest"]

def _aggs(ts_col: str) -> dict:
    # 'first' orders by the CALLER's timestamp column — a hardcoded
    # "ts" broke (or silently mis-ordered, if an unrelated column named
    # ts existed) every resample_agg call with a non-default ts_col
    return {
        "mean": F.avg, "avg": F.avg, "sum": F.sum, "min": F.min,
        "max": F.max, "median": F.median, "count": F.count,
        "first": lambda c: F.min_by(c, F.col(ts_col)),
        "stddev": F.stddev,
    }


def resample_agg(df: DataFrame, rule, aggs: Mapping[str, str] | str,
                 ts_col: str = "ts", partition_by: Sequence[str] = (),
                 value_cols: Sequence[str] | None = None) -> DataFrame:
    """Tumbling-window aggregate; result has ``ts_col`` = bucket start.

    ``aggs`` is either a single func name applied to ``value_cols`` (or all
    numeric-ish remaining columns), or a ``{col: func}`` map.
    """
    sec = int(parse_duration_seconds(rule))
    bucket = F.window(F.col(ts_col), f"{sec} seconds")
    if isinstance(aggs, str):
        cols = list(value_cols) if value_cols is not None else [
            c for c, t in df.dtypes
            if c != ts_col and c not in partition_by and t in ("double", "float", "bigint", "int")
        ]
        agg_map = {c: aggs for c in cols}
    else:
        agg_map = dict(aggs)
    exprs = []
    table = _aggs(ts_col)
    for c, fn in agg_map.items():
        try:
            agg = table[fn]
        except KeyError:
            raise ValueError(f"unsupported resample agg {fn!r}")
        exprs.append(agg(F.col(c)).alias(c))
    out = (df.groupBy(*[F.col(c) for c in partition_by], bucket.alias("_w"))
             .agg(*exprs)
             .withColumn(ts_col, F.col("_w.start"))
             .drop("_w"))
    return out.select(*partition_by, ts_col, *agg_map.keys())


def resample_nearest(df: DataFrame, rule, value_cols: Sequence[str],
                     ts_col: str = "ts",
                     partition_by: Sequence[str] = ()) -> DataFrame:
    """Nearest-observation resample (hydrotools.py:203-204 semantics):
    for each tumbling bucket, take the row whose timestamp is closest to
    the bucket *center* (ties → earlier row, pandas 'first' convention).

    Implemented as min_by over (distance, ts) — one hash aggregate.
    """
    sec = int(parse_duration_seconds(rule))
    bucket = F.window(F.col(ts_col), f"{sec} seconds")
    center = (F.col("_w.start").cast("double") + sec / 2.0)
    dist = F.abs(F.col(ts_col).cast("double") - center)
    key = F.struct(dist.alias("d"), F.col(ts_col).alias("t"))
    exprs = [F.min_by(F.col(c), key).alias(c) for c in value_cols]
    return (df.withColumn("_w", bucket)
              .groupBy(*[F.col(c) for c in partition_by], F.col("_w"))
              .agg(*exprs)
              .withColumn(ts_col, F.col("_w.start"))
              .drop("_w")
              .select(*partition_by, ts_col, *value_cols))


def resample_gapfill(df: DataFrame, rule, aggs: Mapping[str, str] | str,
                     ts_col: str = "ts", partition_by: Sequence[str] = (),
                     value_cols: Sequence[str] | None = None,
                     fill: str | None = None) -> DataFrame:
    """Tumbling aggregate onto a COMPLETE regular grid: empty buckets
    appear with nulls (``fill=None``) or forward-filled values
    (``fill='ffill'``) — pandas ``resample().mean()`` semantics where
    silence is data.

    The grid is ``sequence(min_bucket, max_bucket, step)`` per partition
    key — generated, exploded, left-joined to the aggregate. Grid size =
    time_span / rule per key (rows of a few hundred bytes), so the
    explode is negligible next to the fact scan at any SF.
    """
    from .fillna import ffill as _ffill
    sec = int(parse_duration_seconds(rule))
    agg = resample_agg(df, rule, aggs, ts_col, partition_by, value_cols)
    p = list(partition_by)
    bounds = (df.groupBy(*[F.col(c) for c in p])
              .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")))
    step = F.expr(f"INTERVAL {sec} SECONDS")
    lo = F.timestamp_seconds(
        F.floor(F.col("_lo").cast("double") / sec) * sec)
    hi = F.timestamp_seconds(
        F.floor(F.col("_hi").cast("double") / sec) * sec)
    grid = bounds.select(
        *p, F.explode(F.sequence(lo, hi, step)).alias(ts_col))
    out = grid.join(agg, on=p + [ts_col], how="left")
    if fill == "ffill":
        cols = [c for c in out.columns if c not in p + [ts_col]]
        out = _ffill(out, cols, ts_col, p)
    return out
