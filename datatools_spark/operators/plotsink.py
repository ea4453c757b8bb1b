"""Plot-ready downsampling sink (SURVEY §2.1 S14).

The reference's plotting surface (gpstools.py plot_3d_motion /
plot_relative_motion, diurnal.py plot helpers, hydrotools stage plots)
draws matplotlib figures from in-memory frames. The Spark-first
re-expression keeps the REDUCTION in the engine and only ships a
plot-sized result across the driver boundary: a time-bucketed min/max
envelope (plus bucket mean and count) is visually lossless for line
plots at screen resolution — a 10⁹-row series becomes ≤ 2 points per
pixel-bucket, computed in one partial-aggregating groupBy with
tie-pinned arg-times (no window functions, no sort, no collect until
the explicitly-marked client boundary).

``to_plot_frame`` is the ONE sanctioned ``toPandas()`` in the engine:
it asserts the envelope is already bucketed (bounded rows) before
crossing; the matplotlib call itself stays out of scope (COVERAGE.md).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extrema import _argmax, _argmin

__all__ = ["plot_envelope", "to_plot_frame"]


def plot_envelope(df: DataFrame, value_col: str = "value",
                  ts_col: str = "ts", partition_by: Sequence[str] = (),
                  bucket: str = "6 hours") -> DataFrame:
    """Per-``bucket`` plot envelope: min/max values with their
    (first-occurrence tie-pinned) timestamps, mean, and sample count.

    One hash aggregate keyed on (partitions, bucket) — map-side
    combinable, so at 100 TB each executor emits ≤ #buckets rows and the
    shuffle is plot-sized, not data-sized.
    Output: ``*partition_by, bucket, v_min, t_min, v_max, t_max,
    v_mean, n``.
    """
    mn_v, mn_t = _argmin(value_col, ts_col)
    mx_v, mx_t = _argmax(value_col, ts_col)
    return (df.groupBy(*partition_by,
                       F.window(ts_col, bucket).start.alias("bucket"))
            .agg(mn_v.alias("v_min"), mn_t.alias("t_min"),
                 mx_v.alias("v_max"), mx_t.alias("t_max"),
                 F.avg(value_col).alias("v_mean"),
                 F.count("*").alias("n")))


def to_plot_frame(envelope: DataFrame, max_rows: int = 100_000):
    """The sanctioned driver boundary for plotting: collect an ALREADY
    REDUCED envelope to pandas. Refuses unbounded frames — the guard
    makes 'forgot to downsample' a loud error instead of a driver OOM.
    """
    n = envelope.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"plot frame would exceed {max_rows} rows — reduce with "
            "plot_envelope(bucket=...) before collecting")
    return envelope.toPandas()
