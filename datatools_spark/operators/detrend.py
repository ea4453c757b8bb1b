"""Detrend / rotation / flow-direction analytics (reference gpstools.py).

- ``linear_detrend`` (gpstools.py:462-496): OLS deg-1 fit of a component
  against decimal-doy over a clipped window, residual applied to the FULL
  series → ``regr_slope``/``regr_intercept`` aggregate (one tiny row),
  broadcast back, ``y − (a + b·x)``.
- ``flow_direction_angle`` (gpstools.py:348-356): ``atan(ΔN/ΔE)`` of
  daily-mean first vs last positions. NOTE the reference uses ``atan``,
  not ``atan2`` — direction ambiguous by π (SURVEY §2.8); ``use_atan2``
  gives the corrected semantics, default keeps reference parity.
- ``reproject_to_flow_direction`` (gpstools.py:287-346, 370-376): origin
  shift to the first sample then 2-D rotation
  ``xflow = cosα·E + sinα·N``, ``xtran = −sinα·E + cosα·N``.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutils import decimal_doy

__all__ = ["linear_detrend", "flow_direction_angle", "reproject_to_flow_direction"]


def linear_detrend(df: DataFrame, value_col: str, ts_col: str = "ts",
                   window: tuple | None = None,
                   partition_by: Sequence[str] = (),
                   x_col: str | None = None,
                   out_col: str | None = None) -> DataFrame:
    """Subtract the deg-1 OLS fit (fit on ``window`` slice, applied to all).

    ``x_col=None`` regresses against decimal day-of-year (gpstools.py:491
    ``np.polyfit(doy, y, 1)``); pass e.g. ``'xflow'`` for
    ``z_detrend_wrt_xflow`` (gpstools.py:498-518).
    """
    p = list(partition_by)
    x = F.col(x_col) if x_col else decimal_doy(ts_col)
    fit_src = df
    if window is not None:
        start, end = window
        fit_src = fit_src.where(F.col(ts_col).between(F.lit(start), F.lit(end)))
    fit = fit_src.groupBy(*[F.col(c) for c in p]).agg(
        F.regr_slope(F.col(value_col), x).alias("_slope"),
        F.regr_intercept(F.col(value_col), x).alias("_icept"))
    # LEFT join: a partition with no fit (all rows outside the window,
    # or a null partition key an equi-join can never match) must keep
    # its rows with a null residual — the inner join silently deleted
    # them, contradicting "residual applied to the FULL series"
    joined = df.join(F.broadcast(fit), on=p, how="left") if p \
        else df.crossJoin(F.broadcast(fit))
    out = out_col or f"{value_col}_detrended"
    return (joined
            .withColumn(out, F.col(value_col) - (F.col("_icept") + F.col("_slope") * x))
            .drop("_slope", "_icept"))


def flow_direction_angle(df: DataFrame, north_col: str = "dnorth",
                         east_col: str = "deast", ts_col: str = "ts",
                         use_atan2: bool = False) -> float:
    """Scalar α from daily-mean first-vs-last displacement (gpstools.py:348-356).

    Small driver-side action by design: α parameterizes the rotation
    expressions; it is a scalar, not a data-path column.
    """
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (df.groupBy(day.alias("_d"))
             .agg(F.avg(north_col).alias("_n"), F.avg(east_col).alias("_e")))
    row = daily.agg(
        (F.max_by(F.col("_n"), F.col("_d")) - F.min_by(F.col("_n"), F.col("_d"))).alias("dn"),
        (F.max_by(F.col("_e"), F.col("_d")) - F.min_by(F.col("_e"), F.col("_d"))).alias("de"),
    ).collect()[0]
    if row["dn"] is None or row["de"] is None:
        raise ValueError(
            "flow_direction_angle: no displacement data (empty or "
            "all-null series) — alpha is undefined; pass alpha "
            "explicitly to reproject_to_flow_direction")
    if row["dn"] == 0.0 and row["de"] == 0.0:
        # fully degenerate series (zero total displacement): the numpy
        # reference's arctan(0/0) is NaN — a confident angle (copysign
        # gave +π/2, atan2 gives 0) would silently rotate by garbage.
        # Raise like the all-null guard above; NaN would only surface
        # later as all-NaN rotated columns.
        raise ValueError(
            "flow_direction_angle: zero net displacement (dn=de=0) — "
            "the flow direction is undefined (numpy reference yields "
            "NaN); pass alpha explicitly to reproject_to_flow_direction")
    if use_atan2:
        return math.atan2(row["dn"], row["de"])
    if row["de"] == 0.0:
        # numpy-reference parity at the pole: arctan(dn/0) = arctan(±inf)
        # = ±π/2 (gpstools.py:353 under numpy's inf semantics); Python's
        # float division raised ZeroDivisionError instead
        return math.copysign(math.pi / 2, row["dn"])
    return math.atan(row["dn"] / row["de"])  # reference parity (gpstools.py:353)


def reproject_to_flow_direction(df: DataFrame, alpha: float | None = None,
                                north_col: str = "dnorth", east_col: str = "deast",
                                ts_col: str = "ts",
                                preserve_ref: bool = False) -> DataFrame:
    """Origin shift to the first valid sample + rotation by α
    (gpstools.py:287-346; rotation :370-376).

    The reference's ``determine_start`` loop is broken (never advances,
    gpstools.py:359-365 — SURVEY §5); intended semantics = first sample,
    which is what we anchor to.
    """
    if alpha is None:
        alpha = flow_direction_angle(df, north_col, east_col, ts_col)
    first = df.orderBy(F.col(ts_col)).select(
        F.col(north_col).alias("_n0"), F.col(east_col).alias("_e0")).limit(1)
    work = df.crossJoin(F.broadcast(first))
    n = F.col(north_col) - (F.lit(0.0) if preserve_ref else F.col("_n0"))
    e = F.col(east_col) - (F.lit(0.0) if preserve_ref else F.col("_e0"))
    ca, sa = math.cos(alpha), math.sin(alpha)
    return (work
            .withColumn("xflow", F.lit(ca) * e + F.lit(sa) * n)
            .withColumn("xtran", F.lit(-sa) * e + F.lit(ca) * n)
            .drop("_n0", "_e0"))
