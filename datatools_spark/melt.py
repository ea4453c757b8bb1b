"""Temperature-index melt pipeline (reference melt_model.py — E3).

The reference runs per-day Python loops for shadow correction
(:395-398) and albedo (:423-427); here both are set-based:

- shadow correction: per-day band extrema via window functions + the
  time-weighted interpolation helper;
- daily albedo: ``outgoing[argmax(incoming)] / max(incoming)`` — one
  hash aggregate with a tie-pinned argmax (SURVEY A10, the max_by
  showcase);
- melt: pure column expression (functions.physics.melt_expr).

The 2-h channel smoothing runs through the blocked rolling engine
(Arrow-batched ``applyInPandas`` over day chunks + halo rows,
rolling.py:rolling_stats_blocked): Spark evaluates a sliding RANGE
frame by re-aggregating the whole frame per row — O(n·w) at dense
cadence with parallelism capped at the series count — while the
blocked pass is O(n) and chunk-parallel, exactly equal at the 6-dp
output rounding. Everything else is built-in column expressions and
whole-stage-codegens; no row-at-a-time Python anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.physics import melt_expr
from .functions.timeutils import parse_duration_seconds
from .operators.fillna import ffill, interpolate_linear
from .operators.rolling import rolling_stats_blocked

__all__ = ["apply_shadow_correction", "calc_daily_albedo", "calc_melt"]


def _smooth_chunk(window) -> str:
    """Chunk size for the blocked smoothing pass: 1 day unless the
    caller's smoothing window reaches further (centered reach =
    window/2). A fixed "1d" raised for any public ``smoothing`` wider
    than 2 days — a width the old declarative path accepted (r7
    ADVICE); deriving the chunk keeps the blocked engine's per-task
    memory bound at one chunk + halos for every legal width."""
    half_s = parse_duration_seconds(window) / 2.0
    return "1d" if half_s <= 86_400 else f"{int(-(-half_s // 1))}s"


def apply_shadow_correction(df: DataFrame, solar_col: str = "Solar_incoming",
                            band: tuple[int, int] = (14, 17),
                            ts_col: str = "ts",
                            partition_by: Sequence[str] = ()) -> DataFrame:
    """W4 (melt_model.py:366-406): within a fixed clock band each day, a
    topographic shadow notches the solar curve. Flag in-band samples below
    ``min(first, last)`` of the band, null them, linearly interpolate.

    Set-based: per-(day) band endpoints via min_by/max_by aggregation,
    broadcast back; interpolation via the window helper. Adds
    ``{solar_col}_corrected``.
    """
    p = list(partition_by)
    day = F.date_trunc("DAY", F.col(ts_col))
    in_band = (F.hour(F.col(ts_col)) >= band[0]) & (F.hour(F.col(ts_col)) < band[1])
    # band endpoints per day: first/last in-band values (min_by/max_by ts)
    band_rows = df.where(in_band & F.col(solar_col).isNotNull())
    ends = (band_rows.groupBy(*[F.col(c) for c in p], day.alias("_day"))
            .agg(F.min_by(F.col(solar_col), F.col(ts_col)).alias("_first_v"),
                 F.max_by(F.col(solar_col), F.col(ts_col)).alias("_last_v")))
    thresh = F.least(F.col("_first_v"), F.col("_last_v"))
    work = df.withColumn("_day", day).join(
        F.broadcast(ends), on=p + ["_day"], how="left")
    corrected = F.when(
        in_band & (F.col(solar_col) < thresh), F.lit(None)
    ).otherwise(F.col(solar_col))
    out_col = f"{solar_col}_corrected"
    work = work.withColumn(out_col, corrected).drop("_day", "_first_v", "_last_v")
    return interpolate_linear(work, [out_col], ts_col, p)


def calc_daily_albedo(df: DataFrame, incoming_col: str = "Solar_incoming",
                      reflected_col: str = "Solar_reflected",
                      ts_col: str = "ts", smoothing: str = "2h",
                      partition_by: Sequence[str] = ()) -> DataFrame:
    """A10 (melt_model.py:408-446): 2-h centered rolling means of both
    channels; daily albedo = reflected[argmax(incoming)] / max(incoming);
    values ≥ 1 masked; output one row per day:
    ``partition_by + (day, albedo)``."""
    p = list(partition_by)
    # BOTH channels smoothed over the shared frame in ONE blocked pandas
    # pass (rolling.py:rolling_stats_blocked): the declarative RANGE
    # frame re-aggregates the whole ~2-h frame per row with parallelism
    # capped at the series count — O(n·w) at dense cadence, the exact
    # shape the blocked engines were built to remove (r6 directive 1).
    work = (rolling_stats_blocked(
                df, incoming_col, smoothing,
                {"_in": "mean", "_out": (reflected_col, "mean")},
                ts_col=ts_col, partition_by=p,
                chunk=_smooth_chunk(smoothing))
            .where(F.col("_in").isNotNull()))
    return _daily_albedo_from_smoothed(work, "_in", "_out", p, ts_col)


def _daily_albedo_from_smoothed(sm: DataFrame, in_col: str, out_col: str,
                                p: Sequence[str], ts_col: str) -> DataFrame:
    """Shared A10 core over a smoothed two-channel frame: tie-pinned
    argmax of incoming (max value, earliest ts — pandas idxmax parity),
    ANSI-guarded division (an all-zero-incoming polar-night day makes
    the denominator 0: the raw division THROWS under ANSI; albedo is
    undefined there → NULL, which IS DuckDB's 0/0), values ≥ 1 masked.
    One map-side-combinable aggregate, one row per (partition, day).
    Factored so the A10 semantics cannot diverge between
    :func:`calc_daily_albedo` and :func:`calc_melt` (they used to be
    two hand-copied blocks)."""
    day = F.col("day") if "day" in sm.columns \
        else F.date_trunc("DAY", F.col(ts_col)).alias("day")
    s = F.min(F.struct((-F.col(in_col)).alias("ni"),
                       F.col(ts_col).alias("t"),
                       F.col(out_col).alias("o")))
    daily = (sm.where(F.col(in_col).isNotNull())
             .groupBy(*[F.col(c) for c in p], day)
             .agg(s["o"].alias("_out_at_max"),
                  F.max(in_col).alias("_max_in")))
    alb = F.when(F.col("_max_in") != 0.0,
                 F.col("_out_at_max") / F.col("_max_in"))
    return daily.select(
        *p, "day",
        F.when(alb >= 1.0, F.lit(None)).otherwise(alb).alias("albedo"))


def calc_melt(df: DataFrame, temp_col: str = "Temp",
              incoming_col: str = "Solar_incoming",
              reflected_col: str = "Solar_reflected",
              ts_col: str = "ts", threshold_temp: float = 0.0,
              partition_by: Sequence[str] = ()) -> DataFrame:
    """E3 end-to-end (melt_model.py:448-543): smoothed incoming solar,
    daily albedo joined back on the day key (J3 — the reference joins on
    each day's first timestamp then ffills :531-537; the day-key join +
    ffill is the cleaner equivalent-intended plan), melt expression with
    the temperature gate, nulls→0 (:541). Adds ``melt_rate``."""
    p = list(partition_by)
    # ONE blocked pass smooths both channels (see calc_daily_albedo);
    # the daily-albedo aggregate and the melt expression both consume
    # it, so the pass is localCheckpointed (lazy) — materialize once
    # instead of recomputing the Arrow pass per consumer. The albedo
    # branch reduces map-side to one row per (partition, day); the
    # join back is a broadcast — no full-row shuffle anywhere before
    # the ffill window.
    sm = rolling_stats_blocked(
        df, incoming_col, "2h",
        {"_in_sm": "mean", "_out_sm": (reflected_col, "mean")},
        ts_col=ts_col, partition_by=p, chunk=_smooth_chunk("2h")) \
        .withColumn("day", F.date_trunc("DAY", F.col(ts_col))) \
        .localCheckpoint(eager=False)
    # r11 A/B: eager=True here (one Arrow pass instead of the lazy
    # checkpoint's two branch evaluations in the first job) measured
    # SLOWER at sf0.1 (2.9 vs 2.4 s min-of-4): blocking on the full
    # row-width materialization costs more than the second in-job pass,
    # which runs in otherwise-idle task slots. Keep lazy.
    # daily albedo from the shared smoothed channels — the SAME factored
    # A10 core calc_daily_albedo uses (argmax tie pin, ANSI guard, ≥1
    # mask cannot diverge between the two entry points)
    albedo = _daily_albedo_from_smoothed(sm, "_in_sm", "_out_sm", p,
                                         ts_col)
    work = sm.join(F.broadcast(albedo), on=p + ["day"], how="left")
    work = ffill(work, ["albedo"], ts_col, p)
    m = melt_expr(F.col(temp_col), F.col("_in_sm"), F.col("albedo"),
                  threshold_temp=threshold_temp)
    return (work.withColumn("melt_rate", F.coalesce(m, F.lit(0.0)))
            .drop("_in_sm", "_out_sm", "day"))
