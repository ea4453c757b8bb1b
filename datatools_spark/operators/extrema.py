"""Diurnal extrema picking (reference: diurnal.py ``DiurnalExtrema``).

Re-founds the per-day Python loop (diurnal.py:301-346) as set-based Spark:

1. per-day min pick — one hash aggregate (``min(struct(value, ts))`` pins
   pandas' first-occurrence tie-break: diurnal.py idxmin semantics);
2. max pick either same-day, or — ``min_first & max_next_day`` — within
   ``(min_time, min_time + max_window]`` (18 h default, diurnal.py:325-333):
   an equi-join on day ∈ {min_day, min_day+1} followed by the interval
   filter, NOT a general range join — at scale this shuffles on the day key
   with ≤2 candidate days per pick, so the join fan-out is bounded;
3. sanity drop ``min_val > max_val`` (diurnal.py:336-337) and amplitude
   threshold (diurnal.py:369-373);
4. manual corrections as an immutable overlay join (diurnal.py:375-427) —
   MERGE-style ``coalesce(override, computed)``.

Output schema (flat form, diurnal.py:338-344):
``(day, min_val, min_time, max_val, max_time)`` plus derived
``amplitude`` / decimal-hour projections on request.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutils import parse_duration_seconds

__all__ = [
    "daily_extrema",
    "apply_threshold",
    "with_amplitude",
    "with_decimal_hours",
    "to_multi_indexed",
    "extrema_lag_table",
    "apply_corrections",
    "validate_boundary_picks",
    "calibrated_extrema",
]

# tie-pinned argmin/argmax: pandas idxmin/idxmax return the FIRST occurrence;
# min(struct(v, ts)) / min(struct(-v, ts)) order by (value, time) so equal
# values resolve to the earliest timestamp.
def _argmin(v, ts):
    s = F.min(F.struct(F.col(v).alias("v"), F.col(ts).alias("t")))
    return s["v"], s["t"]


def _argmax(v, ts):
    s = F.min(F.struct((-F.col(v)).alias("nv"), F.col(ts).alias("t")))
    return -s["nv"], s["t"]


def daily_extrema(df: DataFrame, value_col: str = "value", ts_col: str = "ts",
                  partition_by: Sequence[str] = (),
                  min_first: bool = False, max_next_day: bool = False,
                  max_window="18h", broadcast_picks: bool = True) -> DataFrame:
    """Per-day extrema picks (diurnal.py:301-346 ``find_diurnal_extrema``).

    Returns ``partition_by + (day, min_val, min_time, max_val, max_time)``.
    Days where ``min_val > max_val`` are dropped (diurnal.py:336-337).

    ``broadcast_picks`` (min-first mode): hint the per-day ``mins`` table
    as the hash-join build side. It is one row per (series, day) —
    samples-per-day× smaller than the candidate side — and without the
    hint Spark's post-``explode`` size estimate can pick the *exploded
    raw* side as build (measured at sf0.1: a 2M-row broadcast — exactly
    what OOMs a 100 TB run). With it, candidates never shuffle: the join
    and the partial max-aggregate both run map-side, and the only
    exchange carries pre-aggregated per-(series, day) partials. Set
    False only when series-count × days outgrows executor memory — that
    regime falls back to a co-partitioned shuffle join on the day key.
    """
    p = [F.col(c) for c in partition_by]
    day = F.date_trunc("DAY", F.col(ts_col)).alias("day")
    base = df.where(F.col(value_col).isNotNull())

    min_v, min_t = _argmin(value_col, ts_col)
    if not (min_first and max_next_day):
        max_v, max_t = _argmax(value_col, ts_col)
        out = (base.groupBy(*p, day)
               .agg(min_v.alias("min_val"), min_t.alias("min_time"),
                    max_v.alias("max_val"), max_t.alias("max_time")))
        return out.where(F.col("min_val") <= F.col("max_val"))

    # min-first mode: max is searched in (min_time, min_time + max_window]
    win_sec = parse_duration_seconds(max_window)
    mins = (base.groupBy(*p, day)
            .agg(min_v.alias("min_val"), min_t.alias("min_time")))
    # candidate rows carry every day key their (min_time, min_time+win]
    # membership could require: a candidate at time T can answer a min
    # picked up to `win` earlier, i.e. on day(T) back through
    # day(T - win) — floor(win/day) + 1 prior keys. Fan-out stays
    # bounded (2 keys at the reference's sub-24h windows, growing only
    # with the window itself); the exact interval predicate below cuts
    # the slack keys. The old fixed 2-key explode silently MISSED
    # candidates beyond min_day+1 for any max_window > 24h.
    n_back = int(win_sec // 86400) + 1
    cand = base.select(
        *p, F.col(ts_col).alias("_cts"), F.col(value_col).alias("_cv"),
        F.explode(F.array(*[
            F.date_trunc("DAY",
                         F.col(ts_col) - F.expr(f"INTERVAL {d} DAY"))
            for d in range(n_back + 1)])).alias("day"))
    join_keys = list(partition_by) + ["day"]
    upper = F.col("min_time") + F.make_dt_interval(secs=F.lit(win_sec))
    s = F.min(F.struct((-F.col("_cv")).alias("nv"), F.col("_cts").alias("t")))
    mins_side = F.broadcast(mins) if broadcast_picks else mins
    picked = (mins_side.join(cand, on=join_keys)
              .where((F.col("_cts") > F.col("min_time")) & (F.col("_cts") <= upper))
              .groupBy(*[F.col(c) for c in join_keys],
                       F.col("min_val"), F.col("min_time"))
              .agg((-s["nv"]).alias("max_val"), s["t"].alias("max_time")))
    return (picked.select(*join_keys, "min_val", "min_time", "max_val", "max_time")
            .where(F.col("min_val") <= F.col("max_val")))


def apply_threshold(extrema: DataFrame, threshold: float) -> DataFrame:
    """Drop days whose amplitude is below ``threshold`` (diurnal.py:369-373)."""
    return extrema.where((F.col("max_val") - F.col("min_val")) >= threshold)


def with_amplitude(extrema: DataFrame, out_col: str = "amplitude") -> DataFrame:
    """diurnal.py:296-299."""
    return extrema.withColumn(out_col, F.col("max_val") - F.col("min_val"))


def with_decimal_hours(extrema: DataFrame) -> DataFrame:
    """Add ``min_hrs`` / ``max_hrs`` — hours after day start of each pick
    (diurnal.py:257-264)."""
    day_s = F.col("day").cast("double")
    return (extrema
            .withColumn("min_hrs", (F.col("min_time").cast("double") - day_s) / 3600.0)
            .withColumn("max_hrs", (F.col("max_time").cast("double") - day_s) / 3600.0))


def to_multi_indexed(extrema: DataFrame) -> DataFrame:
    """Struct reshape mirroring the two-level (minima/maxima × value/time/hrs)
    columns (diurnal.py:348-367)."""
    e = with_decimal_hours(extrema)
    return e.select(
        "day",
        F.struct(F.col("min_val").alias("value"), F.col("min_time").alias("time"),
                 F.col("min_hrs").alias("hrs")).alias("minima"),
        F.struct(F.col("max_val").alias("value"), F.col("max_time").alias("time"),
                 F.col("max_hrs").alias("hrs")).alias("maxima"),
    )


def extrema_lag_table(df: DataFrame, sensor_col: str, lag_from: str,
                      sensors: Sequence[str], value_col: str = "value",
                      ts_col: str = "ts",
                      extrema: str = "maxima") -> DataFrame:
    """M3 ``lag_df`` (diurnal.py:24-26): per-day table of each sensor's
    extrema timing LAG versus a reference sensor.

    The reference pivots a multi-indexed frame on (extrema, 'hrs') and
    subtracts the ``lag_from`` column from every other sensor's column,
    dropping the reference. Spark-native: per-(sensor, day) extrema via
    :func:`daily_extrema` (one hash aggregate), decimal hours, then a
    conditional-aggregation pivot on the EXPLICIT sensor list (no
    inference job, deterministic column order) and a column subtraction
    — two shuffles total, both on (day)-sized aggregates, never raw
    rows.

    Output: ``day, {sensor}_lag …`` (hours, sensor − reference; the
    ``lag_from`` column is dropped). Days missing a sensor yield NULL.
    """
    ext = daily_extrema(df, value_col, ts_col, partition_by=[sensor_col])
    hrs = "max_hrs" if extrema == "maxima" else "min_hrs"
    e = with_decimal_hours(ext).select(
        F.col(sensor_col), F.col("day"), F.col(hrs).alias("_hrs"))
    pivot = [F.max(F.when(F.col(sensor_col) == s, F.col("_hrs"))).alias(f"_{s}")
             for s in sensors]
    p = e.groupBy("day").agg(*pivot)
    return p.select(
        "day",
        *[(F.col(f"_{s}") - F.col(f"_{lag_from}")).alias(f"{s}_lag")
          for s in sensors if s != lag_from])


def apply_corrections(extrema: DataFrame, corrections: DataFrame,
                      series: DataFrame | None = None,
                      value_col: str = "value", ts_col: str = "ts") -> DataFrame:
    """Immutable overlay for manual pick corrections (diurnal.py:375-451).

    ``corrections`` schema (FIXTURES.md §7): ``day, which ('min'|'max'|'both'),
    new_value, new_time, find_between_start_hrs, find_between_end_hrs``.

    Two correction kinds:
    - explicit ``new_value``/``new_time`` → coalesce over the computed pick;
    - re-search window (hrs after day start) → re-pick the extremum from
      ``series`` inside the window (diurnal.py:407-420, 429-442).
    The corrections table is tiny → broadcast joins throughout.
    """
    # every correction join below is PIVOTED to one row per day before
    # meeting the extrema table: joining on="day" with a raw per-(day,
    # which) corrections table fanned each extrema row out once per
    # correction row — a day with both a min and a max correction (the
    # only way to correct the two sides to different values) emitted
    # TWO partially-corrected duplicates (r9 self-review). If the same
    # (day, side) carries conflicting corrections the struct max picks
    # one deterministically.
    _min_side = F.col("which").isin("min", "both")
    _max_side = F.col("which").isin("max", "both")
    c = F.broadcast(corrections)
    if series is not None:
        # re-search: rows of the series inside [day+start_hrs,
        # day+end_hrs]. day may be DATE-typed (the FIXTURES.md §7
        # schema) — date has no double cast; go through timestamp.
        sec = F.col("day").cast("timestamp").cast("double")
        win = (c.where(F.col("find_between_start_hrs").isNotNull())
               .select("day", "which",
                       (sec + F.col("find_between_start_hrs") * 3600).cast("timestamp").alias("_ws"),
                       (sec + F.col("find_between_end_hrs") * 3600).cast("timestamp").alias("_we")))
        day_key = F.date_trunc("DAY", F.col(ts_col))
        hits = (series.join(F.broadcast(win),
                            on=day_key == win["day"].cast("timestamp"))
                .where(F.col(ts_col).between(F.col("_ws"), F.col("_we"))))
        smin = F.min(F.struct(F.col(value_col).alias("v"), F.col(ts_col).alias("t")))
        smax = F.min(F.struct((-F.col(value_col)).alias("nv"), F.col(ts_col).alias("t")))
        research = (hits.groupBy(win["day"].alias("day"), "which")
                    .agg(smin["v"].alias("_rs_min_val"), smin["t"].alias("_rs_min_time"),
                         (-smax["nv"]).alias("_rs_max_val"), smax["t"].alias("_rs_max_time")))
        res = research.groupBy("day").agg(
            F.max(F.when(_min_side, F.struct(
                F.col("_rs_min_val").alias("v"),
                F.col("_rs_min_time").alias("t")))).alias("_rmin"),
            F.max(F.when(_max_side, F.struct(
                F.col("_rs_max_val").alias("v"),
                F.col("_rs_max_time").alias("t")))).alias("_rmax"))
        extrema = (extrema.join(F.broadcast(res), on="day", how="left")
                   .withColumn("min_val",
                               F.coalesce(F.col("_rmin.v"), F.col("min_val")))
                   .withColumn("min_time",
                               F.coalesce(F.col("_rmin.t"), F.col("min_time")))
                   .withColumn("max_val",
                               F.coalesce(F.col("_rmax.v"), F.col("max_val")))
                   .withColumn("max_time",
                               F.coalesce(F.col("_rmax.t"), F.col("max_time")))
                   .drop("_rmin", "_rmax"))
    explicit = (c.where(F.col("new_value").isNotNull() | F.col("new_time").isNotNull())
                .groupBy("day").agg(
                    F.max(F.when(_min_side, F.struct(
                        F.col("new_value").alias("v"),
                        F.col("new_time").alias("t")))).alias("_cmin"),
                    F.max(F.when(_max_side, F.struct(
                        F.col("new_value").alias("v"),
                        F.col("new_time").alias("t")))).alias("_cmax")))
    out = (extrema.join(F.broadcast(explicit), on="day", how="left")
           .withColumn("min_val", F.when(F.col("_cmin").isNotNull(),
                                         F.coalesce(F.col("_cmin.v"), F.col("min_val")))
                       .otherwise(F.col("min_val")))
           .withColumn("min_time", F.when(F.col("_cmin").isNotNull(),
                                          F.coalesce(F.col("_cmin.t"), F.col("min_time")))
                       .otherwise(F.col("min_time")))
           .withColumn("max_val", F.when(F.col("_cmax").isNotNull(),
                                         F.coalesce(F.col("_cmax.v"), F.col("max_val")))
                       .otherwise(F.col("max_val")))
           .withColumn("max_time", F.when(F.col("_cmax").isNotNull(),
                                          F.coalesce(F.col("_cmax.t"), F.col("max_time")))
                       .otherwise(F.col("max_time")))
           .drop("_cmin", "_cmax"))
    return out


def validate_boundary_picks(extrema: DataFrame, series: DataFrame,
                            value_col: str = "value", ts_col: str = "ts",
                            partition_by: Sequence[str] = (),
                            n_samples: int = 5) -> DataFrame:
    """A5 boundary re-validation (diurnal.py:654-714): a pick sitting on
    its day's first/last sample may be a truncation artifact — inspect
    ±``n_samples`` rows around the boundary in the FULL series and keep
    the pick only if it is still the extremum there.

    Set-based plan: annotate every series row once with (neighborhood
    min/max over a ``rowsBetween(-n, n)`` frame, day-first/day-last
    timestamps) — one sort per series, required by the row-positional
    frame — then keep ONLY the rows sitting on a day boundary: off-
    boundary picks are trustworthy by definition, so the join side
    shrinks to ≤2 rows per (series, day) and both validity joins become
    broadcast hash joins (a null match ⇒ off-boundary ⇒ valid). The
    earlier shape — joining picks against ALL annotated rows — shuffled
    the raw series twice; this never shuffles it beyond the window sort.
    Adds ``min_valid`` / ``max_valid`` int flags (1 = trustworthy).
    """
    from pyspark.sql import Window as W

    p = list(partition_by)
    day = F.date_trunc("DAY", F.col(ts_col))
    series_w = W.partitionBy(*[F.col(c) for c in p]).orderBy(F.col(ts_col))
    nb = series_w.rowsBetween(-n_samples, n_samples)
    day_w = W.partitionBy(*[F.col(c) for c in p], day)
    ann = (series.where(F.col(value_col).isNotNull())
           .select(*p, F.col(ts_col).alias("_ats"),
                   F.col(value_col).alias("_av"),
                   F.min(value_col).over(nb).alias("_nb_min"),
                   F.max(value_col).over(nb).alias("_nb_max"),
                   F.min(ts_col).over(day_w).alias("_day_first"),
                   F.max(ts_col).over(day_w).alias("_day_last")))
    boundary = ann.where((F.col("_ats") == F.col("_day_first")) |
                         (F.col("_ats") == F.col("_day_last")))
    min_ok = F.col("_av") <= F.col("_nb_min")
    max_ok = F.col("_av") >= F.col("_nb_max")
    mn = boundary.select(*[F.col(c).alias(f"_mn_{c}") for c in p],
                         F.col("_ats"), min_ok.cast("int").alias("_mn_ok"))
    mx = boundary.select(*[F.col(c).alias(f"_mx_{c}") for c in p],
                         F.col("_ats").alias("_bts"),
                         max_ok.cast("int").alias("_mx_ok"))
    cond_mn = [extrema[c] == mn[f"_mn_{c}"] for c in p]
    cond_mn.append(extrema["min_time"] == mn["_ats"])
    out = extrema.join(F.broadcast(mn), on=cond_mn[0] if len(cond_mn) == 1
                       else _and_all(cond_mn), how="left")
    cond_mx = [out[c] == mx[f"_mx_{c}"] for c in p]
    cond_mx.append(out["max_time"] == mx["_bts"])
    out = out.join(F.broadcast(mx), on=cond_mx[0] if len(cond_mx) == 1
                   else _and_all(cond_mx), how="left")
    out = (out.withColumn("min_valid", F.coalesce(F.col("_mn_ok"), F.lit(1)))
           .withColumn("max_valid", F.coalesce(F.col("_mx_ok"), F.lit(1))))
    drops = ["_ats", "_bts", "_mn_ok", "_mx_ok"] + \
        [f"_mn_{c}" for c in p] + [f"_mx_{c}" for c in p]
    return out.drop(*drops)


def _and_all(conds):
    acc = conds[0]
    for c in conds[1:]:
        acc = acc & c
    return acc


def calibrated_extrema(df: DataFrame, value_col: str = "value",
                       ts_col: str = "ts",
                       partition_by: Sequence[str] = (),
                       calibration_window: tuple | None = None,
                       window_half="8h", min_first: bool = False,
                       broadcast_picks: bool = True) -> DataFrame:
    """A6/A7 predicted-window picking (diurnal.py:453-488, 310-319,
    593-605): learn the mean occurrence hour of min/max over a
    calibration slice, then pick each day's extrema only inside
    ``[center − half, center + half]`` clock windows.

    Plan: calibration = one day-agg over the slice (tiny, broadcast);
    candidate matching joins on exploded day keys (each clock window
    spans ≤ 2 calendar days) — bounded fan-out, no range join.
    ``min_first``: the max window's start is clipped to the picked
    min_time (diurnal.py:316-319).

    ``broadcast_picks``: hint the per-(series, day) ``wins`` table as
    the join build side (same rationale + fallback as
    ``daily_extrema``) so the 3×-exploded candidates never shuffle.
    """
    p = list(partition_by)
    half_s = parse_duration_seconds(window_half)

    cal_src = df
    if calibration_window is not None:
        cal_src = df.where(F.col(ts_col).between(*calibration_window))
    cal = daily_extrema(cal_src, value_col, ts_col, p)
    day_sec = F.col("day").cast("double")
    hrs = (cal.groupBy(*[F.col(c) for c in p]).agg(
        F.avg((F.col("min_time").cast("double") - day_sec) / 3600.0).alias("_mh"),
        F.avg((F.col("max_time").cast("double") - day_sec) / 3600.0).alias("_xh")))

    day = F.date_trunc("DAY", F.col(ts_col))
    days = df.select(*p, day.alias("day")).distinct()
    days = days.join(F.broadcast(hrs), on=p) if p else \
        days.crossJoin(F.broadcast(hrs))
    dsec = F.col("day").cast("double")
    wins = days.select(
        *p, "day",
        (dsec + F.col("_mh") * 3600 - half_s).cast("timestamp").alias("_min_ws"),
        (dsec + F.col("_mh") * 3600 + half_s).cast("timestamp").alias("_min_we"),
        (dsec + F.col("_xh") * 3600 - half_s).cast("timestamp").alias("_max_ws"),
        (dsec + F.col("_xh") * 3600 + half_s).cast("timestamp").alias("_max_we"))

    # candidates: rows keyed to each calendar day their ±1-day span covers
    cand = df.where(F.col(value_col).isNotNull()).select(
        *p, F.col(ts_col).alias("_cts"), F.col(value_col).alias("_cv"),
        F.explode(F.array(
            F.date_trunc("DAY", F.col(ts_col)),
            F.date_trunc("DAY", F.col(ts_col) - F.expr("INTERVAL 1 DAY")),
            F.date_trunc("DAY", F.col(ts_col) + F.expr("INTERVAL 1 DAY")),
        )).alias("day"))   # the 3 day keys are distinct — no dedup shuffle
    keys = p + ["day"]
    joined = (F.broadcast(wins) if broadcast_picks else wins).join(cand, on=keys)

    in_min = F.col("_cts").between(F.col("_min_ws"), F.col("_min_we"))
    smin = F.min(F.when(in_min, F.struct(F.col("_cv").alias("v"),
                                         F.col("_cts").alias("t"))))
    if not min_first:
        # both picks in ONE pass: conditional tie-pinned struct aggregates
        # (each window predicate masks the other's rows) — a single
        # shuffle on the day keys instead of two join+agg subtrees.
        in_max = F.col("_cts").between(F.col("_max_ws"), F.col("_max_we"))
        smax = F.min(F.when(in_max, F.struct((-F.col("_cv")).alias("nv"),
                                             F.col("_cts").alias("t"))))
        both = (joined.where(in_min | in_max)
                .groupBy(*[F.col(c) for c in keys])
                .agg(smin["v"].alias("min_val"), smin["t"].alias("min_time"),
                     (-smax["nv"]).alias("max_val"), smax["t"].alias("max_time")))
        return (both.where(F.col("min_val") <= F.col("max_val"))
                .select(*keys, "min_val", "min_time", "max_val", "max_time"))

    mins = (joined.where(in_min)
            .groupBy(*[F.col(c) for c in keys])
            .agg(smin["v"].alias("min_val"), smin["t"].alias("min_time")))

    picks = mins.select(*keys, "min_time")
    maxj = joined.join(F.broadcast(picks) if broadcast_picks else picks,
                       on=keys, how="inner")
    lo = F.greatest(F.col("_max_ws"), F.col("min_time"))
    smax = F.min(F.struct((-F.col("_cv")).alias("nv"), F.col("_cts").alias("t")))
    maxs = (maxj.where((F.col("_cts") > lo) & (F.col("_cts") <= F.col("_max_we")))
            .groupBy(*[F.col(c) for c in keys])
            .agg((-smax["nv"]).alias("max_val"), smax["t"].alias("max_time")))
    return (mins.join(maxs, on=keys)
            .where(F.col("min_val") <= F.col("max_val"))
            .select(*keys, "min_val", "min_time", "max_val", "max_time"))
