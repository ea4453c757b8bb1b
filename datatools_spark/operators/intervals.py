"""Time-window subsetting, interval-lookup joins, and as-of alignment.

Covers SURVEY §2.2 F3-F9 (window clipping with ``closed`` endpoint
semantics, union-of-windows selection/anti-selection) and §2.3 J1/J2
(as-of pressure alignment hydrotools.py:369, 546; piecewise sensor-height
assignment hydrotools.py:351-366, 449-463, 533-543).

Scale notes: interval lookup sides are tiny hand-maintained schedules →
always broadcast; the as-of join avoids a range join entirely via the
union + last-non-null-window trick (one shuffle on the series key, sorted
merge within partitions) which scales to arbitrarily large both sides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "clip_to_window",
    "between_with_closed",
    "subset_from_windows",
    "drop_windows",
    "drop_timestamps",
    "interval_lookup_join",
    "asof_join",
    "union_keep_first", "interval_overlap_join",
]


def between_with_closed(ts: Column, start, end, closed: str = "both") -> Column:
    """Range predicate with pandas-style ``closed ∈ {both,left,right,neither}``
    endpoint semantics (gpstools.py:729-739, 895-915)."""
    lo = ts >= F.lit(start) if closed in ("both", "left") else ts > F.lit(start)
    hi = ts <= F.lit(end) if closed in ("both", "right") else ts < F.lit(end)
    return lo & hi


def clip_to_window(df: DataFrame, start, end, ts_col: str = "ts",
                   closed: str = "both") -> DataFrame:
    """gpstools.py:829-844 ``clip_to_window`` / :729-739 ``subset_from_bounds``."""
    return df.where(between_with_closed(F.col(ts_col), start, end, closed))


def subset_from_windows(df: DataFrame, windows: Sequence[tuple],
                        ts_col: str = "ts", closed: str = "both") -> DataFrame:
    """Union of multiple time slices (gpstools.py:746-753) as one OR predicate
    — a single scan, no self-union."""
    pred = None
    for start, end in windows:
        p = between_with_closed(F.col(ts_col), start, end, closed)
        pred = p if pred is None else (pred | p)
    return df.where(pred if pred is not None else F.lit(False))


def drop_windows(df: DataFrame, windows: Sequence[tuple],
                 ts_col: str = "ts", closed: str = "both") -> DataFrame:
    """Anti-selection (gpstools.py:411-415 ``drop_positions``;
    hydrotools.py:388 fixed-range excision)."""
    pred = None
    for start, end in windows:
        p = between_with_closed(F.col(ts_col), start, end, closed)
        pred = p if pred is None else (pred | p)
    return df if pred is None else df.where(~pred)


def drop_timestamps(df: DataFrame, timestamps: Sequence, ts_col: str = "ts",
                    null_cols: Sequence[str] | None = None) -> DataFrame:
    """Delete rows by exact timestamp (gpstools.py:431-441) or — if
    ``null_cols`` given — null out those columns instead (hydrotools.py:295-307
    drop-list semantics)."""
    isin = F.col(ts_col).isin(list(timestamps))
    if null_cols is None:
        return df.where(~isin)
    out = df
    for c in null_cols:
        out = out.withColumn(c, F.when(isin, F.lit(None)).otherwise(F.col(c)))
    return out


def interval_lookup_join(df: DataFrame, schedule: DataFrame,
                         ts_col: str = "ts",
                         start_col: str = "start_ts", end_col: str = "end_ts",
                         on: Sequence[str] = (),
                         closed: str = "both") -> DataFrame:
    """Piecewise-constant assignment from a tiny ``(start, end, value...)``
    schedule (J2: hydrotools.py:351-366, 449-463, 533-543 — the positional
    slices re-expressed as explicit time intervals, SURVEY §7 hard-list (a)).

    Broadcast range join: the schedule is hand-maintained and tiny, so the
    big side never shuffles.
    """
    lo = F.col(ts_col) >= F.col(start_col) if closed in ("both", "left") \
        else F.col(ts_col) > F.col(start_col)
    hi = F.col(ts_col) <= F.col(end_col) if closed in ("both", "right") \
        else F.col(ts_col) < F.col(end_col)
    cond = lo & hi
    for k in on:
        cond = cond & (df[k] == schedule[k])
    # join against the UN-dropped schedule — the condition references
    # schedule[k], and dropping the key columns first severs those
    # attributes from the joined plan (MISSING_ATTRIBUTES at analysis
    # for every on=(...) call, r9 self-review); the schedule-side key
    # duplicates are dropped by Column reference after the join
    out = df.join(F.broadcast(schedule), on=cond, how="left")
    for k in on:
        out = out.drop(schedule[k])
    return out.drop(start_col, end_col)


def asof_join(left: DataFrame, right: DataFrame, ts_col: str = "ts",
              by: Sequence[str] = (), value_cols: Sequence[str] | None = None,
              direction: str = "backward", tolerance=None) -> DataFrame:
    """As-of join: for each left row, the most recent right row at or before
    it (J1: atmospheric-pressure alignment hydrotools.py:369, 546).

    Union + window implementation (no range join): tag sides, union, one
    window per value column carrying the last non-null right value forward
    over ``(by) ORDER BY ts``. One shuffle on ``by``; both sides may be
    arbitrarily large — this is the scale path a broadcast range join
    cannot give. ``direction='forward'`` mirrors with the following value;
    ``tolerance`` (seconds) nulls matches older than the bound.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c != ts_col and c not in by]
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: left side already has column(s) {clash} that "
            "the right side would fill — the old behavior silently "
            "nulled and overwrote the left data; rename the collision "
            "or pass value_cols explicitly")
    b = list(by)
    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(*b, ts_col, *value_cols).withColumn("_side", F.lit(0))
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    missing = [c for c in lhs.columns if c not in rhs.columns]
    for c in missing:
        rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    rhs = rhs.select(*lhs.columns)
    u = lhs.unionByName(rhs)

    asc = direction == "backward"
    order = [F.col(ts_col).asc(), F.col("_side").asc()] if asc else \
        [F.col(ts_col).desc(), F.col("_side").asc()]
    w = (Window.partitionBy(*[F.col(c) for c in b]).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = u
    for c in value_cols:
        filled = F.last(F.col(c), ignorenulls=True).over(w)
        if tolerance is not None:
            # tolerance gates each column's OWN last non-null source
            # timestamp — gating on the last right ROW's timestamp let
            # a stale value pass whenever a newer right row carried a
            # null in that column (r9 self-review). Left rows hold null
            # in c by construction, so the when() below fires only on
            # right rows that actually supplied this column's value.
            # Both expressions reference the PRE-update c (one
            # withColumn projection).
            src = F.last(F.when(F.col(c).isNotNull(), F.col(ts_col)),
                         ignorenulls=True).over(w)
            gap = F.abs(F.col(ts_col).cast("double")
                        - src.cast("double"))
            filled = F.when(gap <= tolerance, filled)
        out = out.withColumn(c, filled)
    return out.where(F.col("_side") == 1).drop("_side")


def union_keep_first(dfs: Sequence[DataFrame], key_cols: Sequence[str],
                     priority_col: str = "_src") -> DataFrame:
    """``pd.concat`` + ``~index.duplicated(keep='first')`` parity
    (J6: hydrotools.py:197-199, 467): union frames in priority order,
    keep the first source's row per key."""
    if not dfs:
        raise ValueError("union_keep_first: no frames given")
    tagged = [d.withColumn(priority_col, F.lit(i)) for i, d in enumerate(dfs)]
    u = tagged[0]
    for d in tagged[1:]:
        u = u.unionByName(d, allowMissingColumns=True)
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(priority_col))
    return (u.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn", priority_col))


def apply_changes(base: DataFrame, changes: DataFrame,
                  key_cols: Sequence[str], ts_col: str = "ts",
                  tiebreak_cols: Sequence[str] = (),
                  delete_col: str | None = None) -> DataFrame:
    """Last-writer-wins CDC merge: apply a change batch onto a snapshot
    (the lakehouse MERGE/upsert primitive — engine add, no reference
    analogue). Per key the surviving row is the latest by
    ``(ts, *tiebreak_cols)``; an exact tie between snapshot and batch
    goes to the BATCH. ``delete_col`` (boolean) tombstones a key when
    its winning row has it set.

    Plan: tag + union + one ``row_number`` per key — a single shuffle
    keyed on ``key_cols`` whose width is the row itself, no join. At
    100 TB: if the snapshot is bucket-stored on ``key_cols``
    (sources/sink.py:write_bucketed_table) and the batch is
    repartitioned to match, the exchange disappears and the merge is a
    per-bucket local sort — the classic merge-on-read compaction shape.
    """
    tagged = [base.withColumn("_src", F.lit(0)),
              changes.withColumn("_src", F.lit(1))]
    u = tagged[0].unionByName(tagged[1], allowMissingColumns=True)
    # _src LAST: it may only break ties on the FULL (ts, *tiebreaks) key
    # — sorting it before the tiebreaks would hand a ts-tie to the batch
    # even when the snapshot row wins on tiebreak_cols.
    order = [F.col(ts_col).desc()] + \
        [F.col(c).desc() for c in tiebreak_cols] + [F.col("_src").desc()]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    out = (u.withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1).drop("_rn", "_src"))
    if delete_col is not None:
        out = out.where(~F.coalesce(F.col(delete_col), F.lit(False)))
    return out


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_cols: tuple[str, str] = ("start", "end"),
                          right_cols: tuple[str, str] = ("start", "end"),
                          bucket: str | float = "1d",
                          how: str = "inner") -> DataFrame:
    """Overlap join between two INTERVAL tables — pairs where
    ``l.start <= r.end AND r.start <= l.end`` — without a theta join.

    Plan: each interval explodes into the coarse time buckets its span
    covers (``sequence`` over bucket indices); candidates meet on equal
    bucket ids (equi-join Catalyst can hash/AQE-optimize), duplicates from
    multi-bucket spans are cut by crediting a pair only in the FIRST
    shared bucket (max of the two start-buckets — no distinct shuffle),
    then the exact predicate filters. Fan-out = span/bucket per row; pick
    ``bucket`` ≈ median span. The equivalent of the range-bucketing
    strategy inside Spark's stream-stream interval joins, for batch.
    """
    from ..functions.timeutils import parse_duration_seconds
    if how != "inner":
        raise ValueError(
            f"interval_overlap_join: how={how!r} is not supported — the "
            "multi-bucket dedup (first-shared-bucket credit) and the "
            "exact overlap predicate run as a POST-JOIN filter, which "
            "silently turns an outer join back into an inner one (and "
            "can duplicate null-extended rows once per exploded "
            "bucket). For left semantics, anti-join the matched left "
            "keys back against the left table and union the remainder.")
    b_us = int((parse_duration_seconds(bucket)
                if isinstance(bucket, str) else float(bucket)) * 1_000_000)
    ls, le = (F.col(f"l.{c}") for c in left_cols)
    rs, re = (F.col(f"r.{c}") for c in right_cols)

    def _bucketed(df: DataFrame, cols: tuple[str, str]) -> DataFrame:
        s = F.unix_micros(F.col(cols[0]))
        e = F.unix_micros(F.col(cols[1]))
        ks = F.floor(s / b_us)
        ke = F.floor(e / b_us)
        return df.withColumn("_kstart", ks).withColumn(
            "_k", F.explode(F.sequence(ks, ke)))

    lb = _bucketed(left, left_cols).alias("l")
    rb = _bucketed(right, right_cols).alias("r")
    first_shared = F.greatest(F.col("l._kstart"), F.col("r._kstart"))
    out = (lb.join(rb, on=(F.col("l._k") == F.col("r._k")), how=how)
           .where((F.col("l._k") == first_shared)
                  & (ls <= re) & (rs <= le)))
    drop = ["_k", "_kstart"]
    for c in drop:
        out = out.drop(F.col(f"l.{c}")).drop(F.col(f"r.{c}"))
    return out


def coalesce_intervals(df: DataFrame, key_cols: Sequence[str] = ("series",),
                       start_col: str = "start",
                       end_col: str = "end") -> DataFrame:
    """Merge overlapping/touching intervals per key into maximal islands
    (the interval-union operator; generalizes the reference's drop-window
    union list, datatools.py:117-141 `subset`/`drop` window handling,
    from literal lists to a distributed table of intervals).

    Gaps-and-islands: one keyed window ordered by (start, end); a row
    opens a new island iff its start exceeds the running max of all
    previous ends (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING — frame max
    is order-insensitive under ties, so the result is deterministic
    even with duplicate starts); the island id is the running sum of
    open flags; islands reduce with min(start)/max(end).

    Scale: the window sorts WITHIN each key only — series count scales
    out across executors, per-series interval counts are the bounded
    dimension (sensor-fleet shape). For a single key with billions of
    intervals, pre-reduce: floor starts to coarse buckets, coalesce per
    bucket, then run this on the (tiny) per-bucket islands.

    Output: ``*key_cols, start_col, end_col, n_merged`` (one row per
    island; n_merged = input intervals absorbed).
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_new", F.when(prev_max.isNull()
                       | (F.col(start_col) > prev_max), 1).otherwise(0))
    island = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (flagged.withColumn("_island", island)
            .groupBy(*keys, F.col("_island"))
            .agg(F.min(start_col).alias(start_col),
                 F.max(end_col).alias(end_col),
                 F.count("*").alias("n_merged"))
            .drop("_island"))
