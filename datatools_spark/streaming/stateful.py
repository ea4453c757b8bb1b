"""Custom stateful streaming operators via ``applyInPandasWithState``.

SURVEY §2.10: the diurnal-extrema pipeline is watermark-windowable for
plain min/max, but *arg-time* extrema with per-day state and event-time
emission is the canonical "Spark lacks this built-in" stateful shape.
This module maintains per ``(key, day)`` state — running min/max value
and their first-occurrence timestamps — across micro-batches, and emits
exactly one row per group when the event-time watermark passes the end
of its day (EventTimeTimeout), bounding state size by (keys × days
inside watermark).

Arrow-batched (pandas per group), no per-row Python; state is a single
4-tuple per open group.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, StringType, StructField, StructType, TimestampType,
)

__all__ = ["stateful_daily_extrema", "STATE_SCHEMA", "OUT_SCHEMA"]

STATE_SCHEMA = StructType([
    StructField("min_val", DoubleType()),
    StructField("min_time", TimestampType()),
    StructField("max_val", DoubleType()),
    StructField("max_time", TimestampType()),
])

OUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("day", TimestampType()),
    StructField("min_val", DoubleType()),
    StructField("min_time", TimestampType()),
    StructField("max_val", DoubleType()),
    StructField("max_time", TimestampType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Fold this batch's rows into (min,argmin,max,argmax) state; emit on
    event-time timeout. Ties pin to the earliest timestamp (reference
    keep-first semantics, diurnal.py:301-346)."""
    event_type, day = key
    if state.hasTimedOut:
        mn, mnt, mx, mxt = state.get
        state.remove()
        yield pd.DataFrame([{
            "event_type": event_type, "day": day,
            "min_val": mn, "min_time": mnt,
            "max_val": mx, "max_time": mxt,
        }])
        return

    mn = mnt = mx = mxt = None
    if state.exists:
        mn, mnt, mx, mxt = state.get
    for pdf in pdfs:
        pdf = pdf.dropna(subset=["value"])
        if pdf.empty:
            continue
        # batch-local extrema first (vectorized), then fold into state;
        # idxmin/idxmax return the FIRST position on ties only when the
        # frame is time-sorted, so sort by ts for pinned tie-breaks
        pdf = pdf.sort_values("ts", kind="stable")
        bi = pdf["value"].idxmin()
        ba = pdf["value"].idxmax()
        bmn, bmnt = float(pdf["value"][bi]), pdf["ts"][bi]
        bmx, bmxt = float(pdf["value"][ba]), pdf["ts"][ba]
        if mn is None or bmn < mn or (bmn == mn and bmnt < mnt):
            mn, mnt = bmn, bmnt
        if mx is None or bmx > mx or (bmx == mx and bmxt < mxt):
            mx, mxt = bmx, bmxt
    if mn is not None:
        state.update((mn, mnt, mx, mxt))
        # emit once the watermark passes the end of this group's day;
        # ms-from-naive-epoch, NOT .timestamp() (local-tz dependent)
        day_end = (pd.Timestamp(day) + dt.timedelta(days=1)).to_pydatetime()
        day_end_ms = int((day_end.replace(tzinfo=None)
                          - dt.datetime(1970, 1, 1)).total_seconds() * 1000)
        state.setTimeoutTimestamp(day_end_ms)
    yield from ()


def stateful_daily_extrema(events: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming per-day arg-time extrema with explicit state.

    Input: ``ts timestamp, event_type string, value double`` stream.
    Emits one final row per (event_type, day) when the watermark passes
    day end — unlike the incremental-agg twin (demo.streaming_daily_extrema,
    update mode), downstream consumers get exactly-once final rows, the
    contract a hypertable rollup sink wants.
    """
    keyed = (events
             .withWatermark("ts", watermark)
             .withColumn("day", F.date_trunc("DAY", F.col("ts"))))
    return (keyed.groupBy("event_type", "day")
            .applyInPandasWithState(
                _update, OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
