"""Streaming-vs-batch equivalence: the streaming window aggregations must
produce exactly the batch results when fed the same data through a file
stream (availableNow trigger)."""

import datetime as dt
import math

import pytest

from datatools_spark.streaming.demo import (
    run_file_stream, streaming_daily_extrema, streaming_sessionize,
    streaming_window_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(500):
        ts = t0 + dt.timedelta(minutes=7 * i)
        rows.append((i, ts, ["click", "view"][i % 2],
                     math.sin(i / 10.0) * 5 + 10))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double")
    src = str(base / "src")
    df.repartition(4).write.parquet(src)
    return base, src, df


def _run(spark, base, src, schema, transform, name):
    out = str(base / f"out_{name}")
    ckpt = str(base / f"ckpt_{name}")
    q = run_file_stream(spark, src, schema, transform, out, ckpt)
    q.awaitTermination(120)
    return spark.read.parquet(out)


def _rounded(df):
    # float aggregation order differs between incremental streaming state
    # and the batch plan — compare at 1e-6
    rows = [tuple(round(v, 6) if isinstance(v, float) else v for v in r)
            for r in df.collect()]
    return sorted(rows)


def test_streaming_window_counts_equals_batch(spark, events_dir):
    base, src, df = events_dir
    got = _run(spark, base, src, df.schema, streaming_window_counts, "counts")
    expect = streaming_window_counts(df)   # same plan, batch source
    assert _rounded(got) == _rounded(expect)


def test_streaming_daily_extrema_equals_batch(spark, events_dir):
    base, src, df = events_dir
    got = _run(spark, base, src, df.schema, streaming_daily_extrema, "extrema")
    expect = streaming_daily_extrema(df)
    assert _rounded(got) == _rounded(expect)


def test_streaming_sessionize_equals_batch(spark, events_dir):
    from pyspark.sql import Window
    import pyspark.sql.functions as F
    base, src, df = events_dir
    tr = lambda d: streaming_sessionize(d, key="event_type")  # noqa: E731
    got = _run(spark, base, src, df.schema, tr, "sessions")
    expect = tr(df)
    assert _rounded(got) == _rounded(expect)
    # cross-check against the batch lag-gap formulation (ts_sessionize
    # shape): same session count and per-session event totals
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    lagged = (df.withColumn("_new", F.when(gap.isNull() | (gap > 1800), 1)
                            .otherwise(0))
              .withColumn("_s", F.sum("_new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    lag_sessions = sorted(
        (r.event_type, r.n) for r in
        lagged.groupBy("event_type", "_s").agg(F.count("*").alias("n"))
        .collect())
    sw_sessions = sorted((r.event_type, r.n_events) for r in got.collect())
    assert lag_sessions == sw_sessions
