"""End-to-end STREAMING pipeline on the events table: one parquet
file-stream fanned out to sessionization, Count-Min frequency ingest,
and a PSI drift monitor — the template for wiring the engine's
streaming twins together over a continuously-ingesting source.

Shape (datatools_spark.streaming.pipeline.run_events_pipeline):

  events files ──► sessionize (session_window)   ──► sessions table
               ├─► CMS ingest (watermark ledger)  ──► at-rest sketch store
               └─► drift monitor (PSI vs frozen)  ──► append-only log

The baseline histogram is frozen from the FIRST HALF of the corpus (the
"historical" data); the stream then delivers the second half in
per-file micro-batches, which is where a drift alert would fire on a
real corpus shift.

Run:  python examples/streaming_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datatools_spark.operators.sketches import cms_estimate, read_cms_store
from datatools_spark.queries import _t
from datatools_spark.session import get_spark
from datatools_spark.streaming.monitor import baseline_histogram
from datatools_spark.streaming.pipeline import run_events_pipeline


def main() -> None:
    spark = get_spark("datatools-streaming-example")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id", "value")

    work = tempfile.mkdtemp(prefix="streaming_pipeline_")
    try:
        # freeze the reference distribution on the historical half;
        # stream the rest in 4 per-file micro-batches
        mid = ev.select(F.percentile_approx("ts", 0.5)).collect()[0][0]
        hist, live = ev.where(F.col("ts") <= mid), ev.where(F.col("ts") > mid)
        src = f"{work}/src"
        live.repartition(4).write.parquet(src)
        baseline = baseline_histogram(hist, key_col="event_type",
                                      value_col="value")

        paths = run_events_pipeline(spark, src, live.schema, work,
                                    baseline)

        sessions = spark.read.parquet(paths["sessions"])
        print(f"sessions: {sessions.count()} "
              f"(by {sessions.columns[0]}; gap 30 min)")
        sessions.orderBy(F.desc("n_events")).show(5, truncate=False)

        probes = live.select("event_type").distinct()
        est = cms_estimate(read_cms_store(spark, paths["cms_store"]),
                           probes, "event_type")
        exact = live.groupBy("event_type").agg(F.count("*").alias("exact"))
        print("CMS store estimates vs exact counts (never undercounts):")
        est.join(exact, "event_type").orderBy("event_type") \
           .show(truncate=False)

        print("drift log (PSI per micro-batch vs frozen baseline; "
              "alert rule would tail this):")
        spark.read.parquet(paths["drift_log"]) \
             .orderBy("batch_id", "event_type").show(20, truncate=False)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
