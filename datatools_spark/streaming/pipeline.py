"""Composite streaming pipeline over one events file-stream: sessionize
+ CMS frequency ingest + drift monitor — the wiring template for a
continuously-ingesting events table (r8 VERDICT #6: the three twins
existed separately; a user combining them had no template).

One parquet source directory feeds THREE independent queries, each with
its own checkpoint — the standard Structured Streaming fan-out (a
source is re-readable; per-query checkpoints track progress
independently, so one consumer failing/retrying never stalls the
others):

- sessions: gap-based sessionization (``streaming_sessionize``,
  session-window state per open session only).
- frequency: every micro-batch folds item occurrences into the at-rest
  Count-Min store (``streaming_cms_ingest``; exactly-once via the
  per-writer watermark ledger; sketch stays d·w cells forever).
- drift: per-micro-batch PSI vs a frozen baseline
  (``streaming_drift_monitor``; stateless, broadcast-sized reference).

All three run with ``availableNow`` (drain the backlog, then stop) so
the composite doubles as a batch-catchup job; swap the trigger for
continuous operation. Example: examples/streaming_pipeline.py;
batch-equivalence of the composite is pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .demo import run_file_stream, streaming_cms_ingest, streaming_sessionize
from .monitor import streaming_drift_monitor

__all__ = ["run_events_pipeline"]


def run_events_pipeline(spark: SparkSession, src_dir: str, schema,
                        work_dir: str, baseline, *,
                        gap: str = "30 minutes",
                        session_key: str = "event_type",
                        item_col: str = "event_type",
                        key_col: str = "event_type",
                        value_col: str = "value",
                        max_files_per_trigger: int = 1,
                        timeout_s: int = 300) -> dict:
    """Drive the three consumers over ``src_dir`` and await all.

    ``baseline`` is the frozen reference distribution for the drift
    monitor (``monitor.baseline_histogram`` output — compute it ONCE
    from a reference corpus, not from the stream). Returns
    ``{"sessions", "cms_store", "drift_log"}`` output paths; sessions
    land as parquet, the CMS store reads back via
    ``sketches.read_cms_store``, the drift log is an append-only
    ``batch_id, key, psi, n_batch`` parquet table."""
    paths = {"sessions": f"{work_dir}/sessions",
             "cms_store": f"{work_dir}/cms_store",
             "drift_log": f"{work_dir}/drift_log"}
    qs = [
        run_file_stream(
            spark, src_dir, schema,
            lambda d: streaming_sessionize(d, gap=gap, key=session_key),
            paths["sessions"], f"{work_dir}/ck_sessions"),
        streaming_cms_ingest(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", int(max_files_per_trigger))
            .parquet(src_dir),
            paths["cms_store"], f"{work_dir}/ck_cms", item_col),
        streaming_drift_monitor(
            spark, src_dir, schema, baseline, paths["drift_log"],
            f"{work_dir}/ck_drift", key_col=key_col, value_col=value_col,
            max_files_per_trigger=max_files_per_trigger),
    ]
    try:
        for q in qs:
            q.awaitTermination(timeout_s)
            if q.isActive:       # drain did not finish: fail loudly
                raise TimeoutError(
                    f"streaming pipeline query {q.name or q.id} still "
                    f"active after {timeout_s}s")
    finally:
        # stop EVERY query on the way out, not just the one that timed
        # out — siblings left running keep holding the checkpoints and
        # appending to the sinks after the caller saw the failure, and
        # a retry then collides with the still-active checkpoint dirs
        for q in qs:
            if q.isActive:
                q.stop()
    return paths
