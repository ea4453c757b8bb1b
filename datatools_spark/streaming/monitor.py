"""Streaming data-quality monitoring: per-micro-batch distribution
drift against a frozen baseline — the gate a continuously-ingesting
training pipeline runs BEFORE appending a new crawl window to the
corpus (batch twin: the ``ts_drift_psi`` query).

Design for unbounded streams: the baseline (per-key value-histogram
anchors + bin masses) is computed ONCE from a reference DataFrame and
collected to the driver — it is a (keys × bins)-row table, not data —
then rides into every micro-batch as a broadcast-sized literal join.
Each batch pays two map-side-combinable aggregates over its own rows;
no state store grows with the stream (the monitor is stateless by
construction: drift is batch-vs-baseline, never batch-vs-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["baseline_histogram", "batch_psi", "streaming_drift_monitor"]

_BINS = 10


def baseline_histogram(df: DataFrame, key_col: str = "event_type",
                       value_col: str = "value",
                       bins: int = _BINS) -> DataFrame:
    """Per-key equal-width histogram of ``value_col``: the frozen
    reference distribution. Output: one row per (key, bin) with the
    key's [lo, hi] anchors carried on every row (so a consumer needs no
    second table): ``key, bin, cnt, lo, hi, n``."""
    v = df.where(F.col(value_col).isNotNull())
    ext = v.groupBy(key_col).agg(F.min(value_col).alias("lo"),
                                 F.max(value_col).alias("hi"),
                                 F.count("*").alias("n"))
    j = v.join(F.broadcast(ext), key_col)
    b = F.when(F.col("hi") > F.col("lo"),
               F.least(F.floor((F.col(value_col) - F.col("lo"))
                               / (F.col("hi") - F.col("lo")) * bins)
                       .cast("bigint"), F.lit(bins - 1))).otherwise(F.lit(0))
    return (j.withColumn("bin", b)
            .groupBy(key_col, "bin", "lo", "hi", "n")
            .agg(F.count("*").alias("cnt")))


def batch_psi(batch: DataFrame, baseline: DataFrame,
              key_col: str = "event_type", value_col: str = "value",
              bins: int = _BINS) -> DataFrame:
    """Smoothed PSI of ``batch``'s value distribution vs ``baseline``
    (from :func:`baseline_histogram`), per key. Bins are anchored on the
    BASELINE's [lo, hi] — the batch is binned into the reference grid,
    so drift outside the historical range lands in the edge bins instead
    of silently re-anchoring. Missing bins count 0 on either side
    (0.5/bins·0.5-smoothed); keys absent from the baseline are skipped
    (no reference — emit nothing rather than a fake number), and so are
    baseline keys with NO batch rows: zero observations carry no drift
    evidence, but the smoothed q collapses to the uniform 1/bins
    distribution and emitted a large fake "drift" row for every quiet
    key in every micro-batch (r9 self-review).
    Output: ``key, psi, n_batch`` (keys with batch data only)."""
    anchors = baseline.select(key_col, "lo", "hi", "n").distinct()
    v = batch.where(F.col(value_col).isNotNull())
    j = v.join(F.broadcast(anchors), key_col)
    b = F.when(F.col("hi") > F.col("lo"),
               F.greatest(F.least(
                   F.floor((F.col(value_col) - F.col("lo"))
                           / (F.col("hi") - F.col("lo")) * bins)
                   .cast("bigint"), F.lit(bins - 1)), F.lit(0))) \
        .otherwise(F.lit(0))
    bc = (j.withColumn("bin", b)
          .groupBy(key_col, "bin").agg(F.count("*").alias("bcnt")))
    nb = bc.groupBy(key_col).agg(F.sum("bcnt").alias("n_batch"))
    # dense (key × bin) grid so zero bins contribute their smoothed mass
    grid = (anchors.select(key_col, "n")
            .crossJoin(F.broadcast(
                baseline.sparkSession.range(bins).select(
                    F.col("id").alias("bin")))))
    full = (grid.join(baseline.select(key_col, "bin",
                                      F.col("cnt").alias("rcnt")),
                      [key_col, "bin"], "left")
            .join(bc, [key_col, "bin"], "left")
            .join(F.broadcast(nb), key_col, "left")
            .fillna(0, ["rcnt", "bcnt", "n_batch"]))
    p = (F.col("rcnt") + 0.5) / (F.col("n") + 0.5 * bins)
    q = (F.col("bcnt") + 0.5) / (F.col("n_batch") + 0.5 * bins)
    term = F.round((q - p) * F.log(q / p), 10).cast("decimal(38,10)")
    return (full.withColumn("_t", term)
            .groupBy(key_col)
            .agg(F.round(F.sum("_t").cast("double"), 6).alias("psi"),
                 F.max("n_batch").alias("n_batch"))
            .where(F.col("n_batch") > 0))


def streaming_drift_monitor(spark: SparkSession, src_dir: str, schema,
                            baseline: DataFrame, log_dir: str,
                            checkpoint_dir: str,
                            key_col: str = "event_type",
                            value_col: str = "value",
                            bins: int = _BINS,
                            max_files_per_trigger: int | None = None):
    """Attach the PSI monitor to a parquet file stream: every micro-batch
    appends one row per key to ``log_dir`` — ``batch_id, key, psi,
    n_batch`` — the drift time-series an alerting rule tails.

    The baseline is materialized eagerly (driver-side localCheckpoint of
    a keys×bins table) so micro-batches never re-aggregate the
    reference data. Append-mode parquet sink: the log is itself a table
    (monitor the monitor). Returns the started query (availableNow when
    ``max_files_per_trigger`` is None; caller awaits)."""
    base = baseline.localCheckpoint(eager=True)

    def _watch(batch_df: DataFrame, batch_id: int):
        out = batch_psi(batch_df, base, key_col, value_col, bins)
        (out.withColumn("batch_id", F.lit(batch_id))
            .select("batch_id", key_col, "psi", "n_batch")
            .write.mode("append").parquet(log_dir))

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    # availableNow drains the source then stops; with maxFilesPerTrigger
    # set it still chunks the backlog into several micro-batches, which
    # is how the test drives a multi-batch log deterministically
    return (stream.writeStream
            .outputMode("append")
            .foreachBatch(_watch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
