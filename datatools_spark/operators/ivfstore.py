"""Materialized IVF index — the ANN layout AT REST.

`similarity.ivf_search` declares the layout ("write the corpus
partitioned by centroid_id and the probe step becomes a partition-pruned
scan"); this module IS that layout, with the same incremental contract
as the signature stores (sigstore.py): assign each vector to its cell
once, append-only batches, searches read only probed cells.

Layout: ``{path}/centroids`` (the k cell centroids — the model) and
``{path}/data`` partitioned by ``centroid_id``. A search resolves its
probe cells driver-side (model-sized centroid collect, like every
kmeans/codebook sync in similarity.py) and scans ``data`` with a static
``centroid_id IN (...)`` predicate — PartitionFilters prune to
nprobe/k_cells of the files before any IO, which is the whole point of
IVF at 1e9 vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import cosine_expr, ivf_assign

__all__ = ["build_ivf_index", "update_ivf_index", "ivf_index_search"]


def build_ivf_index(spark: SparkSession, df: DataFrame,
                    centroids: DataFrame, path: str,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    centroid_id_col: str = "centroid_id") -> int:
    """Assign every corpus vector to its nearest centroid and write the
    cell-partitioned index (overwrite semantics — building is a full
    [re]index; use :func:`update_ivf_index` for batches). Returns the
    number of indexed vectors."""
    centroids.select(F.col(centroid_id_col), F.col(vec_col)) \
        .write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = ivf_assign(df, centroids, vec_col, id_col, centroid_id_col,
                          keep_vec=True) \
        .select(F.col(id_col), F.col(vec_col), F.col(centroid_id_col))
    assigned.write.mode("overwrite").partitionBy(centroid_id_col) \
        .parquet(f"{path}/data")
    return spark.read.parquet(f"{path}/data").count()


def update_ivf_index(spark: SparkSession, batch: DataFrame, path: str,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     centroid_id_col: str = "centroid_id",
                     batch_is_new: bool = False) -> int:
    """Append a batch's vectors NOT already indexed, assigned with the
    STORED centroids (the index's geometry never silently drifts from
    its model). Idempotent per id — same contract as the signature
    stores. ``batch_is_new=True`` skips the internal stored-id
    anti-join for callers that already filtered the batch (the
    streaming loop does — one store read per micro-batch); pass it only
    with a pre-filtered batch. The assignment is localCheckpoint-
    materialized once, so the count and the write do not each re-run
    the anti-join + assignment plan. Returns the number of newly
    indexed vectors."""
    cents = spark.read.parquet(f"{path}/centroids")
    new = batch
    if not batch_is_new:
        existing = spark.read.parquet(f"{path}/data").select(id_col)
        new = batch.join(existing, id_col, "left_anti")
    assigned = ivf_assign(new, cents, vec_col, id_col, centroid_id_col,
                          keep_vec=True) \
        .select(F.col(id_col), F.col(vec_col), F.col(centroid_id_col)) \
        .localCheckpoint(eager=True)
    n = assigned.count()
    if n:
        assigned.write.mode("append").partitionBy(centroid_id_col) \
            .parquet(f"{path}/data")
    return n


def ivf_index_search(spark: SparkSession, path: str, query: DataFrame,
                     k: int = 10, nprobe: int = 2,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id",
                     centroid_id_col: str = "centroid_id") -> DataFrame:
    """Top-k IVF search against the materialized index: probe cells are
    resolved from the stored centroids (model-sized driver step), the
    data scan carries a STATIC ``centroid_id IN (probed)`` predicate —
    PartitionFilters prune non-probed cells before any file IO (plan-
    asserted in tests) — and each query scores only vectors of its own
    probed cells. Identical results to `similarity.ivf_search` run over
    the same centroids (equality-tested).
    Output: ``query_id, vec_id, cosine, rank``."""
    cents = spark.read.parquet(f"{path}/centroids")
    c = F.broadcast(cents.select(F.col(centroid_id_col),
                                 F.col(vec_col).alias("_cv")))
    qs = (query.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
          .crossJoin(c)
          .withColumn("_cos", cosine_expr(F.col("_qv"), F.col("_cv"))))
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_cos").desc(),
                                                  F.col(centroid_id_col))
    # localCheckpoint, not persist: two consumers (the driver-side cell
    # collect and the scoring join) share one materialization without
    # leaking a cached plan per call — a streaming loop calls this every
    # micro-batch
    probes = (qs.withColumn("_rn", F.row_number().over(wq))
              .where(F.col("_rn") <= nprobe)
              .select(query_id_col, centroid_id_col, "_qv")
              .localCheckpoint(eager=True))
    probe_cells = sorted({r[0] for r in
                          probes.select(centroid_id_col).distinct()
                          .collect()})
    data = (spark.read.parquet(f"{path}/data")
            .where(F.col(centroid_id_col).isin(probe_cells)))
    scored = (data.join(F.broadcast(probes), on=centroid_id_col)
              .withColumn("cosine",
                          cosine_expr(F.col(vec_col), F.col("_qv"))))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cosine", "rank"))
