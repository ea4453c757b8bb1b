"""Similarity search over embedding columns (driver-mandated extension).

Embeddings are ``array<float>`` columns. Dot products / norms are computed
with higher-order functions (``zip_with`` + ``aggregate``) — JVM-side,
codegen-friendly, no UDFs, so a 100 TB scan streams through whole-stage
codegen without Python in the loop.

Paths:
- brute-force top-k: broadcast the query vector(s), score every row, one
  ``row_number`` cut — the exact baseline.
- hyperplane-LSH buckets: deterministic pseudo-random hyperplanes
  (``sin(i·97 + j·31)`` components — reproducible in any engine, no RNG
  state) assign each vector a sign-pattern bucket; candidate search only
  touches matching buckets. The scale path: bucket count 2^H bounds each
  join partition.
- IVF-style coarse quantization: assign to nearest of k sampled centroid
  rows, search within the assigned cell (probe=1) — demonstrates the
  partition-pruned ANN layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot_expr", "norm_expr", "cosine_expr", "knn_brute_force",
    "hyperplane_bucket_col", "knn_lsh", "ivf_assign", "ivf_search",
]


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def knn_brute_force(df: DataFrame, query: DataFrame, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``query``: ``(query_id, embedding)`` — small, broadcast. One scan of
    the corpus, per-query ``row_number`` cut (ties broken by id for
    determinism). Output: ``query_id, vec_id, cosine, rank``.
    """
    q = F.broadcast(query.select(F.col(query_id_col),
                                 F.col(vec_col).alias("_qv")))
    scored = (df.select(F.col(id_col), F.col(vec_col)).crossJoin(q)
              .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("_qv"))))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cosine", "rank"))


def _plane_component(h: int, j: Column | int) -> Column:
    """Deterministic hyperplane h component j: sin(h·97 + j·31) — portable
    to any engine (the DuckDB oracle reproduces it verbatim)."""
    jj = F.lit(j) if isinstance(j, int) else j
    return F.sin(F.lit(h * 97).cast("double") + jj.cast("double") * 31.0)


def hyperplane_bucket_col(vec_col: str, num_planes: int = 4) -> Column:
    """Sign-pattern bucket id in [0, 2^num_planes): bit h = 1 iff
    dot(vec, plane_h) > 0."""
    v = F.col(vec_col)
    bucket = None
    for h in range(num_planes):
        proj = F.aggregate(
            F.zip_with(v, F.transform(F.sequence(F.lit(0), F.size(v) - 1),
                                      lambda j: _plane_component(h, j)),
                       lambda x, p: x * p),
            F.lit(0.0), lambda acc, t: acc + t)
        bit = F.when(proj > 0, F.lit(1 << h)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def knn_lsh(df: DataFrame, query: DataFrame, k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            query_id_col: str = "query_id", num_planes: int = 4) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket are scored. Recall < 1 by construction; bucket size ≈ n/2^H
    bounds work. Same output schema as brute force."""
    corpus = df.withColumn("_bkt", hyperplane_bucket_col(vec_col, num_planes))
    q = F.broadcast(query
                    .withColumn("_bkt", hyperplane_bucket_col(vec_col, num_planes))
                    .select(F.col(query_id_col), F.col(vec_col).alias("_qv"),
                            F.col("_bkt")))
    scored = (corpus.join(q, on="_bkt")
              .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("_qv"))))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cosine", "rank"))


def ivf_assign(df: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id",
               centroid_id_col: str = "centroid_id") -> DataFrame:
    """IVF coarse assignment: each vector → nearest centroid (max cosine).

    ``centroids``: small ``(centroid_id, embedding)`` — broadcast; one
    scan, ``max_by`` per row group. Writing the output partitioned by
    ``centroid_id`` gives the partition-pruned ANN layout at rest.
    """
    c = F.broadcast(centroids.select(
        F.col(centroid_id_col), F.col(vec_col).alias("_cv")))
    scored = (df.crossJoin(c)
              .withColumn("_cos", cosine_expr(F.col(vec_col), F.col("_cv"))))
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col(centroid_id_col))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col(id_col), F.col(centroid_id_col), F.col("_cos").alias("cosine")))


def ivf_search(df: DataFrame, centroids: DataFrame, query: DataFrame,
               k: int = 10, nprobe: int = 2,
               vec_col: str = "embedding", id_col: str = "vec_id",
               query_id_col: str = "query_id",
               centroid_id_col: str = "centroid_id") -> DataFrame:
    """Full IVF top-k search: probe the ``nprobe`` nearest cells per query.

    1. Corpus → cell via :func:`ivf_assign` (one broadcast scan).
    2. Each query → its ``nprobe`` nearest centroids (cos desc,
       centroid_id asc tie-break).
    3. Score only corpus vectors living in a probed cell; ``row_number``
       cut to top-k per query (ties by id).

    At rest, write the corpus partitioned by ``centroid_id``: step 3 then
    becomes a partition-pruned scan of nprobe/k_cells of the data — the
    canonical distributed-ANN layout. Output:
    ``query_id, vec_id, cosine, rank``.
    """
    assigned = ivf_assign(df, centroids, vec_col, id_col, centroid_id_col)
    corpus = df.select(F.col(id_col), F.col(vec_col)) \
        .join(assigned.select(id_col, centroid_id_col), id_col)
    c = F.broadcast(centroids.select(F.col(centroid_id_col),
                                     F.col(vec_col).alias("_cv")))
    qs = (query.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
          .crossJoin(c)
          .withColumn("_cos", cosine_expr(F.col("_qv"), F.col("_cv"))))
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_cos").desc(),
                                                  F.col(centroid_id_col))
    probes = (qs.withColumn("_rn", F.row_number().over(wq))
              .where(F.col("_rn") <= nprobe)
              .select(query_id_col, centroid_id_col, "_qv"))
    scored = (corpus.join(F.broadcast(probes), on=centroid_id_col)
              .withColumn("cosine", cosine_expr(F.col(vec_col), F.col("_qv"))))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cosine", "rank"))
