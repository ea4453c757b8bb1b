"""Input-parallelism guard for CPU-heavy map stages.

A parquet file is splittable only at row-group boundaries. A corpus
written as one big row group therefore yields ONE scan task no matter
how many cores the cluster has — and every narrow downstream stage
(shingle explode, per-shingle md5 hashing, tokenization) serializes on
that task. Measured on the sf1-equiv bench corpus (50 k docs, single
row group): the MinHash signature job ran its entire hash stage on one
of 32 cores.

:func:`ensure_parallelism` is the guard the doc-side operators place in
front of their explode/hash stages: if the incoming plan has fewer
partitions than the session's default parallelism, round-robin
repartition the (already column-pruned) input up to core count; else
pass through untouched. At the 100 TB target inputs arrive as many
thousands of splits, so the guard is a structural no-op there — it
exists precisely for the badly-laid-out-input edge that otherwise turns
a cluster into a single core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    ``defaultParallelism``) iff its current plan yields fewer partitions.

    Call it on the narrowest projection you can (after column pruning):
    the round-robin shuffle then moves only the bytes the operator
    actually needs.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
