"""Incremental aggregate maintenance (engine add).

At 100 TB you do not recompute a daily rollup because one late hour of
data arrived — you merge PARTIAL aggregates: keep the rollup table as
(key, sum, count, min, max) partials rather than finished averages, and
fold each new delta batch in with one union + one combinable groupBy.
Algebraic aggregates (sum/count/min/max, hence avg) merge exactly;
the merged table is bit-identical to a full recompute, which is what
the oracle checks.

The same shape is the foreachBatch body for a Structured Streaming
materialized rollup (streaming/demo.py's CDC merge is the row-level
sibling of this aggregate-level merge).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_rollup", "merge_rollups", "finish_rollup"]

_MERGE = {"s": F.sum, "c": F.sum, "mn": F.min, "mx": F.max}


def partial_rollup(df: DataFrame, keys: Sequence[str],
                   value_col: str) -> DataFrame:
    """Partial-aggregate state for ``value_col`` per ``keys``:
    ``s`` (DECIMAL sum — order-proof so repeated merges stay
    bit-stable), ``c``, ``mn``, ``mx``. One combinable groupBy."""
    return df.groupBy(*keys).agg(
        F.sum(F.col(value_col).cast("decimal(30,10)")).alias("s"),
        F.count(value_col).alias("c"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"))


def merge_rollups(base: DataFrame, *deltas: DataFrame) -> DataFrame:
    """Fold delta partials into the base: union + one groupBy re-merge.
    Associative and commutative — any arrival order of deltas yields the
    same table. The shuffle carries only partial rows (one per touched
    key per input), never raw data."""
    out = base
    for d in deltas:
        out = out.unionByName(d)
    keys = [c for c in out.columns if c not in _MERGE]
    return out.groupBy(*keys).agg(
        *[fn(col).alias(col) for col, fn in _MERGE.items()])


def finish_rollup(partials: DataFrame, avg_dp: int = 6) -> DataFrame:
    """Finished view over the partial state: avg = s/c (rounded),
    count, min, max. Kept separate so the STORED table remains
    mergeable."""
    keys = [c for c in partials.columns if c not in _MERGE]
    return partials.select(
        *keys,
        # cast the exact DECIMAL sum to double BEFORE dividing: both
        # engines then perform the same double/int64 division (a decimal
        # division's intermediate scale is engine-specific)
        F.round(F.col("s").cast("double") / F.col("c"), avg_dp)
        .alias("avg_val"),
        F.col("c").alias("n_obs"),
        F.col("mn").alias("min_val"),
        F.col("mx").alias("max_val"))
