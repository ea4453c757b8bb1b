"""Skew mitigation helpers (SURVEY §6 design target: 'skewed keys →
salting or AQE skew-join').

AQE's runtime skew-join splitting (enabled in session.py) covers
sort-merge joins automatically; these helpers cover the two cases AQE
does not:

- ``salted_aggregate``: a hash aggregate where a handful of hot keys
  dominate (one reducer drowns). Two-phase: partial agg on
  (key, salt ∈ [0, S)) spreads each hot key over S reducers, then a slim
  final agg on the key merges the partials. Works for any algebraic
  aggregate (sum/count/min/max; avg = sum/count).
- ``salted_join``: big skewed probe side × small-but-not-broadcastable
  build side. The build side is replicated S× with an explicit salt
  column; the probe side picks a random-but-deterministic salt per row,
  so each hot key's rows spread over S join tasks.

Both are pure DataFrame transforms; results are exactly equal to the
unsalted plans (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]

_PARTIAL = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     aggs: Mapping[str, tuple[str, str]],
                     num_salts: int = 16,
                     salt_source: str | None = None) -> DataFrame:
    """Two-phase skew-safe aggregate.

    ``aggs``: ``{out_col: (func, in_col)}`` with func ∈ sum/count/min/max/avg.
    ``salt_source``: a column whose hash supplies the salt (deterministic);
    defaults to a per-row spread via ``monotonically_increasing_id``.
    """
    salt = (F.pmod(F.hash(F.col(salt_source)), F.lit(num_salts))
            if salt_source else
            F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts)))
    work = df.withColumn("_salt", salt)

    partial_exprs, final_exprs = [], []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partial_exprs += [F.sum(col).alias(f"_s_{out}"),
                              F.count(col).alias(f"_c_{out}")]
            final_exprs.append((F.sum(f"_s_{out}") / F.sum(f"_c_{out}")).alias(out))
        else:
            p, f = _PARTIAL[fn]
            partial_exprs.append(p(col).alias(f"_p_{out}"))
            final_exprs.append(f(f"_p_{out}").alias(out))
    partial = work.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: replicate ``small`` over ``num_salts`` salt
    values, salt ``big`` deterministically, join on keys + salt.

    ``how`` accepts inner/left/semi/anti ONLY: the small side is
    REPLICATED, so any join preserving unmatched small rows
    (right/full) would emit each of them once per salt — num_salts
    null-padded duplicates where the unsalted plan emits one."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "semi",
                   "left_anti", "leftanti", "anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            "replicated small-side rows once per salt — only joins "
            "that preserve no unmatched small rows (inner/left/"
            "semi/anti) are salt-safe")
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts)))
    return (big_salted.join(small_rep, on=list(on) + ["_salt"], how=how)
            .drop("_salt"))
