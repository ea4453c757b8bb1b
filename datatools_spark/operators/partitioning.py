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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ensure_parallelism", "input_bytes", "quantize_fixed",
           "morton_key", "layout_zorder"]


def ensure_parallelism(df: DataFrame, min_parts: int | None = None,
                       min_bytes: int = 2 << 20) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    ``defaultParallelism``) iff its current plan yields fewer partitions
    AND the input is big enough for the spread to pay.

    Call it on the narrowest projection you can (after column pruning):
    the round-robin shuffle then moves only the bytes the operator
    actually needs.

    The ``min_bytes`` gate (metadata-only: sums the scan's file sizes,
    no job) skips the repartition for small inputs, where one core
    finishes the map stage faster than the extra full-row shuffle
    amortizes — measured: a 0.6 MB doc corpus paid 1.5× on simhash for
    a guard that exists to rescue multi-MB single-row-group inputs.
    Unknown sizes (non-local paths, non-file sources) fall through to
    the repartition: at real scale misjudging "small" is the costly
    direction.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    total = input_bytes(df)
    if total is not None and total < min_bytes:
        return df
    return df.repartition(target)


def input_bytes(df: DataFrame) -> int | None:
    """Best-effort input size from scan FILE metadata (no job): sum of
    the local files feeding ``df``'s scan. ``None`` when unknown
    (non-local paths, non-file sources, empty file list) — callers must
    treat unknown as BIG, since misjudging "small" is the costly
    direction at scale."""
    try:
        import os
        from urllib.parse import unquote, urlparse
        total = 0
        for f in df.inputFiles():
            p = urlparse(f)
            if p.scheme not in ("", "file"):
                return None
            total += os.path.getsize(unquote(p.path))
        return total or None
    except Exception:  # noqa: BLE001
        return None


def quantize_fixed(col: Column, lo: Column, hi: Column,
                   bits: int = 16) -> Column:
    """Map ``col`` ∈ [lo, hi] onto the integer grid [0, 2^bits) using
    INTEGER-ONLY arithmetic (``(col−lo)·(2^bits−1) // (hi−lo)``) so the
    result is bit-exact in any engine — a float-multiply-then-floor
    formulation can flap by 1 ulp between Spark and a DuckDB oracle.
    Inputs must already be integral (bigint epochs, ids, scaled ints).
    """
    span = F.greatest(hi - lo, F.lit(1)).cast("bigint")
    # exactness requires scaled ≤ 2^53 (beyond that the bigint→double
    # conversion in the division itself rounds), so refuse wider domains
    # instead of silently returning engine-dependent keys. The guard is
    # woven into the clamp bound so the optimizer cannot prune it.
    max_span = (1 << 53) // ((1 << bits) - 1)
    hi_checked = F.when(span <= F.lit(max_span), hi.cast("bigint")).otherwise(
        F.raise_error(F.lit(
            f"quantize_fixed: domain span exceeds {max_span} "
            f"(2^53/(2^{bits}-1)) — the exact-division guarantee breaks; "
            f"reduce bits or pre-scale the column")).cast("bigint"))
    # clamp into [lo, hi] BEFORE scaling: the output is clamped to the
    # grid anyway, and an out-of-domain value could overflow `scaled`
    colc = F.least(F.greatest(col.cast("bigint"), lo.cast("bigint")),
                   hi_checked)
    scaled = (colc - lo.cast("bigint")) * F.lit((1 << bits) - 1)
    # exact integer division: subtract the remainder first so the double
    # division Spark performs on bigints is of an exact multiple (≤2^53)
    q = ((scaled - F.pmod(scaled, span)) / span).cast("bigint")
    clamped = F.least(F.greatest(q, F.lit(0)), F.lit((1 << bits) - 1))
    # NULL propagates: greatest/least SKIP null arguments, so a null
    # input silently clamped to lo and mapped to grid cell 0 — a bogus
    # z-order key where the SQL oracle's plain arithmetic yields NULL
    return F.when(col.isNotNull(), clamped)


def morton_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: bit-interleave ``n`` already-quantized
    dimension columns (each in [0, 2^bits)) into one bigint.

    Pure shift/and/or expression tree — whole-stage-codegen'd, no UDF;
    ``n·bits`` must fit a signed 64-bit key (n·bits ≤ 62). Bit ``b`` of
    dimension ``i`` lands at position ``b·n + i``, so a sort by the key
    is a space-filling-curve order over the joint domain: rows close in
    ALL dimensions land in the same parquet row group, and min/max
    row-group stats prune range predicates on ANY dimension subset —
    the standard multi-dimensional layout for 100 TB scans (same
    technique as Delta/Iceberg Z-ordering, here as a plain column).
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"morton key needs {n * bits} bits; max 62")
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        cb = c.cast("bigint")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(cb, b).bitwiseAND(F.lit(1)), b * n + i)
    return key


def layout_zorder(df: DataFrame, key: Column, num_files: int | None = None,
                  key_col: str = "_zkey") -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by a (Morton)
    key so each output file owns a compact key range and every file/
    row group carries tight min-max stats on the key — the scan-side
    contract that makes multi-dimensional predicates prune at rest.
    Pair with ``.write.parquet`` (or a partitioned sink from
    ``sources/sink.py``); ``num_files`` bounds output file count.
    """
    out = df.withColumn(key_col, key)
    parts = num_files or out.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(parts, F.col(key_col))
            .sortWithinPartitions(key_col))
