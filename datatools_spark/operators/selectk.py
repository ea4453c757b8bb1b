"""Exact distributed grouped median via two-pass histogram select-k.

Spark's built-in exact ``median``/``percentile`` is a
TypedImperativeAggregate: every value of a group is buffered and
serialized through the shuffle, so a hot group concentrates its entire
value set on one reducer — the one place the velocity kernel
(operators/velocity.py, reference gpstools.py:875-892 semantics) still
paid an all-rows shuffle at scale. ``percentile_approx`` fixes the
shuffle but is approximate, and the hash-parity queries need exact.

This module computes the EXACT median with bounded shuffles:

1. pass 0 — per-group ``(count, min, max)``: plain hash aggregate,
   map-side combinable, shuffle = one row per group;
2. pass 1 — per-(group, bin) histogram counts over ``bins`` equal-width
   bins of the group's own [min, max] (integer-quantized): hash
   aggregate, shuffle = occupied bins per group (≤ ``bins``); a window
   over this SMALL table finds the bin(s) holding the two middle ranks
   and the rank offset before them;
3. pass 2 — only rows falling in a group's target-bin range survive a
   broadcast semi-join (expected ≈ n/bins of the data, with heavy
   duplicate mass handled exactly: equal values collapse into one bin
   whose bounds pin them); a per-group window sort of the SURVIVORS
   picks the middle one/two rows and averages them.

Even-count groups average the two middle order statistics — the same
interpolation as Spark ``median`` and DuckDB ``median`` on doubles, so
results hash-match both. The raw data is scanned three times but
SHUFFLED never: the only exchanges carry per-group scalars, per-bin
counts, and ≈n/bins survivor rows. Worst case (all survivors in one
bin because the group is a single repeated value) short-circuits: the
bin's min == max ⇒ median is that value without a sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_grouped_median", "exact_grouped_quantiles"]


def exact_grouped_median(df: DataFrame, group_cols: Sequence[str],
                         value_col: str = "value", bins: int = 4096,
                         out_col: str = "median") -> DataFrame:
    """Exact per-group median of ``value_col`` with bounded shuffles.

    Returns one row per group: ``group_cols + (out_col,)``. Equality
    with ``F.median`` is property-tested (tests/test_properties.py).
    """
    g = list(group_cols)
    base = df.where(F.col(value_col).isNotNull()) \
        .select(*g, F.col(value_col).alias("_v"))

    # pass 0: group extent + the two middle ranks (1-based)
    ext = (base.groupBy(*g)
           .agg(F.count("*").alias("_n"), F.min("_v").alias("_lo"),
                F.max("_v").alias("_hi")))
    k1 = (F.col("_n") + 1) / 2  # floor later; for odd n both ranks equal
    ext = ext.select(*g, "_n", "_lo", "_hi",
                     F.floor(k1).cast("bigint").alias("_k1"),
                     (F.floor(F.col("_n") / 2) + 1).cast("bigint").alias("_k2"))

    # helper: bin index of a value within its group's [lo, hi]
    def _bin(v):
        span = F.col("_hi") - F.col("_lo")
        raw = F.when(span <= 0, F.lit(0)).otherwise(
            F.floor((v - F.col("_lo")) / span * bins).cast("bigint"))
        return F.least(raw, F.lit(bins - 1))

    # pass 1: histogram + locate target bins per group. Bin value
    # min/max ride the same combinable agg: they power the heavy-
    # duplicate short-circuit below at no extra pass.
    hist = (base.join(F.broadcast(ext), on=g)
            .groupBy(*g, _bin(F.col("_v")).alias("_b"))
            .agg(F.count("*").alias("_c"),
                 F.min("_v").alias("_bmin"), F.max("_v").alias("_bmax")))
    wcum = Window.partitionBy(*g).orderBy("_b") \
        .rowsBetween(Window.unboundedPreceding, -1)
    hist = (hist.join(F.broadcast(ext.select(*g, "_k1", "_k2")), on=g)
            .withColumn("_before", F.coalesce(F.sum("_c").over(wcum), F.lit(0))))
    inbin = F.col("_before") < F.col("_k2")
    covers = (F.col("_before") + F.col("_c")) >= F.col("_k1")
    targets = (hist.where(inbin & covers)
               .groupBy(*g)
               .agg(F.min("_b").alias("_b_lo"), F.max("_b").alias("_b_hi"),
                    F.min("_before").alias("_skipped"),
                    F.min("_bmin").alias("_tmin"),
                    F.max("_bmax").alias("_tmax")))
    # lazy checkpoint: targets feeds BOTH the survivor filter and the
    # final coalesce — group-sized blocks cache at first materialization
    # instead of re-running the corpus-sized histogram per consumer
    targets = targets.localCheckpoint(eager=False)

    # heavy-duplicate short-circuit (the module contract's worst case):
    # when every value in the target-bin range is the SAME value — a
    # group dominated by one repeated value whose bin holds the median
    # — both middle ranks are that value, so the median is known
    # without ranking. Excluding those groups from the survivor set is
    # what keeps the window sort bounded: otherwise ~all of a hot
    # group's rows landed on ONE reducer — exactly the shuffle
    # concentration this module exists to avoid.
    shortcut = F.col("_tmin") == F.col("_tmax")

    # pass 2: survivors = rows in the target-bin range; rank them
    spec = targets.join(ext, on=g)
    surv = (base.join(F.broadcast(spec.where(~shortcut)), on=g)
            .where(_bin(F.col("_v")).between(F.col("_b_lo"), F.col("_b_hi"))))
    wr = Window.partitionBy(*g).orderBy("_v")
    picked = (surv.withColumn("_r", F.row_number().over(wr) + F.col("_skipped"))
              .where((F.col("_r") == F.col("_k1"))
                     | (F.col("_r") == F.col("_k2"))))
    med = picked.groupBy(*g).agg(F.avg("_v").alias("_srt"))
    return (targets.join(med, on=g, how="left")
            .select(*g, F.coalesce(F.col("_srt"), F.col("_tmin"))
                    .alias(out_col)))


def exact_grouped_quantiles(df: DataFrame, group_cols: Sequence[str],
                            value_col: str, probs: Sequence[float],
                            bins: int = 4096,
                            out_cols: Sequence[str] | None = None) -> DataFrame:
    """Exact continuous per-group quantiles with bounded shuffles — the
    select-k generalization of :func:`exact_grouped_median`.

    Interpolation is bit-identical to Spark ``percentile``:
    ``pos = 1 + (n−1)·p`` and ``v = (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi``
    (the exact operand order of Percentile.getPercentile; ``v_lo`` alone
    when ⌈pos⌉ = ⌊pos⌋) on the two bracketing order statistics. Each requested prob needs ≤2 ranks, each rank
    lives in exactly one histogram bin, so survivors are
    ≈ ``2·len(probs)·n/bins`` rows even when the probs span the whole
    distribution (survivor bins are NON-contiguous; global rank is
    reconstructed per bin as ``rows-before-bin + rank-within-bin``, so
    nothing between the quantiles is ever shuffled).
    Returns one row per group: ``group_cols + out_cols``.
    """
    g = list(group_cols)
    probs = list(probs)
    out_cols = list(out_cols) if out_cols is not None else \
        [f"p{int(p * 100)}" for p in probs]
    base = df.where(F.col(value_col).isNotNull()) \
        .select(*g, F.col(value_col).alias("_v"))

    ext = (base.groupBy(*g)
           .agg(F.count("*").alias("_n"), F.min("_v").alias("_lo"),
                F.max("_v").alias("_hi")))
    rank_cols, need = [], []
    for i, p in enumerate(probs):
        pos = F.lit(1.0) + (F.col("_n") - 1) * F.lit(float(p))
        rank_cols += [F.floor(pos).cast("bigint").alias(f"_rlo{i}"),
                      F.ceil(pos).cast("bigint").alias(f"_rhi{i}"),
                      pos.alias(f"_pos{i}")]
        need += [F.col(f"_rlo{i}"), F.col(f"_rhi{i}")]
    ext = ext.select(*g, "_n", "_lo", "_hi", *rank_cols)

    def _bin(v):
        span = F.col("_hi") - F.col("_lo")
        raw = F.when(span <= 0, F.lit(0)).otherwise(
            F.floor((v - F.col("_lo")) / span * bins).cast("bigint"))
        return F.least(raw, F.lit(bins - 1))

    hist = (base.join(F.broadcast(ext), on=g)
            .groupBy(*g, _bin(F.col("_v")).alias("_b"))
            .agg(F.count("*").alias("_c")))
    wcum = Window.partitionBy(*g).orderBy("_b") \
        .rowsBetween(Window.unboundedPreceding, -1)
    hist = (hist.join(F.broadcast(ext), on=g)
            .withColumn("_before", F.coalesce(F.sum("_c").over(wcum), F.lit(0))))
    holds = None
    for r in need:
        h = (F.col("_before") < r) & ((F.col("_before") + F.col("_c")) >= r)
        holds = h if holds is None else (holds | h)
    targets = (hist.where(holds)
               .select(*g, "_b", "_before"))

    surv = (base.join(F.broadcast(ext), on=g)
            .withColumn("_b", _bin(F.col("_v")))
            .join(F.broadcast(targets), on=g + ["_b"]))
    wr = Window.partitionBy(*g, "_b").orderBy("_v")
    ranked = surv.withColumn("_r", F.row_number().over(wr) + F.col("_before"))
    aggs = []
    for i in range(len(probs)):
        vlo = F.max(F.when(F.col("_r") == F.col(f"_rlo{i}"), F.col("_v")))
        vhi = F.max(F.when(F.col("_r") == F.col(f"_rhi{i}"), F.col("_v")))
        pos = F.first(F.col(f"_pos{i}"))
        rlo = F.first(F.col(f"_rlo{i}")).cast("double")
        rhi = F.first(F.col(f"_rhi{i}")).cast("double")
        v = F.when(F.first(F.col(f"_rhi{i}")) == F.first(F.col(f"_rlo{i}")),
                   vlo).otherwise((rhi - pos) * vlo + (pos - rlo) * vhi)
        aggs.append(v.alias(out_cols[i]))
    return ranked.groupBy(*g).agg(*aggs)
