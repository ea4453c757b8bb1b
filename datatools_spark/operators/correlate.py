"""Cross-series correlation operators: lagged cross-correlation and the
Theil–Sen robust trend.

Reference context: the glaciology workload correlates sensors against
each other with explicit lags (``lag_df`` builds an extrema-hour lag
table, /root/reference/diurnal.py:24-26) and fits trends with OLS
(``linear_detrend``, /root/reference/gpstools.py:462-496).  These two
operators supply the general versions a large fleet of series needs:
*which lag aligns series A with series B* (xcorr argmax — e.g. melt →
velocity response delay) and *a trend estimate that one bad sensor week
cannot drag around* (Theil–Sen = median of pairwise slopes, 29%
breakdown point, vs OLS's 0%).

Scale shape (both operators): the raw series is reduced FIRST by a
map-side-combinable bucket aggregate (hour / day grain), so the
all-pairs parts downstream run on #buckets rows, never on raw samples.
At 100 TB the only full-data pass is that first aggregate — one shuffle
of partial sums.  Determinism: every mean is a DECIMAL sum / count, and
every downstream float expression is identical arithmetic in both
engines, so results are partition-order-proof (the repo-wide oracle
convention, queries.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(30,12)"


def bucket_mean(df: DataFrame, series_col: str, ts_col: str = "ts",
                val_col: str = "value", grain: str = "HOUR") -> DataFrame:
    """Per-(series, time-bucket) mean with a decimal (order-proof) sum.

    Output: ``series_col, bkt (timestamp), v (double)``.  One shuffle,
    map-side combinable; at 100 TB this is the pass that touches data.
    """
    return (df.where(F.col(val_col).isNotNull())
            .groupBy(F.col(series_col),
                     F.date_trunc(grain, F.col(ts_col)).alias("bkt"))
            .agg(F.sum(F.col(val_col).cast(_DEC)).alias("_s"),
                 F.count(val_col).alias("_c"))
            .withColumn("v", F.col("_s").cast("double") / F.col("_c"))
            .drop("_s", "_c"))


def xcorr_lags(a: DataFrame, b: DataFrame, max_lag: int,
               step_seconds: int = 3600) -> DataFrame:
    """Pearson cross-correlation of two bucketed series at integer lags
    ``-max_lag..max_lag`` (in bucket steps): corr(a(t), b(t + lag)).

    Inputs are :func:`bucket_mean` outputs (``bkt, v``).  Each a-row is
    fanned out once per lag (2·max_lag+1 copies of an already-aggregated
    frame), equi-joined to b on the shifted bucket (inner join — only
    co-observed buckets count), then reduced to the five Pearson sums
    per lag.  The correlation is computed from decimal-exact sums with
    identical double arithmetic in any engine:

        corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Output: ``lag, n_pairs, xcorr, is_best`` — ``is_best`` marks the
    argmax lag (ties → smaller lag).  Scale: the fan-out and join run on
    #buckets rows; 10 years of hourly buckets × 13 lags ≈ 1.1M rows —
    trivially small next to the raw-series aggregate that produced them.
    """
    lags = F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag))).alias("lag")
    al = (a.select(lags, "bkt", F.col("v").alias("x"))
          .withColumn("jbkt", F.timestamp_seconds(
              F.unix_timestamp("bkt") + F.col("lag") * step_seconds)))
    j = al.join(b.select(F.col("bkt").alias("jbkt"), F.col("v").alias("y")),
                "jbkt")
    g = j.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("x").cast(_DEC)).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("syy"))
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    # a constant series over the overlap zeroes the denominator: the
    # raw division THROWS under ANSI; correlation is undefined there →
    # NULL (exactly what DuckDB/SQL corr() returns for constant input).
    # The variance product is CLAMPED at 0 first: double rounding of
    # the decimal sums can land a near-constant series at ~-1e-12,
    # whose sqrt is NaN — and Spark sorts NaN ABOVE every real value
    # under desc, so the garbage lag won is_best (r9 self-review).
    den = F.sqrt(F.greatest(
        (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)))
    corr = F.when(den != 0.0, (n * sxy - sx * sy) / den)
    w = Window.orderBy(F.col("_corr").desc(), F.col("lag").asc())
    return (g.withColumn("_corr", corr)
            .withColumn("is_best",
                        (F.row_number().over(w) == 1).cast("int"))
            .select("lag", "n_pairs", F.round("_corr", 6).alias("xcorr"),
                    "is_best"))


def theil_sen(df: DataFrame, series_col: str, ts_col: str = "ts",
              val_col: str = "value") -> DataFrame:
    """Theil–Sen robust trend per series: daily means, then the median of
    all pairwise slopes, then intercept = median(y − m·x).

    Two shuffles total after the daily reduce: the pairwise self-join of
    the (tiny) daily frame and the per-series median sort.  The pair
    count is O(days²) per series — 10 years of dailies is 6.6M pairs, a
    non-problem; beyond ~10⁴ buckets switch to slopes over a hash-sampled
    pair subset (same estimator, documented CI widening).  Medians are
    exact (Spark ``median`` = DuckDB ``median``: mean-of-middle-two on
    even counts), slopes are identical double expressions → the whole
    result is engine- and partition-order-exact before the final round.

    Output: ``series_col, n_days, slope_per_day, intercept`` (rounded 6).
    """
    d = (bucket_mean(df, series_col, ts_col, val_col, grain="DAY")
         .withColumn("x", F.datediff("bkt", F.lit("1970-01-01"))
                     .cast("double")))
    lhs = d.select(series_col, F.col("x").alias("x1"), F.col("v").alias("v1"))
    rhs = d.select(series_col, F.col("x").alias("x2"), F.col("v").alias("v2"))
    pairs = (lhs.join(rhs, series_col)
             .where(F.col("x1") < F.col("x2"))
             .withColumn("slope", (F.col("v2") - F.col("v1"))
                         / (F.col("x2") - F.col("x1"))))
    m = pairs.groupBy(series_col).agg(F.median("slope").alias("m"))
    icept = (d.join(m, series_col)
             .groupBy(series_col)
             .agg(F.count("*").alias("n_days"),
                  F.first("m").alias("m"),
                  F.median(F.col("v") - F.col("m") * F.col("x"))
                  .alias("b")))
    return icept.select(series_col, "n_days",
                        F.round("m", 6).alias("slope_per_day"),
                        F.round("b", 6).alias("intercept"))


def dtw_pair_distances(df: DataFrame, pairs: DataFrame,
                       series_col: str = "series", ts_col: str = "ts",
                       val_col: str = "value", grain: str = "HOUR",
                       band: int | None = None) -> DataFrame:
    """Dynamic-time-warping distance between series pairs — the elastic
    similarity xcorr can't express (xcorr aligns with ONE global lag;
    DTW warps locally, matching series whose events stretch and
    compress). Sakoe–Chiba banding (``band``) bounds the warp window.

    This is a genuinely sequential O(n·m) dynamic program — not
    expressible as SQL/window algebra — so it takes the repo's
    documented escape hatch: an Arrow-batched pandas grouped-map
    (`applyInPandas`), never a per-row Python UDF. The DP itself is
    vectorized per anti-row in numpy.

    Scale shape: the raw series reduce FIRST through the combinable
    :func:`bucket_mean` aggregate (one data-sized shuffle); each
    DTW then runs on two bucket arrays whose length is the TIME grain,
    not the sample count — a year of hourly buckets is 8.8k floats, and
    each (pair) row is an independent task slot. Per-series bucket
    arrays must fit executor memory; coarsen ``grain`` first if not.

    ``pairs``: DataFrame with columns ``a, b`` naming series keys.
    Output: ``a, b, n_a, n_b, dtw`` (float64; deterministic — fixed
    per-pair accumulation order, no cross-partition reduction).
    """
    bm = bucket_mean(df, series_col, ts_col, val_col, grain)
    arr = (bm.groupBy(F.col(series_col).alias("_k"))
           .agg(F.array_sort(F.collect_list(F.struct("bkt", "v")))
                .alias("_sv"))
           .select("_k", F.expr("transform(_sv, x -> x.v)").alias("_vs")))
    j = (pairs.join(arr.withColumnRenamed("_k", "a")
                    .withColumnRenamed("_vs", "_va"), "a")
         .join(arr.withColumnRenamed("_k", "b")
               .withColumnRenamed("_vs", "_vb"), "b"))

    import pandas as pd  # local import: Arrow path only

    def _dtw_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        out = []
        # zip over columns: itertuples positionally renames _-prefixed
        # fields, and iterrows boxes every value
        inf = float("inf")
        for a, b, va, vb in zip(pdf["a"], pdf["b"], pdf["_va"], pdf["_vb"]):
            x = np.asarray(va, dtype=np.float64)
            y = np.asarray(vb, dtype=np.float64)
            n, m = len(x), len(y)
            w = max(band, abs(n - m)) if band is not None else None
            prev = np.full(m + 1, np.inf)
            prev[0] = 0.0
            # r11 (guide §4.2, measured min-of-2 on the 8760×8760 band-48
            # bench shape): 0.455 s → 0.159 s per pair, bit-identical.
            # Two effects: (a) the scan iterates PYTHON floats —
            # `.tolist()` converts float64→double exactly, and the same
            # + / < double ops then run without numpy-scalar boxing
            # (~2.4× on the loop); (b) `cur` is np.empty, not np.full —
            # row i+1 only ever reads prev[lo'-1 .. hi'], so only the
            # two cells bordering the written band need an explicit inf
            # (index 0 while the band pins left, index hi+1 while it
            # grows right), which drops n full-row fills to two cells.
            cur = np.empty(m + 1)
            for i in range(1, n + 1):
                lo = 1 if w is None else max(1, i - w)
                hi = m if w is None else min(m, i + w)
                if lo > hi:
                    prev = np.full(m + 1, np.inf)
                    continue
                d = np.abs(x[i - 1] - y[lo - 1:hi]).tolist()
                # cur[j] = d + min(prev[j-1], prev[j], cur[j-1]) — the
                # cur[j-1] term is the sequential recurrence; keep the
                # scan explicit (np.minimum.accumulate can't fold the
                # running term with the elementwise min of two arrays)
                base = np.minimum(prev[lo - 1:hi], prev[lo:hi + 1]).tolist()
                acc = inf
                row = []
                ap = row.append
                for dk, bk in zip(d, base):
                    acc = dk + (bk if bk < acc else acc)
                    ap(acc)
                cur[lo:hi + 1] = row
                cur[0] = np.inf
                if hi < m:
                    cur[hi + 1] = np.inf
                prev, cur = cur, prev
            out.append((a, b, n, m, float(prev[m])))
        return pd.DataFrame(out, columns=["a", "b", "n_a", "n_b", "dtw"])

    schema = ("a string, b string, n_a long, n_b long, dtw double")
    return (j.repartition("a", "b")
            .groupBy("a", "b").applyInPandas(_dtw_batch, schema=schema))
