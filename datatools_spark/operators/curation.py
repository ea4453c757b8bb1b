"""Corpus curation for training-data pipelines: benchmark
decontamination and deterministic (reproducible) sampling.

Not in the reference (driver-mandated LLM-pipeline extensions). Both
operators follow the 100 TB shape:

- decontamination: the benchmark shingle set is TINY relative to the
  corpus (a few eval suites vs the crawl) — distinct it once and
  broadcast into the membership join, so the corpus is touched in one
  map-side pass + one groupBy on doc_id. No shuffle of corpus text.
- deterministic sampling: the keep/drop decision is a pure expression of
  the row key (md5-derived uniform in [0,1)), so it pushes down to the
  scan, needs no state, and replays identically on any cluster layout —
  the property that makes a 100 TB sample auditable and resumable.

Everything is JVM expressions (no Python UDFs) with exact DuckDB
oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count_col, word_shingles, words_col

__all__ = [
    "uniform_hash_col", "deterministic_sample", "contamination_counts",
    "source_balanced_sample", "pack_sequences", "train_val_test_split",
    "group_quota_cap", "epoch_shard", "temperature_sample",
    "priority_sample_per_group",
]


def uniform_hash_col(key: Column, salt: str = "smpl") -> Column:
    """Deterministic uniform [0, 1) from a row key: first 32 bits of
    md5(salt:key) / 2^32. Engine-portable (md5+substr only) and exact —
    the comparison against a rate is bit-identical everywhere."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                          key.cast("string"))), 1, 8),
               16, 10).cast("bigint")
    return h.cast("double") / F.lit(float(1 << 32))


def deterministic_sample(df: DataFrame, rate: float | Column,
                         key_col: str = "doc_id",
                         salt: str = "smpl") -> DataFrame:
    """Keep rows whose key-hash uniform falls below ``rate`` (a float or
    a per-row rate Column). Unlike ``df.sample()`` this is a pure
    FILTER: reproducible across runs/partitionings, pushes to the scan,
    and composes with joins (the same doc samples in or out everywhere).
    """
    r = F.lit(float(rate)) if isinstance(rate, (int, float)) else rate
    return df.where(uniform_hash_col(F.col(key_col), salt) < r)


def contamination_counts(df: DataFrame, benchmark: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         shingle_n: int = 3) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    distinct word ``shingle_n``-grams appear anywhere in the benchmark
    set (the standard eval-leakage gate before pretraining).

    The benchmark's distinct shingles are broadcast; the corpus side is
    explode → broadcast-hash semi-match → count per doc. Docs with no
    overlap report 0 with ``contaminated = false``.
    Output: ``id_col, n_contaminated, contaminated``.
    """
    def shingles(d: DataFrame, with_id: bool = True) -> DataFrame:
        sh = F.explode(word_shingles(text_col, shingle_n,
                                     from_words_col="_words")).alias("_sh")
        d = d.withColumn("_words", words_col(text_col))
        # the benchmark side contributes only its shingle SET — don't
        # impose the corpus's id column on an eval-set schema that may
        # key by prompt/qid instead
        return d.select(F.col(id_col), sh) if with_id else d.select(sh)

    bench_sh = shingles(benchmark, with_id=False).distinct()
    hits = (shingles(df).join(F.broadcast(bench_sh), "_sh")
            .groupBy(id_col).agg(F.count("*").alias("n_contaminated")))
    return (df.select(id_col).join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"))
            .withColumn("contaminated", F.col("n_contaminated") > 0))


def source_balanced_sample(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           source_col: str = "source",
                           salt: str = "mix") -> DataFrame:
    """Domain-mixing downsample: every source is deterministically
    sampled down to (approximately) the token budget of the SMALLEST
    source, the simplest balanced-mixture recipe. Per-source rate =
    min(total_tokens)/total_tokens, applied through
    :func:`deterministic_sample`'s key-hash filter.

    The per-source totals aggregate is tiny (#sources rows) — the rate
    join broadcasts; the only corpus-wide work is one map-side token
    count and the filter itself. Output: sampled rows of ``df`` plus the
    per-row ``_rate`` applied (exact rationals in double; both engines
    divide the same two bigints, so the comparison is reproducible).
    """
    toks = df.withColumn("_tok", token_count_col(text_col))
    totals = toks.groupBy(source_col).agg(F.sum("_tok").alias("_tot"))
    # ANSI guard: a source whose docs are all empty has _tot 0 — the
    # raw division throws; NULL rate (= DuckDB's 0/0) drops the
    # token-free source, and the keep-comparison stays engine-identical.
    # The min runs over POSITIVE totals only: a token-free source must
    # not drag the floor to 0 (which zeroed every OTHER source's rate
    # and returned an empty sample instead of downsampling to the
    # smallest non-empty source).
    totals = totals.withColumn(
        "_rate", F.when(
            F.col("_tot") != 0,
            F.min(F.when(F.col("_tot") > 0, F.col("_tot")))
            .over(Window.partitionBy()).cast("double")
            / F.col("_tot")))
    keyed = toks.join(F.broadcast(totals.select(source_col, "_rate")),
                      source_col)
    return keyed.where(uniform_hash_col(F.col(id_col), salt) < F.col("_rate"))


def temperature_sample(df: DataFrame, alpha: float = 0.5,
                       id_col: str = "doc_id",
                       source_col: str = "source",
                       base_rate: float = 0.5,
                       salt: str = "temp") -> DataFrame:
    """Temperature-flattened source mix — the multilingual/multi-corpus
    rebalancing rule (α<1 boosts the tail): per-source keep rate =
    min(1, base_rate · (n_max/nᵢ)^(1−α)) — the LARGEST source keeps
    ``base_rate``, smaller sources are boosted toward 1. Wherever the
    cap does not bind, the kept count is base_rate·n_max^(1−α)·nᵢ^α —
    proportional to nᵢ^α; budgets that must be exactly ∝ nᵢ^α across
    ALL sources need base_rate ≤ (n_min/n_max)^(1−α) so no source caps.
    At α=1 every source keeps ``base_rate`` (raw proportions).
    ``base_rate >= 1`` with α<1 is REJECTED: n_max/nᵢ ≥ 1 makes every
    rate cap at 1 — the call would silently be the identity (found in
    the r9 self-review; the old docstring promised equalization it
    could not deliver at the then-default base_rate=1).

    Where :func:`source_balanced_sample` flattens fully to the smallest
    source, this interpolates — the knob real pretraining mixes use.

    Plan: one per-source count (map-side combinable, #sources rows),
    broadcast rate join, then :func:`uniform_hash_col`'s pure-expression
    keep filter on the scan. The rate is rounded to 6 dp on both engines
    so the ``pow`` ulp cannot flip a keep decision. Output: kept rows +
    the applied ``_rate``.
    """
    if base_rate >= 1.0 and alpha < 1.0:
        raise ValueError(
            f"temperature_sample: base_rate={base_rate} with "
            f"alpha={alpha} is the identity — every rate "
            "min(1, base_rate*(n_max/n_i)^(1-alpha)) caps at 1 because "
            "n_max/n_i >= 1. Pass base_rate < 1 (the largest source's "
            "keep rate); exact n^alpha proportionality needs "
            "base_rate <= (n_min/n_max)^(1-alpha)")
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    counts = counts.withColumn(
        "_rate", F.round(F.least(F.lit(1.0), F.lit(base_rate) * F.pow(
            F.max("_n").over(Window.partitionBy()).cast("double")
            / F.col("_n"), F.lit(1.0 - alpha))), 6))
    keyed = df.join(F.broadcast(counts.select(source_col, "_rate")),
                    source_col)
    return keyed.where(uniform_hash_col(F.col(id_col), salt) < F.col("_rate"))


def pack_sequences(df: DataFrame, ctx_len: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Sequence packing (concat-then-chunk): lay the corpus out as one
    token stream per ``group_col`` in deterministic ``id_col`` order, cut
    it at ``ctx_len``-token boundaries, and report for every document
    which training sequence its first token lands in and at what offset —
    the standard GPT-style pretraining layout (documents concatenated,
    windows cut regardless of boundaries).

    Plan: one map-side token count + ONE window cumulative sum
    partitioned by ``group_col``. Packing is inherently a prefix-sum:
    parallelism here comes from the group dimension (each source/domain
    packs independently — exactly how large corpora are sharded in
    practice). For a single giant group the same math distributes as a
    two-phase prefix sum (per-partition partial totals, broadcast
    offsets); the per-group window is the declared, oracle-checkable
    form.

    Output: ``id_col, group_col, n_tokens, bin_id, bin_offset,
    n_bins_spanned`` (zero-token docs report bin of the stream position
    with 0 span).
    """
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    tok = token_count_col(text_col)
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    start = F.col("_cum_before")
    spans = F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
        F.floor((start % ctx_len + F.col("n_tokens") - 1) / ctx_len) + 1)
    return (df.select(F.col(id_col), F.col(group_col),
                      tok.alias("n_tokens"))
            .withColumn("_cum_before", cum_before)
            .select(id_col, group_col, "n_tokens",
                    F.floor(start / ctx_len).alias("bin_id"),
                    (start % ctx_len).alias("bin_offset"),
                    spans.alias("n_bins_spanned")))


def train_val_test_split(df: DataFrame, key_col: str = "doc_id",
                         val_frac: float = 0.05, test_frac: float = 0.05,
                         salt: str = "split") -> DataFrame:
    """Deterministic corpus split: every row gets a ``split`` label from
    its key hash — 'train' / 'valid' / 'test' with the requested holdout
    fractions. A pure row-local expression: no shuffle, reproducible on
    any layout, stable under corpus growth (a doc's split never changes
    when other docs are added — the property that keeps eval sets
    uncontaminated across crawl refreshes).
    """
    u = uniform_hash_col(F.col(key_col), salt)
    train_hi = 1.0 - val_frac - test_frac
    split = (F.when(u < train_hi, F.lit("train"))
             .when(u < train_hi + val_frac, F.lit("valid"))
             .otherwise(F.lit("test")))
    return df.withColumn("split", split)


def group_quota_cap(df: DataFrame, max_per_group: int,
                    group_col: str = "source", key_col: str = "doc_id",
                    salt: str = "cap", prefilter_factor: int = 50) -> DataFrame:
    """Cap every group at ``max_per_group`` rows, keeping the
    ``max_per_group`` members with the SMALLEST key hashes — the
    per-domain quota of web-corpus curation (no single domain may
    dominate the mixture), deterministic on any cluster layout (unlike
    take-first-N, which depends on scan order).

    Exact selection is a per-group ``row_number`` over (hash, key) —
    a sort keyed by group. A hot group (a 10⁹-doc domain at 100 TB)
    would concentrate that sort on one reducer, so groups larger than
    ``prefilter_factor × max_per_group`` are first thinned by the pure
    hash FILTER ``u < prefilter_factor·N/|group|``: the survivors are a
    deterministic superset of the N smallest hashes unless fewer than N
    of |group| uniform draws land below prefilter_factor·N/|group| —
    a (N·(1−1/factor)²/2)-exponent Chernoff tail, ≈ e⁻²⁴⁰ at the
    defaults — and the exact row_number then sorts only ~factor·N rows
    per group. Output: the kept rows of ``df``.
    """
    u = uniform_hash_col(F.col(key_col), salt)
    counts = F.broadcast(df.groupBy(group_col)
                         .agg(F.count("*").alias("_gn")))
    work = (df.join(counts, group_col)
            .withColumn("_u", u)
            .where((F.col("_gn") <= max_per_group * prefilter_factor)
                   | (F.col("_u") < F.lit(float(max_per_group
                                                * prefilter_factor))
                      / F.col("_gn"))))
    w = Window.partitionBy(group_col).orderBy("_u", key_col)
    return (work.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_per_group)
            .drop("_gn", "_u", "_rn"))


def epoch_shard(df: DataFrame, n_shards: int, epoch: int = 0,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic per-epoch global shuffle + sharding: every row gets
    ``shard`` ∈ [0, n_shards) and ``pos`` (its rank within the shard) —
    the reader contract of a distributed training job (worker w reads
    shard w in pos order; a new ``epoch`` value reshuffles everything
    reproducibly, with no RNG state to coordinate).

    The hash is row-local; the only heavy operation is the per-shard
    rank, a sort keyed by shard. Shards are hash-balanced (±√ rows), so
    no reducer hot-spots; at rest, write
    ``partitionBy(shard)`` + sortWithinPartitions(pos) and the training
    reader streams each shard sequentially with zero further shuffle.
    Output: ``df`` + ``shard`` (int), ``pos`` (1-based bigint).
    """
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"ep{epoch}:"),
                                          F.col(key_col).cast("string"))),
                           1, 12), 16, 10).cast("bigint")
    out = df.withColumn("_h", h) \
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (out.withColumn("pos", F.row_number().over(w).cast("bigint"))
            .drop("_h"))


def priority_sample_per_group(df: DataFrame, group_cols, weight_col: str,
                              k: int, key_col: str = "doc_id",
                              salt: str = "ws") -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — priority
    sampling (Duffield, Lund & Thorup, JACM 2007): priority
    q = w / u with u a deterministic md5-uniform in (0, 1); keep each
    group's top-k priorities. Inclusion probability is proportional to
    weight (heavier rows win more often), the sample is reproducible
    across runs/engines (no RNG), and — unlike Efraimidis-Spirakis'
    u^(1/w) — the priority is a single DIVISION, so the ranking key is
    bit-identical in any IEEE engine (pow/log differ by ulps across
    libm implementations).

    One keyed window (shuffle on group) — Spark's WindowGroupLimit
    pushes the rank<=k cut map-side, so the exchange carries ~k rows
    per group per partition, not the corpus. u is offset by +0.5/2^32
    to exclude 0 exactly (no div-by-zero), preserving uniformity.
    Adds ``priority``; keeps all input columns."""
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                          F.col(key_col).cast("string"))),
                           1, 8), 16, 10).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    pr = F.col(weight_col).cast("double") / u
    w = Window.partitionBy(*g).orderBy(F.col("priority").desc(),
                                       F.col(key_col))
    return (df.withColumn("priority", pr)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))
