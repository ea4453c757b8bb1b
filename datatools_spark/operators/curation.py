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
    "source_balanced_sample",
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
    def shingles(d: DataFrame) -> DataFrame:
        return (d.withColumn("_words", words_col(text_col))
                .select(F.col(id_col),
                        F.explode(word_shingles(
                            text_col, shingle_n,
                            from_words_col="_words")).alias("_sh")))

    bench_sh = shingles(benchmark).select("_sh").distinct()
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
    totals = totals.withColumn(
        "_rate", F.min("_tot").over(Window.partitionBy()).cast("double")
        / F.col("_tot"))
    keyed = toks.join(F.broadcast(totals.select(source_col, "_rate")),
                      source_col)
    return keyed.where(uniform_hash_col(F.col(id_col), salt) < F.col("_rate"))
