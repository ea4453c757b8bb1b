"""JSONL (newline-delimited JSON) document source/sink — the interchange
format of LLM data pipelines (crawl dumps, HF dataset exports, filtered
corpus drops all move as .jsonl / .jsonl.gz).

Spark-first: ``spark.read.json`` with an EXPLICIT schema (never inferred
— inference is an extra full scan at 100 TB and locks in whatever the
first sampled rows happened to contain) and PERMISSIVE corrupt-record
capture, so one mangled line in a 10⁹-line crawl shard quarantines
instead of failing the job. JSON-lines files split by newline, so a
single giant shard still parallelizes; .gz shards do NOT split — the
writer never produces them, and the reader docs call the trap out.

No reference analogue (the reference reads instrument CSVs); this is a
driver-mandated training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOCUMENT_SCHEMA", "read_documents_jsonl",
           "write_documents_jsonl", "split_corrupt"]

_CORRUPT = "_corrupt_record"

#: canonical documents-table schema (matches testdata documents.parquet)
DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: T.StructType = DOCUMENT_SCHEMA) -> DataFrame:
    """Read a JSONL corpus with corrupt-line quarantine.

    Returns every input line as a row: parsed fields where the line was
    valid JSON matching ``schema``, else nulls plus the raw line in
    ``_corrupt_record``. Use :func:`split_corrupt` to fork clean/bad.
    Multiline mode stays OFF — one JSON value per line is what keeps the
    file splittable (a multiline JSON array forces one task per file).
    """
    # StructType.add MUTATES the receiver — build a fresh struct so the
    # shared DOCUMENT_SCHEMA constant never accumulates the column
    full = T.StructType(list(schema.fields)
                        + [T.StructField(_CORRUPT, T.StringType())])
    return (spark.read
            .schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .json(path))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fork a permissive JSONL read into (clean, quarantine).

    Clean rows drop the corrupt column; quarantine rows carry only the
    raw line (write them next to the output for replay/repair — the
    pattern every ingestion DAG needs so bad lines are auditable, not
    silently dropped).

    The parsed frame is checkpointed first: Spark refuses plans that
    read ONLY the internal corrupt column straight off a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the scan
    would otherwise prune away the very parse that populates it), and
    the quarantine branch is exactly that shape. Both forks share the
    one materialized parse, which the clean branch needs anyway. A lazy
    localCheckpoint (not ``cache()``) keeps the call plan-only while
    avoiding a session-cache entry per ingested file set (the r5
    hygiene rule: checkpoint blocks free on GC, cache registry entries
    never do).
    """
    df = df.localCheckpoint(eager=False)
    clean = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.where(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT))
    return clean, bad


def write_documents_jsonl(df: DataFrame, path: str,
                          shard_by: str | None = None,
                          mode: str = "overwrite") -> None:
    """Write a corpus as JSONL, optionally hive-sharded by a column
    (``source``/``split``): downstream consumers then read one
    directory per shard. Plain text (no .gz): gzip shards don't split,
    so one hot shard would serialize a whole cluster; at rest-size
    sensitivity use the parquet sinks instead (sources/sink.py)."""
    w = df.write.mode(mode)
    if shard_by:
        w = w.partitionBy(shard_by)
    w.json(path)
