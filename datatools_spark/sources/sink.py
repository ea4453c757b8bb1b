"""Layout-aware parquet sinks (SURVEY §4: 'sort-aware file layout:
partition by station, sort by ts within files; min/max pruning via
parquet row-group stats').

The reference relies on a sorted DatetimeIndex for O(log n) slicing
(gpstools.py:583-584 etc.); the lakehouse equivalent is layout at rest:

- hive-partition by the series key (station/event_type/date) → partition
  pruning turns key predicates into directory pruning;
- sort by ts within files → parquet row-group min/max stats prune time
  predicates inside each file;
- ``target_file_rows`` bounds file sizes so a 1000-executor scan gets
  even splits.

``name_file`` (S13 gpstools.py:617-637 naming convention) lives in
sources/neu.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["write_partitioned", "write_bucketed_table"]


def write_partitioned(df: DataFrame, path: str,
                      partition_by: Sequence[str] = (),
                      sort_by: Sequence[str] = ("ts",),
                      mode: str = "overwrite") -> None:
    """Write hive-partitioned parquet with in-file sort.

    ``repartition(partition_by)`` puts each hive partition's rows in one
    task (one file per partition instead of tasks×partitions small
    files); ``sortWithinPartitions(sort)`` orders rows so row-group stats
    are tight for time-range pruning.
    """
    work = df
    if partition_by:
        work = work.repartition(*partition_by)
    if sort_by:
        work = work.sortWithinPartitions(*partition_by, *sort_by)
    writer = work.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(df: DataFrame, table: str,
                         bucket_by: str, num_buckets: int = 32,
                         sort_by: Sequence[str] = ("ts",),
                         mode: str = "overwrite") -> None:
    """Bucketed managed table: co-locates both sides of repeated equi-joins
    on ``bucket_by`` so the join runs shuffle-free (the 100 TB path for
    fact-fact joins the star-schema broadcast can't cover).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
