"""Physical-plan shape assertions (the 100 TB story, checked in CI):

- filters reach the parquet scan (PushedFilters),
- scans read only needed columns (ReadSchema pruning),
- small dimensions broadcast (no fact-side shuffle before aggregation),
- aggregations are partial (map-side combine before the exchange),
- the parity surface contains no Python evaluation (BatchEvalPython),
- partitioned layouts prune (PartitionFilters).
"""

import pytest
from pyspark.sql import functions as F

from datatools_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_pricing_summary_pushdown_and_partial_agg(spark):
    plan = _formatted(QUERIES["ss_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns in ReadSchema
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    # partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_star_join_broadcasts_all_dims(spark):
    plan = _formatted(QUERIES["ss_region_revenue"](spark, SF))
    # formatted plans list each node twice (tree + detail)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_no_python_eval_on_parity_surface(spark):
    """SURVEY §2.11 thesis: zero Python UDFs on the datatools-parity
    operators — everything whole-stage-codegens."""
    for name in ["ts_velocity_grid", "ts_diurnal_extrema_18h",
                 "ts_rolling_center_mean_2h", "ts_asof_align",
                 "ts_interp_linear", "ts_albedo_daily", "doc_minhash",
                 "doc_ngram_pairs", "emb_knn_brute"]:
        plan = _plan(QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_interval_lookup_broadcasts_schedule(spark):
    plan = _plan(QUERIES["ts_interval_lookup"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rolling_single_shuffle(spark):
    """Centered rolling = exactly one exchange (hash partition on the
    series key), then in-partition sort + window — no self-join."""
    plan = _plan(QUERIES["ts_rolling_center_mean_2h"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_partitioned_write_prunes(spark, tmp_path):
    """Sort-aware layout (SURVEY §4): partition by series key → scans with
    a key predicate read only matching partitions."""
    ev = QUERIES["ts_resample_daily_mean"](spark, SF)  # warm import path
    from datatools_spark.queries import _t
    df = _t(spark, SF, "events")
    out = str(tmp_path / "by_type")
    (df.repartition("event_type")
       .sortWithinPartitions("ts")
       .write.partitionBy("event_type").parquet(out))
    scan = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = _formatted(scan)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert scan.count() > 0
