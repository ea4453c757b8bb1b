"""Oracle gate under adversarial partitioning — guards against
accumulation-order float drift (double sums are not associative; a
different shuffle-partition count changes partial-agg merge order, which
can flip a round()ed digit — this bit ts_rollup_multires once, fixed with
exact decimal partials).

Runs the full DuckDB-oracle comparison with deliberately hostile configs:
few/many shuffle partitions, tiny input splits, AQE off.

Usage:  python tests/perturbed_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.oracle_harness import run_all

CONFIGS = [
    {"master": "local[5]", "spark.sql.shuffle.partitions": "7",
     "spark.sql.files.maxPartitionBytes": "131072",
     "spark.sql.adaptive.enabled": "false"},
    {"master": "local[32]", "spark.sql.shuffle.partitions": "200"},
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad = 0
    for cfg in CONFIGS:
        cfg = dict(cfg)
        b = (SparkSession.builder.master(cfg.pop("master"))
             .appName("perturbed-oracle")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false"))
        for k, v in cfg.items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        fails = run_all(spark, sf)
        print(f"config {cfg}: {'ALL GREEN' if not fails else fails}")
        bad += len(fails)
        spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
