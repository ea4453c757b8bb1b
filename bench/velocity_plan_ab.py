"""A/B of the velocity kernel's two physical plans at 1e7 rows — the
measurement behind plans/chooser.py's dispatch rule (SURVEY §4.1, r8
VERDICT #5).

Four rows:
- bucket: the tiling plan (one explode ×2, one hash aggregate).
- range_join: the bucketed-equi-key range join at the SAME tileable
  parameterization (step == stat) — measures what the chooser saves by
  picking bucket when both are valid.
- range_join_overlap: step = stat/2 (twice-dense grid, overlapping
  windows) — the case only the range join can express; its cost scales
  with the grid, not with a data fan-out.
- bare_interval: the pre-r9 formulation (interval predicate with no
  equi key → BroadcastNestedLoopJoin, O(rows × grid)). Survivable at
  this short grid; the gap to the bucketed form grows linearly with
  grid length.

Prints one JSON line; history in bench/SCALE_NOTES.md.

Usage: python bench/velocity_plan_ab.py [--rows N] [--repeats K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datatools_spark.operators.velocity import (  # noqa: E402
    calc_velocity, calc_velocity_range_join)
from datatools_spark.session import get_spark  # noqa: E402


def main() -> None:
    rows = 10_000_000
    repeats = 3
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # ~1 row/second of synthetic positions, mild diurnal signal — the
    # 1e7-row sweep shape bench_scale.py uses for the kernel
    df = (spark.range(rows)
          .select(F.timestamp_seconds(1700000000 + F.col("id")).alias("ts"),
                  (F.sin(F.col("id") / 43200.0 * 3.14159) * 2
                   + F.col("id") * 1e-7).alias("value"))
          ).localCheckpoint(eager=True)
    kw = dict(value_cols=["value"], stat_window="6h",
              separation_window="24h")

    def best(fn):
        t = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = fn().count()
            t.append(round(time.perf_counter() - t0, 2))
        return min(t), n

    def bare_interval():
        # the pre-r9 formulation, kept here as the A/B baseline
        stat, sep = 21600.0, 86400.0
        hs, hst = sep / 2, stat / 2
        es = F.col("ts").cast("double")
        bounds = df.agg(F.min(es).alias("_tmin"), F.max(es).alias("_tmax"))
        grid = bounds.select(F.explode(F.sequence(
            (F.col("_tmin") + sep).cast("long"),
            (F.col("_tmax") - sep).cast("long"),
            F.lit(int(stat)))).alias("_t"))
        pos = df.select(es.alias("_es"), "value")
        sides = []
        for side, off in ((0, -hs), (1, +hs)):
            c = F.col("_t") + off
            j = grid.join(pos, (F.col("_es") >= c - hst)
                          & (F.col("_es") < c + hst))
            sides.append(j.groupBy("_t").agg(
                F.median("value").alias(f"_m{side}"),
                F.count("*").alias(f"_n{side}")))
        return (sides[0].join(sides[1], "_t")
                .where("_n0 > 3 AND _n1 > 3"))

    out = {"metric": "velocity_plan_ab_sec", "rows": rows}
    out["bucket"], out["bucket_rows"] = best(
        lambda: calc_velocity(df, **kw))
    out["range_join"], out["range_rows"] = best(
        lambda: calc_velocity_range_join(df, **kw))
    out["range_join_overlap"], out["overlap_rows"] = best(
        lambda: calc_velocity_range_join(df, grid_step="3h", **kw))
    out["bare_interval"], _ = best(bare_interval)
    out["vs_bare"] = round(out["bare_interval"] / out["range_join"], 2) \
        if out["range_join"] else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
