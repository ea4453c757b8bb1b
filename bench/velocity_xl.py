"""XL scale probe: the flagship kernels at 1e8 rows (10× the standing
sweep's largest size), input generated DISTRIBUTED via ``spark.range``
— no driver-side pandas materialization, so the probe exercises exactly
what a 1000-executor cluster would: a lazy columnar source feeding the
kernel's shuffle.

Rationale: bench_scale.py's 1e5-1e7 sweep builds inputs in the driver
(pandas → Arrow), which caps it around 1e7 rows; this probe removes the
driver from the data path and measures one decade further. At 15-s
cadence 1e8 rows is ~47 years of a single station's GPS record —
per-partition row counts at 32 partitions (~3.1M) match what a 100 TB
corpus sharded over a real cluster would put in ONE task, so per-task
behavior here transfers.

Appends/updates the ``## XL kernel probe`` section of
bench/SCALE_NOTES.md (a curated section bench_scale.py preserves) and
prints one JSON line.

Usage: python bench/velocity_xl.py [--rows N]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench_scale import STAT_S, SEP_S, force_count  # noqa: E402
from datatools_spark.operators.extrema import daily_extrema  # noqa: E402
from datatools_spark.operators.velocity import calc_velocity  # noqa: E402
from datatools_spark.session import get_spark  # noqa: E402

SECTION = "## XL kernel probe (distributed input)"


def synth_positions_distributed(spark, n: int, cadence_s: int = 15):
    """Same signal family as bench_scale.synth_positions (linear drift +
    diurnal sine + small noise) built JVM-side: timestamp_seconds over
    spark.range, rand(seed) noise. Deterministic enough for a perf
    probe; parity runs use the pandas twin."""
    day = 86400.0 / cadence_s
    return (spark.range(n)
            .select(F.timestamp_seconds(
                        F.lit(1704067200) + F.col("id") * cadence_s)
                    .alias("ts"),
                    (3.0 * (F.col("id") / day)
                     + 0.2 * F.sin(F.col("id") / day * 6.283185307179586)
                     + (F.rand(7) - 0.5) * 0.02).alias("value")))


def main() -> None:
    n = 100_000_000
    if "--rows" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rows") + 1])
    spark = get_spark("velocity-xl")
    spark.sparkContext.setLogLevel("ERROR")

    df = synth_positions_distributed(spark, n).repartition(32).cache()
    t0 = time.perf_counter()
    df.count()
    gen_s = time.perf_counter() - t0

    results: dict[str, dict] = {}
    for label in ("exact", "approx", "selectk"):
        t0 = time.perf_counter()
        pts = force_count(calc_velocity(df, ["value"], stat_window=STAT_S,
                                        separation_window=SEP_S,
                                        median_mode=label))
        el = time.perf_counter() - t0
        results[f"velocity_{label}"] = {
            "rows": n, "grid_points": pts, "sec": round(el, 3),
            "rows_per_s": round(n / el)}
    t0 = time.perf_counter()
    days = force_count(daily_extrema(df))
    el = time.perf_counter() - t0
    results["extrema"] = {"rows": n, "days": days, "sec": round(el, 3),
                          "rows_per_s": round(n / el)}
    df.unpersist()

    lines = [SECTION, "",
             f"{n:,} rows at 15-s cadence (~{n * 15 / 86400 / 365:.0f} "
             "years of one station), generated distributed "
             f"(spark.range → timestamp arithmetic; materialize+cache "
             f"{gen_s:.1f} s). Cached columnar input, so the timings are "
             "the KERNEL's shuffle+aggregate alone — the regime a "
             "parquet scan feeds on a real cluster.", "",
             "| kernel | rows | output | sec | rows/s |",
             "|---|---|---|---|---|"]
    for k, v in results.items():
        out_n = v.get("grid_points", v.get("days", ""))
        lines.append(f"| {k} | {v['rows']:,} | {out_n} | {v['sec']} "
                     f"| {v['rows_per_s']:,} |")
    block = "\n".join(lines) + "\n"

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALE_NOTES.md")
    with open(path) as fh:
        prev = fh.read()
    if SECTION in prev:
        new = re.sub(re.escape(SECTION) + r".*?(?=\n## |\Z)", block,
                     prev, flags=re.S)
    else:
        # insert after the generated kernel table (before the first
        # curated section) so bench_scale.py regenerations preserve it
        cut = prev.find("\n## ")
        new = prev + "\n" + block if cut == -1 else \
            prev[:cut] + "\n" + block + prev[cut:]
    with open(path, "w") as fh:
        fh.write(new)

    print(json.dumps({"metric": "velocity_xl", "rows": n,
                      "gen_s": round(gen_s, 1), "results": results}))


if __name__ == "__main__":
    main()
