"""Quick per-query timing probe for optimization iterations.

Usage: python bench/probe.py <query> [query ...] [--n N] [--sf DIR]
Runs each query N times (default 3) with the same full-plan forcing
action bench.py uses, prints per-run seconds + min. NOT an artifact —
bench.py remains the measurement of record.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _b  # noqa: E402  (bench.py module, not the bench/ dir)
from datatools_spark.queries import QUERIES  # noqa: E402
from datatools_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    it = iter(args)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)
    spark = get_spark("datatools-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup at sf0.001 to prime codegen, as bench.py does
    warm = "/root/testdata/sf0.001"
    for name in names:
        if os.path.isdir(warm):
            try:
                _b.force_value(QUERIES[name](spark, warm))
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: WARMUP FAILED: {exc}")
    for name in names:
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _b.force_value(QUERIES[name](spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(ts)} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
