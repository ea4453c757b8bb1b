"""Capture .explain("formatted") for bench queries into plans/r12/.

Usage: python bench/explain_capture.py <suffix> [query ...]
  suffix: "before" | "after" (file name suffix)
  query:  optional subset; default = BENCH_QUERIES + EXTENDED_QUERIES.

Writes plans/r12/<query>_<suffix>.txt. Construction of some queries runs
eager localCheckpoints (the measured-dispatch pair engines), so this is
not free — run it on a quiet box.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datatools_spark.queries import QUERIES  # noqa: E402
from datatools_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    # bench.py (module) wins over the bench/ namespace dir on sys.path
    import bench as _b
    names = sys.argv[2:] or (_b.BENCH_QUERIES + _b.EXTENDED_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("datatools-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} chars", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
