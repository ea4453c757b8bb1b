"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs each Spark query and its oracle SQL on the same sf dir, then
compares: row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted, floats compared to 1e-9 after both
sides' own rounding). Used by tests/test_oracle_parity.py and runnable
directly:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and float repr jitter after the queries' own rounding
        return round(v + 0.0, 9)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark, con, fn, sql, sf_dir: str):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    issues = []
    if sorted(scols) != sorted(dcols):
        issues.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        issues.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
    if not issues:
        a, b = _canon(srows, scols), _canon(drows, dcols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            issues.append(f"values differ; first diffs: {diff}")
    return issues


def run_all(spark, sf_dir: str, names=None):
    from datatools_spark.queries import ORACLE, QUERIES
    con = duck_con(sf_dir)
    failures = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        if name not in ORACLE:
            n = fn(spark, sf_dir).count()  # rows-only check
            print(f"  {name:32s} rows-only ({n} rows)")
            continue
        try:
            issues = compare(spark, con, fn, ORACLE[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION: {type(e).__name__}: {e}"]
        status = "OK" if not issues else "FAIL"
        print(f"  {name:32s} {status}")
        if issues:
            failures[name] = issues
            for i in issues:
                print(f"      {i[:500]}")
    return failures


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from datatools_spark.session import get_spark
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    s = get_spark("oracle-harness")
    s.sparkContext.setLogLevel("ERROR")
    fails = run_all(s, sf, names)
    print(f"{'ALL GREEN' if not fails else f'{len(fails)} FAILURES'}")
    sys.exit(1 if fails else 0)
