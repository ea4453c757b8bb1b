"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs each Spark query and its oracle SQL on the same sf dir, then
compares: row count, column-name set, PER-COLUMN VALUE TYPES (a
tz-aware oracle timestamp vs Spark's naive one is a schema FAIL, as in
the driver), and order-insensitive values with EXACT equality after the
queries' own rounding (no tolerance — the driver hashes values, so a
1-ulp flap that 1e-9 would forgive is a red row there). Used by
tests/test_oracle_parity.py and runnable directly:
    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
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
        # NO tz-stripping: a TIMESTAMPTZ oracle column must differ from a
        # naive Spark timestamp here, exactly as in the driver's compare.
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v + 0.0  # kill -0.0 only; equality is EXACT post-rounding
    return v


def _vtype(v):
    """Value-level dtype tag; tz-awareness is a distinct type."""
    if isinstance(v, dt.datetime):
        return "timestamptz" if v.tzinfo is not None else "timestamp"
    if isinstance(v, dt.date):
        return "date"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    return type(v).__name__


def _coltypes(rows, cols):
    """First non-null value type per column name."""
    out = {}
    for i, c in enumerate(cols):
        out[c] = next((_vtype(r[i]) for r in rows if r[i] is not None), None)
    return out


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
    else:
        st, du = _coltypes(srows, scols), _coltypes(drows, dcols)
        bad = {c: (st[c], du[c]) for c in st
               if st[c] is not None and du[c] is not None and st[c] != du[c]}
        if bad:
            issues.append(f"schema dtypes: {bad}")
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
    try:   # feed the bandwidth time series (r10 VERDICT #1a)
        import bench
        bench.membw_sample("oracle-gate")
    except Exception:  # noqa: BLE001 — telemetry only
        pass
    s = get_spark("oracle-harness")
    s.sparkContext.setLogLevel("ERROR")
    fails = run_all(s, sf, names)
    print(f"{'ALL GREEN' if not fails else f'{len(fails)} FAILURES'}")
    sys.exit(1 if fails else 0)
