"""Generate an sf1-EQUIVALENT dataset for bench scaling (perf only).

The driver ships sf{0.001,0.01,0.1}; the scaling trend needs a third
decade. This replicates sf0.1 ten times with CONSISTENTLY shifted keys
(foreign keys move together, so join selectivity and group cardinality
scale like a real sf1 would):

- facts (events/orders/lineitem): ids shifted by replica × (max+1);
  lineitem.l_orderkey tracks orders.o_orderkey, o_custkey tracks
  customer.c_custkey, l_partkey/l_suppkey track part/supplier.
- documents: every word is prefixed with a replica tag, so replicas
  share no shingles — per-replica dup structure matches sf0.1 instead
  of manufacturing 45 cross-replica near-dup pairs per doc.
- embeddings: vec_id shifted, vectors unchanged.
- dims (region/nation): single copy, as in TPC-H scaling.

events.ts is cast to microsecond TIMESTAMP on write (the source's
TIMESTAMP(NANOS) quirk is a property of the driver's generator, not of
scale). Output: bench/sf1_equiv/*.parquet (~10× sf0.1; NOT committed).

Usage: python bench/make_sf1.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1_equiv")
R = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE MACRO src(t) AS TABLE SELECT * FROM read_parquet('{SRC}/' || t || '.parquet')")

    def shift(table: str, expr: str) -> None:
        con.execute(
            f"COPY ({expr}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
        print(f"{table:12s} {n:>12,}")

    mx = {t: con.execute(f"SELECT max({k}) + 1 FROM src('{t}')").fetchone()[0]
          for t, k in [("events", "event_id"), ("orders", "o_orderkey"),
                       ("customer", "c_custkey"), ("part", "p_partkey"),
                       ("supplier", "s_suppkey"), ("documents", "doc_id"),
                       ("embeddings", "vec_id")]}
    mxu = con.execute("SELECT max(user_id) + 1 FROM src('events')").fetchone()[0]

    rep = f"CROSS JOIN range({R}) rr(r)"
    shift("events", f"""
        SELECT * EXCLUDE (r) REPLACE (event_id + r * {mx['events']} AS event_id,
                          user_id + r * {mxu} AS user_id,
                          ts::TIMESTAMP AS ts)
        FROM src('events') {rep}""")
    shift("documents", f"""
        SELECT * EXCLUDE (r) REPLACE (doc_id + r * {mx['documents']} AS doc_id,
                          CASE WHEN r = 0 THEN text
                               ELSE regexp_replace(text, '(\\S+)',
                                                   'q' || r || '\\1', 'g')
                          END AS text)
        FROM src('documents') {rep}""")
    shift("embeddings", f"""
        SELECT * EXCLUDE (r) REPLACE (vec_id + r * {mx['embeddings']} AS vec_id)
        FROM src('embeddings') {rep}""")
    shift("customer", f"""
        SELECT * EXCLUDE (r) REPLACE (c_custkey + r * {mx['customer']} AS c_custkey)
        FROM src('customer') {rep}""")
    shift("orders", f"""
        SELECT * EXCLUDE (r) REPLACE (o_orderkey + r * {mx['orders']} AS o_orderkey,
                          o_custkey + r * {mx['customer']} AS o_custkey)
        FROM src('orders') {rep}""")
    shift("lineitem", f"""
        SELECT * EXCLUDE (r) REPLACE (l_orderkey + r * {mx['orders']} AS l_orderkey,
                          l_partkey + r * {mx['part']} AS l_partkey,
                          l_suppkey + r * {mx['supplier']} AS l_suppkey)
        FROM src('lineitem') {rep}""")
    shift("part", f"""
        SELECT * EXCLUDE (r) REPLACE (p_partkey + r * {mx['part']} AS p_partkey)
        FROM src('part') {rep}""")
    shift("supplier", f"""
        SELECT * EXCLUDE (r) REPLACE (s_suppkey + r * {mx['supplier']} AS s_suppkey)
        FROM src('supplier') {rep}""")
    shift("nation", "SELECT * FROM src('nation')")
    shift("region", "SELECT * FROM src('region')")


if __name__ == "__main__":
    main()
