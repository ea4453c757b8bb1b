"""Oracle output-type lint — the driver-hash-flap firewall.

The driver canonicalizes DuckDB and Spark results through typed hashing,
so a DuckDB-only output type that Python flattens to a plain value slips
past the local value-compare harness but reds the driver row:

- ``HUGEINT``/``UHUGEINT``: DuckDB's ``sum()`` over INTEGER/BIGINT
  promotes to HUGEINT; Spark emits BIGINT. Hash mismatch, values equal.
  (Shipped red twice: rounds 1-2, ts_sessionize et al.)
- ``TIMESTAMP WITH TIME ZONE``: tz-aware vs Spark's naive timestamp.
  (Round-1 failure class.)

This test DESCRIBEs every registered oracle against the sf0.001 table
schemas — metadata only, no query execution — and fails on any forbidden
column type, so reverting a ``::BIGINT`` cast goes red locally before it
goes red at the driver.
"""

import os

import duckdb
import pytest

from datatools_spark.queries import ORACLE

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FORBIDDEN = ("HUGEINT", "UHUGEINT", "TIMESTAMP WITH TIME ZONE")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_has_no_driver_hostile_types(con, name):
    desc = con.execute(f"DESCRIBE {ORACLE[name]}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc
           if any(f in typ.upper() for f in FORBIDDEN)]
    assert not bad, (
        f"oracle {name!r} emits driver-hostile column types {bad}; "
        f"cast to BIGINT / naive TIMESTAMP in the oracle SQL")
