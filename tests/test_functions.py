"""Unit tests: units registry, physics expressions, time utils, text
analysis, window-spec normalization, similarity primitives."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from datatools_spark.functions.physics import (
    add_in_quadrature, gwl_to_fob, masl_to_pct_overburden, melt_expr,
    wlb_to_fob,
)
from datatools_spark.functions.timeutils import parse_duration_seconds
from datatools_spark.functions.units import convert, convert_col, register
from datatools_spark.operators.similarity import cosine_expr
from datatools_spark.operators.text import (
    fingerprint_col, lang_id_col, token_count_col, word_shingles,
)
from datatools_spark.operators.windowspec import normalize_window


def test_unit_registry_reference_parity():
    # units.py:33-43 registry values
    assert convert("mbar", "mH2O") == 0.0102
    assert convert("ft", "m") == 0.3048
    assert convert("in", "mm") == 25.4
    # reciprocal lookup (units.py:58-64)
    assert convert("m", "ft") == pytest.approx(1 / 0.3048)
    assert convert("x", "x") == 1.0
    with pytest.raises(KeyError):
        convert("furlong", "m")
    register("furlong", "m", 201.168)
    assert convert("m", "furlong") == pytest.approx(1 / 201.168)
    # round-trip invariant (SURVEY §5 property-test plan)
    for a, b in [("mbar", "mH2O"), ("ft", "m"), ("in", "mm")]:
        assert convert(a, b) * convert(b, a) == pytest.approx(1.0)


def test_parse_duration():
    assert parse_duration_seconds("3T") == 180
    assert parse_duration_seconds("2H") == 7200
    assert parse_duration_seconds("1D6H") == 108000
    assert parse_duration_seconds("90min") == 5400
    assert parse_duration_seconds(42) == 42.0
    assert parse_duration_seconds(dt.timedelta(hours=1)) == 3600
    with pytest.raises(ValueError):
        parse_duration_seconds("3parsecs")


def test_physics_expressions(spark):
    df = spark.createDataFrame([(460.0,)], "wlb double")
    r = df.select(
        wlb_to_fob("wlb", 500.0).alias("fob"),
        masl_to_pct_overburden(F.lit(700.0), 300.0, 500.0).alias("pct"),
        add_in_quadrature(F.lit(3.0), F.lit(4.0)).alias("quad"),
        melt_expr(F.lit(5.0), F.lit(400.0), F.lit(0.3)).alias("melt"),
        melt_expr(F.lit(-5.0), F.lit(400.0), F.lit(0.3)).alias("melt_cold"),
    ).first()
    assert r["fob"] == pytest.approx(460.0 / (0.917 * 500.0))
    assert r["pct"] == pytest.approx(100 * 400.0 / (0.917 * 500.0))
    assert r["quad"] == 5.0
    assert r["melt"] == pytest.approx(0.05 * 5 + 0.0094 * 0.7 * 400)
    assert r["melt_cold"] == 0.0


def test_convert_col(spark):
    df = spark.createDataFrame([(10.0,)], "x double")
    assert df.select(convert_col("x", "ft", "m")).first()[0] == pytest.approx(3.048)


def test_lang_id_and_tokens(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"),
         (2, "el gato y la casa de madrid"),
         (3, "xyz qrs"),
         (4, "   ")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", lang_id_col("text").alias("lang"),
        token_count_col("text").alias("n")).collect()}
    assert rows[1]["lang"] == "en" and rows[1]["n"] == 8
    assert rows[2]["lang"] == "es"
    assert rows[3]["lang"] == "und"
    assert rows[4]["n"] == 0


def test_fingerprint_canonicalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "different")],
        "doc_id long, text string")
    fps = [r[0] for r in df.select(fingerprint_col("text")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_word_shingles_edges(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["sh"] for r in
           df.select("doc_id", word_shingles("text").alias("sh")).collect()}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == [] and got[3] == []


def test_cosine_expr(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.6, 0.8])],
                               "a array<double>, b array<double>")
    assert df.select(cosine_expr(F.col("a"), F.col("b"))).first()[0] \
        == pytest.approx(0.6)


def test_normalize_window_forms(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6), 1.0), (dt.datetime(2024, 1, 20, 18), 2.0)],
        "ts timestamp, v double")
    s, e = normalize_window(("2024-01-02", "2024-01-05"))
    assert s == dt.datetime(2024, 1, 2) and e == dt.datetime(2024, 1, 5, 23, 59, 59)
    s, e = normalize_window(("first", "last"), df)
    assert s == dt.datetime(2024, 1, 1, 6) and e == dt.datetime(2024, 1, 20, 18)
    s, e = normalize_window(5, df)
    assert e - s == dt.timedelta(days=5)
    s, e = normalize_window("2024-01")
    assert s == dt.datetime(2024, 1, 1) and e == dt.datetime(2024, 1, 31, 23, 59, 59)
    with pytest.raises(ValueError):
        normalize_window(("2024-01-05", "2024-01-02"))
