"""HOBOware weather-station CSV reader (melt_model.py:48-166).

HOBO exports: line 0 plot title, line 1 column names (quoted, with serial
numbers), then data; '#' row-number column; na sentinels -888.88/-888.9.
Columns are bound by SUBSTRING match (melt_model.py:101-126) — the fuzzy
schema system SURVEY §1.3 flags as easy to get subtly wrong; locked by
tests on header fixtures.

Same scale pattern as cr1000: driver-side prefix read for names, one
distributed schema'd scan for the body.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

__all__ = ["rename_map_from_headers", "read_hobo_csv", "read_and_rename_hobo"]

# melt_model.py:101-126 substring → canonical name (order matters: first hit
# wins; 'Temp' must not shadow 'DewPt' etc., so specific strings first)
_SUBSTRING_RENAMES = [
    ("RH", "RH"),
    ("Gust", "Gust"),
    ("Wind Speed", "Wind_speed"),
    ("Wind Direction", "Wind_direction"),
    ("DewPt", "DewPt"),
    ("Abs Pres", "Abs_pressure"),
    ("Rain", "Rain"),
    ("Temp", "Temp"),
]
_NA_VALUES = ("-888.88", "-888.9")


def rename_map_from_headers(headers: list[str]) -> dict[str, str]:
    """Map raw HOBO headers → canonical names; up to two Solar sensors get
    Solar1/Solar2 in file order (melt_model.py:113-121)."""
    out: dict[str, str] = {}
    solar_n = 0
    for h in headers:
        if h.strip() in ("#", ""):
            continue
        if "Date Time" in h or h == "ts":
            out[h] = "ts"
            continue
        if "Solar" in h:
            solar_n += 1
            out[h] = f"Solar{solar_n}"
            continue
        for sub, name in _SUBSTRING_RENAMES:
            if sub.lower() in h.lower():
                out[h] = name
                break
    return out


def read_hobo_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 ``read_hobo_csv`` (melt_model.py:48-128): skiprows=1 semantics,
    '#' column deleted, substring renames, -888.* nulls."""
    with open(path, newline="") as fh:
        fh.readline()                       # plot title
        headers = next(csv.reader(io.StringIO(fh.readline())))
    renames = rename_map_from_headers(headers)
    fields = []
    seen: dict[str, int] = {}
    for h in headers:
        canon = renames.get(h)
        if canon == "ts":
            fields.append(StructField("ts", StringType()))
        elif canon is None:
            fields.append(StructField(f"_drop_{len(fields)}", StringType()))
        else:
            # two raw headers mapping to one canonical name (e.g. two
            # 'Temp, °C (S/N ...)' sensors — only the Solar pair gets
            # explicit 1/2 suffixes) would produce duplicate schema
            # fields and AMBIGUOUS_REFERENCE on the first withColumn;
            # suffix repeats in file order instead
            n = seen.get(canon, 0)
            seen[canon] = n + 1
            fields.append(StructField(
                canon if n == 0 else f"{canon}{n + 1}", DoubleType()))
    df = (spark.read.schema(StructType(fields))
          .option("quote", '"')
          .csv(path))
    for na in _NA_VALUES:   # numeric sentinel nulls (schema'd read keeps them)
        for f_ in fields:
            if isinstance(f_.dataType, DoubleType):
                df = df.withColumn(f_.name, F.when(
                    F.col(f_.name) == float(na), F.lit(None)).otherwise(F.col(f_.name)))
    df = (df.withColumn("ts", F.try_to_timestamp(F.col("ts"), F.lit("MM/dd/yy hh:mm:ss a")))
          .where(F.col("ts").isNotNull()))
    return df.drop(*[f_.name for f_ in fields if f_.name.startswith("_drop_")])


def read_and_rename_hobo(spark: SparkSession, path: str,
                         single_solar_site: bool = False) -> DataFrame:
    """S6 ``read_and_rename_hobo`` (melt_model.py:131-166): decide
    incoming-vs-reflected by comparing the two solar columns' means
    (the smaller mean is the reflected sensor — melt_model.py:147-153);
    one tiny aggregate action, then a conditional rename.

    ``single_solar_site``: 2018 LOWC*/HIGH* files with one sensor →
    Solar1 is incoming (melt_model.py:156-162).
    """
    df = read_hobo_csv(spark, path)
    if "Solar2" not in df.columns or single_solar_site:
        if "Solar1" in df.columns:
            df = df.withColumnRenamed("Solar1", "Solar_incoming")
        return df
    m = df.agg(F.avg("Solar1").alias("m1"), F.avg("Solar2").alias("m2")).collect()[0]
    if m["m1"] is not None and m["m2"] is not None and m["m1"] < m["m2"]:
        mapping = {"Solar1": "Solar_reflected", "Solar2": "Solar_incoming"}
    else:
        mapping = {"Solar1": "Solar_incoming", "Solar2": "Solar_reflected"}
    return df.withColumnsRenamed(mapping)
