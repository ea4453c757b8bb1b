"""GNSS NEU position/velocity CSV readers (reference gpstools.py:688-726).

Declared schemas (no inference — SURVEY §4: fixed dtype maps become
explicit StructTypes so the scan is single-pass and pushdown-friendly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

__all__ = ["load_neu_gps", "load_neu_xt_vel", "station_id_from_path", "name_file"]

# gpstools.py:689-696: names + dtypes; index col 0 is the timestamp.
NEU_SCHEMA = StructType([
    StructField("ts", StringType()),       # parsed below (multiple formats)
    StructField("doy", DoubleType()),
    StructField("dnorth", DoubleType()),
    StructField("dnorth_err", DoubleType()),
    StructField("deast", DoubleType()),
    StructField("deast_err", DoubleType()),
    StructField("dheight", DoubleType()),
    StructField("dheight_err", DoubleType()),
    StructField("err_code", LongType()),
])

VEL_SCHEMA = StructType([
    StructField("ts", StringType()),
    StructField("N_vel", DoubleType()),
    StructField("E_vel", DoubleType()),
    StructField("U_vel", DoubleType()),
    StructField("X_vel", DoubleType()),
    StructField("T_vel", DoubleType()),
])


def load_neu_gps(spark: SparkSession, path: str, tz_utc: bool = True) -> DataFrame:
    """S1 ``load_NEUgps`` (gpstools.py:688-699): fixed 8-col schema,
    ``'  nan'`` null sentinel, drop ``err_code``, UTC timestamps.

    One distributed CSV scan; adding files/partitions scales linearly.
    """
    df = (spark.read.schema(NEU_SCHEMA)
          .option("nullValue", "  nan")
          .option("mode", "PERMISSIVE")
          .csv(path))
    ts = F.try_to_timestamp(F.col("ts"))   # ANSI-safe: header/garbage rows -> null
    df = df.withColumn("ts", ts).where(F.col("ts").isNotNull())
    return df.drop("err_code")   # gpstools.py:697


def load_neu_xt_vel(spark: SparkSession, path: str) -> DataFrame:
    """S2 ``load_NEUXTvel`` (gpstools.py:702-726): computed-velocity file,
    m/day columns."""
    df = spark.read.schema(VEL_SCHEMA).csv(path)
    return (df.withColumn("ts", F.try_to_timestamp(F.col("ts")))
            .where(F.col("ts").isNotNull()))


def station_id_from_path(path: str) -> str:
    """S12 ``get_station_name`` (gpstools.py:184-201): first 4 chars of the
    file name, uppercased."""
    return os.path.basename(path)[:4].upper()


def name_file(stn_id: str, year2: int, dat: str, flag: str, ext: str = "csv") -> str:
    """S13 ``_name_file`` (gpstools.py:617-637): ``CODEYY_DAT_FLAG.ext``
    sink naming, e.g. LMID17_VEL_NEUXT.csv."""
    return f"{stn_id}{year2:02d}_{dat}_{flag}.{ext}"
