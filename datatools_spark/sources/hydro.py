"""Hydrology stage/level derived readers (hydrotools.py:239-307, 569-586).

Stage computations over CR1000 scans: sensor-saturation sentinel filters,
unit conversion, reference-datum subtraction, timestamp drop-lists. The
reference hard-codes column names where it meant parameters
(hydrotools.py:270, 295-297 — literal ``'data_header'``); we implement
the INTENDED parameterized semantics (SURVEY §5 divergence note).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.units import convert
from .cr1000 import read_cr1000_csv

__all__ = ["calc_stage", "calc_stage_jeme", "read_moulin18",
           "calc_submerged_depth"]


def calc_stage(spark: SparkSession, path: str, ref_datum: float,
               bad_data_readout: float = 67.0,
               data_header: str = "Stage") -> DataFrame:
    """S10 ``calc_stage_radi`` (hydrotools.py:239-275): filter sensor
    saturation (readings ≥ sentinel are the sensor pegged at max range),
    inches→m, ``stage = ref_datum − distance``. Returns (ts, stage)."""
    df = read_cr1000_csv(spark, path)
    k = convert("in", "m")
    return (df.where(F.col(data_header) < bad_data_readout)
            .select("ts", (F.lit(ref_datum) - F.col(data_header) * k).alias("stage")))


def calc_stage_jeme(spark: SparkSession, path: str, ref_datum: float,
                    drop_timestamps: Sequence | None = None,
                    bad_data_readout: float = 80.0,
                    water_sensor: str = "Stage",
                    ablation_sensor: str = "Abl") -> DataFrame:
    """S11 ``calc_stage_jeme`` (hydrotools.py:278-307): stage + a second
    logger→ground channel; listed timestamps nulled (not dropped —
    the reference nulls the water column only, :295-307)."""
    df = read_cr1000_csv(spark, path)
    k = convert("in", "m")
    out = df.select(
        "ts",
        (F.lit(ref_datum) - F.col(water_sensor) * k).alias("stage"),
        (F.col(ablation_sensor) * k).alias("logger_to_ground")
        if ablation_sensor in df.columns else F.lit(None).alias("logger_to_ground"),
        F.col(water_sensor).alias("_raw"))
    out = out.withColumn("stage", F.when(
        F.col("_raw") >= bad_data_readout, F.lit(None)).otherwise(F.col("stage")))
    if drop_timestamps:
        out = out.withColumn("stage", F.when(
            F.col("ts").isin(list(drop_timestamps)), F.lit(None)
        ).otherwise(F.col("stage")))
    return out.drop("_raw")


def calc_submerged_depth(df: DataFrame, level_col: str = "Lvl",
                         zero: float = 0.0) -> DataFrame:
    """M5 ``calc_submerged_depth`` (hydrotools.py:392-394):
    ``−ft→m(Lvl) + zero``."""
    k = convert("ft", "m")
    return df.withColumn("submerged_depth", -(F.col(level_col) * k) + zero)


def read_moulin18(spark: SparkSession, path: str,
                  all_data: bool = False) -> DataFrame:
    """S9 ``read_moulin18`` (hydrotools.py:569-586): CR1000 scan + derived
    ``submerged_depth = −ft→m(Lvl)``; optional Stage/Abl channels converted
    in→m when present (schema-conditional projection)."""
    df = read_cr1000_csv(spark, path)
    df = calc_submerged_depth(df)
    k_in = convert("in", "m")
    if "Stage" in df.columns:
        df = df.withColumn("logger_to_stream", F.col("Stage") * k_in)
    if "Abl" in df.columns:
        df = df.withColumn("logger_to_ground", F.col("Abl") * k_in)
    if not all_data:
        keep = [c for c in ("ts", "submerged_depth", "logger_to_stream",
                            "logger_to_ground") if c in df.columns]
        df = df.select(*keep)
    return df
