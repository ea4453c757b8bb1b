"""Campbell CR1000 / TOA5 data-logger CSV readers (hydrotools.py:207-236).

TOA5 files carry a 4-line header (line 0 station metadata, line 1 column
names, lines 2-3 units/aggregation). pandas does ``skiprows=[0,2,3]``;
Spark cannot skip arbitrary rows in a distributed CSV scan, so:

- the column names come from a driver-side read of the file PREFIX only
  (4 lines — O(1) regardless of file size);
- the body is a normal distributed schema'd scan where the header lines
  simply fail timestamp parsing and are filtered out (``ts IS NOT NULL``)
  — no zipWithIndex, no single-threaded pass, scales to any size.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

__all__ = ["read_header_names", "read_cr1000_csv", "read_str17_csv",
           "DEFAULT_DROP_COLS"]

# hydrotools.py:207-208 diagnostic columns dropped on load
DEFAULT_DROP_COLS = ("RECORD", "BattV", "Freq", "Amp", "SNRat", "NFreq",
                     "DRat", "TR", "TT", "Digits", "PTemp_C")


def read_header_names(path: str, header_line: int = 1) -> list[str]:
    """Driver-side parse of the TOA5 name row (line index 1). Reads only
    the file prefix — constant work for terabyte files."""
    with open(path, newline="") as fh:
        for i, line in enumerate(fh):
            if i == header_line:
                return next(csv.reader(io.StringIO(line)))
    raise ValueError(f"{path}: no header line {header_line}")


def read_cr1000_csv(spark: SparkSession, path: str,
                    drop_cols: Sequence[str] = DEFAULT_DROP_COLS,
                    na_value: str = "NAN") -> DataFrame:
    """S3 ``read_cr1000_csv`` (hydrotools.py:207-228): TOA5 scan with
    ``skiprows=[0,2,3]`` semantics, 'NAN' nulls, diagnostics dropped."""
    names = read_header_names(path)
    fields = [StructField("ts", StringType())]
    fields += [StructField(c, DoubleType()) for c in names[1:]]
    schema = StructType(fields)
    df = (spark.read.schema(schema)
          .option("nullValue", na_value)
          .option("quote", '"')
          .csv(path))
    df = (df.withColumn("ts", F.try_to_timestamp(F.col("ts")))
          .where(F.col("ts").isNotNull()))   # drops all 4 header lines
    keep_drops = [c for c in drop_cols if c in df.columns]
    return df.drop(*keep_drops)


def read_str17_csv(spark: SparkSession, path: str,
                   drop_cols: Sequence[str] = DEFAULT_DROP_COLS) -> DataFrame:
    """S4 ``read_str17_csv`` (hydrotools.py:231-236): S3 + dropna()."""
    return read_cr1000_csv(spark, path, drop_cols).na.drop()
