"""GC-NET space-separated weather file reader (melt_model.py:169-270).

Format: header block of one parameter name per line (optionally prefixed
with a 1-2 digit index, stripped by regex melt_model.py:189) terminated by
a blank line, then whitespace-separated data rows. The 44-parameter
catalog (melt_model.py:614-686) maps fuzzy header text → canonical name.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["GCNET_PARAMETERS", "read_gcnet_headers", "rename_gcnet_headers",
           "read_jar1_data"]

# condensed catalog (melt_model.py:614-686): fuzzy key → canonical name.
GCNET_PARAMETERS = {
    "station number": "Station Number",
    "year": "Year",
    "julian decimal": "Julian Decimal Time",
    "sw_down": "SW_down",
    "sw_up": "SW_up",
    "net radiation": "Net Radiation",
    "tc air 1": "TC Air 1",
    "tc air 2": "TC Air 2",
    "cs500 t air 1": "CS500 T Air 1",
    "cs500 t air 2": "CS500 T Air 2",
    "rh 1": "RH 1",
    "rh 2": "RH 2",
    "u1": "U1",
    "u2": "U2",
    "u dir 1": "U Dir 1",
    "u dir 2": "U Dir 2",
    "atmos pressure": "Atmos Pressure",
    "snow height 1": "Snow Height 1",
    "snow height 2": "Snow Height 2",
    "t snow 1": "T Snow 1",
    "t snow 2": "T Snow 2",
    "battery voltage": "Battery Voltage",
}

_NA_SENTINELS = ("999.0000", "999.0")


def read_gcnet_headers(path: str) -> list[str]:
    """S7 ``read_gcnet_headers`` (melt_model.py:169-192): one name per line
    until the first blank line; numeric prefixes stripped
    (``re.sub('^\\d\\d? ', '', line)``). Driver-side prefix read."""
    headers = []
    with open(path) as fh:
        for line in fh:
            s = line.strip()
            if not s:
                break
            headers.append(re.sub(r"^\d\d? ", "", s))
    return headers


def rename_gcnet_headers(headers: list[str]) -> list[str]:
    """Fuzzy-match each header against the parameter catalog; unmatched
    headers raise (melt_model.py:226-234 parity)."""
    out = []
    for h in headers:
        key = h.lower().strip()
        hit = None
        for fuzzy, canon in GCNET_PARAMETERS.items():
            if fuzzy in key:
                hit = canon
                break
        if hit is None:
            raise ValueError(f"unrecognized GC-NET header: {h!r}")
        out.append(hit)
    return out


def read_jar1_data(spark: SparkSession, path: str) -> DataFrame:
    """S8 ``read_JAR1_data`` (melt_model.py:238-270): whitespace-separated
    scan skipping the header block; na sentinels 999.0; timestamp =
    Year + (Julian Decimal Time − 1) days rounded to the hour; adds
    ``Avg Air Temp`` = row-wise mean of the four air-temperature columns.

    Distributed shape: text scan → split on whitespace → project typed
    columns; header lines drop out via numeric-parse nulls.
    """
    cols = rename_gcnet_headers(read_gcnet_headers(path))
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    # F.get (not getItem): header lines split into fewer tokens than data
    # rows — out-of-bounds must yield null, not an ANSI error.
    df = raw.select(*[
        F.get(parts, i).try_cast("double").alias(c) for i, c in enumerate(cols)
    ]).where(F.col("Year").isNotNull() & F.col("Julian Decimal Time").isNotNull())
    for c in cols:
        df = df.withColumn(c, F.when(
            F.col(c).isin([float(s) for s in _NA_SENTINELS]), F.lit(None)
        ).otherwise(F.col(c)))
    # index = Year start + (JDT − 1) days, rounded to the hour
    # (melt_model.py:259-263); round = truncate(ts + 30min)
    year_start = F.try_to_timestamp(F.concat(F.col("Year").cast("int").cast("string"),
                                         F.lit("-01-01")))
    secs = (F.col("Julian Decimal Time") - 1.0) * 86400.0
    ts = F.timestamp_seconds(year_start.cast("double") + secs)
    df = df.withColumn("ts", F.date_trunc(
        "HOUR", ts + F.expr("INTERVAL 30 MINUTES")))
    temp_cols = [c for c in ("TC Air 1", "TC Air 2", "CS500 T Air 1",
                             "CS500 T Air 2") if c in cols]
    if temp_cols:
        # row-wise mean over available (non-null) readings, pandas
        # df.mean(axis=1) parity (melt_model.py:261-262)
        arr = F.array(*[F.col(f"`{c}`") for c in temp_cols])
        nn = F.filter(arr, lambda x: x.isNotNull())
        df = df.withColumn("Avg Air Temp", F.when(
            F.size(nn) > 0,
            F.aggregate(nn, F.lit(0.0), lambda a, x: a + x) / F.size(nn)))
    return df
