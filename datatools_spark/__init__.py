"""datatools_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jzmejia/datatools, re-founded on the Spark
DataFrame/SQL stack (Catalyst + Tungsten + AQE) and extended with the
operators a large-scale (100 TB) training-data pipeline needs.

Layout:
- ``session``    — configured SparkSession factory (AQE, UTC, Arrow)
- ``operators/`` — rolling, resample, extrema, velocity, detrend,
                   intervals/as-of, fillna/interpolation, dedup,
                   similarity, text
- ``sources/``   — instrument CSV readers (NEU, TOA5/CR1000, HOBO, GC-NET)
- ``functions/`` — time/unit/physics expression helpers
- ``streaming/`` — Structured Streaming analogues (event-time windows)

Design stance (SURVEY §7): zero Python UDFs on the parity hot path;
every reference operator is a composition of built-in Spark expressions.
"""

from .session import get_spark
from .timeseries import TimeSeriesFrame
from .pipelines import BaseStn, DiurnalExtrema, OnIce, WeatherStation

__all__ = ["get_spark", "TimeSeriesFrame", "BaseStn", "DiurnalExtrema",
           "OnIce", "WeatherStation"]
__version__ = "0.1.0"
