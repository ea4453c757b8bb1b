"""End-to-end tour of the engine's reference-parity API on synthetic data.

Mirrors the three reference workflows (SURVEY §3 E1-E3) the way a
jzmejia/datatools user would run them after switching to Spark:

  E1  OnIce GPS pipeline: errors filter → flow reprojection → smoothing
      → velocity kernel → detrend
  E2  DiurnalExtrema: per-day picks, amplitude threshold, corrections
  E3  WeatherStation melt: shadow correction → albedo → melt model

Run:  python examples/end_to_end.py
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datatools_spark import DiurnalExtrema, OnIce, get_spark
from datatools_spark.melt import calc_melt


def synth_gps(spark, n_days=6, cadence_s=30):
    t0 = dt.datetime(2017, 6, 1)
    rows = []
    for i in range(n_days * 86400 // cadence_s):
        t = t0 + dt.timedelta(seconds=i * cadence_s)
        day = i * cadence_s / 86400.0
        rows.append((t,
                     0.5 + 2.0 * day + 0.05 * math.sin(2 * math.pi * day),
                     0.5 + 1.0 * day,      # strictly positive N/E (A13)
                     -0.02 * day + 0.04 * math.sin(2 * math.pi * (day - 0.25)),
                     0.01, 0.01))
    return spark.createDataFrame(
        rows, "ts timestamp, dnorth double, deast double, dheight double, "
              "dnorth_err double, deast_err double")


def synth_weather(spark, n_days=5):
    t0 = dt.datetime(2017, 7, 1)
    rows = []
    for i in range(n_days * 24 * 4):
        t = t0 + dt.timedelta(minutes=15 * i)
        hod = t.hour + t.minute / 60.0
        sun = max(0.0, math.sin((hod - 6) / 12 * math.pi)) * 800
        rows.append((t, 2.0 + 6 * math.sin((hod - 14) / 24 * 2 * math.pi),
                     sun, sun * 0.35))
    return spark.createDataFrame(
        rows, "ts timestamp, Temp double, Solar_incoming double, "
              "Solar_reflected double")


def main():
    spark = get_spark("datatools-example")
    spark.sparkContext.setLogLevel("ERROR")

    # E1 — GPS velocity (gpstools.py workflow)
    stn = OnIce(synth_gps(spark), "LMID")
    stn = stn.drop_large_errors(0.1).reproject_to_flow_direction()
    vel = stn.calc_velocity("x", stat_window="30T", separation_window="4H")
    print(f"E1 flow angle α = {stn.alpha:.4f} rad, quadrant {stn.which_quadrant()}")
    print("E1 velocity sample:")
    vel.orderBy("date").limit(3).show(truncate=False)
    kept = OnIce.filter_zero(vel, vel_col="xflow_vel")
    print("E1 stats:", stn.stn_stats(kept, vel_col="xflow_vel"))

    # E2 — diurnal extrema on the height component
    series = stn.data.select("ts", F.col("dheight").alias("value"))
    de = DiurnalExtrema(series, min_first=True, max_next_day=True,
                        threshold=0.0)
    print("E2 per-day extrema picks:")
    de.with_amplitude().orderBy("day").show(5, truncate=False)

    # E3 — melt model (melt_model.py workflow)
    wx = synth_weather(spark)
    melt = calc_melt(wx)
    print("E3 daily melt totals (m w.e.):")
    (melt.groupBy(F.date_trunc("DAY", "ts").alias("day"))
         .agg(F.round(F.sum("melt_rate"), 4).alias("daily_melt"))
         .orderBy("day").show(truncate=False))


if __name__ == "__main__":
    main()
