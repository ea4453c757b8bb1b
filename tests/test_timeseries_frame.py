"""TimeSeriesFrame chaining: a multi-step pipeline through the wrapper
must equal the same operators applied directly."""

import datetime as dt
import math

import pytest

from datatools_spark.timeseries import TimeSeriesFrame


@pytest.fixture()
def tsf(spark):
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for s in ("A", "B"):
        for i in range(4 * 96):
            v = math.sin(2 * math.pi * i / 96.0) + (2.5 if s == "A" else 5.0)
            if i % 50 == 7:
                v = None
            rows.append((s, t0 + dt.timedelta(minutes=15 * i), v))
    df = spark.createDataFrame(rows, "station string, ts timestamp, value double")
    return TimeSeriesFrame(df, series_keys=["station"], meta={"units": "m"})


def test_chain_clip_interp_rolling_resample(tsf):
    out = (tsf.clip(("2024-01-01", "2024-01-03"))
           .interpolate(["value"])
           .rolling("value", "2h", out_col="sm")
           .resample("1D", {"sm": "mean"}))
    rows = out.sorted().collect()
    assert len(rows) == 6               # 2 stations × 3 days
    assert out.meta["units"] == "m"     # metadata flows through
    a = [r for r in rows if r["station"] == "A"]
    b = [r for r in rows if r["station"] == "B"]
    # B runs 2.5 above A; daily means preserve the offset
    for ra, rb in zip(a, b):
        assert rb["sm"] - ra["sm"] == pytest.approx(2.5, abs=0.05)


def test_extrema_and_velocity_per_series(tsf):
    ex = tsf.daily_extrema()
    assert ex.groupBy("station").count().count() == 2
    vel = tsf.interpolate(["value"]).velocity(["value"], stat_window="1h",
                                              separation_window="6h")
    assert {r["station"] for r in vel.select("station").distinct().collect()} \
        == {"A", "B"}


def test_asof_and_union(tsf, spark):
    right = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 12), 100.0),
         ("B", dt.datetime(2024, 1, 1, 12), 200.0)],
        "station string, ts timestamp, p double")
    out = tsf.clip(("2024-01-01 13:00", "2024-01-01 14:00")).asof_join(
        TimeSeriesFrame(right, series_keys=["station"]), value_cols=["p"])
    got = {r["station"]: r["p"] for r in out.df.collect()}
    assert got == {"A": 100.0, "B": 200.0}


def test_tsf_ewma_and_acf(spark):
    from datatools_spark.timeseries import TimeSeriesFrame
    import datetime as dt
    rows = [(dt.datetime(2020, 1, 1, 0, i), "g", float(i % 5))
            for i in range(60)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, value double")
    tsf = TimeSeriesFrame(df, series_keys=["k"])
    sm = tsf.ewma("value").df
    assert "value_ewma" in sm.columns and sm.count() == 60
    acf = tsf.acf("value", max_lag=5)
    out = {r["lag"]: r for r in acf.collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # value repeats with period 5 -> lag-5 autocorrelation is 1
    assert abs(out[5]["acf"] - 1.0) < 1e-9
    assert out[5]["n_pairs"] == 55
