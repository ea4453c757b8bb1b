"""Source-reader tests on synthetic fixture files (FIXTURES.md schemas)."""

import math

import pytest

from datatools_spark.sources.cr1000 import read_cr1000_csv, read_str17_csv
from datatools_spark.sources.gcnet import (
    read_gcnet_headers, read_jar1_data, rename_gcnet_headers,
)
from datatools_spark.sources.hobo import read_and_rename_hobo, read_hobo_csv
from datatools_spark.sources.hydro import calc_stage, read_moulin18
from datatools_spark.sources.neu import (
    load_neu_gps, name_file, station_id_from_path,
)


@pytest.fixture(scope="module")
def neu_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("neu") / "JEME17_GPS_NEU.csv"
    lines = []
    for i in range(48):
        h, m = divmod(i * 30, 60)
        ts = f"2017-07-01 {h:02d}:{m:02d}:00"
        doy = 182 + i * 30 / 1440
        lines.append(f"{ts},{doy:.4f},{0.01 * i:.4f},0.003,{0.02 * i:.4f},"
                     f"0.004,{100 + 0.001 * i:.4f},0.01,0")
    # a null-sentinel row and a large-error row
    lines.append("2017-07-02 00:00:00,183.0,  nan,0.003,0.9,0.004,100.0,0.01,0")
    lines.append("2017-07-02 00:30:00,183.02,0.5,9.9,0.9,9.9,100.0,0.01,0")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_load_neu_gps(spark, neu_file):
    df = load_neu_gps(spark, neu_file)
    assert "err_code" not in df.columns
    assert df.count() == 50
    row = df.where("ts = '2017-07-02 00:00:00'").first()
    assert row["dnorth"] is None          # '  nan' sentinel
    assert df.where("dnorth_err < 1 AND deast_err < 1").count() == 49


def test_station_naming():
    assert station_id_from_path("/data/jeme17_GPS_NEU.csv") == "JEME"
    assert name_file("LMID", 17, "VEL", "NEUXT") == "LMID17_VEL_NEUXT.csv"


TOA5 = """\
"TOA5","JEME","CR1000","12345","CR1000.Std.27","CPU:prog.CR1","1234","Table1"
"TIMESTAMP","RECORD","BattV","Lvl","Freq","Stage","Abl"
"TS","RN","Volts","ft","Hz","in","in"
"","","Avg","Smp","Smp","Smp","Smp"
"2018-07-01 00:00:00",1,12.5,10.0,800.1,24.0,12.0
"2018-07-01 00:15:00",2,12.5,10.5,800.2,25.0,12.0
"2018-07-01 00:30:00",3,12.4,NAN,800.3,70.0,12.0
"2018-07-01 00:45:00",4,12.4,11.0,800.4,26.0,12.0
"""


@pytest.fixture(scope="module")
def toa5_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("toa5") / "jeme18_moulin.csv"
    p.write_text(TOA5)
    return str(p)


def test_read_cr1000(spark, toa5_file):
    df = read_cr1000_csv(spark, toa5_file)
    assert df.count() == 4                   # header lines filtered
    assert "RECORD" not in df.columns and "BattV" not in df.columns
    assert "Freq" not in df.columns
    assert {"ts", "Lvl", "Stage", "Abl"} <= set(df.columns)
    assert df.where("Lvl IS NULL").count() == 1   # 'NAN' sentinel


def test_read_str17_dropna(spark, toa5_file):
    assert read_str17_csv(spark, toa5_file).count() == 3


def test_calc_stage_sentinel_filter(spark, toa5_file):
    df = calc_stage(spark, toa5_file, ref_datum=5.0, bad_data_readout=67.0)
    rows = {r["ts"].minute: r["stage"] for r in df.collect()}
    assert len(rows) == 3                    # the 70.0 readout dropped
    assert rows[0] == pytest.approx(5.0 - 24.0 * 0.0254)


def test_read_moulin18(spark, toa5_file):
    df = read_moulin18(spark, toa5_file)
    row = df.where("ts = '2018-07-01 00:00:00'").first()
    assert row["submerged_depth"] == pytest.approx(-10.0 * 0.3048)
    assert row["logger_to_stream"] == pytest.approx(24.0 * 0.0254)


HOBO = """\
"Plot Title: jeme aws 2017"
"#","Date Time, GMT-02:00","Temp, °C (LGR S/N: 1)","RH, % (LGR S/N: 1)","Solar Radiation, W/m² (LGR S/N: 2)","Solar Radiation, W/m² (LGR S/N: 3)","Wind Speed, m/s (LGR S/N: 4)","Rain, mm"
1,"07/01/17 12:00:00 AM",1.5,80.0,100.0,70.0,3.0,0.0
2,"07/01/17 01:00:00 AM",-888.88,81.0,110.0,75.0,3.5,0.0
3,"07/01/17 02:00:00 AM",2.5,82.0,120.0,80.0,4.0,0.1
"""


@pytest.fixture(scope="module")
def hobo_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("hobo") / "jeme17_aws.csv"
    p.write_text(HOBO)
    return str(p)


def test_read_hobo(spark, hobo_file):
    df = read_hobo_csv(spark, hobo_file)
    assert {"ts", "Temp", "RH", "Solar1", "Solar2", "Wind_speed", "Rain"} \
        <= set(df.columns)
    assert df.count() == 3
    assert df.where("Temp IS NULL").count() == 1   # -888.88 sentinel


def test_hobo_solar_classification(spark, hobo_file):
    df = read_and_rename_hobo(spark, hobo_file)
    # Solar2 mean (75) < Solar1 mean (110) → Solar2 is reflected
    assert "Solar_incoming" in df.columns and "Solar_reflected" in df.columns
    row = df.orderBy("ts").first()
    assert row["Solar_incoming"] == 100.0 and row["Solar_reflected"] == 70.0


GCNET = """\
1 Station Number
2 Year
3 Julian Decimal Time
4 SW_down
5 SW_up
6 TC Air 1
7 TC Air 2
8 Atmos Pressure

1.0 2017.0 182.0000 300.0 210.0 1.0 2.0 900.0
1.0 2017.0 182.0417 310.0 215.0 999.0 2.5 901.0
1.0 2017.0 182.0833 320.0 999.0000 3.0 3.5 902.0
"""


@pytest.fixture(scope="module")
def gcnet_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("gcnet") / "jar1_2017.txt"
    p.write_text(GCNET)
    return str(p)


def test_gcnet_headers(gcnet_file):
    h = read_gcnet_headers(gcnet_file)
    assert h[0] == "Station Number" and len(h) == 8
    assert rename_gcnet_headers(["sw_down total"]) == ["SW_down"]
    with pytest.raises(ValueError):
        rename_gcnet_headers(["bogus header"])


def test_read_jar1(spark, gcnet_file):
    df = read_jar1_data(spark, gcnet_file)
    rows = df.orderBy("ts").collect()
    assert len(rows) == 3
    # JDT 182.0 → day 182 = July 1 (index = Jan 1 + 181 days), hour-rounded
    assert rows[0]["ts"].month == 7 and rows[0]["ts"].day == 1
    assert rows[0]["ts"].hour == 0
    assert rows[1]["ts"].hour == 1                   # 182.0417 ≈ 01:00
    # Avg Air Temp: row-wise mean with 999.0 treated as null
    assert rows[0]["Avg Air Temp"] == pytest.approx(1.5)
    assert rows[1]["Avg Air Temp"] == pytest.approx(2.5)
    assert rows[2]["SW_up"] is None                  # 999.0000 sentinel


def test_load_neu_xt_vel(spark, tmp_path):
    """S2 (gpstools.py:702-726): computed-velocity CSV with malformed
    timestamp rows dropped by try_to_timestamp."""
    from datatools_spark.sources.neu import load_neu_xt_vel
    p = tmp_path / "LMID17_VEL_NEUXT.csv"
    p.write_text(
        "2017-07-01 00:00:00,0.01,0.02,0.00,0.05,0.01\n"
        "2017-07-01 01:00:00,0.02,0.03,0.01,0.06,0.02\n"
        "not-a-timestamp,0.03,0.04,0.02,0.07,0.03\n")
    df = load_neu_xt_vel(spark, str(p))
    assert df.count() == 2
    assert {"N_vel", "E_vel", "U_vel", "X_vel", "T_vel"} <= set(df.columns)
    assert df.agg({"X_vel": "max"}).first()[0] == 0.06


def test_calc_stage_jeme(spark, tmp_path):
    """S11 (hydrotools.py:278-307): sentinel (80) nulls stage, listed
    timestamps nulled (not dropped), second channel converted in→m."""
    import datetime as dt
    from datatools_spark.sources.hydro import calc_stage_jeme
    p = tmp_path / "jeme.dat"
    p.write_text(
        '"TOA5","JEME","CR1000","1","x","y","1","T"\n'
        '"TIMESTAMP","RECORD","Stage","Abl"\n'
        '"TS","RN","in","in"\n'
        '"","","Smp","Smp"\n'
        '"2018-07-01 00:00:00",1,24.0,12.0\n'
        '"2018-07-01 00:15:00",2,85.0,12.0\n'
        '"2018-07-01 00:30:00",3,26.0,12.0\n')
    drop = [dt.datetime(2018, 7, 1, 0, 30)]
    df = calc_stage_jeme(spark, str(p), ref_datum=10.0, drop_timestamps=drop)
    rows = {r["ts"]: r for r in df.collect()}
    assert len(rows) == 3                                   # nulled, not dropped
    ok = rows[dt.datetime(2018, 7, 1, 0, 0)]
    assert ok["stage"] == pytest.approx(10.0 - 24.0 * 0.0254)
    assert ok["logger_to_ground"] == pytest.approx(12.0 * 0.0254)
    assert rows[dt.datetime(2018, 7, 1, 0, 15)]["stage"] is None   # sentinel
    assert rows[dt.datetime(2018, 7, 1, 0, 30)]["stage"] is None   # drop list


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    """JSONL source: valid lines parse to the document schema, corrupt
    lines quarantine with the raw text preserved (never dropped, never
    fatal); writer round-trips; sharded write lays out one dir per key."""
    from datatools_spark.sources.jsonl import (
        read_documents_jsonl, split_corrupt, write_documents_jsonl)
    src = tmp_path / "in.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", '
        '"source": "a", "n_chars": 11}',
        'not json at all',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", '
        '"source": "b", "n_chars": 7}',
        '{"truncated": ',
    ]
    src.write_text("\n".join(lines) + "\n")
    raw = read_documents_jsonl(spark, str(src))
    clean, bad = split_corrupt(raw)
    got = {r.doc_id: (r.text, r.lang, r.source) for r in clean.collect()}
    assert got == {1: ("hello world", "en", "a"), 2: ("bonjour", "fr", "b")}
    badlines = {r[0] for r in bad.collect()}
    assert badlines == {"not json at all", '{"truncated": '}

    out = tmp_path / "out"
    write_documents_jsonl(clean, str(out), shard_by="source")
    import os
    shards = {d for d in os.listdir(out) if d.startswith("source=")}
    assert shards == {"source=a", "source=b"}
    back = read_documents_jsonl(spark, str(out) + "/*")
    clean2, bad2 = split_corrupt(back)
    # partitionBy drops the shard column from the file payload; it comes
    # back via the directory key when reading the root — here we read
    # shard globs, so compare the payload columns
    assert {r.doc_id: r.text for r in clean2.collect()} == \
        {1: "hello world", 2: "bonjour"}
    assert bad2.count() == 0
