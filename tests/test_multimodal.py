"""Multimodal plumbing: the Arrow-batched mapInPandas stub must compute
EXACTLY the numbers the declared JVM-expression parity path computes
(operators/multimodal.py extract_features vs extract_features_expr), so
the driver's green hash row on `mm_extract_features` certifies both.
"""

import pytest
from pyspark.sql import functions as F

from datatools_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select(F.col("doc_id").alias("media_id"),
                    F.encode("text", "utf-8").alias("payload")))


def test_mapinpandas_equals_expr_twin(spark, media):
    dim = 8
    arrow = MM.extract_features(media, dim=dim)
    arrow_flat = arrow.select(
        "media_id",
        *[F.round(F.element_at("features", i + 1), 9).alias(f"f{i}")
          for i in range(dim)])
    expr = MM.extract_features_expr(media, dim=dim).select(
        "media_id", *[F.round(F.col(f"f{i}"), 9).alias(f"f{i}")
                      for i in range(dim)])
    a = {r["media_id"]: tuple(r[f"f{i}"] for i in range(dim))
         for r in arrow_flat.collect()}
    b = {r["media_id"]: tuple(r[f"f{i}"] for i in range(dim))
         for r in expr.collect()}
    assert a == b


def test_extract_features_empty_and_null_payload(spark):
    rows = [(1, b""), (2, None), (3, b"abc")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["f0"]
           for r in MM.extract_features_expr(df, dim=2).collect()}
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[3] == pytest.approx(ord("a") / 255.0)


def test_sample_frames_fanout_shape(spark, media):
    out = MM.sample_frames(media, every_n=1)
    # one row per frame 0..len//1000 inclusive; payloads < 1000 bytes → 1 row
    n_media = media.count()
    per = out.groupBy("media_id").count()
    assert per.count() == n_media
    expect = media.select(
        "media_id",
        (F.floor(F.length("payload") / 1000) + 1).alias("e"))
    joined = per.join(expect, "media_id") \
        .where(F.col("count") != F.col("e")).count()
    assert joined == 0


def test_real_decode_path_is_gated(spark, media):
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, decode_stub=False)
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media, decode_stub=False)


def test_resize_plan_never_upscales_and_preserves_aspect(spark):
    from datatools_spark.operators.multimodal import resize_plan
    rows = [(1, 448, 224), (2, 100, 50), (3, 224, 224), (4, 1, 2000)]
    df = spark.createDataFrame(rows, "media_id bigint, width int, height int")
    out = {r["media_id"]: r for r in resize_plan(df, max_side=224).collect()}
    assert (out[1]["out_w"], out[1]["out_h"]) == (224, 112)
    assert (out[2]["out_w"], out[2]["out_h"]) == (100, 50)   # no upscale
    assert out[2]["scale"] == 1.0
    assert (out[3]["out_w"], out[3]["out_h"]) == (224, 224)
    assert out[4]["out_w"] == 1                               # 1-px floor
    assert out[4]["out_h"] == 224


def test_patch_grid_counts_and_coords(spark):
    from datatools_spark.operators.multimodal import patch_grid
    df = spark.createDataFrame([(1, 33, 17)], "media_id bigint, width int, height int")
    rows = patch_grid(df, patch=16).collect()
    # ceil(33/16)=3 x ceil(17/16)=2 -> 6 patches
    assert len(rows) == 6
    coords = {(r["px"], r["py"]) for r in rows}
    assert coords == {(x, y) for x in range(3) for y in range(2)}
    assert len({r["patch_id"] for r in rows}) == 6


def test_patchify_plan_is_shuffle_free(spark):
    from datatools_spark.queries import QUERIES
    plan = QUERIES["mm_patchify"](spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
