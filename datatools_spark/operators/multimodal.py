"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct —
the lakehouse-native layout (cf. Spark's built-in ``binaryFile`` source).
The Spark-side plumbing (schemas, batch iteration via ``mapInPandas``,
partition sizing) is real and tested; the actual codec work is STUBBED
(``decode_stub=True`` produces a deterministic fake; ``False`` raises
``NotImplementedError``) because image/audio libraries are not available
in this environment. Swapping the stub for PIL/librosa is a one-function
change — the distributed shape does not move.

Scale notes: binary payloads dominate row size → ``maxPartitionBytes``
governs scan parallelism; feature extraction is a ``mapInPandas`` over
Arrow batches (no per-row Python), and outputs (small feature vectors)
should be written to a separate table to avoid re-shipping payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA", "attach_media_metadata", "extract_features",
    "extract_features_expr", "sample_frames", "resize_plan", "patch_grid",
]

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("meta", StructType([
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("sample_rate", LongType(), True),
    ]), True),
])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          kind: str = "image") -> DataFrame:
    """Derive cheap metadata JVM-side (no decode): payload length, kind,
    content fingerprint. Deep metadata (width/height/duration) requires the
    decode path below."""
    return (df
            .withColumn("kind", F.lit(kind))
            .withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))
            .withColumn("content_md5", F.md5(F.col(payload_col))))


def _fake_feature(payload: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: feature i is
    byte ``payload[i % len]`` scaled to [0, 1] — chosen because the very
    same number is expressible as a pure SQL scalar in any engine
    (``ascii(substr(...)) / 255``), making the stub ORACLE-CHECKABLE
    (see :func:`extract_features_expr`), not just stable."""
    if payload is None:
        return [0.0] * dim
    return [float(payload[i % len(payload)]) / 255.0 if payload else 0.0
            for i in range(dim)]


def extract_features_expr(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "media_id", dim: int = 8) -> DataFrame:
    """JVM-expression twin of :func:`extract_features`'s stub: one column
    per feature, ``f{i} = byte(payload, i % n) / 255``, via
    decode→substr→ascii (byte == codepoint for ASCII payloads — asserted
    by the equality test against the mapInPandas path).

    This is the declared parity path: whole-stage-codegen'd, no Python in
    the loop, and reproducible in DuckDB for the correctness oracle. The
    Arrow-batched :func:`extract_features` stays the shape a real
    decoder+encoder would use at 100 TB.
    Output: ``id_col, f0 .. f{dim-1}`` (doubles in [0, 1]).
    """
    s = F.decode(F.col(payload_col), "UTF-8")
    n = F.length(s)
    cols = []
    for i in range(dim):
        byte_i = F.ascii(F.substring(s, (F.lit(i) % n) + F.lit(1), F.lit(1)))
        f = F.when(n.isNull() | (n == 0), F.lit(0.0)) \
             .otherwise(byte_i.cast("double") / F.lit(255.0))
        cols.append(f.alias(f"f{i}"))
    return df.select(F.col(id_col), *cols)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id", dim: int = 8,
                     decode_stub: bool = True) -> DataFrame:
    """Batchwise feature extraction via ``mapInPandas`` (Arrow batches).

    Real pipeline would decode (PIL/ffmpeg/librosa) and run an encoder per
    batch; here the decode step is a deterministic stub (see module note).
    Output: ``(media_id, features array<double>)``.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use decode_stub=True for the plumbing path")

    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ])

    def _batches(it: Iterator):
        import pandas as pd
        for pdf in it:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [_fake_feature(p, dim) for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(_batches, out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", every_n: int = 10,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    Stub emits ``n_bytes // (every_n * 1000)`` synthetic frame indices so
    the explode/fan-out shape (and its effect on partition sizing) is
    exercised without a codec.
    """
    if not decode_stub:
        raise NotImplementedError("frame decode requires ffmpeg bindings")
    n_frames = (F.length(F.col(payload_col)) / F.lit(every_n * 1000)).cast("int")
    return (df.withColumn("frame_idx",
                          F.explode(F.sequence(F.lit(0), F.greatest(n_frames, F.lit(0)))))
            .select(F.col(id_col), "frame_idx",
                    F.md5(F.concat(F.col(payload_col),
                                   F.col("frame_idx").cast("string"))).alias("frame_fingerprint")))


def resize_plan(df: DataFrame, max_side: int = 224,
                width_col: str = "width", height_col: str = "height",
                id_col: str = "media_id") -> DataFrame:
    """Aspect-preserving thumbnail planning — the metadata half of an
    image resize (the pixel op itself is the stubbed decode path): scale
    = max_side / longest side (never upscale), output dims floored with
    a 1-px floor guard. Pure row-local arithmetic: plans for 100 TB of
    images are computed in one codegen'd scan of the (small) metadata
    columns — payload bytes untouched.

    Output: ``id_col, width, height, scale, out_w, out_h``.
    """
    w, h = F.col(width_col).cast("double"), F.col(height_col).cast("double")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(float(max_side)) / longest) \
             .otherwise(F.lit(1.0))
    out_w = F.greatest(F.floor(w * scale), F.lit(1)).cast("bigint")
    out_h = F.greatest(F.floor(h * scale), F.lit(1)).cast("bigint")
    return df.select(F.col(id_col), F.col(width_col), F.col(height_col),
                     F.round(scale, 6).alias("scale"),
                     out_w.alias("out_w"), out_h.alias("out_h"))


def patch_grid(df: DataFrame, patch: int = 16,
               width_col: str = "width", height_col: str = "height",
               id_col: str = "media_id") -> DataFrame:
    """ViT-style patch tiling plumbing: one row per ``patch``×``patch``
    tile of each image (ceil-division grid, edge tiles clipped by the
    consumer). The fan-out is a computed-sequence explode — zero
    shuffle, rows inherit the scan's partitioning; per-patch work
    (the decode+crop, stubbed here) would run where the bytes already
    live. Output: ``id_col, px, py, patch_id`` with ``patch_id`` a
    deterministic md5 of (id, px, py) — the join key a downstream
    encoder table would use.
    """
    nx = F.ceil(F.col(width_col) / F.lit(patch)).cast("int")
    ny = F.ceil(F.col(height_col) / F.lit(patch)).cast("int")
    n = (nx * ny).cast("int")
    g = df.select(F.col(id_col), nx.alias("_nx"),
                  F.explode(F.sequence(F.lit(0), n - 1)).alias("_i"))
    px = (F.col("_i") % F.col("_nx")).cast("bigint")
    py = F.floor(F.col("_i") / F.col("_nx")).cast("bigint")
    return g.select(
        F.col(id_col), px.alias("px"), py.alias("py"),
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          px.cast("string"), py.cast("string")))
        .alias("patch_id"))
