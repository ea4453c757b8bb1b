"""XL scale probe: the embedding near-dup path at 1e7 vectors — the
last pair family without an XL probe (velocity got 1e8 in r9, the
banded hash engines 1e8 in r11's ``pair_xl.py``).

Input is generated DISTRIBUTED (``spark.range`` + JVM-side ``sin``
components — no driver in the data path). Two legs:

1. **gram** — ``embedding_dup_pairs`` (hyperplane LSH pre-bucket +
   per-bucket BLAS gram via ``grouped_gram_pairs``) over 1e7 64-d
   vectors with 1% planted near-dups at cosine ≈ 1−1e-6. Single-table
   sign-LSH is APPROXIMATE by design — a planted pair is bucketed
   together only when all ``planes`` hyperplanes agree — so the probe
   MEASURES recall (expected (1−θ/π)^planes ≈ 0.94 at these angles)
   and asserts a floor, plus zero spurious pairs (a random 64-d pair
   at cosine ≥ 0.99 is ~8σ; none should survive).
2. **cap** — the same corpus through too few planes (avg bucket ≫
   ``gram_bucket_cap``): the per-bucket gram must FAIL FAST with the
   named group-cap error before any c²·d work starts — the embedding
   twin of the banded engines' hot-bucket/candidate-mass refusals.
   The probe times the refusal.

Prints one JSON line; results land in bench/SCALE_NOTES.md (round 11).

Usage: python bench/emb_xl.py [--rows N] [--planes P] [--legs gram,cap]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import membw_sample  # noqa: E402
from datatools_spark.operators.dedup import embedding_dup_pairs  # noqa: E402
from datatools_spark.session import get_spark  # noqa: E402

DUP_FRAC = 0.01
DIM = 64
EPS = 1e-3  # partner = base + EPS·noise → cosine ≈ 1 − DIM·EPS²/(2‖v‖²)


def _vec(seed_col, salt: int):
    return F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: F.sin(F.xxhash64(seed_col, j + F.lit(salt))
                        .cast("double")))


def corpus(spark, n: int):
    """n base vectors + 1% planted near-dup partners (partner of base
    i is ``v_i + EPS·noise_i``, id = i + n)."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"), _vec(F.col("id"), 0).alias("embedding"))
    k = int(n * DUP_FRAC)
    partners = spark.range(k).select(
        (F.col("id") + n).alias("vec_id"),
        F.zip_with(_vec(F.col("id"), 0), _vec(F.col("id"), 7919),
                   lambda v, e: v + F.lit(EPS) * e).alias("embedding"))
    return base.unionByName(partners), k


def leg_gram(spark, n: int, planes: int) -> dict:
    df, k = corpus(spark, n)
    df = df.localCheckpoint(eager=True)  # pin: gen cost out of the timing
    t0 = time.perf_counter()
    pairs = embedding_dup_pairs(df, "embedding", "vec_id", threshold=0.99,
                                bucket_hyperplanes=planes)
    found = pairs.count()
    wall = round(time.perf_counter() - t0, 1)
    recalled = pairs.where(F.col("b_id") - F.col("a_id") == n).count()
    recall = recalled / k
    assert recall >= 0.8, (recalled, k)
    assert found == recalled, (found, recalled)  # zero spurious at 8σ
    return {"rows": n, "planes": planes, "sec": wall, "pairs": found,
            "planted": k, "recalled": recalled,
            "recall": round(recall, 4),
            "vecs_per_sec": round(n / wall)}


def leg_cap(spark, n: int) -> dict:
    df, _ = corpus(spark, n)
    t0 = time.perf_counter()
    try:
        embedding_dup_pairs(df, "embedding", "vec_id", threshold=0.99,
                            bucket_hyperplanes=6).count()
        verdict = "RAN — group_cap did not refuse (regression!)"
    except Exception as exc:  # noqa: BLE001 — refusal surface under test
        # the cap raises executor-side inside the grouped-map UDF, so
        # the named message sits in the Py4J wrapper's traceback text
        msg = str(exc)
        at = msg.find("group holds")
        verdict = ("fail-fast: " + (msg[at:at + 140] if at >= 0
                                    else msg.splitlines()[0][:140]))
    wall = round(time.perf_counter() - t0, 1)
    return {"rows": n, "planes": 6, "sec": wall, "verdict": verdict}


def main() -> None:
    n = 10_000_000
    planes = 14
    legs = "gram,cap"
    if "--rows" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--planes" in sys.argv:
        planes = int(sys.argv[sys.argv.index("--planes") + 1])
    if "--legs" in sys.argv:
        legs = sys.argv[sys.argv.index("--legs") + 1]
    spark = get_spark("emb-xl", extra_conf={
        "spark.sql.shuffle.partitions": "256"})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"load_start": membw_sample("emb_xl_start", calib=True)}
    if "gram" in legs:
        out["gram"] = leg_gram(spark, n, planes)
        print(json.dumps({"gram": out["gram"]}), flush=True)
    if "cap" in legs:
        out["cap"] = leg_cap(spark, n)
        print(json.dumps({"cap": out["cap"]}), flush=True)
    spark.stop()
    out["load_end"] = membw_sample("emb_xl_end", calib=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
