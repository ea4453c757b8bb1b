"""XL scale probe: the banded pair engines at 1e8 hashes (r10 VERDICT
#6) — the same protocol that staked VELOCITY_APPROX_THRESHOLD_ROWS.
Input is generated DISTRIBUTED via ``spark.range`` (no driver in the
data path), so per-partition behavior at 32 partitions matches what a
real cluster would put in one task.

Four legs, each answering one operating question at 1e8:

1. **wide** — ``packed_wide_pairs`` (256-bit, 8 bands, budget 7) over
   1e8 uniform hashes + 1% planted near-dups at Hamming 3, with the
   DEFAULT ``max_candidate_mass="auto"`` pre-flight live. Exact recall
   asserted. This is the engine the refusal messages point narrow
   corpora at — it must actually run at the refusal scale.
2. **narrow_failfast** — ``packed_hamming_pairs`` (64-bit, 8-bit band
   keys) over the same 1e8 corpus with ``"auto"``: the inherent
   structural mass is bands·n²/2^(w+1) ≈ 1.6e14 verified candidates
   (≈ 50 days at the measured verify throughput below), so the capped
   auto budget (``STRUCTURAL_CAP_PER_HASH``) must REFUSE in pre-flight
   seconds, not attempt the join. The probe times the refusal. The
   first full run refused via the hot-bucket Jensen bound after the
   127.5 s banding-detection aggregate; that run motivated the
   CLOSED-FORM structural refusal (bands·Σ_s jensen(n, w+s_w) off the
   budget-resolution aggregate alone — zero banding jobs), which this
   leg now times instead.
3. **hot** — ``packed_hamming_pairs`` (64-bit, 4 bands → 16-bit keys)
   at 1e7 with a PLANTED hot bucket: 2e5 distinct hashes sharing one
   band-0 key (C(2e5,2) ≈ 2e10 candidates in ONE bucket — one reduce
   task, days). The probe records the unrefined vs sub-band-refined
   mass and asserts the planted in-bucket near-dups are still recalled
   exactly (pigeonhole holds through re-banding).
4. **minhash** — ``minhash_lsh_pairs`` end-to-end (shingle → 16
   minhashes → 4-band index → verify) over 1e8 synthetic docs with 1%
   planted exact dups, recall asserted. The cold leg: text bytes are
   generated JVM-side, signatures localCheckpoint once, verify joins
   read them twice.

The cold (un-hot) portion of leg 3 doubles as the VERIFY-THROUGHPUT
measurement that stakes ``STRUCTURAL_CAP_PER_HASH``'s feasibility
argument: its candidate mass is known exactly from the pre-flight
aggregate, so mass/wall is the box's verified-candidates-per-second.

Prints one JSON line; results land in bench/SCALE_NOTES.md (round 11).

Usage: python bench/pair_xl.py [--rows N] [--minhash-rows N]
       [--legs wide,narrow,hot,minhash]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import membw_sample  # noqa: E402
from datatools_spark.operators.dedup import (  # noqa: E402
    auto_mass_budget, minhash_lsh_pairs, packed_hamming_pairs,
    packed_wide_pairs)
from datatools_spark.session import get_spark  # noqa: E402
from pair_engine_sweep import corpus  # noqa: E402

DUP_FRAC = 0.01


def leg_wide(spark, n: int) -> dict:
    df, k = corpus(spark, n)
    gen0 = time.perf_counter()
    df.count()
    gen_s = round(time.perf_counter() - gen0, 1)
    t0 = time.perf_counter()
    pairs = packed_wide_pairs(df, "h", 256, 8, 7, "id",
                              max_candidate_mass="auto")
    found = pairs.count()
    wall = round(time.perf_counter() - t0, 1)
    planted = pairs.where((F.col("b_id") - F.col("a_id") == n)
                          & (F.col("hamming") == 3)).count()
    assert planted == k, (planted, k)
    df.unpersist()
    return {"rows": n, "gen_s": gen_s, "sec": wall, "pairs": found,
            "planted": k, "planted_recalled": planted,
            "hashes_per_sec": round(n / wall)}


def leg_narrow_failfast(spark, n: int) -> dict:
    df, _ = corpus(spark, n)
    narrow = df.select("id", F.element_at("h", 1).alias("h64"))
    budget = auto_mass_budget(int(n * (1 + DUP_FRAC)), 8, 8)
    t0 = time.perf_counter()
    try:
        packed_hamming_pairs(narrow, "h64", 64, 8, 7, "id",
                             max_candidate_mass="auto").count()
        verdict = "RAN — auto admitted the corpus (cap regression!)"
    except RuntimeError as exc:
        verdict = f"fail-fast: {str(exc).split(';')[0]}"
    wall = round(time.perf_counter() - t0, 1)
    df.unpersist()
    # inherent structural mass the cap refused to admit
    inherent = (8 * n * n) >> 9
    return {"rows": n, "sec": wall, "auto_budget": budget,
            "inherent_mass": inherent, "verdict": verdict}


def hot_corpus(spark, n: int, hot_n: int):
    """64-bit hashes: uniform base; ``hot_n`` DISTINCT hashes sharing
    band-0's 16-bit key (0xBEEF) with 1% planted in-bucket partners at
    Hamming 3 (one flipped bit in EACH of bands 1..3 — partners stay in
    the hot bucket, disagree in every other band, and land in distinct
    sub-bands under the refinement's 4x12-bit re-banding of bits 16..63,
    so recall is attributable to the hot-bucket sub-band path alone)."""
    base = spark.range(n).select(
        F.col("id"), F.xxhash64("id", F.lit(99)).alias("h64"))
    hot = spark.range(n, n + hot_n).select(
        F.col("id"),
        F.shiftleft(F.xxhash64("id"), 16)
        .bitwiseOR(F.lit(0xBEEF)).alias("h64"))
    k = int(hot_n * DUP_FRAC)
    partners = spark.range(n, n + k).select(
        (F.col("id") + hot_n).alias("id"),
        F.shiftleft(F.xxhash64("id"), 16)
        .bitwiseOR(F.lit(0xBEEF))
        .bitwiseXOR(F.lit((1 << 17) | (1 << 33) | (1 << 49))).alias("h64"))
    return base.unionByName(hot).unionByName(partners).persist(), k, hot_n


def leg_hot(spark, n: int) -> dict:
    hot_n = 200_000
    df, k, _ = hot_corpus(spark, n, hot_n)
    df.count()
    # unrefined mass of the planted bucket alone (what ONE reduce task
    # would verify without re-banding) vs the engine's refined total
    unrefined_hot = hot_n * (hot_n - 1) // 2
    t0 = time.perf_counter()
    pairs = packed_hamming_pairs(df, "h64", 64, 4, 3, "id",
                                 max_candidate_mass="auto")
    found = pairs.count()
    wall = round(time.perf_counter() - t0, 1)
    planted = pairs.where((F.col("b_id") - F.col("a_id") == hot_n)
                          & (F.col("hamming") == 3)
                          & (F.col("b_id") >= n + hot_n)).count()
    assert planted == k, (planted, k)
    # cold structural mass (uniform part, 16-bit keys): the throughput
    # denominator — the hot bucket's refined contribution is negligible
    cold_mass = (4 * n * n) >> 17
    df.unpersist()
    return {"rows": n, "hot_bucket": hot_n, "sec": wall, "pairs": found,
            "planted_in_bucket": k, "planted_recalled": planted,
            "unrefined_hot_mass": unrefined_hot,
            "approx_cold_mass": cold_mass,
            "verify_cands_per_sec": round(cold_mass / wall)}


def synth_docs(spark, n: int):
    """1e8 distinct 8-word docs JVM-side + 1% exact-dup partners (the
    dup of doc i carries doc i's text verbatim → Jaccard 1.0)."""
    words = [F.conv(F.xxhash64("src", F.lit(s)).cast("string"), 10, 36)
             for s in range(8)]
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("src"))
    k = int(n * DUP_FRAC)
    dups = spark.range(k).select(
        (F.col("id") + n).alias("doc_id"), F.col("id").alias("src"))
    return (base.unionByName(dups)
            .select("doc_id", F.concat_ws(" ", *words).alias("text")),
            k)


def leg_minhash(spark, n: int) -> dict:
    df, k = synth_docs(spark, n)
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(df, "text", "doc_id", num_hashes=16,
                              bands=4, shingle_n=3, threshold=0.5)
    found = pairs.count()
    wall = round(time.perf_counter() - t0, 1)
    planted = pairs.where((F.col("b_id") - F.col("a_id") == n)
                          & (F.col("jaccard_est") == 1.0)).count()
    assert planted == k, (planted, k)
    return {"rows": n, "sec": wall, "pairs": found, "planted": k,
            "planted_recalled": planted, "docs_per_sec": round(n / wall)}


def main() -> None:
    n = 100_000_000
    mh_n = 100_000_000
    legs = "wide,narrow,hot,minhash"
    if "--rows" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--minhash-rows" in sys.argv:
        mh_n = int(sys.argv[sys.argv.index("--minhash-rows") + 1])
    if "--legs" in sys.argv:
        legs = sys.argv[sys.argv.index("--legs") + 1]
    # 256 shuffle partitions: at 1e8 the banding join's sides are
    # ~10-20 GB each — 32 partitions put multi-GB sorts in every task
    # (the r11 first probe run died spilling >80 GB); 256 keeps each
    # task's sort in memory and AQE coalesces the small stages. This is
    # exactly the SCALE.md §2 sizing rule applied to the probe.
    spark = get_spark("pair-xl", extra_conf={
        "spark.sql.shuffle.partitions": "256"})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"load_start": membw_sample("pair_xl_start", calib=True)}
    if "wide" in legs:
        out["wide_1e8"] = leg_wide(spark, n)
        print(json.dumps({"wide": out["wide_1e8"]}), flush=True)
    if "narrow" in legs:
        out["narrow_failfast_1e8"] = leg_narrow_failfast(spark, n)
        print(json.dumps({"narrow": out["narrow_failfast_1e8"]}),
              flush=True)
    if "hot" in legs:
        out["hot_1e7"] = leg_hot(spark, min(n, 10_000_000))
        print(json.dumps({"hot": out["hot_1e7"]}), flush=True)
    if "minhash" in legs:
        out["minhash_1e8"] = leg_minhash(spark, mh_n)
        print(json.dumps({"minhash": out["minhash_1e8"]}), flush=True)
    spark.stop()
    out["load_end"] = membw_sample("pair_xl_end", calib=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
