"""Scale sweep for the packed banded-Hamming pair engines
(dedup.packed_hamming_pairs / packed_wide_pairs) on synthetic hashes —
the measurement behind the signature-width claim in SCALE.md:

- At a FIXED Hamming budget (<= 7), a 64-bit signature forces 8-bit
  band keys: 256 buckets per band, so candidate mass is Theta(n^2/256)
  on ANY corpus once n passes ~1e6 distinct hashes. The engine's
  max_candidate_mass pre-flight must FAIL FAST there (seconds, one
  bucket-count aggregate) instead of attempting the join.
- A 256-bit signature gives the same budget 32-bit keys (4.3e9
  buckets): collision-driven mass ~ n^2 * bands / 2^32 stays in the
  linear regime at any realistic corpus size, so the wide engine runs
  the SAME n comfortably, with planted near-dups recalled exactly.

Corpus: n ids with 4x xxhash64-seeded words (uniform 256-bit hashes);
1% planted near-dup partners at Hamming 3 (word 0 XOR 0b1011). The
64-bit leg uses word 0 alone. Prints one JSON line; history lives in
bench/SCALE_NOTES.md.

Usage: python bench/pair_engine_sweep.py [--big]   # --big adds n=1e7
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datatools_spark.operators.dedup import (  # noqa: E402
    packed_hamming_pairs, packed_wide_pairs)
from datatools_spark.session import get_spark  # noqa: E402

DUP_FRAC = 0.01
FLIP = 0b1011            # 3 bits -> planted pairs at hamming 3


def corpus(spark, n: int):
    base = spark.range(n).select(
        F.col("id"),
        F.array(*[F.xxhash64("id", F.lit(s)) for s in range(4)]).alias("h"))
    k = int(n * DUP_FRAC)
    dups = spark.range(k).select(
        (F.col("id") + n).alias("id"),
        F.array(F.xxhash64("id", F.lit(0)).bitwiseXOR(F.lit(FLIP)),
                *[F.xxhash64("id", F.lit(s)) for s in range(1, 4)]).alias("h"))
    return base.unionByName(dups).persist(), k


def main() -> None:
    sizes = [100_000, 1_000_000]
    if "--big" in sys.argv:
        sizes.append(10_000_000)
    spark = get_spark("pair-engine-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"dup_frac": DUP_FRAC, "planted_hamming": 3, "wide": {},
           "narrow_failfast": {}}

    for n in sizes:
        df, k = corpus(spark, n)
        df.count()
        t0 = time.perf_counter()
        pairs = packed_wide_pairs(df, "h", 256, 8, 7, "id")
        found = pairs.count()
        wall = round(time.perf_counter() - t0, 2)
        planted = pairs.where(
            (F.col("b_id") - F.col("a_id") == n)
            & (F.col("hamming") == 3)).count()
        assert planted == k, (planted, k)
        out["wide"][str(n)] = {"sec": wall, "pairs": found,
                               "planted_recalled": planted,
                               "pairs_per_sec_in": round(n / wall)}
        df.unpersist()

    # 64-bit leg: the SAME corpora through 8-bit band keys must trip the
    # pre-flight (mass ~ n^2/512 per band) in seconds, not hours
    for n in sizes[1:]:
        df, _ = corpus(spark, n)
        narrow = df.select("id", F.element_at("h", 1).alias("h64"))
        budget = 100_000_000
        t0 = time.perf_counter()
        try:
            packed_hamming_pairs(narrow, "h64", 64, 8, 7, "id",
                                 hot_bucket_cap=None,
                                 max_candidate_mass=budget).count()
            verdict = "RAN (mass under budget)"
        except RuntimeError as exc:
            verdict = f"fail-fast: {str(exc).split(';')[0]}"
        out["narrow_failfast"][str(n)] = {
            "sec": round(time.perf_counter() - t0, 2),
            "budget": budget, "verdict": verdict}
        df.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
