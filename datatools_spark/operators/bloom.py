"""Bloom-filter pre-filtered semi join (engine add; no reference analogue).

The classic big-big semi-join problem at 100 TB: ``probe SEMI JOIN build``
shuffles the entire probe side on the join key even when only a few
percent survive. A Bloom filter built from the build side and applied
map-side to the probe scan cuts that shuffle volume to (survivors +
false positives) BEFORE any exchange — the same trick Spark's runtime
row-level filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``)
plays, made explicit here so the plan works on any Spark build and the
filter can be persisted/reused across queries.

Shape:
- build: one column-pruned scan of the build side → ``num_hashes``
  md5-derived bit positions per key → one bounded ``distinct`` (at most
  ``num_bits`` rows — the aggregate is capped by the filter size, never
  by build-side cardinality) → driver packs a ``num_bits``-bit bitmask
  (8 KiB at the default 2^16 bits) that broadcasts as a plan literal.
- probe: a pure-expression membership test (all ``num_hashes`` bits set)
  that sits directly on the scan — it whole-stage-codegens and costs no
  shuffle. False-positive survivors are removed by the exact semi join
  that follows, so results are ALWAYS exact; the bloom only sheds volume.

md5-derived positions (not engine-native hash) keep the filter portable:
the same bitmask is reproducible in DuckDB/Trino for cross-engine audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_positions", "bloom_build", "bloom_test_col",
           "bloom_semi_join"]


def bloom_positions(key: Column, num_bits: int, num_hashes: int,
                    salt: str = "bf") -> Column:
    """Array of ``num_hashes`` bit positions in [0, num_bits) for a key:
    position i = first 8 hex digits of md5('salt:i:key') mod num_bits.
    Pure codegen (md5 + conv + pmod), identical in any SQL engine."""
    return F.array(*[
        F.pmod(F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{salt}:{i}:"), key.cast("string"))),
            1, 8), 16, 10).cast("bigint"), F.lit(num_bits))
        for i in range(num_hashes)])


def bloom_build(build: DataFrame, key_col: str, num_bits: int = 1 << 16,
                num_hashes: int = 4, salt: str = "bf") -> list[int]:
    """Build the bitmask: explode each key's positions, distinct (bounded
    by ``num_bits``), collect, pack into 32-bit words carried in longs.

    NULL build keys are ignored — a plain semi join never matches null
    keys, and this filter must equal it (a null key otherwise reached
    the driver packing loop as a None position and crashed it).

    The driver-side collect is bounded by the FILTER size (2^16 bits →
    ≤ 65 536 ints), not the build cardinality — the same legitimacy class
    as collecting k centroids. At 100 TB the distinct is one
    map-side-combined shuffle of ≤ num_bits narrow rows."""
    pos = (build.where(F.col(key_col).isNotNull())
           .select(F.explode(
               bloom_positions(F.col(key_col), num_bits, num_hashes, salt)
           ).alias("p"))
           .distinct().collect())
    # 32-bit words kept in longs: always positive, so both the literal
    # and the power-of-two bit test below stay in exact integer range
    words = [0] * ((num_bits + 31) // 32)
    for row in pos:
        p = row["p"]
        words[p >> 5] |= 1 << (p & 31)
    return words


def bloom_test_col(key: Column, words: list[int], num_bits: int,
                   num_hashes: int, salt: str = "bf") -> Column:
    """Membership test against a packed bitmask literal: true iff ALL
    ``num_hashes`` positions are set. The bitmask rides into the plan as
    an ``array<long>`` literal (num_bits/8 bytes), so the test is a
    shuffle-free scan-side filter."""
    arr = F.array(*[F.lit(w) for w in words])
    test = F.lit(True)
    for i in range(num_hashes):
        p = F.pmod(F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{salt}:{i}:"), key.cast("string"))),
            1, 8), 16, 10).cast("bigint"), F.lit(num_bits))
        word = F.element_at(arr, (p / 32).cast("int") + 1)
        # 2^(p%32) is exact in double up to 2^31, so the mask column is a
        # clean bigint (shiftleft can't take a column shift amount)
        mask = F.pow(F.lit(2.0), (p % 32).cast("int")).cast("bigint")
        bit = word.bitwiseAND(mask)
        test = test & (bit != 0)
    return test


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, num_bits: int = 1 << 16,
                    num_hashes: int = 4, salt: str = "bf") -> DataFrame:
    """Exact semi join with a Bloom pre-filter on the probe side.

    1. bitmask from the build side (one bounded distinct);
    2. map-side bloom test on the probe scan (sheds non-matching rows
       before any exchange);
    3. exact semi join on the survivors (removes false positives).

    Result == plain ``probe.join(build, semi)`` — asserted in tests —
    but the shuffle moves only bloom survivors."""
    words = bloom_build(build, build_key, num_bits, num_hashes, salt)
    pre = probe.where(bloom_test_col(F.col(probe_key), words, num_bits,
                                     num_hashes, salt))
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pre.join(keys, on=probe_key, how="left_semi")
