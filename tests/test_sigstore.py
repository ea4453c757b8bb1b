"""Incremental signature store: idempotent appends; batch-vs-store LSH
pairs equal the full-corpus LSH restricted to the batch."""

from datatools_spark.operators.dedup import minhash_lsh_pairs
from datatools_spark.operators.sigstore import (
    lsh_pairs_against_store, update_signature_store)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _corpus(tag, base, n, dup_of=None):
    out = []
    for i in range(n):
        words = " ".join(f"{tag}{(i * 7 + j) % 23}" for j in range(12))
        out.append((base + i, words))
    if dup_of:
        out += [(base + n + k, text) for k, (_, text) in enumerate(dup_of)]
    return out


def test_incremental_store_equals_full_lsh(spark, tmp_path):
    path = str(tmp_path / "sigstore")
    b1_rows = _corpus("w", 0, 30)
    # batch 2: new docs + near-copies of batch-1 docs (cross-batch dups)
    b2_rows = _corpus("x", 1000, 20, dup_of=b1_rows[:5])
    b1, b2 = _docs(spark, b1_rows), _docs(spark, b2_rows)

    assert update_signature_store(spark, b1, path) == 30
    assert update_signature_store(spark, b1, path) == 0      # idempotent
    assert update_signature_store(spark, b2, path) == 25

    got = {(r["a_id"], r["b_id"]): r["jaccard_est"]
           for r in lsh_pairs_against_store(spark, b2, path).collect()}

    full = minhash_lsh_pairs(b1.unionByName(b2))
    b2_ids = {r[0] for r in b2_rows}
    want = {(r["a_id"], r["b_id"]): r["jaccard_est"]
            for r in full.collect()
            if r["a_id"] in b2_ids or r["b_id"] in b2_ids}
    assert got == want
    assert got  # the cross-batch duplicates are actually found
    # exact duplicates agree on all 16 hashes
    assert any(v == 1.0 for v in got.values())
