"""End-to-end training-data curation pipeline on the driver testdata.

The LLM-data workflow the engine's extension operators exist for, run as
one composition over `documents` + `embeddings`:

  1. exact dedup        (md5 fingerprint, keep-first)
  2. near-dup retention (MinHash → banded LSH → verified pairs → greedy keep)
  3. quality + language gating
  4. token budgeting    (BPE-ish subword estimate)
  5. ANN neighbors      (IVF nprobe search over embeddings)

Run:  python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datatools_spark import get_spark
from datatools_spark.operators import dedup as D
from datatools_spark.operators import similarity as SIM
from datatools_spark.operators import text as TX


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup
    docs = D.exact_dedup(docs)
    n1 = docs.count()

    # 2. near-dup retention (greedy keep-lowest-id over verified LSH pairs)
    pairs = D.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    drops = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    docs = docs.join(drops, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality + language gates
    q = TX.quality_score_cols("text")
    docs = (docs.withColumn("quality", q["quality_score"])
            .withColumn("lang_pred", TX.lang_id_col("text"))
            .where((F.col("quality") > 0.1) & (F.col("lang_pred") != "und")))
    n3 = docs.count()

    # 4. token budget
    budget = docs.agg(
        F.sum(TX.subword_count_col("text")).alias("est_tokens")).first()

    print(f"docs: {n0} → exact-dedup {n1} → near-dup {n2} → gated {n3}")
    print(f"estimated training tokens: {budget['est_tokens']:,}")

    # 5. ANN over the embedding table (IVF, 2 probes of 8 cells)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    cents = emb.where(F.col("vec_id") < 8) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    qv = emb.where(F.col("vec_id").isin(0, 1, 2)) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    print("IVF nprobe=2 top-5 neighbors:")
    SIM.ivf_search(emb, cents, qv, k=5, nprobe=2) \
        .orderBy("query_id", "rank").show(15, truncate=False)


if __name__ == "__main__":
    main()
