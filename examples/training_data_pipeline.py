"""End-to-end training-data curation pipeline on the driver testdata.

The LLM-data workflow the engine's extension operators exist for, run as
one composition over `documents` + `embeddings`:

  1. exact dedup        (md5 fingerprint, keep-first)
  2. near-dup retention (MinHash → banded LSH → verified pairs →
                         connected components → keep cluster min)
  3. quality + repetition + language gating, PII scrub
  4. benchmark decontamination (broadcast 5-gram set)
  5. span-level dup + entropy diagnostics on the survivors
  6. source-balanced deterministic sampling + token budgeting
  7. train/valid/test split + sequence packing (concat-then-chunk bins)
  8. ANN neighbors      (IVF nprobe search over embeddings)
  9-10. multimodal near-dup (banded perceptual-hash pair engine + the
                         wide 256-bit variant and its cost model)
  11. ingest data contract (one-pass check suite) + incremental
                         component-store dedup cluster ids
  12. hybrid retrieval  (BM25 + cosine fused by reciprocal rank)
  13. canonical corpus table (copy-on-write merge store: re-scrub
                         upserts + takedown deletes rewrite only
                         touched files; change feed maintains stats)

The oracle-checked composite `queries.doc_curation_pipeline` runs the
same funnel under the hash-parity gate; this script is the narrative
version with per-stage prints (and cluster-aware retention via
graph.connected_components instead of the composite's exact-dup stage).
For streaming ingest, the same gates are stateless expressions and the
dedup step is streaming_ingest_dedup + operators/sigstore.py
(incremental signature table — batches sign only new docs).

Run:  python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datatools_spark import get_spark
from datatools_spark.operators import curation as CU
from datatools_spark.operators import dedup as D
from datatools_spark.operators import graph as GR
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

    # 2. near-dup retention: LSH pairs → connected components → keep the
    #    cluster minimum (chains A~B~C collapse correctly; keeping
    #    "lowest id per PAIR" would over-drop B and C independently)
    pairs = D.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    comp = GR.connected_components(pairs)
    drops = comp.where(F.col("id") != F.col("component")) \
        .select(F.col("id").alias("doc_id"))
    # materialize the retention milestone: every downstream stage (and
    # this script's per-stage counts) would otherwise replay
    # exact-dedup + MinHash + LSH on each action — measured >2× of the
    # whole run before this checkpoint. Production materializes the
    # post-retention corpus for the same reason.
    docs = docs.join(drops, "doc_id", "left_anti") \
        .localCheckpoint(eager=True)
    n2 = docs.count()

    # 3. quality + repetition + language gates, then PII scrub
    q = TX.quality_score_cols("text")
    rep = TX.repetition_stats(docs)
    docs = (docs.join(rep.select("doc_id", "top_ngram_frac"), "doc_id")
            .withColumn("quality", q["quality_score"])
            .withColumn("lang_pred", TX.lang_id_col("text"))
            .where((F.col("quality") > 0.1) & (F.col("lang_pred") != "und")
                   & (F.col("top_ngram_frac") <= 0.2)))
    docs = docs.withColumn("text", TX.scrub_cols("text")["scrubbed"])
    n3 = docs.count()

    # 4. decontaminate against a benchmark set (stand-in: doc_id < 30)
    bench = spark.read.parquet(f"{sf}/documents.parquet") \
        .where(F.col("doc_id") < 30)
    clean = CU.contamination_counts(docs, bench, shingle_n=5) \
        .where(~F.col("contaminated")).select("doc_id")
    # second milestone: stages 5-7 fan out into several independent
    # actions (diagnostics, budget, split counts, packing) that would
    # each replay the gate + scrub + decontamination expressions
    docs = docs.join(clean, "doc_id").localCheckpoint(eager=True)
    n4 = docs.count()

    # 5. span-dup + entropy diagnostics (survivor corpus health report)
    spans = D.span_dup_stats(docs, span_tokens=16)
    ent = TX.word_entropy(docs)
    diag = (spans.agg(F.round(F.avg("dup_frac"), 4).alias("avg_span_dup"))
            .crossJoin(ent.agg(F.round(F.avg("entropy"), 3)
                               .alias("avg_entropy"))).first())

    # 6. source-balanced deterministic sample + token budget; the
    #    per-source LENGTH DISTRIBUTION comes off a mergeable bottom-k
    #    value sample (sketches.py) — at corpus scale each shard folds
    #    its sketch driver-side, no global sort ever
    docs = CU.source_balanced_sample(docs)
    n5 = docs.count()
    budget = docs.agg(
        F.sum(TX.subword_count_col("text")).alias("est_tokens")).first()
    from datatools_spark.operators import sketches as SKC
    lens = SKC.value_sample_sketch(docs, ["source"], "doc_id",
                                   "n_chars", k=64)
    lens = lens.select(
        "source",
        SKC.sample_quantile_col(F.col("vs"), 0.5).alias("p50_chars"),
        SKC.sample_quantile_col(F.col("vs"), 0.9).alias("p90_chars"))
    print("per-source length quantiles (bottom-k value sample, k=64):")
    lens.orderBy("source").show(5, truncate=False)

    # 7. split + sequence packing into 512-token training bins
    docs = CU.train_val_test_split(docs)
    packed = CU.pack_sequences(docs.where(F.col("split") == "train"),
                               ctx_len=512)
    n_bins = packed.agg((F.max("bin_id") + 1).alias("b")).groupBy() \
        .sum("b").first()[0]
    split_counts = {r["split"]: r["n"] for r in
                    docs.groupBy("split").agg(F.count("*").alias("n"))
                    .collect()}

    print(f"docs: {n0} → exact-dedup {n1} → near-dup clusters {n2} → "
          f"gated+scrubbed {n3} → decontaminated {n4} → sampled {n5}")
    print(f"survivor health: avg span-dup {diag['avg_span_dup']}, "
          f"avg word entropy {diag['avg_entropy']} bits")
    print(f"estimated training tokens: {budget['est_tokens']:,}; "
          f"split {split_counts}; ~{n_bins} packed 512-token bins/source")

    # 8. ANN over the embedding table (IVF, 2 probes of 8 cells)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    cents = emb.where(F.col("vec_id") < 8) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    qv = emb.where(F.col("vec_id").isin(0, 1, 2)) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    print("IVF nprobe=2 top-5 neighbors:")
    SIM.ivf_search(emb, cents, qv, k=5, nprobe=2) \
        .orderBy("query_id", "rank").show(15, truncate=False)

    # 9. multimodal near-dup: the SAME banded pair engine over perceptual
    #    hashes — image aHash here; audio plugs in via
    #    MM.pcm16_energy_hash(..., hash_col="ehash") unchanged
    from datatools_spark.operators import multimodal as MM
    media = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"))
    sig = MM.raw8_ahash(media, width=16, grid=8)
    img_pairs = MM.ahash_pairs(sig, bands=8, max_hamming=7)
    img_comp = GR.connected_components(img_pairs)
    n_img_dups = img_comp.where(F.col("id") != F.col("component")).count()
    print(f"image near-dup (aHash, hamming<=7): {img_pairs.count()} pairs, "
          f"{n_img_dups} payloads droppable by keep-min retention")

    # 10. corpora past ~1e6 distinct hashes: widen the signature instead
    #     of fighting 8-bit band keys — 256-bit aHash through the wide
    #     engine gets 32-bit keys at the same hamming budget, and the
    #     pre-flight prices the candidate mass BEFORE any shuffle
    mass = MM.pair_candidate_mass(sig, bands=8)
    print("64-bit band-key cost model (candidate mass per band):")
    mass.show(8, truncate=False)
    wide_sig = MM.raw8_ahash(media, width=16, grid=16)   # 256-bit
    wide_pairs = MM.ahash_pairs(wide_sig, bands=8, max_hamming=7,
                                nbits=256)
    print(f"wide 256-bit pairs (32-bit band keys): {wide_pairs.count()}")

    # 11. (r5) the INGEST-TIME pieces a production pipeline runs before
    #     any of the above: a declarative data contract gated in ONE
    #     aggregation pass, and canonical dedup-cluster ids maintained
    #     incrementally (no full-corpus recompute per batch)
    import tempfile

    from datatools_spark.operators import checks as CK
    from datatools_spark.operators.compstore import (read_components,
                                                     update_component_store)
    contract = CK.check_suite(
        spark.read.parquet(f"{sf}/documents.parquet"),
        [CK.not_null("doc_id"), CK.unique("doc_id"),
         CK.in_range("n_chars", 1, 100_000),
         CK.row_count_between(1, None)])
    print("ingest data contract (one scan):")
    contract.show(truncate=False)

    # two ingest batches; per batch: LSH pairs of (corpus-so-far)
    # restricted to edges touching the batch — exactly what
    # sigstore.lsh_pairs_against_store emits in the streaming loop
    # (streaming_text_ingest_components packages all of this)
    comp_dir = tempfile.mkdtemp(prefix="compstore_demo_") + "/comps"
    all_docs = spark.read.parquet(f"{sf}/documents.parquet")
    mid = all_docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    seen = all_docs.limit(0)
    for batch in [all_docs.where(F.col("doc_id") <= mid),
                  all_docs.where(F.col("doc_id") > mid)]:
        seen = seen.unionByName(batch)
        in_batch = batch.select("doc_id")
        # sign the corpus-so-far ONCE per batch: the two semi-joins
        # (edges touching the batch on either endpoint) re-read this
        # materialized pair list instead of re-running MinHash+LSH
        # twice — the pre-fix shape cost 2× the signing work per batch
        bp_all = D.minhash_lsh_pairs(seen, num_hashes=8, bands=4,
                                     threshold=0.5) \
            .localCheckpoint(eager=True)
        bp = (bp_all
              .join(in_batch.withColumnRenamed("doc_id", "a_id"),
                    "a_id", "left_semi")
              .unionByName(
                  bp_all
                  .join(in_batch.withColumnRenamed("doc_id", "b_id"),
                        "b_id", "left_semi"))
              .distinct())
        update_component_store(spark, in_batch, bp, comp_dir)
    labels = read_components(spark, comp_dir)
    n_clustered = labels.where(F.col("id") != F.col("component")).count()
    print(f"incremental component store after 2 batches: "
          f"{labels.count()} ids, {n_clustered} non-canonical")

    # 12. (r5) hybrid retrieval: BM25 lexical + cosine semantic fused by
    #     reciprocal rank (no score calibration needed)
    from datatools_spark.operators.similarity import rrf_fuse
    lex = TX.bm25_scores(all_docs, ["spark", "merge", "window"])
    from pyspark.sql import Window as W
    lex = (lex.withColumn("rank", F.row_number().over(
        W.orderBy(F.col("score").desc(), F.col("doc_id"))).cast("bigint"))
        .where(F.col("rank") <= 15).select("doc_id", "rank"))
    qv2 = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qv"))
    sem = (emb.crossJoin(F.broadcast(qv2))
           .select(F.col("vec_id").alias("doc_id"),
                   SIM.cosine_expr(F.col("embedding"),
                                   F.col("_qv")).alias("_c"))
           .withColumn("rank", F.row_number().over(
               W.orderBy(F.col("_c").desc(), F.col("doc_id")))
               .cast("bigint"))
           .where(F.col("rank") <= 15).select("doc_id", "rank"))
    print("hybrid RRF top-5:")
    rrf_fuse([lex, sem]).where(F.col("rank") <= 5).show(truncate=False)

    # 13. (r5) the curated corpus as a MANAGED table: corrections and
    #     takedowns arrive forever, and "rewrite the 100 TB corpus" is
    #     not an answer. The copy-on-write merge store rewrites only the
    #     files whose key boxes the batch touches, and its change feed
    #     maintains downstream stats without a rescan.
    from datatools_spark.operators.mergestore import (
        init_merge_store, merge_into, read_change_feed, read_merge_store)
    root = tempfile.mkdtemp(prefix="corpus_store_") + "/t"
    canon = (all_docs.select("doc_id", "source", "text")
             .repartitionByRange(8, "doc_id")
             .sortWithinPartitions("doc_id"))
    init_merge_store(spark, canon, root, ["doc_id"])
    # a PII re-scrub lands as an upsert batch ...
    fix = (read_merge_store(spark, root).where(F.col("doc_id") % 97 == 0)
           .withColumn("text", TX.scrub_cols("text")["scrubbed"]))
    r1 = merge_into(spark, root, fix, ["doc_id"], "update",
                    change_feed=True)
    # ... and a takedown request as a delete batch
    gone = read_merge_store(spark, root).where(F.col("doc_id") % 131 == 0) \
        .select("doc_id")
    # retain_generations (r10): a long-lived store auto-checkpoints on
    # commit — metadata and dead bytes stay flat per lifetime batch
    r2 = merge_into(spark, root, gone, ["doc_id"], "delete",
                    change_feed=True, retain_generations=2)
    print(f"merge store: re-scrub touched {r1['files_rewritten']} of "
          f"{r1['files_live_before']} files ({r1['rows_matched']} rows); "
          f"takedown removed {r2['rows_deleted']} rows")
    # per-source doc counts maintained from the FEED alone
    delta = (read_change_feed(spark, root)
             .select("source", F.when(
                 F.col("_change_type").isin("insert", "update_postimage"),
                 1).when(F.col("_change_type") == "delete", -1)
                 .otherwise(-1).alias("d"))
             .groupBy("source").agg(F.sum("d").alias("delta_docs")))
    print("per-source doc-count delta from the change feed:")
    delta.where(F.col("delta_docs") != 0).orderBy("source").show(5)


if __name__ == "__main__":
    main()
