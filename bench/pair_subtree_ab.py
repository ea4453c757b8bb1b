"""A/B of the posting-list pair engine's r9 subtree-dedup restructure
at corpus sizes up to 1e6 docs — the measurement behind the SCALE.md
claim that the checkpoint win GROWS with corpus size.

old-shape: the pre-r9 `containment_pairs` — exploded shingle index
re-evaluated per consumer (df guard, per-doc sizes, pair generation)
and both containment directions emitted as a union of two projections
(each re-running the pair engine). r9: the index and the sizes table
are checkpointed once; both directions explode from one evaluation.

Synthetic corpus: 12-word docs over locally-structured vocab so shingle
document frequency stays bounded (like natural text under the max_df
guard). Prints one JSON line; history in bench/SCALE_NOTES.md.

Usage: python bench/pair_subtree_ab.py [--docs N] [--repeats K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datatools_spark.operators import dedup as D  # noqa: E402
from datatools_spark.operators.partitioning import (  # noqa: E402
    ensure_parallelism)
from datatools_spark.operators.text import (  # noqa: E402
    word_shingles, words_col)
from datatools_spark.session import get_spark  # noqa: E402


def _old_containment(df, threshold=0.5, max_df=100):
    # the pre-r9 shape, kept as the A/B baseline
    sh = (ensure_parallelism(df.select("doc_id", "text"), min_bytes=0)
          .withColumn("_w", words_col("text"))
          .select("doc_id", F.explode(word_shingles(
              "text", 3, from_words_col="_w")).alias("_sh")))
    dfreq = sh.groupBy("_sh").agg(F.count("*").alias("_df"))
    stop = dfreq.where(F.col("_df") > max_df).select("_sh") \
        .localCheckpoint(eager=True)
    if stop.isEmpty():
        stop = None
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("_n"))
    na = sizes.select(F.col("doc_id").alias("a_id"),
                      F.col("_n").alias("_na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"),
                      F.col("_n").alias("_nb"))
    idx = sh if stop is None \
        else sh.join(F.broadcast(stop), "_sh", "left_anti")
    lists = idx.groupBy("_sh").agg(
        F.sort_array(F.collect_list("doc_id")).alias("_ids"))
    inter = (lists.select(F.explode(F.expr(
                 "flatten(transform(_ids, (x, i) -> "
                 "transform(slice(_ids, i + 2, size(_ids) - i - 1), "
                 "y -> struct(x AS a, y AS b))))")).alias("_p"))
             .groupBy(F.col("_p.a").alias("a_id"),
                      F.col("_p.b").alias("b_id"))
             .agg(F.count("*").alias("_inter")))
    base = inter.join(na, "a_id").join(nb, "b_id")
    i = F.col("_inter").cast("double")
    fwd = base.select(F.col("a_id").alias("src_id"),
                      F.col("b_id").alias("dst_id"),
                      (i / F.col("_na")).alias("containment"))
    rev = base.select(F.col("b_id").alias("src_id"),
                      F.col("a_id").alias("dst_id"),
                      (i / F.col("_nb")).alias("containment"))
    return fwd.unionByName(rev).where(F.col("containment") >= threshold)


def main() -> None:
    docs = 1_000_000
    repeats = 2
    if "--docs" in sys.argv:
        docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit(f"w{j}_"),
                     ((F.col("id") + j) % (50 + 7 * j)).cast("string"))
            for j in range(12)]).alias("text"))
    # 1% planted exact-dup partners so the verify+emit path carries
    # real survivors, not just candidate mass
    dups = base.where(F.col("doc_id") % 100 == 0) \
        .select((F.col("doc_id") + docs).alias("doc_id"), "text")
    df = base.unionByName(dups).localCheckpoint(eager=True)

    def best(fn):
        t = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(df).count()
            t.append(round(time.perf_counter() - t0, 2))
        return min(t)

    out = {"metric": "pair_subtree_ab_sec", "docs": docs}
    out["old_shape"] = best(
        lambda d: _old_containment(d, threshold=0.5, max_df=100))
    out["r9"] = best(
        lambda d: D.containment_pairs(d, threshold=0.5, max_df=100))
    out["speedup"] = round(out["old_shape"] / out["r9"], 2) \
        if out["r9"] else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
