"""Auto-checkpoint flatness sweep (r9 VERDICT #5 done-criterion): a
long merge loop with retain_generations set must hold (a) generation /
metadata dir counts, (b) on-disk parquet file counts, and (c)
per-batch wall flat in the number of lifetime batches.

Run: python bench/mergestore_checkpoint_sweep.py [n_batches]
Prints one row every `stride` batches: batch, wall_s (mean of the
stride), data/stats/log dir counts, parquet files on disk, live files.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from datatools_spark.operators.mergestore import (
    init_merge_store, merge_into, merge_store_live_files,
    read_merge_store)
from datatools_spark.session import get_spark


def gen_dirs(root, sub=""):
    base = os.path.join(root, sub) if sub else root
    if not os.path.isdir(base):
        return 0
    return sum(1 for d in os.listdir(base)
               if d.startswith("gen-") and d[4:].isdigit())


def parquet_on_disk(root):
    n = 0
    for d, _, files in os.walk(root):
        rel = os.path.relpath(d, root)
        if rel != "." and rel.split(os.sep)[0].startswith("_"):
            continue  # metadata/changes trees
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    stride = max(1, n_batches // 20)
    spark = get_spark("ckpt-sweep", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ckpt_sweep_") + "/store"
    base = (spark.range(0, 10_000)
            .select(F.col("id"), (F.col("id") % 97).alias("v"))
            .repartitionByRange(8, "id").sortWithinPartitions("id"))
    init_merge_store(spark, base, root, ["id"])
    print("batch,wall_s,data_dirs,stats_dirs,log_dirs,parquet_files,live")
    t_block = time.perf_counter()
    for i in range(1, n_batches + 1):
        k = (i * 631) % 10_000
        upd = spark.createDataFrame(
            [(k + j, -i) for j in range(8)], "id long, v long")
        merge_into(spark, root, upd, ["id"], "update",
                   retain_generations=3)
        if i % stride == 0:
            wall = (time.perf_counter() - t_block) / stride
            live = len(merge_store_live_files(spark, root))
            print(f"{i},{wall:.3f},{gen_dirs(root)},"
                  f"{gen_dirs(root, '_stats')},{gen_dirs(root, '_log')},"
                  f"{parquet_on_disk(root)},{live}", flush=True)
            t_block = time.perf_counter()
    n = read_merge_store(spark, root).count()
    # updates at keys k..k+7 with k up to 9999 insert a few keys past
    # the initial 10k — the count can only grow, never lose rows
    assert n >= 10_000, n
    print(f"final_rows,{n}", flush=True)
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    main()
