"""Scale sweep for the copy-on-write merge store
(operators/mergestore.py) — the measurement behind its SCALE.md claim:
per-merge cost is governed by the BATCH and the files it touches, not
the table size.

Protocol: initialize a key-clustered table, then apply FIXED-SIZE
upsert batches while the table GROWS 2× per step (append-shaped merges
interleaved with key-local update merges). If the claim holds:

- key-local updates (all keys inside a few files' boxes) stay flat in
  seconds and touch a near-constant file count as the table grows;
- pure inserts (keys past the live max) touch ZERO files at any size;
- the control — a SCATTERED update whose keys hit every file's box —
  grows with the table, which is exactly what the manifest predicts
  (copy-on-write cannot save a merge that really touches everything).

Prints one JSON line; history in bench/SCALE_NOTES.md.

Usage: python bench/mergestore_sweep.py [--steps N] [--batch-size M]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datatools_spark.operators.mergestore import (  # noqa: E402
    init_merge_store, merge_into, merge_store_stats)
from datatools_spark.session import get_spark  # noqa: E402


def _rows(spark, lo: int, n: int, files: int):
    df = (spark.range(lo, lo + n)
          .select(F.col("id"), (F.col("id") % 9973).alias("v"),
                  F.md5(F.col("id").cast("string")).alias("tag")))
    return df.repartitionByRange(files, "id").sortWithinPartitions("id")


def main() -> None:
    steps = 5
    batch = 20_000
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    if "--batch-size" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch-size") + 1])

    spark = get_spark()
    root_dir = tempfile.mkdtemp(prefix="mergestore_sweep_")
    store = f"{root_dir}/t"
    base_n = 200_000
    init_merge_store(spark, _rows(spark, 0, base_n, 16), store, ["id"])
    next_key = base_n          # table keys stay contiguous [0, next_key)
    local_s, insert_s, scatter_s = [], [], []
    local_files, scatter_files = [], []
    try:
        for s in range(steps):
            # key-LOCAL update: the SAME hot region every step — flat
            # seconds/files as the table grows around it is the claim
            upd = _rows(spark, 50_000, batch, 4)
            t0 = time.monotonic()
            r = merge_into(spark, store, upd, ["id"], "update")
            local_s.append(round(time.monotonic() - t0, 3))
            local_files.append(r["files_rewritten"])

            # pure INSERT far past the live max — zero files touched
            ins = _rows(spark, 100_000_000 + s * batch, batch, 4)
            t0 = time.monotonic()
            r = merge_into(spark, store, ins, ["id"], "update")
            insert_s.append(round(time.monotonic() - t0, 3))
            assert r["files_rewritten"] == 0, r

            # SCATTERED control: every k-th key across the whole live
            # span → hits ~every file box; SHOULD grow with the table
            stride = max(1, next_key // batch)
            sc = (_rows(spark, 0, batch, 4)
                  .withColumn("id", F.col("id") * stride))
            t0 = time.monotonic()
            r = merge_into(spark, store, sc, ["id"], "update")
            scatter_s.append(round(time.monotonic() - t0, 3))
            scatter_files.append(r["files_rewritten"])

            # grow the table 2×: append-shaped merge of the next
            # contiguous key range (what a key-clustered writer does)
            grow = _rows(spark, next_key, next_key, 16)
            merge_into(spark, store, grow, ["id"], "update")
            next_key *= 2

        n_live = merge_store_stats(spark, store).count()
        print(json.dumps({
            "metric": "mergestore_sweep",
            "batch": batch, "steps": steps,
            "final_table_rows_approx": next_key,
            "final_live_files": int(n_live),
            "local_update_sec": local_s,
            "local_files_rewritten": local_files,
            "insert_sec": insert_s,
            "scattered_update_sec": scatter_s,
            "scattered_files_rewritten": scatter_files,
        }))
    finally:
        shutil.rmtree(root_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
