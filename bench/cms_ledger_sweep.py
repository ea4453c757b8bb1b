"""Scale sweep for the CMS at-rest store's watermark ledger
(operators/sketches.py:update_cms_store) — the measurement behind the
r9 claim that update cost is FLAT in ingest history.

The r8 ledger grew one row per batch forever and was re-read on every
update, so fold cost carried an O(batches-ever) term. The r9 watermark
ledger keeps one (app_id, last_id) row per writer; the only per-update
corpus-sized object left is the d·w sketch itself, which is constant
(4×1024 cells) by construction. If the claim holds, per-batch seconds
stay flat across 1e3 folds from one writer.

Protocol: fold N fixed-size batches (distinct writer-monotonic ids)
into one store and time every update; report windowed means (first /
middle / last 50) and the last/first ratio. Prints one JSON line;
history in bench/SCALE_NOTES.md.

Usage: python bench/cms_ledger_sweep.py [--batches N] [--batch-size M]
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

from datatools_spark.operators.sketches import (  # noqa: E402
    read_cms_store, update_cms_store)
from datatools_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_batches = 1000
    batch = 2_000
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])
    if "--batch-size" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch-size") + 1])

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cms_ledger_sweep_")
    path = f"{root}/store"
    per_batch = []
    try:
        for b in range(n_batches):
            items = spark.range(b * batch, (b + 1) * batch).select(
                F.concat(F.lit("w"), (F.col("id") % 5000).cast("string"))
                .alias("item"))
            t0 = time.perf_counter()
            update_cms_store(spark, items, path, "item", b,
                             app_id="sweep")
            per_batch.append(round(time.perf_counter() - t0, 3))
        cells = read_cms_store(spark, path).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    w = min(50, max(1, n_batches // 4))
    mean = lambda xs: round(sum(xs) / len(xs), 3)  # noqa: E731
    first, last = mean(per_batch[:w]), mean(per_batch[-w:])
    print(json.dumps({
        "metric": "cms_store_per_batch_sec", "batches": n_batches,
        "batch_size": batch, "window": w,
        "first_mean": first,
        "mid_mean": mean(per_batch[n_batches // 2 - w // 2:
                                   n_batches // 2 + w - w // 2]),
        "last_mean": last,
        "last_vs_first": round(last / first, 2) if first else None,
        "sketch_cells": cells}))


if __name__ == "__main__":
    main()
