"""Scale sweep for the incremental component store
(operators/compstore.py) — the measurement behind its SCALE.md claim:
per-batch update cost is governed by the BATCH (ids + pairs), not the
corpus already registered.

Protocol: ingest FIXED-SIZE batches (ids + ~1% intra/cross-batch
near-dup pairs) into one growing store and time every update. If the
claim holds, per-batch seconds stay flat as members grows from 0 to
n_batches × batch; a full `read_components` resolve and a compaction
are timed at the end (those ARE corpus-sized by design — one broadcast
join / one rewrite). Prints one JSON line; history in
bench/SCALE_NOTES.md.

Usage: python bench/compstore_sweep.py [--batches N] [--batch-size M]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datatools_spark.operators.compstore import (  # noqa: E402
    compact_component_store, read_components, update_component_store)
from datatools_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_batches = 8
    batch = 50_000
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])
    if "--batch-size" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch-size") + 1])

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="compstore_sweep_")
    path = f"{root}/store"
    per_batch = []
    try:
        for b in range(n_batches):
            lo = b * batch
            ids = spark.range(lo, lo + batch) \
                .selectExpr("id as doc_id")
            # ~1% pairs: half intra-batch neighbor pairs, half reaching
            # back into the previous batch (cross-batch merges every
            # round). Offsets are applied to a 0-based range — the
            # original `id*2` over the already-offset range landed past
            # the batch bound and silently emptied every intra set
            # after batch 0 (r5 self-review).
            intra = spark.range(0, batch // 400) \
                .selectExpr(f"{lo} + id * 2 as a_id",
                            f"{lo} + id * 2 + 1 as b_id")
            pairs = intra
            if b > 0:
                cross = spark.range(0, batch // 400) \
                    .selectExpr(f"{lo - batch} + id as a_id",
                                f"{lo} + id as b_id")
                pairs = intra.unionByName(cross)
            t0 = time.perf_counter()
            update_component_store(spark, ids, pairs, path)
            per_batch.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        n = read_components(spark, path).count()
        t_resolve = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        compact_component_store(spark, path, f"{root}/compact")
        t_compact = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({
        "metric": "compstore_per_batch_sec", "batch_size": batch,
        "per_batch": per_batch,
        "first_vs_last": round(per_batch[-1] / per_batch[0], 2)
        if per_batch[0] else None,
        "members": n, "resolve_sec": t_resolve,
        "compact_sec": t_compact}))


if __name__ == "__main__":
    main()
