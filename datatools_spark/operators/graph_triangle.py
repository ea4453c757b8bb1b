"""Triangle counting — two physical plans behind one operator.

Both plans share the degree-ordered orientation (Cohen 2009 /
Suri–Vassilvitskii "MapReduce triangles"): orient every edge from its
lower-(degree, id) endpoint to the higher one; then a triangle with
orientation order a<b<c is exactly the oriented edge a→b plus
c ∈ N⁺(a) ∩ N⁺(b), so T = Σ over oriented edges of |N⁺(u) ∩ N⁺(v)|.
Orientation bounds every out-degree by O(√m) on ANY graph, so no hub
node can melt an executor and total intersection work is m^1.5.

The two ways to realize the per-edge intersection:

* **Sparse / large-n (the 100 TB default)** — ``collect_list`` the
  oriented adjacency per node and take ``array_intersect`` per edge.
  No wedge rows ever hit an exchange (the wedge SELF-JOIN formulation
  materialized ~62M rows and 38 s on the dense sf0.1 co-purchase
  graph; the array form is ~25 s — the remaining cost is ~5e8 hash-set
  probes inside ``array_intersect``).

* **Dense / small-n bitsets** — when the node count fits a
  driver-chosen budget, rank nodes 0..n-1 in orientation order and
  pack each out-neighborhood into ``ceil(n/64)`` BIGINTs; the per-edge
  intersection becomes ``Σ bit_count(x & y)`` over W words — 16 ANDs
  instead of ~900 hash probes on the sf0.1 graph (measured: the count
  stage drops 25 s → <1 s; the full query incl. pair generation
  22.7 s → 5.3 s warm).
  The mask table has ≤ n rows so BOTH closing joins broadcast: the
  only exchanges left are the degree agg and the adjacency groupBy.
  A 91%-dense 1000-node graph is exactly the regime where arrays lose:
  Σ|N⁺| ≈ n³/2 element ops vs m·n/64 word ops — a 64× algorithmic gap
  plus constant-factor wins.

The switch is one metadata-sized action (``count`` of the node table,
which is localCheckpointed and reused by the totals agg either way).
At 100 TB the co-occurrence graphs that matter are either sparse
(array path, bounded by orientation) or dense-but-small projections
(bitset path after the n ≤ budget check) — a dense LARGE graph has
Ω(n²) edges and is not countable by any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_stats"]

#: Largest node count for which the dense-bitset plan is attempted.
#: 1<<14 nodes → 2 KiB mask/node, ≤ 32 MiB broadcast — safely inside
#: Spark's default 8 GiB broadcast-join ceiling and executor heap.
DENSE_BITSET_MAX_NODES = 1 << 14


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b",
                   dense_bitset_max_nodes: int = DENSE_BITSET_MAX_NODES,
                   ) -> DataFrame:
    """Triangle count + global clustering coefficient of an undirected
    simple graph given as a deduplicated ``a < b`` edge list.

    Output (1 row): ``n_nodes, n_edges, n_triangles, n_wedges,
    clustering`` where clustering = 3·T / wedges (0 when wedge-free).
    The count is orientation-invariant, which is what the
    (orientation-free) SQL oracle checks. Plan selection is described
    in the module docstring; pass ``dense_bitset_max_nodes=0`` to force
    the sparse/array plan (useful for plan-shape tests).
    """
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # node table: one row per node with its degree. Materialized once
    # (localCheckpoint) — reused by the plan switch, the orientation
    # join, and the totals agg without re-scanning the edge list.
    deg = und.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint()
    n_nodes = deg.count()

    if n_nodes <= dense_bitset_max_nodes and n_nodes > 0:
        tri = _tri_dense_bitset(e, deg, n_nodes)
    else:
        tri = _tri_sparse_arrays(e, deg)

    tots = (deg.agg(F.count("*").alias("n_nodes"),
                    (F.sum("deg") / 2).cast("bigint").alias("n_edges"),
                    F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
                    .cast("bigint").alias("n_wedges")))
    return (tots.crossJoin(tri)
            .select("n_nodes", "n_edges", "n_triangles", "n_wedges",
                    F.round(F.when(F.col("n_wedges") > 0,
                                   3.0 * F.col("n_triangles")
                                   / F.col("n_wedges")).otherwise(0.0), 6)
                    .alias("clustering")))


def _tri_sparse_arrays(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Oriented adjacency arrays + per-edge ``array_intersect``."""
    du = deg.select(F.col("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | \
          ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    orient = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("nn"))
    adj = orient.groupBy("s").agg(F.collect_list("nn").alias("_nb"))
    au = adj.select(F.col("s"), F.col("_nb").alias("_nu"))
    av = adj.select(F.col("s").alias("nn"), F.col("_nb").alias("_nv"))
    return (orient.join(au, "s").join(av, "nn")
            .select(F.size(F.array_intersect("_nu", "_nv")).alias("_c"))
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint")
                 .alias("n_triangles")))


def _tri_dense_bitset(e: DataFrame, deg: DataFrame,
                      n_nodes: int) -> DataFrame:
    """Packed-BIGINT adjacency masks; closing joins both broadcast.

    Node rank = ``row_number`` over the orientation key (deg, id) — a
    single-partition window, legal because n_nodes already passed the
    size gate (the window input is the metadata-sized node table, not
    the edge list). Orientation by (deg, id) order IS rank order, so
    edges orient as (lower rank → higher rank) with no struct gymnastics.
    """
    n_words = (n_nodes + 63) // 64
    from pyspark.sql import Window
    rank = deg.select(
        "u", (F.row_number().over(
            Window.orderBy(F.col("deg"), F.col("u"))) - 1).alias("pos"))
    pu = rank.select(F.col("u"), F.col("pos").alias("ps"))
    pv = rank.select(F.col("u").alias("v"), F.col("pos").alias("pt"))
    oe = (e.join(F.broadcast(pu), "u").join(F.broadcast(pv), "v")
          .select(F.least("ps", "pt").alias("s"),
                  F.greatest("ps", "pt").alias("t")))
    # one mask row per node-with-out-edges: W packed words over the
    # out-neighbour ranks. Build cost Σdeg·W word ops — metadata-scale.
    masks = (oe.groupBy("s")
             .agg(F.collect_list("t").alias("_nb"))
             .select("s", F.expr(
                 f"transform(sequence(0, {n_words - 1}), w -> "
                 f"aggregate(filter(_nb, p -> p DIV 64 = w), 0L, "
                 f"(acc, p) -> acc | shiftleft(1L, CAST(p % 64 AS INT))))"
             ).alias("_m")))
    ms = masks.select(F.col("s"), F.col("_m").alias("_mu"))
    mt = masks.select(F.col("s").alias("t"), F.col("_m").alias("_mv"))
    per_edge = (oe.join(F.broadcast(ms), "s")
                  .join(F.broadcast(mt), "t", "left")
                  .select(F.when(F.col("_mv").isNull(), F.lit(0)).otherwise(
                      F.expr("aggregate(zip_with(_mu, _mv, "
                             "(x, y) -> bit_count(x & y)), 0L, "
                             "(acc, c) -> acc + CAST(c AS BIGINT))"))
                      .alias("_c")))
    return per_edge.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint")
        .alias("n_triangles"))
