"""Graph analytics over relational event data.

The reference has no graph surface; this generalizes its
entity-relationship theme (users acting on shared days) into the two
classic distributed-graph kernels every large-scale pipeline ends up
needing — triangle counting (community density / spam detection) and
PageRank (entity importance for sampling weights) — expressed as
DataFrame joins and aggregations so Catalyst plans them like any other
query. Connected components (the third kernel) already lives in
operators/dedup.connected_components for duplicate-cluster formation.

Scale notes
-----------
- Triangle counting uses DEGREE ORIENTATION (each undirected edge is
  directed from its lower-degree endpoint, ties by id): every wedge is
  then enumerated at its lowest-degree vertex, which bounds
  per-vertex wedge fan-out by O(sqrt(m)) even on power-law graphs —
  the standard trick that keeps the wedge join from exploding at the
  skewed hubs (a raw wedge join at a degree-10^6 hub would emit 10^12
  rows).
- PageRank runs in FIXED-POINT integer arithmetic (ranks scaled by
  10^12, floor division): additions and divisions on positive BIGINTs
  are exactly reproducible across engines and partitionings, so an
  iterative algorithm — normally hostile to cross-engine value
  hashing — gates EXACTLY against an unrolled SQL oracle. Precision
  loss vs float is ~1e-12 per op, irrelevant for ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # 10^12 fixed-point rank units


def cooccurrence_edges(
    df: DataFrame,
    entity_col: str,
    context_col: str,
) -> DataFrame:
    """Undirected co-occurrence edges: entities sharing a context
    (users purchasing on the same day, docs sharing a cluster, ...).
    Canonical orientation src < dst, distinct. The self-join is
    per-context (shuffle on the context key), so cost is
    O(Σ context_size²) — bound contexts first (day × event_type here)
    the same way dedup bounds band buckets."""
    occ = df.select(
        F.col(context_col).alias("ctx"), F.col(entity_col).alias("ent")
    ).distinct()
    a = occ.select("ctx", F.col("ent").alias("src"))
    b = occ.select("ctx", F.col("ent").alias("dst"))
    return (
        a.join(b, "ctx")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles in an undirected graph given canonical edges
    (src < dst, distinct). Degree orientation: re-direct each edge
    from its lower-degree endpoint (ties broken by id), enumerate
    wedges at the source, close them against the oriented edge set.
    Each triangle is counted exactly once — at its lowest-degree
    vertex. Returns a single row (n_edges, n_triangles)."""
    # the edge list feeds three consumers (degree table, wedge sides,
    # closing probe) — persist so the derivation (often a join itself)
    # runs once, the same invariant-frame caching every graph engine
    # applies
    edges = edges.persist()
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(deg.withColumnRenamed("v", "src"), "src")
        .withColumnRenamed("d", "ds")
        .join(deg.withColumnRenamed("v", "dst"), "dst")
        .withColumnRenamed("d", "dd")
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("w"),
    )
    w1 = oriented.select(F.col("u"), F.col("w").alias("w1"))
    w2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    wedges = w1.join(w2, "u").filter(F.col("w1") < F.col("w2"))
    closing = edges.select(
        F.col("src").alias("w1"), F.col("dst").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return ne.crossJoin(tri)


def edge_triangle_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support — the k-truss primitive (an edge's
    support is the number of triangles containing it; k-truss keeps
    edges with support >= k-2, the standard dense-community filter).
    Same degree-oriented wedge enumeration as triangle_count — each
    triangle is found ONCE at its lowest-degree vertex — then each
    found triangle credits its THREE canonical edges via a 3-way
    explode, and one groupBy((src,dst)) sums support. Cost identical
    to triangle counting plus an output-sized shuffle. Returns
    (src, dst, support) for edges in >= 1 triangle."""
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    edges = edges.persist()
    e = (
        edges.join(deg.withColumnRenamed("v", "src"), "src")
        .withColumnRenamed("d", "ds")
        .join(deg.withColumnRenamed("v", "dst"), "dst")
        .withColumnRenamed("d", "dd")
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("w"),
    )
    w1 = oriented.select(F.col("u"), F.col("w").alias("w1"))
    w2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    wedges = w1.join(w2, "u").filter(F.col("w1") < F.col("w2"))
    closing = edges.select(
        F.col("src").alias("w1"), F.col("dst").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"])  # (u, w1, w2) per triangle
    # credit all three canonical edges of each triangle
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "w1").alias("src"),
                    F.greatest("u", "w1").alias("dst"),
                ),
                F.struct(
                    F.least("u", "w2").alias("src"),
                    F.greatest("u", "w2").alias("dst"),
                ),
                F.struct(F.col("w1").alias("src"), F.col("w2").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return sides.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )


def pagerank_fixedpoint(
    edges: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """PageRank over an undirected graph (canonical edges src < dst),
    ``iterations`` rounds, damping d = damping_pct/100, uniform init.

    All arithmetic is fixed-point on positive BIGINTs (RANK_SCALE
    units, floor division via ``div``), so every engine and every
    partitioning produces the IDENTICAL integers:

        R0(v)    = RANK_SCALE div N
        R_k+1(v) = ((100-d)*RANK_SCALE) div (100*N)
                   + (d * Σ_{u~v} (R_k(u) div deg(u))) div 100

    Undirected ⇒ edges are symmetrized before the transfer join and
    every node has deg >= 1 (no dangling mass). Each iteration is one
    join (ranks × adjacency) + one groupBy(dst) — the canonical
    message-passing shape; at cluster scale pre-partition both sides
    by vertex id so the per-iteration shuffle moves only rank rows.
    Returns (v, rank_fp) — rank in RANK_SCALE units, exact."""
    sym = edges.select("src", "dst").unionAll(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    ).persist()  # the invariant adjacency — read once per iteration
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()  # bounded: one long — fixes the constants below
    base = ((100 - damping_pct) * RANK_SCALE) // (100 * n)
    ranks = deg.select(
        F.col("src").alias("v"),
        F.lit(RANK_SCALE // n).cast("bigint").alias("rank_fp"),
    )
    adj = sym.join(deg, "src")
    for _ in range(iterations):
        transfer = (
            adj.join(ranks, adj["src"] == ranks["v"])
            .select(
                F.col("dst"),
                F.expr("rank_fp div deg").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("in_sum"))
        )
        ranks = transfer.select(
            F.col("dst").alias("v"),
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * in_sum) div 100")
            )
            .cast("bigint")
            .alias("rank_fp"),
        )
    return ranks
