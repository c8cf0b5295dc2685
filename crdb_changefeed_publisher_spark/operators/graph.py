"""Iterative graph algorithms as repeated join-aggregate rounds.

Cluster resolution (connected components) lives in operators/dedup.py;
this module holds rank/centrality style iterations. The Spark shape for
all of them: the edge list is the big table, per-iteration state is one
small (node, value) frame, and every iteration is

    state' = agg( edges JOIN state ON src )  grouped by dst

— an equi-join plus a partial aggregation, both shuffling on node ids.
Iterations are a driver-side Python loop over DataFrame transformations
(the loop builds the plan; Spark executes it lazily), with an optional
localCheckpoint cadence to truncate lineage on long runs, exactly like
the distributed fallback in connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (duplicate edges
    are deduped first): ``r'(v) = (1 - d) + d * sum_{u->v} r(u) / out(u)``
    — the classic un-normalized formulation, uniform initial rank 1.
    Dangling nodes (no out-edges) keep receiving rank but redistribute
    none (the standard simplified variant; document, don't hide).

    Determinism/oracle contract: fixed n_iter means the whole computation
    unrolls into exact arithmetic any engine can replay (the oracle chains
    one CTE per iteration); ranks round to 6 only at the END, so the only
    cross-engine drift is float summation order — ulps, absorbed by the
    rounding.

    Scale shape: out-degrees are one partial agg over the edges; each
    iteration is one broadcast-able (node, rank) join against the edges +
    one partial-agg sum on dst. The edge list is scanned once per
    iteration and never materialized wider than (src, dst, weight);
    `checkpoint_every` truncates plan lineage on long runs.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    contrib_edges = e.join(out_deg, "src")
    for i in range(n_iter):
        inflow = (
            contrib_edges.join(ranks, F.col("src") == F.col("node"))
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_counts(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list, each
    triangle counted exactly once — the clustering-coefficient primitive
    (dense near-dup neighborhoods are triangle-rich; chains and stars
    are triangle-free, so this separates CLIQUE-like duplicate clusters
    from weak transitive links that connected components alone cannot
    distinguish).

    Scale shape (Cohen's MapReduce scheme with DEGREE ORIENTATION):
    orient every edge from its lower-(degree, id) endpoint to the higher
    — every triangle then has exactly one vertex with two OUTGOING
    oriented edges, so wedges built per source node enumerate each
    candidate once, and the per-node wedge count is bounded by the
    ORIENTED out-degree (O(sqrt(m)) even at skewed degree
    distributions), never the raw degree of a hub. Work: two shuffles to
    compute degrees + orient, one self-join on the wedge source, one
    equi-join back onto the canonical edge set to close wedges, one
    explode + partial-agg count. Orientation changes only the WORK, not
    the result — verified against the naive a<b<c 3-way-join oracle.

    Returns (node, n_triangles), nodes in >= 1 triangle."""
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    deg = (
        e.select(F.col("lo").alias("n")).union(e.select(F.col("hi").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dl = deg.select(F.col("n").alias("lo"), F.col("d").alias("dlo"))
    dh = deg.select(F.col("n").alias("hi"), F.col("d").alias("dhi"))
    keyed = e.join(dl, "lo").join(dh, "hi")
    # orient from the lower (degree, id) endpoint; ties break by id, so
    # the orientation is a strict total order and acyclic
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = keyed.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("src"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
    )
    o1 = oriented.select(F.col("src"), F.col("dst").alias("v"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("w"))
    wedges = o1.join(o2, "src").filter(F.col("v") < F.col("w"))
    closed = wedges.join(
        e,
        (F.least("v", "w") == F.col("lo")) & (F.greatest("v", "w") == F.col("hi")),
    ).select("src", "v", "w")
    corners = closed.select(
        F.explode(F.array("src", "v", "w")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
