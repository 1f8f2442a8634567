"""Iterative graph algorithms over similarity graphs.

The LLM-curation companion to :mod:`dedup`'s connected components: once
near-duplicate PAIRS exist (MinHash/LSH, embedding blocking, ...), graph
centrality ranks documents INSIDE the duplicate neighborhood — e.g. pick
the highest-PageRank member of a boilerplate cluster as the canonical
copy, or weight a document's sampling probability by how central it is in
the redundancy graph (central == heavily templated).

Everything here is INTEGER-exact so results hash-compare across engines:
scores are micros (x1e6), every division is integer division, and the
iteration count is fixed — the same recurrence unrolls to a DuckDB CTE
chain for the oracle (the bpe_train_merges technique).

Scale (100 TB): one iteration = one equi-join of the edge list with the
|V|-row rank frame on src + one groupBy(dst) sum — the textbook
co-partitionable PageRank step (partition edges by src once; every
iteration reuses that partitioning; rank frames are |V|-row, never
collected to the driver).  The edge frame is localCheckpoint-ed once —
``iters`` consumers, and upstream pair generation (an LSH pipeline) is
far more expensive than the checkpoint write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for rank scores
PR_SCALE = 1_000_000
#: damping factor 0.85 in micros
PR_DAMPING_X1E6 = 850_000


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED pair list, integer-exact.

    ``pairs`` is a deduplicated (a < b) pair frame (e.g.
    :func:`dedup.lsh_candidate_pairs`); each pair contributes both edge
    directions.  Every node starts at ``PR_SCALE`` micros and iterates

        pr'(v) = (PR_SCALE - d) + (d * sum_{u->v} (pr(u) DIV deg(u)))
                 DIV PR_SCALE,   d = PR_DAMPING_X1E6

    with INTEGER division throughout — bit-identical across engines, and
    the recurrence unrolls to a DuckDB CTE chain for the oracle.  Isolated
    documents (no near-duplicate edge) are not nodes of this graph and do
    not appear; every emitted node has degree >= 1, so the DIV is safe.

    Returns ``(node, degree, pagerank_x1e6)``.

    Magnitude bound (no overflow): total mass stays ~|V| * PR_SCALE, so
    the damped sum is < |V| * PR_SCALE * PR_DAMPING_X1E6 ~ 8.5e17 only
    beyond |V| = 1e6 *in one connected hub's in-neighborhood*; real
    similarity graphs are bounded by the LSH bucket cap long before that.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionAll(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg(src)) — joined ONCE, then checkpointed for the
    # `iters` consumers below (exchange reuse can't span the loop: each
    # iteration's join key equality is with a different rank frame).
    # Partitioning note (round-9 A/B): repartition("src") before the
    # checkpoint removes the per-iteration edge-side exchange under
    # STATIC planning (22 -> 12 exchanges measured) but AQE discards a
    # LogicalRDD's outputPartitioning and re-inserts them, and AQE's
    # skew-splitting is worth more here than the saved exchanges.  The
    # AQE-surviving form is a src-BUCKETED edge table — bucket-scan
    # distributions are not re-planned — via :func:`pagerank_from_edges`
    # over ``sources.bucketed.write_bucketed(..., ["src"])``.
    edges_deg = (
        edges.join(deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=False)
    )
    return pagerank_from_edges(edges_deg, iters=iters)


def pagerank_from_edges(edges_deg: DataFrame, iters: int = 4) -> DataFrame:
    """PageRank iterations over a prebuilt ``(src, dst, deg)`` edge frame
    — ``deg`` must be deg(src), each undirected pair present in BOTH
    directions (what :func:`pagerank` builds, or a persisted edge table).

    Steady-state deployments persist the edge frame src-bucketed
    (``sources.bucketed.write_bucketed(edges_deg, t, ["src"], n)``): the
    bucket spec survives AQE, so every iteration's join reads co-located
    buckets and only the |V|-row rank frame shuffles — asserted
    structurally in tests/test_graph.py::test_pagerank_bucketed_edges.
    """
    # every (src, *) row carries the same deg, so max == the value
    deg = edges_deg.groupBy("src").agg(F.max("deg").alias("deg"))
    pr = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE).cast("long").alias("pr"),
    )
    base = PR_SCALE - PR_DAMPING_X1E6
    for i in range(iters):
        contrib = edges_deg.join(
            pr, edges_deg["src"] == pr["node"]
        ).select(
            F.col("dst"),
            F.expr("pr div deg").alias("c"),
        )
        pr = contrib.groupBy("dst").agg(
            (
                F.lit(base).cast("long")
                + F.expr(f"{PR_DAMPING_X1E6} * sum(c) div {PR_SCALE}")
            ).alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
        # the rank frame's lineage nests one join+agg per iteration and
        # optimizer/analysis cost grows superlinearly with it; truncate
        # every 4 iterations so large `iters` stays plan-bounded (a |V|-row
        # frame, cheap to materialize; no-op for the default iters=4)
        if (i + 1) % 4 == 0 and (i + 1) < iters:
            pr = pr.localCheckpoint(eager=False)
    return (
        pr.join(deg, pr["node"] == deg["src"])
        .select(
            F.col("node"),
            F.col("deg").cast("long").alias("degree"),
            F.col("pr").alias("pagerank_x1e6"),
        )
    )
