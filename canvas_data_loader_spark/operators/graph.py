"""Iterative graph algorithms as relational fixed-iteration plans.

Companion to the dedup connected-components operators
(operators/dedup.py::connected_components_star): where components need
an until-fixpoint loop, ranking algorithms run a FIXED number of
power iterations — which makes them both deterministic and
oracle-expressible (the DuckDB mirror unrolls the same iterations as
CTEs, exactly like queries._kmeans_ctes does for Lloyd refinement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    round_dp: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank, normalized so ranks average ~1.

    ``edges``: (src, dst) — for an undirected graph pass both
    directions. ``nodes``: (doc) — every vertex, including isolated
    ones (they hold the (1-d) floor). Dangling mass is not
    redistributed (the standard leaky simplification; with symmetric
    edges every non-isolated node has out-degree > 0, so only isolated
    nodes leak, by design).

    rn_{i+1}(v) = (1-d) + d * sum_{u->v} rn_i(u) / deg(u)

    computed in FIXED POINT: ranks live in integer micro-units
    (10^round_dp per 1.0), per-edge contributions are integer floor
    divisions (rn DIV deg), and the damping step is
    (D * sum) DIV 1000 with D = round(damping * 1000). Every
    operation is exact integer arithmetic, so the ranking is
    bit-identical across engines and partitionings BY CONSTRUCTION —
    no round-at-a-boundary hazard (a 6dp double-rounded variant of
    this operator diverged by 1 ulp at one node on the first try;
    quantizing to floor instead of nearest costs <=1 micro-unit per
    edge per iteration and buys determinism).

    Each iteration is one join + one map-side-combinable groupBy —
    the same dataflow GraphX/Pregel lowers to, without leaving the
    DataFrame API, so AQE/broadcast decisions stay with Catalyst. At
    scale: localCheckpoint the rank frame every few iterations to cut
    lineage, and pre-partition edges by dst so the contribution
    shuffle is reused across iterations.

    Output: (doc, rn) — rank per node as double (exact micro-unit /
    10^round_dp conversion), mean ~1.
    """
    scale = 10 ** round_dp
    d_mil = int(round(damping * 1000))
    floor_mil = int(round((1.0 - damping) * scale))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_with_deg = edges.join(deg, "src")
    pr = nodes.select("doc", F.lit(scale).cast("long").alias("rn_u"))
    for _ in range(iters):
        contrib = (
            e_with_deg.join(pr, e_with_deg["src"] == pr["doc"])
            .select(
                F.col("dst").alias("doc"),
                F.expr("rn_u div deg").alias("__c"),
            )
            .groupBy("doc")
            .agg(F.sum("__c").alias("__s"))
        )
        pr = nodes.join(contrib, "doc", "left").select(
            "doc",
            (
                F.lit(floor_mil)
                + F.expr(
                    f"({d_mil} * coalesce(__s, 0L)) div 1000"
                )
            ).cast("long").alias("rn_u"),
        )
    return pr.select("doc", (F.col("rn_u") / float(scale)).alias("rn"))
