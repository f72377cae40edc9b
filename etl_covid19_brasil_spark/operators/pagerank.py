"""Integer-quantized PageRank (power iteration) over an edge DataFrame.

The centrality primitive corpus-curation pipelines run over link graphs
(CommonCrawl-style harmonic/PageRank filtering) and the repo's showcase
that ITERATIVE algorithms fit the engine: each sweep is one
contribution join + one destination-keyed aggregation — the same
join/agg shuffle pair every other operator uses, repeated k times with
lineage truncation between sweeps.

Determinism policy: ranks live as INTEGER micro-units end-to-end.
``r_{k+1}(v) = 150000 + (85 * sum(r_k(u) div outdeg(u))) div 100`` uses
only integer division and integer sums, so the result is independent of
partitioning, aggregation order, and engine — a floating-point PageRank
sums doubles in shuffle order and cannot hash-match an oracle. The
quantization error (< 1 micro-unit per term) is far below any ranking
use of the score.

Scale shape: edges and degrees are computed once and reused every
sweep; each iteration shuffles (node, contribution) pairs — O(edges) —
and localCheckpoint keeps the plan from growing by one join per sweep
(an unchecked 10-sweep lineage is a 20-join plan that analyzes
quadratically). Dangling nodes must be handled by the caller's graph
construction (the query tier uses a bidirectional bipartite graph, so
every node has out-degree >= 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_ppm: int = 850_000,
) -> DataFrame:
    """Run ``iterations`` integer power-method sweeps over ``edges``.

    Returns (node, rank_u6): rank in micro-units, starting uniform at
    1_000_000 per node. ``damping_ppm`` is the damping factor in parts
    per million (default 0.85).
    """
    d_num = damping_ppm // 10_000  # 0.85 -> 85 (percent numerator)
    base = 1_000_000 - damping_ppm  # teleport mass in micro-units: 150000

    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.lit(1_000_000).cast("long").alias("rank_u6"))
    )
    for _ in range(iterations):
        # outdeg derives from edges — rename the join key at each hop so
        # the self-join lineage never leaves an ambiguous attribute
        per_src = (
            ranks.join(outdeg, ranks.node == outdeg.src)
            .select(F.col("src").alias("contrib_src"), F.expr("rank_u6 div d").alias("c"))
        )
        contrib = (
            per_src.join(edges, per_src.contrib_src == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            "node",
            (F.lit(base) + F.expr(f"({d_num} * s) div 100"))
            .cast("long")
            .alias("rank_u6"),
        ).localCheckpoint(eager=False)
    return ranks
