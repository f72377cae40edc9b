"""Integer-quantized PageRank (power iteration) over an edge DataFrame.

The centrality primitive corpus-curation pipelines run over link graphs
(CommonCrawl-style harmonic/PageRank filtering) and the repo's showcase
that ITERATIVE algorithms fit the engine: each sweep is one
contribution join + one destination-keyed aggregation — the same
join/agg shuffle pair every other operator uses, repeated k times with
lineage truncation between sweeps.

Determinism policy: ranks live as INTEGER micro-units end-to-end.
``r_{k+1}(v) = (1e6 - damping_ppm) + (num * sum(r_k(u) div outdeg(u)))
div den`` — where num/den is ``damping_ppm / 1_000_000`` reduced by
their gcd (0.85 -> 17/20) — uses only integer division and integer
sums, so the result is independent of partitioning, aggregation order,
and engine — a floating-point PageRank sums doubles in shuffle order
and cannot hash-match an oracle. The quantization error (< 1
micro-unit per term) is far below any ranking use of the score, and
the gcd reduction means ANY damping_ppm is applied exactly (no
truncation to percent). Overflow bound: num * sum(contributions to one
node) must fit in int64; with the reduced default (num=17) that allows
~5e17 micro-units of mass converging on a single node.

Scale shape: edges, degrees and the node set are computed once and
reused every sweep; each iteration shuffles (node, contribution) pairs
— O(edges) — plus one node-set left join so nodes with zero in-degree
keep their teleport rank (and keep contributing out-mass) instead of
vanishing. localCheckpoint keeps the plan from growing by one join per
sweep (an unchecked 10-sweep lineage is a 20-join plan that analyzes
quadratically). Out-degree-0 (dangling) nodes must still be handled by
the caller's graph construction (the query tier uses a bidirectional
bipartite graph, so every node has out-degree >= 1).
"""

from __future__ import annotations

import math

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
    if not 0 <= damping_ppm <= 1_000_000:
        raise ValueError(f"damping_ppm must be in [0, 1e6], got {damping_ppm}")
    # exact rational damping: reduce ppm/1e6 by gcd so any damping_ppm is
    # applied without truncation (0.85 -> 17/20, 0.855 -> 171/200)
    g = math.gcd(damping_ppm, 1_000_000) or 1
    d_num, d_den = damping_ppm // g, 1_000_000 // g
    base = 1_000_000 - damping_ppm  # teleport mass in micro-units: 150000

    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank_u6"))
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
        # left-join back onto the FULL node set: a node with zero
        # in-degree receives no contributions but must keep its teleport
        # rank (and keep pushing out-mass next sweep), not vanish
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({d_num} * coalesce(s, 0L)) div {d_den}")
            )
            .cast("long")
            .alias("rank_u6"),
        ).localCheckpoint(eager=False)
    return ranks
