"""Maximal Marginal Relevance (MMR) diversified top-k selection.

Carbonell & Goldstein 1998: iteratively pick the candidate maximizing
``lambda * relevance - (1 - lambda) * max_sim_to_already_picked`` — the
standard result-diversification pass a retrieval stack runs after its
ranker, trading relevance against redundancy.

Scale contract
--------------
MMR is inherently sequential (each pick changes every remaining
candidate's penalty), so it cannot be a corpus-wide Spark op — and does
not need to be: the corpus-sized work is the RELEVANCE SCORING + top-pool
cut, which stays fully distributed (map-side ordered folds + a
TakeOrderedAndProject). Only the constant-size pool (default 50 rows,
O(1) in corpus size) is collected, and the greedy loop runs over that
pool's ``pool x dim`` float64 matrix on the driver — the same
bounded-collect pattern as the IVF centroid trainer (llm/ann.py). At
100 TB the pool is still 50 rows.

Determinism: pool membership/order comes from the JVM ordered-fold dot
(bit-stable, ties on id); all driver-side scoring is float64 numpy with
index-ordered reductions; outputs are quantized to integer micro-units.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["mmr_sign", "mmr_select"]


def mmr_sign(i: int, j: int) -> float:
    """Python twin of queries.llm._rp_sign / _SIGN_SQL (i is 1-based)."""
    return 1.0 if ((i * 73 + j * 179 + 7) * 2654435761) % 1000 < 500 else -1.0


def mmr_select(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_j: int = 101,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR over the top-``pool`` candidates by query relevance.

    Relevance is the cosine of each L2-normalized vector against the
    hash-derived ±1 query vector (row ``query_j`` of the virtual sign
    matrix shared with embedding_random_projection / rank_hybrid_rrf);
    diversity penalty is the max cosine to any already-selected vector.

    Returns (id, mmr_order, rel_u6, penalty_u6, mmr_u6): selection order
    1..k, the candidate's relevance, the penalty at selection time, and
    the winning marginal score — all floor(x * 1e6 + 0.5) micro-units.
    """
    spark = df.sparkSession
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot_self = F.aggregate(
        F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, t: a + t
    )
    ne = F.transform(emb, lambda x: x / F.sqrt(dot_self))
    dotq = F.aggregate(
        F.transform(
            ne,
            lambda x, i: F.when(
                ((i + 1) * 73 + query_j * 179 + 7) * F.lit(2654435761) % 1000 < 500,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            * x,
        ),
        F.lit(0.0),
        lambda a, t: a + t,
    )
    cand = (
        df.select(F.col(id_col).alias("id"), ne.alias("ne"), dotq.alias("dotq"))
        .orderBy(F.desc("dotq"), F.asc("id"))
        .limit(pool)
        .collect()
    )
    ids = [r["id"] for r in cand]
    mat = np.array([r["ne"] for r in cand], dtype=np.float64)
    dim = mat.shape[1] if len(cand) else 0
    q = np.array([mmr_sign(i + 1, query_j) for i in range(dim)], dtype=np.float64)
    # Recompute relevance in float64 numpy so every score the greedy loop
    # compares comes from ONE arithmetic domain (|q| = sqrt(dim) is a
    # shared constant — it rescales, never reorders).
    rel = mat @ q / np.sqrt(dim) if len(cand) else np.empty(0)
    sims = mat @ mat.T  # pool x pool cosines (vectors are unit-norm)

    picked: list[int] = []
    rows = []
    remaining = set(range(len(cand)))
    while remaining and len(picked) < k:
        best = None
        for c in sorted(remaining):  # index order == (dotq desc, id) order
            penalty = max((sims[c, p] for p in picked), default=0.0)
            score = lam * rel[c] - (1.0 - lam) * penalty
            if best is None or score > best[0] + 1e-15:
                best = (score, c, penalty)
        _, c, penalty = best
        picked.append(c)
        remaining.discard(c)
        rows.append(
            (
                ids[c],
                len(picked),
                int(np.floor(rel[c] * 1e6 + 0.5)),
                int(np.floor(penalty * 1e6 + 0.5)),
                int(np.floor((lam * rel[c] - (1.0 - lam) * penalty) * 1e6 + 0.5)),
            )
        )
    return spark.createDataFrame(
        rows, "id long, mmr_order int, rel_u6 long, penalty_u6 long, mmr_u6 long"
    )
