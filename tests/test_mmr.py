"""Pins for rank_mmr_diversify (rows-only by contract): the Spark-side
pool + driver greedy loop must equal an independent pure-python replay,
and the selection must actually diversify (the property MMR exists for).
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_covid19_brasil_spark.llm.mmr import mmr_select, mmr_sign
from etl_covid19_brasil_spark.registry import T
from tests.conftest import SF_SMOKE

K, POOL, LAM, QJ = 10, 50, 0.7, 101


@pytest.fixture(scope="module")
def result(spark):
    rows = mmr_select(
        T(spark, SF_SMOKE, "embeddings"), query_j=QJ, k=K, pool=POOL, lam=LAM
    ).collect()
    return sorted((r["mmr_order"], r["id"], r["rel_u6"], r["penalty_u6"], r["mmr_u6"]) for r in rows)


@pytest.fixture(scope="module")
def reference(spark):
    """Pure-python replay: pandas-read parquet, float64 numpy end-to-end."""
    import duckdb

    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in raw])
    mat = np.array([r[1] for r in raw], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dim = mat.shape[1]
    q = np.array([mmr_sign(i + 1, QJ) for i in range(dim)])
    rel = mat @ q / np.sqrt(dim)
    order = np.lexsort((ids, -rel))[:POOL]
    pids, pmat, prel = ids[order], mat[order], rel[order]
    sims = pmat @ pmat.T
    picked, out = [], []
    remaining = list(range(len(pids)))
    while remaining and len(picked) < K:
        best = None
        for c in remaining:
            pen = max((sims[c, p] for p in picked), default=0.0)
            s = LAM * prel[c] - (1 - LAM) * pen
            if best is None or s > best[0] + 1e-15:
                best = (s, c, pen)
        s, c, pen = best
        picked.append(c)
        remaining.remove(c)
        out.append(
            (
                len(picked),
                int(pids[c]),
                int(np.floor(prel[c] * 1e6 + 0.5)),
                int(np.floor(pen * 1e6 + 0.5)),
                int(np.floor(s * 1e6 + 0.5)),
            )
        )
    return sorted(out), (pids, pmat, prel, sims, picked)


def test_matches_python_replay(result, reference):
    assert result == reference[0]


def test_selection_is_diverse(reference):
    """MMR's reason to exist: the selected set's max pairwise cosine must
    not exceed the pure-relevance top-K's (and on this corpus must strictly
    improve it — guards against the penalty term silently becoming a no-op).
    """
    pids, pmat, prel, sims, picked = reference[1]
    mmr_max = max(sims[a, b] for i, a in enumerate(picked) for b in picked[i + 1 :])
    topk = list(range(K))  # pool is already (rel desc, id) ordered
    topk_max = max(sims[a, b] for i, a in enumerate(topk) for b in topk[i + 1 :])
    assert mmr_max <= topk_max
    assert mmr_max < topk_max - 1e-9
    # relevance still matters: every pick is from the pool's upper half
    assert set(picked) <= set(range(POOL))


def test_first_pick_is_most_relevant(result):
    by_order = {o: (i, r) for o, i, r, _p, _m in result}
    first_id, first_rel = by_order[1]
    assert first_rel == max(r for _o, _i, r, _p, _m in result) or first_rel >= max(
        r for o, (_i, r) in by_order.items() if o > 1
    )
