"""ann_search (two-DataFrame retrieval, VERDICT r14 item 1) and the
prepare_ann_route handle (item 5): tier equivalence, the 8x recall
floor vs brute force on the same split, and byte-identity of the
amortized-construction path. Plan pins live in tests/test_plans.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _unit(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _truth_two_frame(q_ids, q_mat, i_ids, i_mat, k=5) -> set:
    """Exact two-frame top-k truth set in numpy (same tie-break)."""
    qn, idxn = _unit(q_mat.astype(np.float64)), _unit(i_mat.astype(np.float64))
    sims = qn @ idxn.T
    sims[q_ids[:, None] == i_ids[None, :]] = -np.inf
    out = set()
    for r, qid in enumerate(q_ids):
        order = np.lexsort((i_ids, -sims[r]))[:k]
        out.update((int(qid), int(i_ids[j])) for j in order if sims[r, j] > -np.inf)
    return out


def _split_frames(spark, n, dim, seed, anchors_n=8, noise=0.08):
    """Clustered corpus split 1/20 queries vs 19/20 index (the
    registered split discipline), returned as (q_df, i_df, numpy truth
    inputs)."""
    rng = np.random.default_rng(seed)
    anchors = _unit(rng.normal(size=(anchors_n, dim)))
    vecs = _unit(
        anchors[np.arange(n) % anchors_n] + noise * rng.normal(size=(n, dim))
    ).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    qm = ids % 20 == 0
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    df = spark.createDataFrame(pdf)
    q = df.filter("vec_id % 20 = 0")
    i = df.filter("vec_id % 20 <> 0")
    return q, i, (ids[qm], vecs[qm], ids[~qm], vecs[~qm])


def test_ann_search_exact_tiers_agree_on_gate_split(spark):
    """The three exact tiers (bounded-index broadcast, broadcast-query
    scan, cogrouped block-nested-loop) must return the IDENTICAL
    (query_id, neighbor_id, rank) result on the same split — they are
    one operator at three plan shapes. Driver-checked too (they share
    one oracle), but the equality must hold locally without DuckDB in
    the loop."""
    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.ann import TierRoute
    from etl_covid19_brasil_spark.llm.search import (
        MAX_INDEX_ROWS,
        QUERY_BROADCAST_MAX,
        ann_search,
    )

    e = load_table(spark, SF, "embeddings")
    q, i = e.filter("vec_id % 20 = 0"), e.filter("vec_id % 20 <> 0")

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], round(r["cosine"], 12))
            for r in df.collect()
        )

    bounded = rows(ann_search(q, i, k=5))
    flat_route = TierRoute("lsh", MAX_INDEX_ROWS + 1, 0, None)
    scan = rows(ann_search(q, i, k=5, route=flat_route, n_index=MAX_INDEX_ROWS + 1))
    bnl = rows(
        ann_search(
            q,
            i,
            k=5,
            route=flat_route,
            n_index=MAX_INDEX_ROWS + 1,
            n_queries=QUERY_BROADCAST_MAX + 1,
        )
    )
    assert len(bounded) > 0
    assert scan == bounded
    assert bnl == bounded


@pytest.mark.slow  # full-lane tier: 8x corpus build + two-frame truth
def test_ann_search_ivf_recall_floor_at_8x(spark):
    """The approximate tier's quality gate (VERDICT r14 item 1 'done'
    condition): at the 8x size regime (4000 vectors, clustered — the
    shape the ivf tier exists for), the two-frame cell meet must
    recover >= 0.9 of the brute-force truth ON THE SAME SPLIT. The
    16-cell trained handle + rank-derived probes mirror the registered
    ann_search_ivf query's construction."""
    from etl_covid19_brasil_spark.llm.ann import TierRoute, kmeans_lloyd
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    q, i, (q_ids, q_mat, i_ids, i_mat) = _split_frames(spark, 4000, 64, seed=37)
    cents = kmeans_lloyd(i, k=16, iters=3)
    route = TierRoute("ivf", MAX_INDEX_ROWS + 1, 0, None, centroids=cents)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search(
            q, i, k=5, route=route, n_index=MAX_INDEX_ROWS + 1
        ).collect()
    }
    truth = _truth_two_frame(q_ids, q_mat, i_ids, i_mat, k=5)
    r = len(got & truth) / len(truth)
    print(f"ann_search ivf 8x clustered split recall: {r:.3f}")
    assert r >= 0.9, f"two-frame IVF recall collapsed: {r:.3f}"


@pytest.mark.slow  # full-lane tier: trains Lloyd twice on a 6k corpus
def test_ann_search_route_handle_is_byte_identical(spark):
    """prepare_ann_route amortization contract (VERDICT r14 item 5):
    the handle changes WHERE construction runs, never WHAT is computed.
    Two comparisons pin that:

    1. ann_topk_auto(route=handle) == ivf_topk(centroids=handle's) —
       the handle path is exactly the per-call path GIVEN the same
       trained centroids (every derivation downstream of the centroids
       is deterministic in them). A fresh no-handle call is NOT the
       comparison baseline: re-running Lloyd re-sums doubles across a
       shuffle, so two trainings are equal only to float tolerance —
       the handle exists precisely so construction runs once.
    2. Reusing ONE handle across calls is self-identical (the amortized
       path injects no per-call state).

    Plus the two-frame consumer: ann_search with the handle equals
    ann_search without it at the bounded tier (where the tier hint is
    ignored by design)."""
    from etl_covid19_brasil_spark.llm.ann import (
        ann_topk_auto,
        ivf_topk,
        prepare_ann_route,
    )
    from etl_covid19_brasil_spark.llm.search import ann_search

    rng = np.random.default_rng(41)
    n, dim = 6000, 32
    anchors = _unit(rng.normal(size=(8, dim)))
    vecs = _unit(
        anchors[np.arange(n) % 8] + 0.08 * rng.normal(size=(n, dim))
    ).astype(np.float64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    ).cache()
    route = prepare_ann_route(df)
    assert route.tier == "ivf" and route.centroids is not None

    def rows(d):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in d.collect()
        )

    with_handle = rows(ann_topk_auto(df, k=5, route=route))
    direct = rows(ivf_topk(df, k=5, centroids=route.centroids))
    assert with_handle == direct and len(with_handle) > 0
    reused = rows(ann_topk_auto(df, k=5, route=route))
    assert reused == with_handle

    q, i = df.filter("vec_id % 20 = 0"), df.filter("vec_id % 20 <> 0")
    # two-frame: at this index size both calls take the bounded exact
    # tier, covering the handle-ignored-safely contract. The explicit
    # n_index hint pins that: a cached local relation has no row-count
    # statistics, so the plan estimate would otherwise overshoot the
    # bound and route both calls onto the approximate tier.
    ni = i.count()
    s_with = rows(ann_search(q, i, k=5, route=route, n_index=ni))
    s_without = rows(ann_search(q, i, k=5, n_index=ni))
    assert s_with == s_without and len(s_with) > 0
    df.unpersist()


def test_ann_search_empty_query_batch(spark):
    """A zero-row query batch must return a zero-row (not crashed)
    result on the bounded tier — the eval-harness edge every serving
    API hits eventually."""
    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import ann_search

    e = load_table(spark, SF, "embeddings")
    q = e.filter("vec_id < 0")
    assert ann_search(q, e, k=5).count() == 0


def test_ann_search_empty_index(spark):
    """The symmetric edge (ADVICE r15): a zero-row INDEX routes to the
    bounded tier (estimates floor at 1) and must return a zero-row
    result, not crash in np.stack on the collected empty frame."""
    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import ann_search

    e = load_table(spark, SF, "embeddings")
    assert ann_search(e, e.filter("vec_id < 0"), k=5).count() == 0


def test_ann_search_query_collect_is_bounded_on_lying_estimate(spark, monkeypatch):
    """The broadcast-query tier's driver collect must be gated by an
    EXACT bound probe, not the Catalyst estimate (VERDICT r15
    what's-wrong #1): an under-estimating n_queries hint (standing in
    for a CBO selectivity undershoot on a filtered frame) must degrade
    to the cogrouped tier — with the identical result — instead of
    pulling the whole over-bound query frame through the driver."""
    import etl_covid19_brasil_spark.llm.search as search_mod
    from etl_covid19_brasil_spark.llm.ann import TierRoute
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    rng = np.random.default_rng(7)
    n, dim = 400, 16
    vecs = _unit(rng.normal(size=(n, dim))).astype(np.float64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    )
    q, i = df.filter("vec_id % 2 = 0"), df.filter("vec_id % 2 <> 0")
    flat = TierRoute("lsh", MAX_INDEX_ROWS + 1, 0, None)
    # shrink the broadcast bound so the 200-row query side is over it
    monkeypatch.setattr(search_mod, "QUERY_BROADCAST_MAX", 50)

    captured = []
    orig = search_mod._broadcast_query_scan

    def spy(*args, **kwargs):
        captured.append(kwargs.get("q_pdf"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(search_mod, "_broadcast_query_scan", spy)
    # n_queries=1 lies low — exactly the CBO undershoot shape
    got = ann_search(
        q, i, k=5, route=flat, n_index=MAX_INDEX_ROWS + 1, n_queries=1
    )
    rows = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in got.collect()
    )
    # the over-bound batch never reached the broadcast tier
    assert captured == [], "lying estimate still routed the driver collect"
    ref = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ann_search(q, i, k=5).collect()
    )
    assert rows == ref and len(rows) > 0


def test_ivf_search_kernels_are_fanout_sliced():
    """Memory-guard pin (ADVICE r16 medium): _ivf_search's assign
    kernels fan each input batch n_probe- / s_n-fold with full vectors,
    so they must yield through _fanout_slices like every other fan-out
    kernel in the family (_ivfpq_search, lsh_search) — one unsliced
    yield at scale is the SCALECHECK_r12 OutOfDirectMemoryError shape.
    The slice step is a worker-side constant unobservable at gate scale
    (65536 output rows far exceeds any test batch), so pin the guard's
    presence in the kernel source; bit-identity of sliced yields is
    _fanout_slices' own contract (only Arrow framing changes)."""
    import inspect

    from etl_covid19_brasil_spark.llm.search import _ivf_search

    src = inspect.getsource(_ivf_search)
    assert src.count("_fanout_slices") >= 2, (
        "_ivf_search lost its fan-out slicing guard"
    )


def test_lsh_search_recall_floor_on_gate_split(spark):
    """Two-frame LSH bucket meet at gate scale (P=4 floor, exhaustive
    d=1 fan): recall vs the exact split reference — measured 0.976."""
    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import ann_search, lsh_search

    e = load_table(spark, SF, "embeddings")
    q, i = e.filter("vec_id % 20 = 0"), e.filter("vec_id % 20 <> 0")
    ref = {(r["query_id"], r["neighbor_id"]) for r in ann_search(q, i, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in lsh_search(q, i, k=5).collect()}
    r = len(got & ref) / len(ref)
    print(f"lsh_search gate split recall: {r:.3f}")
    assert r >= 0.9, f"two-frame LSH gate recall collapsed: {r:.3f}"


@pytest.mark.slow  # full-lane tier: 8x corpus build + exact reference
def test_lsh_search_recall_floor_at_8x_flat(spark):
    """The tier's quality gate at the scale it exists for: 8x flat
    (16,000 dimension-rolled vectors, split 800 queries / 15,200
    index), derived P=6 / T=11, recall vs the exact reference —
    measured 0.959. Also the regression pin for the recall-bearing
    count fix: deriving P from Catalyst's filtered-frame estimate
    instead of the exact count measured P=12 and recall 0.367."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.scale_check import build_scaled_dir

    import pyspark.sql.functions as F
    import shutil

    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import ann_search, lsh_search

    path = build_scaled_dir(spark, 8)
    try:
        emb = load_table(spark, path, "embeddings").cache()
        emb.count()
        q = emb.filter(F.col("vec_id") % 20 == 0)
        i = emb.filter(F.col("vec_id") % 20 != 0)
        ref = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_search(q, i, k=5, n_index=i.count()).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"]) for r in lsh_search(q, i, k=5).collect()
        }
        r = len(got & ref) / len(ref)
        print(f"lsh_search 8x flat split recall: {r:.3f}")
        assert r >= 0.85, f"two-frame LSH 8x recall collapsed: {r:.3f}"
        emb.unpersist()
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_lsh_adc_search_matches_bucket_recall_on_gate_split(spark):
    """The ADC budget form shares lsh_search's planes/tables/fan/salting
    exactly, so at gate scale (small buckets, pool >> bucket) its result
    must match the full-vector form — the added approximation (ADC
    ranking inside the pool bound) has no room to bite here. Also pins
    that the index side genuinely ships NO vectors (source pin on the
    sign_index kernel's vec column)."""
    import inspect

    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import lsh_adc_search, lsh_search

    e = load_table(spark, SF, "embeddings")
    q, i = e.filter("vec_id % 20 = 0"), e.filter("vec_id % 20 <> 0")
    full = {
        (r["query_id"], r["neighbor_id"]) for r in lsh_search(q, i, k=5).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_adc_search(q, i, k=5).collect()
    }
    assert len(full) > 0
    r = len(adc & full) / len(full)
    print(f"lsh_adc_search gate recall vs full-vector form: {r:.3f}")
    assert r >= 0.95, f"ADC form diverged from the full-vector form: {r:.3f}"
    src = inspect.getsource(lsh_adc_search)
    assert '"vec": [None] * (len(ids) * rows),  # the budget: no vectors' in src


def test_ann_topk_auto_budget_routes_flat_to_adc(spark, monkeypatch):
    """The self-join router twin of the ivfpq budget pin (ADVICE r14):
    a declared index byte budget the raw float64 index overflows, on a
    flat-routed corpus, must take the ADC-banded form instead of
    silently shipping full vectors through the banding shuffle; without
    the budget the identical call stays on lsh_topk."""
    import etl_covid19_brasil_spark.llm.search as search_mod
    from etl_covid19_brasil_spark.llm.ann import TierRoute, ann_topk_auto

    rng = np.random.default_rng(23)
    n, dim = 300, 16
    vecs = _unit(rng.normal(size=(n, dim))).astype(np.float64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    )
    route = TierRoute("lsh", n, dim, None)
    hit = []
    orig = search_mod.lsh_adc_search

    def spy(*a, **kw):
        hit.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(search_mod, "lsh_adc_search", spy)
    got = ann_topk_auto(df, k=3, route=route, index_budget_bytes=1024)
    assert got.count() > 0 and hit, "budget did not route the ADC self-join"
    assert {c for c in got.columns} == {"query_id", "neighbor_id", "cosine", "rank"}
    hit.clear()
    full = ann_topk_auto(df, k=3, route=route)
    assert full.count() > 0 and not hit


@pytest.mark.slow  # full-lane tier: four materializations + PQ training
def test_ann_search_budget_routes_flat_big_batch_to_adc(spark, monkeypatch):
    """A DECLARED index byte budget on the flat route with an over-bound
    query batch must route the banded ADC form instead of the cogrouped
    BNL (the budget is the same explicit opt-in that routes ivfpq on
    clustered shapes); without the budget the identical call stays on
    the exact BNL."""
    import etl_covid19_brasil_spark.llm.search as search_mod
    from etl_covid19_brasil_spark.llm.ann import TierRoute
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    rng = np.random.default_rng(17)
    n, dim = 600, 16
    vecs = _unit(rng.normal(size=(n, dim))).astype(np.float64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    )
    q, i = df.filter("vec_id % 2 = 0"), df.filter("vec_id % 2 <> 0")
    flat = TierRoute("lsh", MAX_INDEX_ROWS + 1, dim, None)
    monkeypatch.setattr(search_mod, "QUERY_BROADCAST_MAX", 50)
    hit = []
    orig = search_mod.lsh_adc_search

    def spy(*a, **kw):
        hit.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(search_mod, "lsh_adc_search", spy)
    got = ann_search(
        q, i, k=5, route=flat,
        n_index=MAX_INDEX_ROWS + 1, n_queries=300,
        index_budget_bytes=1024,  # raw float64 index overflows this
    )
    assert got.count() > 0 and hit, "budget did not route the ADC form"
    # recall sanity vs the exact result on the same split
    ref = {(r["query_id"], r["neighbor_id"]) for r in ann_search(q, i, k=5).collect()}
    adc = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert len(adc & ref) / len(ref) >= 0.8
    # no budget -> the exact BNL, never a silent approximate default
    hit.clear()
    exact = ann_search(
        q, i, k=5, route=flat, n_index=MAX_INDEX_ROWS + 1, n_queries=300
    )
    assert not hit
    assert {(r["query_id"], r["neighbor_id"]) for r in exact.collect()} == ref


@pytest.mark.slow  # full-lane tier: 8x corpus + PQ train + exact reference
def test_lsh_adc_search_recall_floor_at_8x_flat(spark):
    """The budget tier's quality gate at the scale it exists for (the
    VERDICT r15 item 3 'done' condition): 8x flat split, recall vs the
    FULL-VECTOR lsh_search it replaces — the byte saving must not cost
    bucket-level recall beyond the ADC pool bound."""
    import shutil
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import lsh_adc_search, lsh_search
    from scripts.scale_check import build_scaled_dir

    path = build_scaled_dir(spark, 8)
    try:
        emb = load_table(spark, path, "embeddings").cache()
        emb.count()
        q = emb.filter(F.col("vec_id") % 20 == 0)
        i = emb.filter(F.col("vec_id") % 20 != 0)
        full = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_search(q, i, k=5).collect()
        }
        adc = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_adc_search(q, i, k=5).collect()
        }
        r = len(adc & full) / len(full)
        print(f"lsh_adc_search 8x flat recall vs full-vector form: {r:.3f}")
        assert r >= 0.85, f"ADC budget tier recall collapsed: {r:.3f}"
        emb.unpersist()
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.slow  # full-lane tier: Lloyd + PQ train on a 4k corpus
def test_ann_search_pq_recall_floor_on_clustered_split(spark):
    """The budget tier's quality gate: two-frame IVF-PQ (residual byte
    codes on the index shuffle, global rerank pool, exact-cosine rerank
    join) on the 8-anchor clustered split — the only shape the tier is
    routed on. Measured 1.0 at 4000 x 64; pin a conservative floor so a
    broken codebook/pool/rerank stage fails loudly."""
    from etl_covid19_brasil_spark.llm.ann import TierRoute, kmeans_lloyd
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    q, i, (q_ids, q_mat, i_ids, i_mat) = _split_frames(spark, 4000, 64, seed=61)
    cents = kmeans_lloyd(i, k=16, iters=3)
    route = TierRoute("ivfpq", MAX_INDEX_ROWS + 1, 64, None, centroids=cents)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search(
            q, i, k=5, route=route, n_index=MAX_INDEX_ROWS + 1
        ).collect()
    }
    truth = _truth_two_frame(q_ids, q_mat, i_ids, i_mat, k=5)
    r = len(got & truth) / len(truth)
    print(f"ann_search two-frame ivfpq clustered split recall: {r:.3f}")
    assert r >= 0.9, f"two-frame IVF-PQ recall collapsed: {r:.3f}"


def test_ann_search_index_collect_is_bounded_on_lying_estimate(spark, monkeypatch):
    """The bounded-INDEX tier's driver collect must be gated by the same
    exact limit-probe as the query side (r16): an under-estimating
    n_index hint (the CBO selectivity-undershoot shape — live since
    ann_search_filtered feeds post-filter frames into this gate) must
    fall through to the routed path with the identical result instead
    of pulling the whole over-bound index through the driver."""
    import etl_covid19_brasil_spark.llm.search as search_mod
    from etl_covid19_brasil_spark.llm.search import ann_search

    rng = np.random.default_rng(8)
    n, dim = 400, 16
    vecs = _unit(rng.normal(size=(n, dim))).astype(np.float64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    )
    q, i = df.filter("vec_id % 4 = 0"), df.filter("vec_id % 4 <> 0")
    # shrink the bound so the 300-row index side is over it
    monkeypatch.setattr(search_mod, "MAX_INDEX_ROWS", 50)

    full_collects = []
    orig = search_mod._broadcast_index_search

    def spy(*args, **kwargs):
        full_collects.append(kwargs.get("i_pdf"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(search_mod, "_broadcast_index_search", spy)
    # n_index=1 lies low — the probe must catch it
    got = ann_search(q, i, k=5, n_index=1)
    rows = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in got.collect()
    )
    assert full_collects == [], "lying estimate still routed the full collect"
    monkeypatch.undo()
    ref = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ann_search(q, i, k=5).collect()
    )
    assert rows == ref and len(rows) > 0


def test_ivf_candidate_pairs_meet_at_most_once(spark):
    """r16 optimization: the IVF merge skips the pair-dedup exchange on
    the meet-at-most-once argument (one home cell per index row,
    distinct probe cells per query). Pin the argument itself: the
    per-cell candidate stream of the two-frame IVF tier must contain
    no duplicated (query_id, neighbor_id) pair, so dedup=False is a
    plan-only change."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import TierRoute, kmeans_lloyd
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search
    from etl_covid19_brasil_spark.registry import T

    e = T(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") % 20 == 0)
    i = e.filter(F.col("vec_id") % 20 != 0)
    cents = kmeans_lloyd(i, k=8, iters=2)
    route = TierRoute("ivf", MAX_INDEX_ROWS + 1, 0, None, centroids=cents)
    # k larger than any cell's top so the local lists are as wide as
    # the tier ever emits them; rank<=k filter keeps every emitted pair
    out = ann_search(q, i, k=10_000, route=route, n_index=MAX_INDEX_ROWS + 1)
    dup = (
        out.groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert dup == 0


def test_exact_pair_counts_fused_and_correct(spark):
    """r17 (VERDICT r16 item 7): single-shot lsh_search/lsh_adc_search
    callers pay ONE fused count job instead of two. Pin (a) the fused
    counts equal the two separate count() results in every hint
    combination, and (b) the fused form costs strictly fewer scheduler
    jobs than the two-count form it replaced (self-calibrating: both
    are measured via job groups in this session)."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.search import _exact_pair_counts
    from etl_covid19_brasil_spark.registry import T

    e = T(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") % 8 == 0)
    i = e.filter(F.col("vec_id") % 8 != 0)
    sc = spark.sparkContext

    def jobs_of(group, fn):
        sc.setJobGroup(group, group)
        try:
            out = fn()
        finally:
            sc.setJobGroup("idle", "idle")
        return out, len(sc.statusTracker().getJobIdsForGroup(group))

    (ni, nq), fused_jobs = jobs_of(
        "fused_pc", lambda: _exact_pair_counts(i, q, None, None)
    )
    (ni2, nq2), two_jobs = jobs_of("two_pc", lambda: (i.count(), q.count()))
    assert (ni, nq) == (ni2, nq2)
    assert fused_jobs < two_jobs, (fused_jobs, two_jobs)
    # hints short-circuit to zero jobs
    _, zero_jobs = jobs_of("hint_pc", lambda: _exact_pair_counts(i, q, 7, 3))
    assert zero_jobs == 0
    assert _exact_pair_counts(i, q, 7, 3) == (7, 3)
    assert _exact_pair_counts(i, q, None, 3) == (ni, 3)
    assert _exact_pair_counts(i, q, 7, None) == (7, nq)
    # one frame on both sides: one count serves both
    (si, sq), self_jobs = jobs_of(
        "self_pc", lambda: _exact_pair_counts(e, e, None, None)
    )
    assert si == sq == ni + nq
    assert self_jobs <= fused_jobs


def test_lsh_adc_pool_has_no_pair_keyed_exchange(spark):
    """r17 (VERDICT r16 item 3): the ADC rerank pool's pair dedup and
    row_number window share ONE query_id exchange — the old plan paid a
    full (query_id, neighbor_id) hash exchange for the dedup and then a
    second exchange for the window. The pair-keyed exchange is the
    unique plan signature of the old shape: assert it is gone while the
    dedup aggregate and the pool window survive."""
    import re

    from etl_covid19_brasil_spark.llm.search import lsh_adc_search
    from tests.test_plans import plan_of

    q, i, _ = _split_frames(spark, 800, 16, seed=11)
    p = plan_of(lsh_adc_search(q, i, k=5))
    assert re.search(r"hashpartitioning\(query_id#\d+", p), p
    assert not re.search(r"hashpartitioning\(query_id#\d+L?,\s*neighbor_id", p), (
        "pair-keyed dedup exchange is back: " + p
    )
