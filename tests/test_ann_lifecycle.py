"""Index lifecycle (VERDICT r15 item 1): ann_index_append's append +
staleness contract on a frozen TierRoute handle — non-stale appends keep
the trained state byte-for-byte (unchanged-prefix stability), the
measured triggers (size growth, shape drift, exact-tier gate) fire at
the engine's own routing bounds, and the served union holds the pinned
recall floor. The append-cost-vs-rebuild-cost probe lives in
scripts/append_probe.py (SCALECHECK_r16)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _unit(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _clustered(
    spark, n, dim, seed, id_start=0, anchors_n=8, noise=0.08, anchor_seed=99
):
    # anchors come from a SHARED seed so a (base, delta) pair drawn with
    # different noise seeds is genuinely the same distribution
    anchors = _unit(np.random.default_rng(anchor_seed).normal(size=(anchors_n, dim)))
    rng = np.random.default_rng(seed)
    vecs = _unit(
        anchors[np.arange(n) % anchors_n] + noise * rng.normal(size=(n, dim))
    ).astype(np.float64)
    ids = np.arange(id_start, id_start + n, dtype=np.int64)
    return (
        spark.createDataFrame(
            pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
        ),
        ids,
        vecs,
    )


def _flat(spark, n, dim, seed, id_start=0):
    rng = np.random.default_rng(seed)
    vecs = _unit(rng.normal(size=(n, dim))).astype(np.float64)
    ids = np.arange(id_start, id_start + n, dtype=np.int64)
    return (
        spark.createDataFrame(
            pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
        ),
        ids,
        vecs,
    )


def _truth(q_ids, q_mat, i_ids, i_mat, k=5) -> set:
    sims = _unit(q_mat) @ _unit(i_mat).T
    sims[q_ids[:, None] == i_ids[None, :]] = -np.inf
    out = set()
    for r, qid in enumerate(q_ids):
        order = np.lexsort((i_ids, -sims[r]))[:k]
        out.update((int(qid), int(i_ids[j])) for j in order if sims[r, j] > -np.inf)
    return out


def test_append_in_distribution_delta_is_not_stale(spark):
    """A delta drawn from the SAME anchor geometry as the trained base
    must pass both staleness triggers: its assignment cosine clears the
    clustered threshold and sub-2x growth stays under the size bound.
    The handle's trained state must be untouched (same centroid array)
    and n_est must advance by the exact delta count."""
    from etl_covid19_brasil_spark.llm.ann import (
        TierRoute,
        ann_index_append,
        kmeans_lloyd,
    )

    base, _, _ = _clustered(spark, 1200, 32, seed=11)
    delta, _, _ = _clustered(spark, 300, 32, seed=12, id_start=1200)
    cents = kmeans_lloyd(base, k=16, iters=3)
    route = TierRoute("ivf", 1200, 32, None, centroids=cents, n_trained=1200)
    new_route, union, report = ann_index_append(route, base, delta)
    assert not report.stale and report.reason == ""
    assert report.n_delta == 300
    assert report.delta_tight_cos > 0.5  # cleared the routing threshold
    assert new_route.centroids is cents  # zero re-Lloyd
    assert new_route.n_est == 1500 and new_route.n_trained == 1200
    assert union.count() == 1500


def test_append_unchanged_prefix_is_byte_stable(spark):
    """Serving the BASE through the post-append handle must be
    byte-identical to serving it through the pre-append handle: a
    non-stale append changes bookkeeping (n_est), never trained state,
    and every derivation downstream of the centroids is deterministic
    in them."""
    from etl_covid19_brasil_spark.llm.ann import (
        TierRoute,
        ann_index_append,
        kmeans_lloyd,
    )
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    base, _, _ = _clustered(spark, 1200, 32, seed=21)
    delta, _, _ = _clustered(spark, 300, 32, seed=22, id_start=1200)
    q, i = base.filter("vec_id % 20 = 0"), base.filter("vec_id % 20 <> 0")
    cents = kmeans_lloyd(i, k=16, iters=3)
    route = TierRoute("ivf", 1140, 32, None, centroids=cents, n_trained=1140)
    new_route, _, report = ann_index_append(route, i, delta)
    assert not report.stale

    def rows(r):
        return sorted(
            (x["query_id"], x["neighbor_id"], x["rank"], x["cosine"])
            for x in ann_search(
                q, i, k=5, route=r, n_index=MAX_INDEX_ROWS + 1
            ).collect()
        )

    before, after = rows(route), rows(new_route)
    assert before == after and len(before) > 0


def test_append_shape_drift_triggers_retrain(spark):
    """Off-distribution delta (flat random vectors against a handle
    trained on 8-anchor clusters): the bounded shape sample measures
    assignment cosine BELOW the engine's clustered-routing threshold —
    the cells can't resolve the new data — and the shape trigger
    fires."""
    from etl_covid19_brasil_spark.llm.ann import (
        TierRoute,
        ann_index_append,
        kmeans_lloyd,
    )

    base, _, _ = _clustered(spark, 1200, 32, seed=31)
    delta, _, _ = _flat(spark, 300, 32, seed=32, id_start=1200)
    cents = kmeans_lloyd(base, k=16, iters=3)
    route = TierRoute("ivf", 1200, 32, None, centroids=cents, n_trained=1200)
    new_route, _, report = ann_index_append(route, base, delta, retrain=False)
    assert report.stale and report.reason == "shape"
    assert report.delta_tight_cos < 0.5
    # retrain=False: the grown-but-stale handle is returned as-is
    assert new_route.centroids is cents and new_route.n_est == 1500


def test_append_size_growth_triggers_retrain(spark):
    """Corpus growth past _RETRAIN_GROWTH x the TRAINING size fires the
    size trigger even when the delta fits the trained geometry — and
    the bound accumulates across appends (measured against n_trained,
    not the post-append n_est)."""
    from etl_covid19_brasil_spark.llm.ann import (
        TierRoute,
        ann_index_append,
        kmeans_lloyd,
    )

    base, _, _ = _clustered(spark, 900, 32, seed=41)
    d1, _, _ = _clustered(spark, 500, 32, seed=42, id_start=900)
    d2, _, _ = _clustered(spark, 500, 32, seed=43, id_start=1400)
    cents = kmeans_lloyd(base, k=16, iters=3)
    route = TierRoute("ivf", 900, 32, None, centroids=cents, n_trained=900)
    route1, union1, rep1 = ann_index_append(route, base, d1)
    assert not rep1.stale and route1.n_est == 1400
    # second append crosses 2 x 900 = 1800 cumulatively
    _, _, rep2 = ann_index_append(route1, union1, d2, retrain=False)
    assert rep2.stale and rep2.reason == "size"


def test_append_exact_tier_gate_retrains_to_a_routed_tier(spark):
    """An exact-tier handle whose union outgrows _EXACT_TIER_MAX must
    report tier-gate staleness, and retrain=True must hand back a
    freshly routed handle over the union (clustered union -> ivf with
    trained centroids and n_trained stamped)."""
    from etl_covid19_brasil_spark.llm.ann import (
        _EXACT_TIER_MAX,
        ann_index_append,
        prepare_ann_route,
    )

    base, _, _ = _clustered(spark, 3000, 32, seed=51)
    delta, _, _ = _clustered(
        spark, _EXACT_TIER_MAX - 3000 + 500, 32, seed=52, id_start=3000
    )
    route = prepare_ann_route(base.cache())
    # a 3000-row local relation estimates over the exact gate only if
    # statistics overshoot; pin the premise with the count fallback
    if route.tier != "exact":
        route = route._replace(tier="exact", n_est=3000, n_trained=3000,
                               centroids=None)
    new_route, union, report = ann_index_append(route, base, delta)
    assert report.stale and report.reason == "tier-gate"
    assert new_route.tier in ("ivf", "lsh")
    assert new_route.n_trained > 0
    if new_route.tier == "ivf":
        assert new_route.centroids is not None
    base.unpersist()


def test_append_lsh_handle_only_grows(spark):
    """The lsh tier carries no trained state (planes/tables derive per
    call from exact counts) — its handle never reports stale; only the
    size bookkeeping advances."""
    from etl_covid19_brasil_spark.llm.ann import TierRoute, ann_index_append

    base, _, _ = _flat(spark, 800, 16, seed=61)
    delta, _, _ = _flat(spark, 5000, 16, seed=62, id_start=800)
    route = TierRoute("lsh", 800, 16, None, n_trained=800)
    new_route, _, report = ann_index_append(route, base, delta)
    assert not report.stale and report.reason == ""
    assert new_route.tier == "lsh" and new_route.n_est == 5800


def test_stream_ann_enrich_live_twin_matches_batch(spark):
    """The streaming x ann_search composition (VERDICT r15 item 2): the
    readStream micro-batch replay through run_stream_ann_enrich must
    equal the whole-batch ann_search over the same split (per-query
    top-k commutes with any batch split), and the replay must actually
    execute >= 2 micro-batches — otherwise the handle-reuse claim is
    vacuous."""
    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import ann_search
    from etl_covid19_brasil_spark.streaming.jobs import run_stream_ann_enrich

    e = load_table(spark, SF, "embeddings")
    q, i = e.filter("vec_id % 20 = 0"), e.filter("vec_id % 20 <> 0")
    res, n_batches = run_stream_ann_enrich(spark, q, i, k=5, n_files=3)
    assert n_batches >= 2, f"replay ran in {n_batches} micro-batch(es)"

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in df.collect()
        )

    assert rows(res) == rows(ann_search(q, i, k=5)) and res.count() > 0


def test_stream_ann_enrich_never_retrains_per_batch(spark, monkeypatch):
    """Handle-reuse tripwire: with a trained ivf handle passed in, NO
    micro-batch may reach kmeans_lloyd — construction amortizes across
    the stream's lifetime (the no-per-batch-Lloyd 'done' condition).
    foreachBatch sinks run driver-side, so the tripwire sees every
    trigger."""
    import etl_covid19_brasil_spark.llm.search as search_mod
    from etl_covid19_brasil_spark.llm.ann import TierRoute, kmeans_lloyd
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS
    from etl_covid19_brasil_spark.streaming.jobs import run_stream_ann_enrich

    base, _, _ = _clustered(spark, 1500, 32, seed=81)
    q = base.filter("vec_id % 20 = 0")
    i = base.filter("vec_id % 20 <> 0")
    cents = kmeans_lloyd(i, k=16, iters=3)
    route = TierRoute(
        "ivf", MAX_INDEX_ROWS + 1, 32, None, centroids=cents, n_trained=1425
    )

    def tripwire(*a, **k):
        raise AssertionError("per-batch Lloyd: the frozen handle was ignored")

    monkeypatch.setattr(search_mod, "kmeans_lloyd", tripwire)
    # the unbounded n_index hint forces the routed ivf tier (the bounded
    # exact tier would ignore the handle and make the tripwire vacuous)
    res, n_batches = run_stream_ann_enrich(
        spark, q, i, k=5, n_files=2, route=route, n_index=MAX_INDEX_ROWS + 1
    )
    assert n_batches >= 2 and res.count() > 0


def test_stream_index_ingest_serves_whole_corpus_result(spark):
    """The full serving loop (streaming ingest INTO the index through
    the lifecycle handle): after 3 micro-batch appends, serving the
    query batch from the final handle must equal ann_search over the
    whole corpus — appends commute with unions, per-query top-k is
    split-invariant. The per-batch report trail must show one
    non-crashed staleness decision per micro-batch."""
    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.llm.search import ann_search
    from etl_covid19_brasil_spark.streaming.jobs import run_stream_index_ingest

    e = load_table(spark, SF, "embeddings")
    q, i = e.filter("vec_id % 20 = 0"), e.filter("vec_id % 20 <> 0")
    base = i.filter("vec_id % 10 < 8")
    delta = i.filter("vec_id % 10 >= 8")
    res, reports = run_stream_index_ingest(spark, base, delta, q, k=5, n_files=3)
    assert len(reports) == 3 and all(r.n_delta > 0 for r in reports)

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in df.collect()
        )

    assert rows(res) == rows(ann_search(q, i, k=5)) and res.count() > 0


def test_stream_index_ingest_retrains_when_the_feed_drifts(spark):
    """Mid-stream staleness: a clustered base with an off-distribution
    (flat) feed must fire the shape trigger during ingestion and
    retrain over the union — the audit-trail event a production loop
    alerts on. The served result must still cover the drifted rows."""
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS
    from etl_covid19_brasil_spark.streaming.jobs import run_stream_index_ingest
    import etl_covid19_brasil_spark.llm.ann as ann_mod

    base, _, _ = _clustered(spark, 1500, 32, seed=91)
    delta, _, _ = _flat(spark, 400, 32, seed=92, id_start=1500)
    q = base.filter("vec_id % 20 = 0")
    # force the ivf route at training time so the handle carries trained
    # state the drifted feed can invalidate
    orig = ann_mod.prepare_ann_route

    def routed(df, *a, **kw):
        route = orig(df, *a, **kw)
        if route.tier == "exact":
            route = route._replace(
                tier="ivf",
                centroids=ann_mod.kmeans_lloyd(df, k=16, iters=3),
                n_est=MAX_INDEX_ROWS + 1,
                n_trained=MAX_INDEX_ROWS + 1,
            )
        return route

    import unittest.mock as mock

    with mock.patch.object(ann_mod, "prepare_ann_route", side_effect=routed):
        res, reports = run_stream_index_ingest(
            spark, base, delta, q, k=5, n_files=2
        )
    assert any(r.stale and r.reason == "shape" for r in reports), reports
    assert res.count() > 0


@pytest.mark.slow  # full-lane tier: Lloyd + two-frame truth at 8x-ish size
def test_append_then_search_holds_recall_floor_on_union(spark):
    """The 'done' condition: append -> ann_search over the UNION holds
    the routed ivf tier's recall floor (>= 0.9 on the clustered shape)
    for queries against a handle that never saw the delta at training
    time — in-distribution growth is served by trained-cell assignment
    alone."""
    from etl_covid19_brasil_spark.llm.ann import (
        TierRoute,
        ann_index_append,
        kmeans_lloyd,
    )
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    base, b_ids, b_vecs = _clustered(spark, 3200, 64, seed=71)
    delta, d_ids, d_vecs = _clustered(spark, 800, 64, seed=72, id_start=3200)
    q, i = base.filter("vec_id % 20 = 0"), base.filter("vec_id % 20 <> 0")
    cents = kmeans_lloyd(i, k=16, iters=3)
    route = TierRoute("ivf", 3040, 64, None, centroids=cents, n_trained=3040)
    new_route, union, report = ann_index_append(route, i, delta)
    assert not report.stale
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search(
            q, union, k=5, route=new_route, n_index=MAX_INDEX_ROWS + 1
        ).collect()
    }
    qm = b_ids % 20 == 0
    im = ~qm
    u_ids = np.concatenate([b_ids[im], d_ids])
    u_vecs = np.concatenate([b_vecs[im], d_vecs])
    truth = _truth(b_ids[qm], b_vecs[qm], u_ids, u_vecs, k=5)
    r = len(got & truth) / len(truth)
    print(f"post-append union recall: {r:.3f}")
    assert r >= 0.9, f"post-append recall collapsed: {r:.3f}"
    # delta rows are genuinely served: some appear among the neighbors
    assert any(nid >= 3200 for _, nid in got)


# ---------------------------------------------------------------------------
# Persistence: ann_index_save / ann_index_load (faiss write_index/read_index)


def test_index_save_load_roundtrip_is_byte_identical(spark, tmp_path):
    """A trained ivf handle must survive the parquet roundtrip with its
    trained state bit-exact — same tier/gate numbers, same probe
    signals, same float64 centroid bytes — and a query served through
    the LOADED handle must be byte-equal to one served through the
    original (float64 -> parquet DOUBLE is lossless, and everything
    downstream of the centroids is deterministic in them)."""
    from etl_covid19_brasil_spark.llm.ann import (
        ann_index_load,
        ann_index_save,
        prepare_ann_route,
    )
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    df, _, _ = _clustered(spark, 6000, 32, seed=21)
    route = prepare_ann_route(df)
    assert route.tier == "ivf" and route.centroids is not None

    ann_index_save(spark, route, str(tmp_path / "idx"))
    loaded = ann_index_load(spark, str(tmp_path / "idx"))

    assert (loaded.tier, loaded.n_est, loaded.dim, loaded.n_trained) == (
        route.tier,
        route.n_est,
        route.dim,
        route.n_trained,
    )
    assert loaded.probe == route.probe
    assert np.array_equal(loaded.centroids, route.centroids)

    q = df.filter("vec_id % 20 = 0")
    i = df.filter("vec_id % 20 <> 0")
    a = ann_search(q, i, k=5, route=route, n_index=MAX_INDEX_ROWS + 1)
    b = ann_search(q, i, k=5, route=loaded, n_index=MAX_INDEX_ROWS + 1)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) > 0


def test_index_save_load_exact_tier_handle(spark, tmp_path):
    """The exact tier's handle carries no trained state; the roundtrip
    must preserve that shape (no centroids, no probe) instead of
    inventing empty arrays."""
    from etl_covid19_brasil_spark.llm.ann import (
        ann_index_load,
        ann_index_save,
        prepare_ann_route,
    )

    df, _, _ = _clustered(spark, 800, 16, seed=22)
    route = prepare_ann_route(df)
    assert route.tier == "exact" and route.centroids is None

    ann_index_save(spark, route, str(tmp_path / "idx"))
    loaded = ann_index_load(spark, str(tmp_path / "idx"))
    assert loaded == route


def test_index_load_rejects_unknown_format(spark, tmp_path, monkeypatch):
    """A format-version bump must refuse to load instead of misreading
    the artifact — the reason the version is stamped at all."""
    import etl_covid19_brasil_spark.llm.ann as ann_mod

    df, _, _ = _clustered(spark, 800, 16, seed=23)
    route = ann_mod.prepare_ann_route(df)
    monkeypatch.setattr(ann_mod, "_INDEX_FORMAT_VERSION", 999)
    ann_mod.ann_index_save(spark, route, str(tmp_path / "idx"))
    monkeypatch.undo()
    with pytest.raises(ValueError, match="unsupported index format"):
        ann_mod.ann_index_load(spark, str(tmp_path / "idx"))


# ---------------------------------------------------------------------------
# Deletion: ann_index_delete (faiss remove_ids + the shrink trigger)


def test_delete_nonstale_keeps_trained_state(spark):
    """A small delete must not touch the trained state: same centroid
    bytes, n_est down by the tombstone count, the live frame exactly
    excludes the tombstoned ids, and absent ids are tolerated (they
    over-subtract the estimate — documented lower bound — but never
    error)."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import ann_index_delete, prepare_ann_route

    df, ids, _ = _clustered(spark, 6000, 32, seed=24)
    route = prepare_ann_route(df)
    assert route.tier == "ivf"

    dele = spark.range(0, 500).select(F.col("id").alias("vec_id"))
    r2, live, rep = ann_index_delete(route, df, dele)
    assert not rep.stale and rep.reason == "" and rep.n_tombstones == 500
    assert r2.n_est == route.n_est - 500
    assert r2.n_trained == route.n_trained
    assert np.array_equal(r2.centroids, route.centroids)
    live_ids = {r["vec_id"] for r in live.select("vec_id").collect()}
    assert live_ids == set(range(500, 6000))

    # ids not present in the base: no error, estimate still a lower bound
    ghost = spark.range(100_000, 100_010).select(F.col("id").alias("vec_id"))
    r3, live3, rep3 = ann_index_delete(route, df, ghost)
    assert rep3.n_tombstones == 10 and not rep3.stale
    assert live3.count() == 6000


def test_delete_shrink_trigger_retrains_on_live_size(spark):
    """Deleting past half the training size must fire the shrink
    trigger, and the retrained handle must be sized off the LIVE
    corpus, not the anti-joined plan's inherited base estimate (the
    n_rows honesty fix): 3000 live rows land under _EXACT_TIER_MAX, so
    the fresh route is the exact tier."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import ann_index_delete, prepare_ann_route

    df, _, _ = _clustered(spark, 10_000, 32, seed=25)
    route = prepare_ann_route(df)
    assert route.tier == "ivf"

    dele = spark.range(0, 7000).select(F.col("id").alias("vec_id"))
    r2, live, rep = ann_index_delete(route, df, dele)
    assert rep.stale and rep.reason == "shrink"
    assert r2.tier == "exact" and r2.n_trained == 3000

    # retrain=False: shrunk-but-stale handle, trained state untouched
    r3, _, rep3 = ann_index_delete(route, df, dele, retrain=False)
    assert rep3.stale and r3.tier == "ivf"
    assert np.array_equal(r3.centroids, route.centroids)
    assert r3.n_est == 3000


def test_delete_then_serve_matches_index_built_without_them(spark):
    """Tombstone-mask correctness: serving the live frame through the
    UNCHANGED handle returns exactly what an index that never contained
    the deleted rows returns (per-query top-k over the live set)."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import ann_index_delete, prepare_ann_route
    from etl_covid19_brasil_spark.llm.search import ann_search

    df, ids, vecs = _clustered(spark, 6000, 32, seed=26)
    route = prepare_ann_route(df)
    dele = spark.range(0, 1200).select(F.col("id").alias("vec_id"))
    r2, live, _rep = ann_index_delete(route, df, dele)

    q = df.filter("vec_id % 20 = 0")
    idx = live.filter("vec_id % 20 <> 0")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search(q, idx, k=5, route=r2).collect()
    }
    keep = ids % 20 != 0
    keep &= ids >= 1200
    qm = ids % 20 == 0
    want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=5)
    assert got == want and not any(n < 1200 for _, n in got)


def test_delete_anti_join_broadcasts_tombstones(spark):
    """The tombstone mask must be a BROADCAST anti-join — delete_ids is
    the small side by construction; a shuffled anti-join would re-hash
    the whole accumulated index per delete."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import ann_index_delete, prepare_ann_route

    df, _, _ = _clustered(spark, 6000, 32, seed=27)
    route = prepare_ann_route(df)
    dele = spark.range(0, 100).select(F.col("id").alias("vec_id"))
    _, live, _ = ann_index_delete(route, df, dele)
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ---------------------------------------------------------------------------
# Filtered retrieval: ann_search_filtered (the vector-DB IDSelector shape)


def test_filtered_search_is_exact_on_eligible_subset(spark):
    """PRE-filter semantics: the result is per-query top-k over exactly
    the eligible rows — equal to the brute-force reference on the
    filtered subset, with no ineligible neighbor ever emitted."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.search import ann_search_filtered

    df, ids, vecs = _clustered(spark, 3000, 32, seed=28)
    q = df.filter("vec_id % 20 = 0")
    i = df.filter("vec_id % 20 <> 0")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search_filtered(
            q, i, F.col("vec_id") % 3 == 0, k=5
        ).collect()
    }
    keep = (ids % 20 != 0) & (ids % 3 == 0)
    qm = ids % 20 == 0
    want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=5)
    assert got == want and not any(n % 3 for _, n in got)


def test_filtered_search_full_corpus_handle_holds_recall(spark):
    """ONE handle trained on the FULL corpus must keep serving filtered
    queries on the routed ivf tier — a subset of a clustered corpus
    keeps its geometry, so the trained cells stay valid and recall vs
    the filtered-exact reference holds the floor (the no-per-predicate-
    rebuild contract that makes filtered search cheap)."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import prepare_ann_route
    from etl_covid19_brasil_spark.llm.search import (
        MAX_INDEX_ROWS,
        ann_search_filtered,
    )

    df, ids, vecs = _clustered(spark, 6000, 32, seed=29)
    route = prepare_ann_route(df)
    assert route.tier == "ivf"
    q = df.filter("vec_id % 20 = 0")
    i = df.filter("vec_id % 20 <> 0")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search_filtered(
            q,
            i,
            F.col("vec_id") % 3 != 0,
            k=5,
            route=route,
            n_index=MAX_INDEX_ROWS + 1,  # force the routed tier
        ).collect()
    }
    assert not any(n % 3 == 0 for _, n in got)
    keep = (ids % 20 != 0) & (ids % 3 != 0)
    qm = ids % 20 == 0
    want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=5)
    recall = len(got & want) / len(want)
    assert recall >= 0.85, f"filtered ivf recall {recall:.3f} under floor"


def test_filtered_search_predicate_reaches_the_scan(spark, tmp_path):
    """The predicate must push into the parquet scan of the index side
    (Catalyst pushdown through the pre-filter) — the filtered-out rows
    are never read, which is the entire point of PRE-filtering at
    100 TB."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import TierRoute, kmeans_lloyd
    from etl_covid19_brasil_spark.llm.search import (
        MAX_INDEX_ROWS,
        ann_search_filtered,
    )

    df, _, _ = _clustered(spark, 3000, 32, seed=30)
    df.withColumn("label", (F.col("vec_id") % 4).cast("int")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "emb"))
    emb = spark.read.parquet(str(tmp_path / "emb"))
    q = emb.filter("vec_id % 20 = 0").drop("label")
    cents = kmeans_lloyd(emb, k=16, iters=1)
    route = TierRoute("ivf", 3000, 32, None, centroids=cents, n_trained=3000)
    res = ann_search_filtered(
        q,
        emb.filter("vec_id % 20 <> 0"),
        F.col("label") == 1,
        k=5,
        route=route,
        n_index=MAX_INDEX_ROWS + 1,
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(label,1)" in plan, plan


def test_filtered_search_cliff_engages_despite_lying_statistics(spark):
    """The selectivity cliff must be MEASURED, not estimated: an
    in-memory frame's post-filter statistics overshoot by orders of
    magnitude (measured 6750x on this shape), which would silently
    serve a few-hundred-row eligible set through the routed ivf tier.
    With a routed handle passed and NO n_index hint, a selective
    predicate must still land on the bounded exact tier — result
    set-equal to the filtered truth."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import prepare_ann_route
    from etl_covid19_brasil_spark.llm.search import ann_search_filtered

    df, ids, vecs = _clustered(spark, 6000, 32, seed=31)
    df = df.cache()
    try:
        df.count()
        route = prepare_ann_route(df)
        assert route.tier == "ivf"
        q = df.filter("vec_id % 20 = 0")
        i = df.filter("vec_id % 20 <> 0")
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_search_filtered(
                q, i, F.col("vec_id") % 50 == 1, k=5, route=route
            ).collect()
        }
        keep = (ids % 20 != 0) & (ids % 50 == 1)
        qm = ids % 20 == 0
        want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=5)
        assert got == want and len(got) > 0
    finally:
        df.unpersist()
