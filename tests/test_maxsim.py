"""rank_maxsim growth path (llm/maxsim.py, VERDICT r14 item 7): the
LSH token-bucket prefilter must (a) actually prune the candidate
stream, (b) hold a recall floor against the exact scan form it
approximates, and (c) engage only on the routed side of the size
dispatch. The scan form's bit-identity to the DuckDB oracle is the
driver's job (rank_maxsim_topk stays oracled)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.01"


def _toks(spark, sf=SF):
    from etl_covid19_brasil_spark.queries.llm import _tokens
    from etl_covid19_brasil_spark.registry import T

    return T(spark, sf, "documents").select(
        "doc_id", F.explode(_tokens()).alias("token")
    )


def test_maxsim_prefilter_recall_floor_vs_scan(spark):
    """Candidate generation is the ONLY approximation — scoring is
    shared — so recall of the prefiltered top-5 against the scan top-5
    is purely bucket-inclusion. Measured 1.0 at gate scale (3 tables x
    4 planes over 8-dim integer token vectors); pin a conservative
    floor so a broken plane tensor / collision join fails loudly."""
    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk

    toks = _toks(spark)
    scan = {
        (r["query_doc"], r["doc_id"])
        for r in maxsim_topk(toks, k=5, prefilter=False).collect()
    }
    pre = {
        (r["query_doc"], r["doc_id"])
        for r in maxsim_topk(toks, k=5, prefilter=True).collect()
    }
    r = len(pre & scan) / len(scan)
    print(f"maxsim prefilter recall vs scan: {r:.3f}")
    assert r >= 0.8, f"token-bucket prefilter recall collapsed: {r:.3f}"


def test_maxsim_prefilter_prunes_the_candidate_stream(spark):
    """The prefilter must generate STRICTLY fewer (query_doc, doc)
    pairs than the scan's implicit full cross (16 query docs x every
    other doc) — otherwise it is pure overhead. The 8x probe in
    SCALECHECK_r15 measures the reduction at scale; this pins the
    mechanism."""
    from etl_covid19_brasil_spark.llm.maxsim import (
        maxsim_candidates,
        token_vec,
    )
    from pyspark.sql import Window

    toks = (
        _toks(spark)
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("token"))
        )
        .filter("rn <= 8")
        .drop("rn")
    )
    comp = toks.withColumn("vec", token_vec(F.col("token")))
    qd = toks.select("doc_id").distinct().orderBy("doc_id").limit(16)
    qcomp = comp.join(qd, "doc_id").select(
        F.col("doc_id").alias("query_doc"),
        F.col("token").alias("q_token"),
        F.col("vec").alias("q_vec"),
    )
    n_docs = toks.select("doc_id").distinct().count()
    full = 16 * (n_docs - 1)
    cand = maxsim_candidates(comp, qcomp).count()
    print(f"maxsim candidates: {cand} of {full} full-cross pairs")
    assert 0 < cand < full


def test_maxsim_query_docs_follow_document_table_not_token_stream(spark):
    """Oracle-contract pin (ADVICE r15): the oracle draws its 16 query
    docs from the DOCUMENT table (`SELECT doc_id FROM documents ORDER BY
    doc_id LIMIT 16`); a doc with NULL/empty text among the first 16 ids
    yields no token rows, and drawing query docs from the exploded token
    stream would silently promote the 17th doc into the query set. With
    query_docs passed, the tokenless doc occupies its slot (producing no
    result rows, same as the oracle) and the 17th doc stays out."""
    import pandas as pd

    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk

    rows = []
    for d in range(24):
        if d == 3:  # NULL-text doc: present in documents, absent in toks
            continue
        for t in (f"alpha{d % 5}", f"beta{d % 7}", f"gamma{d}"):
            rows.append((d, t))
    toks = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "token"]))
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(24))})
    )
    got = maxsim_topk(toks, k=3, n_query_docs=16, prefilter=False, query_docs=docs)
    qset = {r["query_doc"] for r in got.select("query_doc").distinct().collect()}
    assert 16 not in qset, "17th doc promoted into the query set"
    assert 3 not in qset  # tokenless query doc scores nothing — like the oracle
    assert qset == set(range(16)) - {3}


def test_maxsim_routing_dispatches_on_token_volume(spark):
    """prefilter=None must route scan below MAXSIM_SCAN_MAX_TOKENS and
    prefilter above it (the est_tokens hint stands in for plan
    statistics). Since the r16 matmul-kernel scorer both forms share
    one scoring plan (the candidate set rides the Python broadcast as
    an allowed-set mask, not a join), so the route is pinned at the
    dispatch itself: maxsim_candidates runs ONLY on the prefilter
    route."""
    import etl_covid19_brasil_spark.llm.maxsim as maxsim_mod
    from etl_covid19_brasil_spark.llm.maxsim import (
        MAXSIM_SCAN_MAX_TOKENS,
        maxsim_topk,
    )

    toks = _toks(spark)
    calls = []
    orig = maxsim_mod.maxsim_candidates

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    maxsim_mod.maxsim_candidates = spy
    try:
        maxsim_topk(toks, k=5, est_tokens=1)
        assert not calls, "scan route still built the LSH prefilter"
        maxsim_topk(toks, k=5, est_tokens=MAXSIM_SCAN_MAX_TOKENS + 1)
        assert calls, "over-threshold route skipped the prefilter"
    finally:
        maxsim_mod.maxsim_candidates = orig
    # results at gate scale: prefiltered output is a valid top-k frame
    rows = maxsim_topk(toks, k=5, est_tokens=MAXSIM_SCAN_MAX_TOKENS + 1).limit(
        200
    ).collect()
    assert rows and set(rows[0].asDict()) == {"query_doc", "doc_id", "maxsim", "rank"}


def test_maxsim_preselected_tokens_match_default_path(spark):
    """r16 optimization: the registered queries select the first-8-
    distinct-tokens map-side (array_distinct + array_sort + slice on
    the token ARRAY, zero exchanges) and pass tokens_preselected=True;
    maxsim_topk's own aggregate-based selection stays the generic
    path. The two must be row-identical — the flag only skips a plan
    stage, never changes which tokens score."""
    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk
    from etl_covid19_brasil_spark.queries.llm import _tokens
    from etl_covid19_brasil_spark.registry import T

    d = T(spark, SF, "documents")
    generic = maxsim_topk(_toks(spark), k=5, prefilter=False, query_docs=d)
    pre = d.select(
        "doc_id",
        F.explode(
            F.slice(F.array_sort(F.array_distinct(_tokens())), 1, 8)
        ).alias("token"),
    )
    fast = maxsim_topk(
        pre, k=5, prefilter=False, query_docs=d, tokens_preselected=True
    )
    a = sorted(map(tuple, generic.collect()))
    b = sorted(map(tuple, fast.collect()))
    assert a == b


def test_preselected_token_overflow_raises(spark):
    """r17 (ADVICE r16): tokens_preselected trusts callers to cap each
    doc at max_doc_tokens tokens. A violating caller used to silently
    bleed the overflowing doc's slot maxes into the NEXT query doc's
    columns, corrupting both scores; the slot builder now rejects it
    loudly (the query frame is bounded, so the check is free)."""
    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk

    toks = spark.createDataFrame(
        [(1, f"tok{i}") for i in range(10)] + [(2, "tok0")],
        "doc_id long, token string",
    )
    with pytest.raises(ValueError, match="max_doc_tokens"):
        maxsim_topk(toks, k=1, prefilter=False, tokens_preselected=True)
