#!/usr/bin/env python
"""r15 probes (VERDICT r14 items 1, 5, 7) — one quiet-box run, one JSON
line, consumed by SCALECHECK_r15:

1. ann_search tier timings at the 8x split (vec_id % 20 — 1/20 query
   batch vs 19/20 frozen index, the registered discipline): bounded
   broadcast-index tier (the reference), forced broadcast-query scan,
   forced cogrouped BNL — all exact, result-equality asserted; plus the
   forced two-frame IVF tier (trained 16-cell handle) with sampled
   recall vs the exact reference.
2. prepare_ann_route amortization: construction (route + Lloyd) timed
   once, then ann_topk_auto with the handle vs without, on an
   8-anchor clustered corpus (the ivf-routed shape) — the index-build /
   index-use split's measured payoff.
3. rank_maxsim prefilter at 8x documents: candidate-stream size and
   wall-clock, scan vs prefiltered, plus recall of the prefiltered
   top-5 against the scan top-5.

Timing protocol: noop-write materialization, construction separated
from execution where the item measures amortization; recalls read out
untimed.
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from etl_covid19_brasil_spark import get_spark  # noqa: E402
from etl_covid19_brasil_spark.io import load_table  # noqa: E402
from scripts.scale_check import build_scaled_dir  # noqa: E402


def _noop_time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _pairs(df) -> set:
    return {(int(r.query_id), int(r.neighbor_id)) for r in df.toPandas().itertuples()}


def main() -> None:
    from etl_covid19_brasil_spark.llm.ann import (
        TierRoute,
        ann_topk_auto,
        kmeans_lloyd,
        prepare_ann_route,
    )
    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    # replica factor: 8 (the r15 artifact) by default; r16 extends the
    # two-frame tier measurements to 32x/64x (VERDICT r15 item 6)
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    spark = get_spark(app_name="ann-search-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": replicas}

    # ---- 1. ann_search tiers at the Nx split --------------------------
    path = build_scaled_dir(spark, replicas)
    emb = load_table(spark, path, "embeddings").cache()
    n = emb.count()
    q = emb.filter(F.col("vec_id") % 20 == 0)
    i = emb.filter(F.col("vec_id") % 20 != 0)
    nq, ni = q.count(), i.count()
    out["split"] = {"n": n, "n_queries": nq, "n_index": ni}

    bounded = ann_search(q, i, k=5, n_index=ni)
    sec_bounded = _noop_time(bounded)
    ref = _pairs(bounded)

    flat_route = TierRoute("lsh", MAX_INDEX_ROWS + 1, 0, None)
    scan = ann_search(q, i, k=5, route=flat_route, n_index=MAX_INDEX_ROWS + 1)
    sec_scan = _noop_time(scan)
    scan_eq = _pairs(scan) == ref

    from etl_covid19_brasil_spark.llm.search import QUERY_BROADCAST_MAX

    # the registered ann_search_bnl config: one query salt, two index
    # tiles (n_queries just over the broadcast bound — a 10**9 hint
    # would derive 10,000 salts and replicate the index 10,000x)
    bnl = ann_search(
        q,
        i,
        k=5,
        route=flat_route,
        n_index=MAX_INDEX_ROWS + 1,
        n_queries=QUERY_BROADCAST_MAX + 1,
    )
    sec_bnl = _noop_time(bnl)
    bnl_eq = _pairs(bnl) == ref

    t0 = time.perf_counter()
    cents = kmeans_lloyd(i, k=16, iters=3)
    sec_lloyd = round(time.perf_counter() - t0, 3)
    ivf_route = TierRoute("ivf", MAX_INDEX_ROWS + 1, 0, None, centroids=cents)
    ivf = ann_search(q, i, k=5, route=ivf_route, n_index=MAX_INDEX_ROWS + 1)
    sec_ivf = _noop_time(ivf)
    ivf_recall = round(len(_pairs(ivf) & ref) / len(ref), 4)

    out[f"tiers_{replicas}x"] = {
        "bounded_sec": sec_bounded,
        "scan_sec": sec_scan,
        "scan_equal": scan_eq,
        "bnl_sec": sec_bnl,
        "bnl_equal": bnl_eq,
        "ivf_lloyd_sec": sec_lloyd,
        "ivf_sec": sec_ivf,
        "ivf_recall_vs_exact": ivf_recall,
    }
    print(f"# tiers_{replicas}x: {out[f'tiers_{replicas}x']}", file=sys.stderr)
    emb.unpersist()

    if replicas != 8:
        # 32x/64x runs measure the two-frame tier scaling only; the
        # amortization and maxsim sections are 8x-pinned r15 artifacts
        shutil.rmtree(path, ignore_errors=True)
        print(json.dumps(out))
        return

    # ---- 2. handle amortization on the ivf-routed clustered shape -----
    rng = np.random.default_rng(51)
    cn, dim = 16000, 64
    anchors = rng.normal(size=(8, dim))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    vecs = anchors[np.arange(cn) % 8] + 0.08 * rng.normal(size=(cn, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(cn, dtype=np.int64), "embedding": list(vecs)})
    ).cache()
    cdf.count()
    t0 = time.perf_counter()
    route = prepare_ann_route(cdf)
    sec_prepare = round(time.perf_counter() - t0, 3)
    sec_with = _noop_time(ann_topk_auto(cdf, k=5, route=route))
    sec_with2 = _noop_time(ann_topk_auto(cdf, k=5, route=route))
    # the no-handle arm pays routing + Lloyd at CONSTRUCTION time (the
    # eager dispatcher jobs), so the timer must wrap the builder call,
    # not just the materialization
    t0 = time.perf_counter()
    _noop_time(ann_topk_auto(cdf, k=5))
    sec_without = round(time.perf_counter() - t0, 3)
    out["handle_amortization"] = {
        "tier": route.tier,
        "prepare_sec": sec_prepare,
        "call_with_handle_sec": min(sec_with, sec_with2),
        "call_without_handle_sec": sec_without,
    }
    print(f"# handle: {out['handle_amortization']}", file=sys.stderr)
    cdf.unpersist()

    # ---- 3. maxsim prefilter at 8x documents --------------------------
    docs = load_table(spark, path, "documents")
    toks = docs.select("doc_id", F.explode(
        F.split(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " ")), " +")
    ).alias("token")).cache()
    n_tok = toks.count()
    n_docs = docs.count()
    scan_df = maxsim_topk(toks, k=5, prefilter=False)
    sec_mscan = _noop_time(scan_df)
    scan_top = {
        (int(r.query_doc), int(r.doc_id)) for r in scan_df.toPandas().itertuples()
    }
    pre_df = maxsim_topk(toks, k=5, prefilter=True)
    sec_mpre = _noop_time(pre_df)
    pre_top = {
        (int(r.query_doc), int(r.doc_id)) for r in pre_df.toPandas().itertuples()
    }
    out["maxsim_8x"] = {
        "n_docs": n_docs,
        "n_tokens": n_tok,
        "full_cross_pairs": 16 * (n_docs - 1),
        "candidate_pairs_structural": 16 * 64,
        "scan_sec": sec_mscan,
        "prefiltered_sec": sec_mpre,
        "recall_vs_scan": round(len(pre_top & scan_top) / len(scan_top), 4),
    }
    print(f"# maxsim_8x: {out['maxsim_8x']}", file=sys.stderr)
    toks.unpersist()

    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
