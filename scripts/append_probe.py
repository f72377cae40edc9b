#!/usr/bin/env python
"""r16 probe (VERDICT r15 item 1) — index lifecycle economics, one
quiet-box run, one JSON line, consumed by SCALECHECK_r16:

On the 8x-scale clustered corpus (16,000 vectors, dim 64 — the
ivf-routed shape prepare_ann_route trains on):

1. build cost: prepare_ann_route on the base (routing jobs + Lloyd);
2. append cost: ann_index_append of a 20% in-distribution delta —
   the non-stale path (delta.count() + the bounded delta shape sample);
3. rebuild cost: prepare_ann_route over the union — what every append
   would pay without the staleness contract;
4. served quality: ann_search recall over the union through the
   APPENDED handle vs the exact two-frame reference (the trained cells
   never saw the delta);
5. trigger check: an off-distribution (flat) delta of the same size
   must fire the shape trigger.

Timing protocol: construction timed around the builder call (the
lifecycle calls are eager by contract); recalls read out untimed.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from etl_covid19_brasil_spark import get_spark  # noqa: E402


def _unit(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _clustered(spark, n, dim, seed, id_start=0, anchor_seed=99):
    anchors = _unit(np.random.default_rng(anchor_seed).normal(size=(8, dim)))
    rng = np.random.default_rng(seed)
    vecs = _unit(
        anchors[np.arange(n) % 8] + 0.08 * rng.normal(size=(n, dim))
    ).astype(np.float64)
    ids = np.arange(id_start, id_start + n, dtype=np.int64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    )
    return df, ids, vecs


def main() -> None:
    from etl_covid19_brasil_spark.llm.ann import (
        ann_index_append,
        prepare_ann_route,
    )
    from etl_covid19_brasil_spark.llm.search import MAX_INDEX_ROWS, ann_search

    spark = get_spark(app_name="append-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    n_base, n_delta, dim = 16000, 3200, 64
    base, b_ids, b_vecs = _clustered(spark, n_base, dim, seed=11)
    delta, d_ids, d_vecs = _clustered(
        spark, n_delta, dim, seed=12, id_start=n_base
    )
    base = base.cache()
    delta = delta.cache()
    base.count(), delta.count()

    t0 = time.perf_counter()
    route = prepare_ann_route(base)
    sec_build = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    new_route, union, report = ann_index_append(route, base, delta)
    sec_append = round(time.perf_counter() - t0, 3)

    union = union.cache()
    union.count()
    t0 = time.perf_counter()
    rebuilt = prepare_ann_route(union)
    sec_rebuild = round(time.perf_counter() - t0, 3)

    out["lifecycle_8x"] = {
        "n_base": n_base,
        "n_delta": n_delta,
        "tier": route.tier,
        "build_sec": sec_build,
        "append_sec": sec_append,
        "rebuild_sec": sec_rebuild,
        "append_over_rebuild": round(sec_append / max(sec_rebuild, 1e-9), 4),
        "append_stale": report.stale,
        "delta_tight_cos": round(report.delta_tight_cos, 4),
        "rebuilt_tier": rebuilt.tier,
    }
    print(f"# lifecycle_8x: {out['lifecycle_8x']}", file=sys.stderr)

    # ---- served quality through the appended handle --------------------
    q_pdf = pd.DataFrame(
        {
            "vec_id": np.arange(100000, 100800, dtype=np.int64),
            "embedding": list(
                _unit(
                    _unit(np.random.default_rng(99).normal(size=(8, dim)))[
                        np.arange(800) % 8
                    ]
                    + 0.08 * np.random.default_rng(13).normal(size=(800, dim))
                ).astype(np.float64)
            ),
        }
    )
    q = spark.createDataFrame(q_pdf)
    got = {
        (int(r.query_id), int(r.neighbor_id))
        for r in ann_search(
            q, union, k=5, route=new_route, n_index=MAX_INDEX_ROWS + 1
        )
        .toPandas()
        .itertuples()
    }
    q_ids = q_pdf["vec_id"].to_numpy()
    q_mat = np.stack(q_pdf["embedding"].to_numpy())
    u_ids = np.concatenate([b_ids, d_ids])
    u_mat = np.concatenate([b_vecs, d_vecs])
    sims = _unit(q_mat) @ _unit(u_mat).T
    truth = set()
    for r, qid in enumerate(q_ids):
        order = np.lexsort((u_ids, -sims[r]))[:5]
        truth.update((int(qid), int(u_ids[j])) for j in order)
    out["served_union"] = {
        "recall_vs_exact": round(len(got & truth) / len(truth), 4),
        "delta_rows_served": sum(1 for _, nid in got if nid >= n_base),
    }
    print(f"# served_union: {out['served_union']}", file=sys.stderr)

    # ---- shape trigger on an off-distribution delta ---------------------
    flat = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(50000, 50000 + n_delta, dtype=np.int64),
                "embedding": list(
                    _unit(
                        np.random.default_rng(7).normal(size=(n_delta, dim))
                    ).astype(np.float64)
                ),
            }
        )
    )
    t0 = time.perf_counter()
    _, _, drift = ann_index_append(route, base, flat, retrain=False)
    sec_drift = round(time.perf_counter() - t0, 3)
    out["drift_trigger"] = {
        "stale": drift.stale,
        "reason": drift.reason,
        "delta_tight_cos": round(drift.delta_tight_cos, 4),
        "check_sec": sec_drift,
    }
    print(f"# drift_trigger: {out['drift_trigger']}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
