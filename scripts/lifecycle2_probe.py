#!/usr/bin/env python
"""r16 probe — the lifecycle's second half (persist / delete / filtered
retrieval), one quiet-box run, one JSON line, consumed by
SCALECHECK_r16:

On the 8x-scale clustered corpus (16,000 vectors, dim 64 — the
ivf-routed shape):

1. persistence economics: ann_index_save / ann_index_load wall-clock
   and artifact bytes vs the build cost the artifact amortizes —
   write_index is only worth shipping if save+load is a rounding error
   against retraining on the consumer side — plus trained-state
   byte-identity through the roundtrip;
2. delete economics: ann_index_delete of a 10% tombstone batch (the
   non-stale path: one distinct count on the tombstone side) vs the
   rebuild a naive delete would pay, and served recall over the live
   frame through the UNCHANGED handle vs the exact reference;
3. filtered retrieval: ONE full-corpus handle serving three predicate
   selectivities on the forced ivf route — recall vs the
   filtered-exact reference at each (a subset of a clustered corpus
   keeps its geometry, so one handle must hold the floor across
   predicates), and the selectivity cliff (eligible set under the
   bounded gate) read out as exact set-equality.

Timing protocol: construction timed around the eager builder calls;
recalls read out untimed.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from etl_covid19_brasil_spark import get_spark  # noqa: E402


def _unit(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _clustered(spark, n, dim, seed, anchor_seed=99):
    anchors = _unit(np.random.default_rng(anchor_seed).normal(size=(8, dim)))
    rng = np.random.default_rng(seed)
    vecs = _unit(
        anchors[np.arange(n) % 8] + 0.08 * rng.normal(size=(n, dim))
    ).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    )
    return df, ids, vecs


def _truth(q_ids, q_mat, i_ids, i_mat, k=5):
    sims = _unit(q_mat) @ _unit(i_mat).T
    sims[q_ids[:, None] == i_ids[None, :]] = -np.inf
    out = set()
    for r, qid in enumerate(q_ids):
        order = np.lexsort((i_ids, -sims[r]))[:k]
        out.update((int(qid), int(i_ids[j])) for j in order if sims[r, j] > -np.inf)
    return out


def main() -> None:
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.llm.ann import (
        ann_index_delete,
        ann_index_load,
        ann_index_save,
        prepare_ann_route,
    )
    from etl_covid19_brasil_spark.llm.search import (
        MAX_INDEX_ROWS,
        ann_search,
        ann_search_filtered,
    )

    spark = get_spark(app_name="lifecycle2-probe", shuffle_partitions=32)
    n, dim, k = 16_000, 64, 5
    df, ids, vecs = _clustered(spark, n, dim, seed=5)
    df = df.cache()
    df.count()
    q = df.filter("vec_id % 20 = 0")
    i = df.filter("vec_id % 20 <> 0")
    qm = ids % 20 == 0
    im = ids % 20 != 0

    out: dict = {"n": n, "dim": dim}

    # 1. persistence
    t0 = time.perf_counter()
    route = prepare_ann_route(df)
    build_sec = time.perf_counter() - t0
    d = tempfile.mkdtemp(prefix="lifecycle2_idx_")
    t0 = time.perf_counter()
    ann_index_save(spark, route, d)
    save_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    loaded = ann_index_load(spark, d)
    load_sec = time.perf_counter() - t0
    artifact_bytes = sum(p.stat().st_size for p in Path(d).rglob("*") if p.is_file())
    out["persist_8x"] = {
        "tier": route.tier,
        "build_sec": round(build_sec, 3),
        "save_sec": round(save_sec, 3),
        "load_sec": round(load_sec, 3),
        "roundtrip_over_build": round((save_sec + load_sec) / build_sec, 4),
        "artifact_bytes": artifact_bytes,
        "corpus_vector_bytes": n * dim * 8,
        "state_byte_identical": bool(
            route.tier == loaded.tier
            and route.probe == loaded.probe
            and np.array_equal(route.centroids, loaded.centroids)
        ),
    }

    # 2. delete economics + served recall through the unchanged handle
    tomb = df.filter("vec_id % 10 = 7").select("vec_id")
    t0 = time.perf_counter()
    r2, live, rep = ann_index_delete(route, df, tomb)
    delete_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    rebuilt = prepare_ann_route(live, n_rows=live.count())
    rebuild_sec = time.perf_counter() - t0
    live_i = live.filter("vec_id % 20 <> 0")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search(
            q, live_i, k=k, route=r2, n_index=MAX_INDEX_ROWS + 1
        ).collect()
    }
    keep = im & (ids % 10 != 7)
    want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=k)
    out["delete_8x"] = {
        "n_tombstones": rep.n_tombstones,
        "stale": rep.stale,
        "delete_sec": round(delete_sec, 3),
        "rebuild_sec": round(rebuild_sec, 3),
        "delete_over_rebuild": round(delete_sec / rebuild_sec, 4),
        "recall_vs_exact_live": round(len(got & want) / len(want), 4),
        "tombstoned_served": sum(1 for _, nb in got if nb % 10 == 7),
    }

    # 3. filtered retrieval through ONE full-corpus handle
    filt = {}
    for name, pred, keep_mask in [
        ("sel_0.75", "vec_id % 4 <> 0", ids % 4 != 0),
        ("sel_0.25", "vec_id % 4 = 0", ids % 4 == 0),
    ]:
        t0 = time.perf_counter()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_search_filtered(
                q, i, pred, k=k, route=route, n_index=MAX_INDEX_ROWS + 1
            ).collect()
        }
        wall = time.perf_counter() - t0
        keep = im & keep_mask
        want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=k)
        filt[name] = {
            "wall_sec": round(wall, 3),
            "recall_vs_filtered_exact": round(len(got & want) / len(want), 4),
            "ineligible_served": sum(
                1 for _, nb in got if not keep_mask[nb]
            ),
        }
    # the cliff: eligible set bounded -> exact set equality (no hints:
    # the re-measured filtered frame takes the bounded tier)
    t0 = time.perf_counter()
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_search_filtered(
            q, i, "vec_id % 50 = 1", k=k, route=route
        ).collect()
    }
    wall = time.perf_counter() - t0
    keep = im & (ids % 50 == 1)
    want = _truth(ids[qm], vecs[qm], ids[keep], vecs[keep], k=k)
    filt["sel_0.02_cliff"] = {
        "wall_sec": round(wall, 3),
        "exact_equal": bool(got == want),
    }
    out["filtered_8x"] = filt

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
