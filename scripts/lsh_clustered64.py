#!/usr/bin/env python
"""r13 follow-up (VERDICT r12 item 5): time ann_lsh_topk's default
config at 64x on the CLUSTERED corpus shape.

The r12 64x-clustered menu measured LSH at recall 1.000 / 466 s —
3.7x IVF-flat's 126 s at the identical corpus — because auto_n_tables
is angle-blind: it spends the full cluster-free table budget (T=15 at
the 64x-derived P=9) on a corpus whose neighbors collide at
near-certainty per table. derive_n_tables (r13) measures the needed
count on the shared shape sample; this probe records the derived
count, the wall-clock, and the sampled recall so the payoff is a
number, not an argument.

Timing protocol: noop-write (the scale_check/bench pattern); recall
read out UNTIMED afterwards on the clustered64_controls sampled-truth
estimator (+-3% CI at 256 queries).

Usage: python scripts/lsh_clustered64.py [--replicas 64]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_brasil_spark import get_spark  # noqa: E402
from etl_covid19_brasil_spark.io import load_table  # noqa: E402
from scripts.scale_check import (  # noqa: E402
    build_clustered_embeddings,
    sampled_recall_truth,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    args = ap.parse_args()

    import math

    from etl_covid19_brasil_spark.llm.ann import (
        _TARGET_BUCKET_ROWS,
        _sample_matrix,
        auto_n_tables,
        derive_n_tables,
        lsh_topk,
    )

    spark = get_spark(app_name="lsh-clustered64")
    spark.sparkContext.setLogLevel("ERROR")
    path = build_clustered_embeddings(spark, args.replicas)
    emb = load_table(spark, path, "embeddings").cache()
    n = emb.count()

    # record the route the operator will take (same derivation inputs)
    n_planes = max(4, math.ceil(math.log2(max(2, n / _TARGET_BUCKET_ROWS))))
    route = derive_n_tables(
        _sample_matrix(emb, "vec_id", "embedding"), n_planes, 64
    )
    out = {
        "replicas": args.replicas,
        "n": n,
        "n_planes": n_planes,
        "n_tables_cap": auto_n_tables(n_planes),
        "n_tables_derived": route.n_tables,
        "sampled_inclusion": round(route.sampled_inclusion, 4),
    }

    truth, sample_qids, _ = sampled_recall_truth(emb, n)
    t0 = time.perf_counter()
    res = lsh_topk(emb, k=5)
    res.write.format("noop").mode("overwrite").save()
    out["lsh_sec"] = round(time.perf_counter() - t0, 3)
    got = {
        (int(r.query_id), int(r.neighbor_id))
        for r in res.toPandas().itertuples()
        if int(r.query_id) in sample_qids
    }
    out["lsh_recall_sampled"] = round(len(got & truth) / len(truth), 4)

    emb.unpersist()
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
