#!/usr/bin/env python
"""One-off r12 probe: IVF-PQ at 64x on the CLUSTERED corpus shape.

The r12 64x refresh measured the flat-corpus default at 286.8x
(fraction-held probes — the disclosed quadratic regime on the one
corpus shape where no sublinear scheme holds recall). This probe runs
the SAME query at the SAME 64x row count on the clustered shape, where
the shape dispatch routes fixed probes + residual codes: the wall-clock
gap between the two rows is the measured payoff of the r12 dispatch.

Recall at 64x is spot-checked on a deterministic 256-query sample:
full brute-force truth at 128k vectors is O(n^2) and pointless when
the sampled estimator has +-3% CI at this k; the truth for the sample
is computed driver-side against the full corpus (128k x 64 doubles =
65 MB — bounded).

Usage: python scripts/clustered64_probe.py [--replicas 64]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from etl_covid19_brasil_spark import get_spark  # noqa: E402
from etl_covid19_brasil_spark.io import load_table  # noqa: E402
from scripts.scale_check import build_clustered_embeddings  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    args = ap.parse_args()

    from etl_covid19_brasil_spark.llm.ann import (
        auto_n_cells,
        ivfpq_topk,
        pick_probe_strategy,
    )
    from etl_covid19_brasil_spark.llm.similarity import _normalize

    spark = get_spark(app_name="clustered64-probe")
    out: dict = {"replicas": args.replicas, "shape": "clustered"}

    from scripts.scale_check import sampled_recall_truth

    for tier, replicas in (("t_base", 1), ("t_big", args.replicas)):
        path = build_clustered_embeddings(spark, replicas)
        emb = load_table(spark, path, "embeddings").cache()
        n = emb.count()
        n_cells = auto_n_cells(n)
        # timing matches the scale_check/bench protocol (noop write, no
        # driver collect in the timed region — the result transfer is
        # O(n) and would pollute the ratio); recall is read from an
        # UNTIMED second materialization below
        t0 = time.perf_counter()
        res = ivfpq_topk(emb, k=5, n_cells=n_cells)
        res.write.format("noop").mode("overwrite").save()
        out[tier] = round(time.perf_counter() - t0, 3)
        out[f"{tier}_n"] = n
        out[f"{tier}_n_cells"] = n_cells

        if tier == "t_big":
            # record the route the shipped default actually took (the
            # trained centroids ivfpq_topk derives internally are not
            # returned; re-derive the routing signals on untrained
            # first-n_cells centroids, the ivf_topk default convention)
            cent = (
                emb.select("vec_id", "embedding")
                .orderBy("vec_id")
                .limit(n_cells)
                .toPandas()
            )
            routed = pick_probe_strategy(
                emb, _normalize(np.stack(cent["embedding"].to_numpy()))
            )
            out["dispatch_route"] = routed.route
            out["dispatch_n_probe"] = routed.n_probe
            truth, sample_qids, n_sampled = sampled_recall_truth(emb, n)
            pdf = res.toPandas()  # untimed — recall readout only
            got = {
                (int(r.query_id), int(r.neighbor_id))
                for r in pdf.itertuples()
                if int(r.query_id) in sample_qids
            }
            out["recall_at5_sampled"] = round(len(got & truth) / len(truth), 4)
            out["recall_sample_queries"] = n_sampled
        emb.unpersist()
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    out["ratio"] = round(out["t_big"] / out["t_base"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
