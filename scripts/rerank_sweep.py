#!/usr/bin/env python
"""r13 calibration sweep: recall@5 and wall-clock of ivfpq_topk as a
function of the GLOBAL rerank-pool width, on both 8x corpus shapes.

Context: r13 replaced the per-cell rerank pools (exact join touched
n_q x n_probe x rerank x k rows — 410M at rerank=64/64x, failed the
r12 rig) with one global per-query WindowGroupLimit pool of
rerank * k candidates (cross-cell ADC term restored, see
llm/ann.py:ivfpq_topk). That changes what a given ``rerank`` buys:
the old union's EFFECTIVE width was n_probe * rerank * k, so the
shipped defaults must be re-derived against measured curves — this
script produces them (SCALECHECK_r13).

Usage: python scripts/rerank_sweep.py [--replicas 8]
       [--shapes flat,clustered] [--reranks 4,16,40,80,160]
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
    build_scaled_dir,
    sampled_recall_truth,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--shapes", default="flat,clustered")
    ap.add_argument("--reranks", default="4,16,40,80,160")
    args = ap.parse_args()
    reranks = [int(r) for r in args.reranks.split(",")]

    from etl_covid19_brasil_spark.llm.ann import (
        auto_n_cells,
        auto_n_probe,
        ivfpq_topk,
    )

    spark = get_spark(
        app_name="rerank-sweep",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": args.replicas, "reranks": reranks}
    for shape in args.shapes.split(","):
        path = (
            build_clustered_embeddings(spark, args.replicas)
            if shape == "clustered"
            else build_scaled_dir(spark, args.replicas)
        )
        emb = load_table(spark, path, "embeddings").cache()
        n = emb.count()
        n_cells = auto_n_cells(n)
        truth, sample_qids, _ = sampled_recall_truth(emb, n)
        # the knobs each shape's dispatch would route (measured r12):
        # flat -> fraction-held probes + raw codes; clustered -> fixed
        # 10 + residual codes. Passed explicitly so each sweep point is
        # exactly one pool-width change.
        if shape == "clustered":
            kw = dict(n_cells=n_cells, n_probe=10, by_residual=True)
        else:
            kw = dict(
                n_cells=n_cells,
                n_probe=min(auto_n_probe(n_cells), n_cells),
                by_residual=False,
            )
        shape_out: dict = {"n": n, "n_cells": n_cells, "n_probe": kw["n_probe"]}
        for rr in reranks:
            t0 = time.perf_counter()
            try:
                res = ivfpq_topk(emb, k=5, rerank=rr, **kw)
                pdf = res.toPandas()
            except Exception as exc:  # noqa: BLE001 — record and continue
                shape_out[f"rerank{rr}"] = {
                    "sec": round(time.perf_counter() - t0, 2),
                    "error": str(exc).splitlines()[0][:160],
                }
                continue
            sec = time.perf_counter() - t0
            got = {
                (int(r.query_id), int(r.neighbor_id))
                for r in pdf.itertuples()
                if int(r.query_id) in sample_qids
            }
            shape_out[f"rerank{rr}"] = {
                "sec": round(sec, 2),
                "recall": round(len(got & truth) / len(truth), 4),
            }
            print(f"# {shape} rerank={rr}: {shape_out[f'rerank{rr}']}", file=sys.stderr)
        out[shape] = shape_out
        emb.unpersist()
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
