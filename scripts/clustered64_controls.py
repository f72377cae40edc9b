#!/usr/bin/env python
"""r12 follow-up: the two control rows for the clustered-64x IVF-PQ
probe (scripts/clustered64_probe.py measured sampled recall 0.624 at
the shipped default rerank=16).

- IVF-flat at the SAME fixed 10 probes: if recall holds ~1.0, the
  decay is PQ quantization distortion among 16k-vector near-tie
  clusters, not a probe-routing defect.
- IVF-PQ rerank=64: the documented recovery knob (8x stepwise table:
  0.55/0.86/1.00 at rerank 4/16/64) re-measured at 64x density.

Usage: python scripts/clustered64_controls.py [--replicas 64]
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
from scripts.scale_check import build_clustered_embeddings  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    args = ap.parse_args()

    from etl_covid19_brasil_spark.llm.ann import auto_n_cells, ivf_topk, ivfpq_topk
    # maxResultSize raised for the stress rig only: at 64x the ivf_flat
    # job's RESULT-stage accounting charges ~98 MiB per task (32 tasks,
    # ~3.1 GiB total) against spark.driver.maxResultSize even though the
    # final filtered result is ~640k rows / ~20 MB — see the probe notes
    # in SCALECHECK_r12. Gate/bench-scale runs keep the 1g default.
    spark = get_spark(
        app_name="clustered64-controls",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    path = build_clustered_embeddings(spark, args.replicas)
    emb = load_table(spark, path, "embeddings").cache()
    n = emb.count()
    n_cells = auto_n_cells(n)

    from scripts.scale_check import sampled_recall_truth

    truth, sample_qids, _ = sampled_recall_truth(emb, n)

    out: dict = {"replicas": args.replicas, "n": n, "n_cells": n_cells}
    for label, fn in (
        ("ivf_flat_fixed10", lambda: ivf_topk(emb, k=5, n_cells=n_cells, n_probe=10)),
        (
            # r13 semantics: rerank is the GLOBAL pool width (pool 320
            # across all probed cells; the r12 per-cell scheme this rig
            # failed on joined 410M rows at the same nominal rerank)
            "ivfpq_rerank64",
            lambda: ivfpq_topk(
                emb, k=5, n_cells=n_cells, n_probe=10, by_residual=True, rerank=64
            ),
        ),
        (
            # shipped default: the r13 tight-cell dispatch must tier-
            # route this to exact in-cell scoring (VERDICT r12 item 2 —
            # done = >= 0.8 here, vs 0.608 for the r12 PQ default)
            "ivfpq_default",
            lambda: ivfpq_topk(emb, k=5, n_cells=n_cells),
        ),
    ):
        # one control failing (this is a memory-pressure stress rig)
        # must not lose the other's row
        print(f"# running {label}", file=sys.stderr)
        # noop-write timing (the scale_check/bench protocol); the recall
        # readout collects UNTIMED afterwards
        t0 = time.perf_counter()
        try:
            res = fn()
            res.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — record and continue
            out[f"{label}_sec"] = round(time.perf_counter() - t0, 3)
            out[f"{label}_error"] = str(exc).splitlines()[0][:200]
            print(f"# {label} FAILED after {out[f'{label}_sec']}s", file=sys.stderr)
            continue
        out[f"{label}_sec"] = round(time.perf_counter() - t0, 3)
        pdf = res.toPandas()
        got = {
            (int(r.query_id), int(r.neighbor_id))
            for r in pdf.itertuples()
            if int(r.query_id) in sample_qids
        }
        out[f"{label}_recall_sampled"] = round(len(got & truth) / len(truth), 4)
        print(f"# {label}: {json.dumps(out)}", file=sys.stderr)

    emb.unpersist()
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
