#!/usr/bin/env python
"""Job-count probes for the r17 driver-round-trip cuts:

- unigram_em_train (VERDICT r16 item 5): jobs per 3-iteration train;
- lsh_search / lsh_adc_search construction (item 7): eager jobs paid by
  a single-shot caller before the result plan even executes.

Counting uses job groups (setJobGroup is thread-local; everything here
is single-threaded) and the status tracker, so the number is the real
scheduler-visible job count, not a guess. Run from any tree:
    python scripts/job_count_probe.py [emtrain|lsh]
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_covid19_brasil_spark import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark(app_name="job_count_probe")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def _count_jobs(group: str, fn) -> int:
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("idle", "idle")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def probe_emtrain() -> dict:
    from etl_covid19_brasil_spark.llm.tokenizer import unigram_em_train

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out: dict = {}

    def run():
        fit = unigram_em_train(docs, n_iters=3, vocab_target=120)
        out["n_pieces"] = len(fit.pieces)
        out["ll"] = [round(x, 6) for x in fit.log_likelihood]

    out["jobs"] = _count_jobs("emtrain_probe", run)
    return out


def probe_lsh() -> dict:
    from etl_covid19_brasil_spark.llm.search import lsh_adc_search, lsh_search

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 8 == 0)
    index = emb.filter(F.col("vec_id") % 8 != 0)
    out: dict = {}
    # construction jobs only: building the DataFrame runs the eager
    # count/sample/derive jobs; the plan itself is not executed here
    out["lsh_search_jobs"] = _count_jobs(
        "lsh_probe", lambda: lsh_search(queries, index, k=5)
    )
    out["lsh_adc_search_jobs"] = _count_jobs(
        "lsh_adc_probe", lambda: lsh_adc_search(queries, index, k=5)
    )
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res: dict = {"sf": SF}
    if which in ("emtrain", "all"):
        res["emtrain"] = probe_emtrain()
    if which in ("lsh", "all"):
        res["lsh"] = probe_lsh()
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
