#!/usr/bin/env python
"""VERDICT r16 item 8: measure `_maxsim_score`'s n_qdocs x 8-column
merge aggregate at n_query_docs in {16, 64, 256} (guide §5 wide-row
hazard). The registered queries run at 16; this probes whether the
wide max() merge degrades super-linearly as the query set grows, which
would justify a map/struct merge form. Measurement only — the scoring
form changes only if a probed alternative wins AND stays oracle-green
at 16.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_covid19_brasil_spark import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

spark = get_spark(app_name="maxsim_qdocs_probe")
spark.sparkContext.setLogLevel("ERROR")


def build(n_qdocs: int):
    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk

    tokens = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " ")), " +"
    )
    d = spark.read.parquet(f"{SF}/documents.parquet")
    toks = d.select(
        "doc_id",
        F.explode(F.slice(F.array_sort(F.array_distinct(tokens)), 1, 8)).alias(
            "token"
        ),
    )
    return maxsim_topk(
        toks,
        k=5,
        n_query_docs=n_qdocs,
        prefilter=False,
        query_docs=d,
        tokens_preselected=True,
    )


def block(n_qdocs: int, n: int) -> list[float]:
    out = []
    for _ in range(n):
        spark.sparkContext._jvm.System.gc()
        spark.catalog.clearCache()
        df = build(n_qdocs)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(time.perf_counter() - t0)
    return out


def main() -> None:
    # 256 runs ONCE, not min-of-N x 2 orders: the first probe attempt
    # showed a single 256-qdoc rep takes minutes (the cliff itself) —
    # repeating it adds wall-clock, not information.
    res = {}
    for s in (16, 64):
        block(s, 1)  # warm
    for order in ((16, 64), (64, 16)):
        for s in order:
            res.setdefault(s, []).extend(block(s, RUNS))
    res[256] = block(256, 1)
    out = {
        str(s): {
            "min": round(min(v), 3),
            "med": round(sorted(v)[len(v) // 2], 3),
            "n": len(v),
        }
        for s, v in res.items()
    }
    print(json.dumps({"sf": SF, "runs_per_block": RUNS, "n_qdocs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
