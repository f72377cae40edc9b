#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced to full materialization with the noop writer (no
driver collect bottleneck, no output skipped by count() shortcuts). One
untimed warmup of a trivial action absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_covid19_brasil_spark import get_spark, registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the shuffle-heavy relational core + the LLM-data scale
# paths, covering scan/filter/agg, star join, window, as-of, sessionize,
# dedup (exact + LSH), and similarity (brute force + ANN).
HEADLINE = [
    "agg_groupby_pricing",
    "join_inner_revenue",
    "agg_count_distinct",
    "win_running_sum",
    "top_k_orders",
    "join_asof",
    "filter_correlated_subquery",
    "stream_session_window",
    "text_tokenize_freq",
    "exact_dedup",
    "near_dedup_minhash",
    "near_dedup_embedding",
    "similarity_topk",
    "ann_lsh_topk",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()

    # warmup: JVM + parquet footer reads
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = specs[name].spark(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
