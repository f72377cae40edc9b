#!/usr/bin/env python
"""VERDICT r16 item 3: same-session interleaved A/B of the ADC rerank
pool — single query_id exchange (r17, `_POOL_SINGLE_EXCHANGE=True`) vs
the r16 two-exchange shape (dedup on (query_id, neighbor_id) + window
on query_id). Times the registered ann_search_lsh_adc bench path and
asserts the two forms return identical rows while measuring.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_brasil_spark import get_spark, registry
import etl_covid19_brasil_spark.llm.search as search_mod

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

spark = get_spark(app_name="lsh_adc_pool_ab")
spark.sparkContext.setLogLevel("ERROR")
specs = registry.all_specs()
NAME = "ann_search_lsh_adc"


def block(fused: bool, n: int) -> list[float]:
    search_mod._POOL_SINGLE_EXCHANGE = fused
    out = []
    try:
        for _ in range(n):
            spark.sparkContext._jvm.System.gc()
            spark.catalog.clearCache()
            df = specs[NAME].spark(spark, SF)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out.append(time.perf_counter() - t0)
    finally:
        search_mod._POOL_SINGLE_EXCHANGE = True
    return out


def rows(fused: bool):
    search_mod._POOL_SINGLE_EXCHANGE = fused
    try:
        df = specs[NAME].spark(spark, SF)
        return sorted(map(tuple, df.collect()))
    finally:
        search_mod._POOL_SINGLE_EXCHANGE = True


def main() -> None:
    assert rows(True) == rows(False), "pool forms diverge!"
    for f in (True, False):
        block(f, 2)  # warm both forms
    runs: dict = {True: [], False: []}
    for order in ((True, False), (False, True)):
        for f in order:
            runs[f].extend(block(f, RUNS))
    res = {
        "sf": SF,
        "runs_per_block": RUNS,
        "fused_min": round(min(runs[True]), 3),
        "fused_med": round(sorted(runs[True])[len(runs[True]) // 2], 3),
        "two_exchange_min": round(min(runs[False]), 3),
        "two_exchange_med": round(sorted(runs[False])[len(runs[False]) // 2], 3),
        "rows_identical": True,
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
