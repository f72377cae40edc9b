#!/usr/bin/env python
"""VERDICT r16 item 4: same-session interleaved A/B of the minhash
pipelines' localCheckpoint materialization (`llm/minhash._shared_scan`)
vs a lineage-only variant, at the bench SF. Run at 32 and 8 cores via
SPARK_GRAFT_CPUS to classify the driver's 2x r16 gap (2.048 s at 32c vs
1.069 s at 8c on identical code) as box/stage-floor vs a real plan
problem.

Protocol: per-form back-to-back warm min-of-N blocks, two sweep orders
(the bench.py discipline applied pairwise); gc + clearCache outside the
timer, noop sink inside.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_brasil_spark import get_spark, registry
import etl_covid19_brasil_spark.llm.minhash as mh

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

spark = get_spark(app_name="minhash_ckpt_ab")
spark.sparkContext.setLogLevel("ERROR")
specs = registry.all_specs()

_orig = mh._shared_scan


def _lineage_only(df):
    return df


def _run_block(name: str, lineage: bool, n: int) -> list[float]:
    mh._shared_scan = _lineage_only if lineage else _orig
    out = []
    try:
        for _ in range(n):
            spark.sparkContext._jvm.System.gc()
            spark.catalog.clearCache()
            df = specs[name].spark(spark, SF)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out.append(time.perf_counter() - t0)
    finally:
        mh._shared_scan = _orig
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    res: dict = {"cpus": cpus, "sf": SF, "runs_per_block": RUNS}
    for q in ("near_dedup_minhash", "dedup_minhash_components"):
        for lineage in (False, True):  # warm both forms
            _run_block(q, lineage, 2)
        runs: dict = {False: [], True: []}
        for order in ((False, True), (True, False)):
            for lineage in order:
                runs[lineage].extend(_run_block(q, lineage, RUNS))
        res[q] = {
            "checkpoint_min": round(min(runs[False]), 3),
            "checkpoint_med": round(sorted(runs[False])[len(runs[False]) // 2], 3),
            "lineage_min": round(min(runs[True]), 3),
            "lineage_med": round(sorted(runs[True])[len(runs[True]) // 2], 3),
        }
        print(f"[ab] {q} ({cpus}c): {res[q]}", file=sys.stderr)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
