#!/usr/bin/env python
"""r14 probe (VERDICT r13 item 3): record which tier pick_ann_tier
routes at each probed scale and shape, so the ann_topk_auto front door
can be checked against the README's measured tier menu as a table, not
an argument.

Cheap by construction: the router runs the one bounded TakeOrdered
seed job + the one bounded shape sample per corpus — no full ANN
queries are executed here (their recall/wall-clock envelopes are the
clustered64/scale_check probes' job).

Usage: python scripts/tier_routes.py [--replicas 8 32 64]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_brasil_spark import get_spark  # noqa: E402
from etl_covid19_brasil_spark.io import load_table  # noqa: E402
from scripts.scale_check import (  # noqa: E402
    build_clustered_embeddings,
    build_scaled_dir,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[8, 32, 64])
    args = ap.parse_args()

    from etl_covid19_brasil_spark.llm.ann import pick_ann_tier

    spark = get_spark(app_name="tier-routes")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for replicas in args.replicas:
        for shape, build in (
            ("flat", build_scaled_dir),
            ("clustered", build_clustered_embeddings),
        ):
            path = build(spark, replicas)
            emb = load_table(spark, path, "embeddings")
            route = pick_ann_tier(emb)
            rows.append(
                {
                    "replicas": replicas,
                    "shape": shape,
                    "tier": route.tier,
                    "n_est": route.n_est,
                    "probe_route": route.probe.route if route.probe else None,
                    "n_probe": route.probe.n_probe if route.probe else None,
                    "tight_cos": None
                    if route.probe is None or math.isnan(route.probe.tight_cos)
                    else round(route.probe.tight_cos, 4),
                }
            )
            print(f"# {replicas}x {shape}: {rows[-1]}", file=sys.stderr)
            shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"routes": rows}))


if __name__ == "__main__":
    main()
