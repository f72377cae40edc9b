#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plans of the flagship
queries, annotated with the load-bearing properties tests/test_plans.py
asserts. The artifact exists so a reviewer can see the ACTUAL plans the
100 TB claims rest on without running Spark; regenerate after any
planner-visible change with `python scripts/gen_plans.py > PLANS.md`.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_brasil_spark import get_spark, registry  # noqa: E402

SF = "/root/testdata/sf0.001"

# (query, what to look at) — mirrors the test_plans.py assertions
SHOWCASE = [
    (
        "join_inner_revenue",
        "Flagship star join: every dimension BroadcastHashJoin, one "
        "fact-side Exchange, partial+final HashAggregate.",
    ),
    (
        "agg_groupby_pricing",
        "TPC-H Q1 shape: predicate pushed to the parquet scan "
        "(PushedFilters), map-side partial aggregation halves the "
        "shuffle.",
    ),
    (
        "agg_revenue_forecast_band",
        "TPC-H Q6 shape: ALL predicates reach PushedFilters; the scan "
        "is the query.",
    ),
    (
        "join_min_cost_supplier",
        "TPC-H Q2 shape: derived-partsupp aggregation is the only "
        "fact shuffle; region-filtered supplier dim broadcasts.",
    ),
    (
        "top_k_orders",
        "Global top-k fuses to TakeOrderedAndProject — per-partition "
        "k-heaps, no global Sort.",
    ),
    (
        "near_dedup_minhash",
        "MinHash LSH banding: signatures map-side, candidates from band "
        "equi-joins — no CartesianProduct / BroadcastNestedLoopJoin "
        "anywhere.",
    ),
    (
        "mine_hard_negatives",
        "Label-masked exact kernel under the index bound: one broadcast "
        "+ MapInPandas, no shuffle join.",
    ),
    (
        "join_obt_denormalize",
        "One-big-table flatten: seven joins, >= 6 broadcasts, single "
        "fact-side Exchange.",
    ),
    (
        "recursive_cte_hierarchy",
        "Native WITH RECURSIVE: the UnionLoop operator (engine-level "
        "fixpoint), not a static union.",
    ),
    (
        "ann_search_topk",
        "Two-frame retrieval, bounded-index tier: one Python-side "
        "broadcast + MapInPandas over the query stream — zero hash "
        "exchange, no join operator.",
    ),
    (
        "ann_search_scan",
        "Two-frame retrieval, broadcast-query scan tier: the index's "
        "vectors never shuffle — the only hash exchange carries skinny "
        "(query_id, neighbor_id, cosine) candidates into the "
        "WindowGroupLimit top-k merge.",
    ),
    (
        "ann_search_lsh_adc",
        "LSH budget tier (r16): banded index rows carry m byte-codes, "
        "never vectors; per-bucket ADC kernel, cross-table dedup + "
        "WindowGroupLimit pool, exact-cosine rerank join for pool "
        "survivors only.",
    ),
    (
        "ann_index_append",
        "Index lifecycle (r16): append + staleness check on a frozen "
        "TierRoute handle, then the bounded-index exact serve over the "
        "union — the plan is the serve; construction ran eagerly.",
    ),
    (
        "ann_index_delete",
        "Index lifecycle, deletion half (r16): the live frame is base "
        "ANTI-JOIN tombstones with the tombstone side broadcast "
        "(BroadcastHashJoin LeftAnti — no shuffle over the index), "
        "then the exact serve over the survivors.",
    ),
    (
        "ann_search_filtered",
        "Filtered retrieval (r16): at gate SF the eligible set is "
        "bounded, so the shown plan is the zero-shuffle query-side "
        "kernel — the index's FILTERED scan ran inside the bounded "
        "limit-probe job, predicate pushed down; on the routed tiers "
        "the pushdown is part of this plan and pinned "
        "(tests/test_ann_lifecycle.py: PushedFilters EqualTo(label,1)).",
    ),
    (
        "tokenizer_unigram_segment",
        "Unigram tokenizer serving (r16): one unique-word shuffle, the "
        "bounded piece table broadcast into a linear-DP Arrow kernel "
        "over unique words, a Heaps'-law-sized join back to the token "
        "stream, integer aggregates per doc — DuckDB-oracled against "
        "full segmentation enumeration.",
    ),
    (
        "rank_maxsim_topk",
        "MaxSim scoring after the r16 re-plan: the query side rides a "
        "Python broadcast as one numpy matrix into an Arrow matmul "
        "kernel — MapInPandas, NO join operator (the r14 "
        "nested-loop-join form evaluated its slot dots outside "
        "effective codegen: 27.9 -> 1.5 s at the bench shape, "
        "bit-identical output); the only exchange is the "
        "doc-count-sized slot-max merge.",
    ),
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="gen-plans")
    specs = registry.all_specs()
    print("# PLANS — flagship physical plans (generated)")
    print()
    print(
        "Generated by `python scripts/gen_plans.py` at sf0.001; the\n"
        "properties called out per plan are the ones tests/test_plans.py\n"
        "pins in CI. Regenerate after planner-visible changes."
    )
    for name, note in SHOWCASE:
        df = specs[name].spark(spark, SF)
        print(f"\n## {name}\n")
        print(f"{note}\n")
        print("```")
        # formatted plans carry exprIds that churn per session; stable
        # enough for review, not for diffing — note it once
        print(plan_of(df).rstrip())
        print("```")


if __name__ == "__main__":
    main()
