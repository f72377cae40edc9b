#!/usr/bin/env python
"""Regenerate COVERAGE.md — the SURVEY.md §2 operator inventory mapped to
registered queries, their oracle status, and the non-query (API-level)
surfaces with their tests. Run from the repo root:

    python scripts/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_brasil_spark import registry  # noqa: E402

SECTION_TITLES = {
    "2.1": "Scans / sources / sinks",
    "2.2": "Projections / filters / predicates",
    "2.3": "Joins",
    "2.4": "Aggregations",
    "2.5": "Window functions",
    "2.6": "Sorts / limits / top-k",
    "2.7": "Set operations",
    "2.8": "Scalar functions",
    "2.9": "Streaming",
    "2.10": "LLM-data-pipeline operators",
    "2.11": "UDF / UDAF / UDTF surface",
}

# Surfaces that are APIs with side effects (sources/sinks/streaming
# runtime/stateful kernels) — covered by dedicated tests instead of
# queries()+oracle_sql() rows.
API_SURFACE = [
    ("2.1", "scan_csv / scan_json / scan_parquet / scan_orc", "io.py", "tests/test_io.py"),
    ("2.1", "sink_orc roundtrip (columnar format twin)", "io.py", "tests/test_io.py::test_sink_orc_roundtrip_with_pushdown"),
    ("2.1", "lake maintenance: clustered sink / partition upsert / key merge / compaction", "io.py", "tests/test_io.py (clustered, upsert, merge, compact)"),
    ("2.1", "scan_http_json (driver-side fetch)", "io.py", "tests/test_io.py, tests/test_etl.py"),
    ("2.1", "scan_jdbc / sink_jdbc_replace (embedded Derby)", "io.py", "tests/test_io.py::test_jdbc_sink_and_scan_roundtrip"),
    ("2.1", "sink_parquet (partitioned) / sink_csv (quoted)", "io.py", "tests/test_io.py"),
    ("2.2", "ETL pipelines (covid/ibge golden parity)", "etl.py", "tests/test_etl.py"),
    ("2.2", "width-2 parallel data-lake build (reference DAG parity)", "etl.py", "tests/test_etl.py::test_run_data_lake_lands_both_tables_concurrently"),
    ("2.2", "clean_numeric property-based nulls/junk", "etl.py", "tests/test_etl.py::test_clean_numeric_property"),
    ("2.3", "salted_join exactness + spread", "operators/skew.py", "tests/test_scale_ops.py"),
    ("2.3", "bucketed co-located join (zero Exchange)", "operators/bucketing.py", "tests/test_scale_ops.py"),
    ("2.9", "readStream file replay == batch (4 jobs)", "streaming/jobs.py", "tests/test_streaming.py"),
    ("2.9", "applyInPandasWithState running totals", "streaming/jobs.py", "tests/test_streaming.py::test_arbitrary_state_running_totals"),
    ("2.9", "watermark late-data discard", "streaming/jobs.py", "tests/test_streaming.py::test_late_data_beyond_watermark_is_dropped"),
    ("2.9", "foreachBatch sink", "streaming/jobs.py", "tests/test_streaming.py::test_foreach_batch_parquet_sink"),
    ("2.9", "stream-stream interval join (watermarked both sides)", "streaming/jobs.py", "tests/test_streaming.py::test_interval_join_matches_batch"),
    ("2.9", "rate-micro-batch source drives windowed jobs", "streaming/jobs.py", "tests/test_streaming.py::test_rate_stream_feeds_windowed_aggregation"),
    ("2.9", "kafka source envelope projection", "streaming/jobs.py", "tests/test_streaming.py::test_kafka_stream_constructor_projects_envelope"),
    ("2.9", "AvailableNow backfill trigger (self-terminating catch-up)", "streaming/jobs.py", "tests/test_streaming.py::test_available_now_backfill_drains_and_terminates"),
    ("2.1", "paginated HTTP source (empty-page stop, max_pages guard, per-page retry)", "io.py", "tests/test_io.py::test_paged_http_source_follows_pages_and_retries"),
    ("2.4", "r8 analytics semantic invariants (apportionment, survival, EWMA, id-assign, winsorize, upsample)", "queries/analytics.py + quality.py", "tests/test_analytics_invariants.py"),
    ("2.10", "zlib compression-ratio kernel == local zlib (rows-only exactness pin)", "queries/llm.py", "tests/test_scale_ops.py::test_compression_ratio_matches_local_zlib"),
    ("2.10", "multimodal decode kernel determinism", "llm/multimodal.py", "tests/test_multimodal.py"),
    ("2.10", "real PPM/WAV codec roundtrips (+ hypothesis properties)", "llm/multimodal.py", "tests/test_multimodal.py (roundtrip, property)"),
    ("2.10", "multimodal resize / UDTF frame sampling", "llm/multimodal.py", "tests/test_multimodal.py"),
    ("2.10", "cogrouped block-nested-loop == broadcast kernel (exact similarity)", "llm/similarity.py", "tests/test_scale_ops.py (tiled_equals_single)"),
    ("2.11", "UDTF one-to-many via SQL LATERAL", "llm/multimodal.py", "tests/test_multimodal.py::test_frame_sampler_udtf_lateral_join"),
    ("3", "SQL entry point == DataFrame layer", "sql.py", "tests/test_scale_ops.py"),
    ("4", "physical-plan audits (pushdown/broadcast/top-k/no-cross-product)", "—", "tests/test_plans.py"),
]


def main() -> None:
    specs = registry.all_specs()
    by_sec: dict[str, list] = {}
    for s in specs.values():
        by_sec.setdefault(s.section, []).append(s)

    print("# COVERAGE — SURVEY.md §2 inventory → implementation map")
    print()
    print("Generated by `python scripts/gen_coverage.py`. Every query row is")
    print("differentially tested against DuckDB at sf0.01 (tests/test_oracle.py");
    print("and the driver's CORRECTNESS gate); `rows-only` marks operators that")
    print("are approximate/probabilistic/engine-specific by construction.")
    print()
    total = len(specs)
    with_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    print(f"**{total} registered queries** — {with_oracle} oracle-checked, "
          f"{total - with_oracle} rows-only.")
    print()
    for sec in sorted(by_sec, key=lambda s: [int(p) for p in s.split(".")]):
        rows = sorted(by_sec[sec], key=lambda s: s.name)
        print(f"## §{sec} {SECTION_TITLES.get(sec, '')} ({len(rows)} queries)")
        print()
        print("| query | oracle | doc |")
        print("|---|---|---|")
        for s in rows:
            o = "DuckDB" if s.oracle is not None else "rows-only"
            doc = " ".join(s.doc.split())
            if len(doc) > 140:
                doc = doc[:137] + "..."
            print(f"| `{s.name}` | {o} | {doc} |")
        print()
    print("## API-level surface (side-effecting / runtime paths, covered by dedicated tests)")
    print()
    print("| § | surface | module | tests |")
    print("|---|---|---|---|")
    for sec, what, mod, tests in API_SURFACE:
        print(f"| {sec} | {what} | `{mod}` | `{tests}` |")


if __name__ == "__main__":
    main()
