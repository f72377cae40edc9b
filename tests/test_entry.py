"""Driver-contract smoke (SURVEY.md §3): __spark_entry__ is the public
surface the round driver consumes — entry() must run and the two maps
must stay consistent, or every other green test is unreachable."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_entry_runs_and_has_stable_schema(spark):
    df = E.entry(spark)
    # the flagship star-join rollup always has revenue groups at sf0.001 —
    # `>= 0` would pass on an accidentally-empty result (zero-row audit)
    assert df.count() > 0
    assert df.columns == E.entry(spark).columns


def test_query_and_oracle_maps_are_consistent(spark):
    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) >= 170
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # rows-only queries are the documented approximate/streaming tiers only
    rows_only = set(qs) - set(osql)
    assert all(
        any(
            tok in n
            for tok in (
                "minhash",
                "simhash",
                "ann_",
                "media_decode",
                "pq_",
                "embedding_lsh",
                "pca_power",  # iterative linear algebra — numpy-replay-pinned
                "compression_ratio",  # no SQL deflate — local-zlib-equality-pinned
                "phash",  # no SQL PPM decode/bit-pool — numpy-replay-pinned
                "fingerprint_dedup",  # no SQL WAV decode — gain-invariance-pinned
                "video_phash",  # no SQL container parse — two-sided-pinned
                "mmr",  # sequential greedy loop — python-replay-pinned
                "maxsim_prefiltered",  # LSH candidate cap — recall-pinned vs the oracled scan form
                "classifier_train",  # iterative float GD — invariant-pinned
                "negatives_ann",  # IVF-approximate — recall-pinned vs exact
                "kmeans_elbow",  # iterative float training — monotone-pinned
                "rolling_hll",  # sketch estimate — error-pinned vs exact
                "hll_overlap",  # sketch inclusion-exclusion — error-pinned
                "theta_set",  # theta sketch algebra — error-pinned vs exact
                "unigram_train",  # iterative float EM — monotone+reference-pinned
                "unigram_sample",  # lattice sampling — validity+distribution-pinned
            )
        )
        for n in rows_only
    ), rows_only
    # oracle SQL strings are non-empty and reference at least one table/CTE
    assert all(o.strip() for o in osql.values())


def test_registry_names_are_unique_and_snake_case(spark):
    import re

    names = list(E.queries())
    assert len(names) == len(set(names))
    assert all(re.fullmatch(r"[a-z0-9_]+", n) for n in names)


# full-lane tier (r15): materializes all 395 checked outputs (~2.4 min);
# the oracle sweep covers the same surface in the smoke lane
@pytest.mark.slow
def test_no_array_or_map_columns_in_checked_outputs(spark):
    """The driver's result canonicalizer sorts every output column with
    pandas sort_values; array/map cells are unhashable there and crash
    even rows-only checks (r04: embedding_quantize_int8,
    media_decode_features, embedding_pq_codes). Checked query outputs
    must be scalar-only — serialize arrays (concat_ws / array_join)
    before returning.

    r17 (VERDICT r16 item 2): the per-query schema check now lives in
    oracle.check_query, so the full 408-query oracle sweep
    (tests/test_oracle.py) pins it per query at zero extra cost — the
    old form here re-ran every eager construction just to read
    schemas (~4.5 min). This test pins the ENFORCEMENT: a query spec
    returning an array column must fail check_query before any row
    comparison runs."""
    import duckdb

    from etl_covid19_brasil_spark.oracle import check_query
    from etl_covid19_brasil_spark.registry import QuerySpec

    def bad_query(s, sf):
        return s.range(1).selectExpr("id", "array(1, 2) AS arr")

    spec = QuerySpec(
        name="__arr_probe__", spark=bad_query, oracle=None, section="t", doc="t"
    )
    con = duckdb.connect()
    res = check_query(spark, con, spec, "/root/testdata/sf0.001")
    con.close()
    assert not res.ok and "array/map" in res.detail, res
