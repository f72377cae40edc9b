"""Differential tests: every registered query vs its DuckDB oracle —
the local twin of the driver's t2 correctness gate (SURVEY.md §5).

Default run checks sf0.001 (fast). Set ETL_SPARK_TEST_SF=gate to run the
driver's sf0.01 scale.
"""

from __future__ import annotations

import os

import pytest

from etl_covid19_brasil_spark import registry
from etl_covid19_brasil_spark.oracle import check_query
from tests.conftest import SF_GATE, SF_SMOKE

SPECS = registry.all_specs()
USE_GATE = os.environ.get("ETL_SPARK_TEST_SF") == "gate"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck_smoke, duck_gate):
    sf_dir = SF_GATE if USE_GATE else SF_SMOKE
    con = duck_gate if USE_GATE else duck_smoke
    res = check_query(spark, con, SPECS[name], sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    if SPECS[name].oracle is None:
        # mirror the driver-row green gate (registry._driver_check_history):
        # a rows-only query must actually DELIVER rows — zero rows verified
        # nothing and counts red there, so it fails here too
        assert res.spark_rows > 0, f"{name}: rows-only query returned 0 rows"
