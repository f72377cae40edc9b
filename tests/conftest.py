from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from etl_covid19_brasil_spark import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck_smoke():
    from etl_covid19_brasil_spark.oracle import duckdb_connection

    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_gate():
    from etl_covid19_brasil_spark.oracle import duckdb_connection

    con = duckdb_connection(SF_GATE)
    yield con
    con.close()
