"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``etl_covid19_brasil_spark``; the inventory
is assembled by the query registry (one QuerySpec per SURVEY.md §2
operator, each declaring its own oracle SQL).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_covid19_brasil_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-join revenue
    rollup (lineitem ⋈ orders ⋈ customer ⋈ nation + filter + groupBy +
    exact money sum)."""
    from etl_covid19_brasil_spark.queries.relational import join_inner_revenue

    return join_inner_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys without an oracle are the
    approximate/probabilistic ops, checked rows-only by contract)."""
    return registry.all_oracle_sql()
