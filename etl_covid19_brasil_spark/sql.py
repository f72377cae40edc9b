"""The SQL entry point (SURVEY.md §3, entry point 3).

The reference's data lake exists "para consultas" — arbitrary SQL over the
loaded tables, delegated to Postgres (dags/create-data-lake.py:23-24).
This engine internalizes that surface: ``register_views`` publishes every
lake/test table as a temp view and ``sql`` runs any statement through the
same Catalyst lifecycle as the DataFrame API — the two layers lower to
identical logical plans (asserted in tests/test_sql.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_covid19_brasil_spark.io import register_views

__all__ = ["register_views", "sql"]


def sql(spark: SparkSession, statement: str, sf_dir: str | None = None) -> DataFrame:
    """Run a SQL statement; with ``sf_dir`` the test tables are (re-)
    registered first so the statement can reference them by name."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(statement)
