"""REF-parity queries: the reference's cleaning semantics exercised over
the driver test tables (SURVEY.md §2.2; golden-fixture twins live in
tests/test_etl.py).

The test tables contain no nulls or contaminated strings, so each query
synthesizes the reference's failure modes deterministically (key-modulo
sentinels) and then applies the engine's cleaning operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_covid19_brasil_spark.etl import clean_numeric, flatten_structs, with_audit_column
from etl_covid19_brasil_spark.registry import T, query

# Synthesized string-contaminated numeric: the reference's observed input
# states for last_available_confirmed_per_100k_inhabitants
# (dags/create-data-lake.py:74-79): '', ' ', NULL, junk, and clean values.
_CONTAMINATE = """
    CASE WHEN o_orderkey % 7 = 0 THEN ''
         WHEN o_orderkey % 7 = 1 THEN ' '
         WHEN o_orderkey % 7 = 2 THEN NULL
         WHEN o_orderkey % 7 = 3 THEN 'not-a-number'
         ELSE CAST(o_totalprice AS VARCHAR) END
"""


@query(
    "etl_sentinel_clean",
    oracle=f"""
    SELECT o_orderkey,
           COALESCE(TRY_CAST(NULLIF(TRIM({_CONTAMINATE}), '') AS DOUBLE), 0.0) AS cleaned
    FROM orders
    """,
    section="2.2",
    doc="replace_sentinels / clean_numeric: ''/' '/NULL/junk -> 0.0, parseable "
    "strings -> double (dags/create-data-lake.py:74-79). Spark's non-ANSI "
    "cast == DuckDB TRY_CAST.",
)
def etl_sentinel_clean(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("o_orderkey")
    contaminated = (
        F.when(k % 7 == 0, "")
        .when(k % 7 == 1, " ")
        .when(k % 7 == 2, None)
        .when(k % 7 == 3, "not-a-number")
        .otherwise(F.col("o_totalprice").cast("string"))
    )
    df = T(spark, sf, "orders").select("o_orderkey", contaminated.alias("cleaned"))
    return clean_numeric(df, "cleaned", fill=0.0)


@query(
    "etl_flatten_structs",
    oracle="""
    SELECT event_id,
           event_type AS "evt.kind",
           user_id AS "evt.who.id",
           CAST(user_id % 10 AS BIGINT) AS "evt.who.cohort"
    FROM events
    """,
    section="2.2",
    doc="json_normalize-style dotted flattening (dags/create-data-lake.py:97): "
    "a nested struct built from events collapses to dotted top-level "
    "columns via flatten_structs (etl.py) — pure projection, zero shuffle.",
)
def etl_flatten_structs(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select(
        "event_id",
        F.struct(
            F.col("event_type").alias("kind"),
            F.struct(
                F.col("user_id").alias("id"),
                (F.col("user_id") % 10).alias("cohort"),
            ).alias("who"),
        ).alias("evt"),
    )
    return flatten_structs(e)


@query(
    "etl_audit_column",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(*) AS n_with_audit FROM orders
    """,
    section="2.2",
    doc="created_at_datalake audit column (dags/create-data-lake.py:70,100): "
    "the timestamp itself is load-time-dependent, so the checked output is "
    "its null-free cardinality.",
)
def etl_audit_column(spark: SparkSession, sf: str) -> DataFrame:
    df = with_audit_column(T(spark, sf, "orders"))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("created_at_datalake").alias("n_with_audit"),
    )
