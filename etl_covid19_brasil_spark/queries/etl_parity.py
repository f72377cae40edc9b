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


@query(
    "etl_pandas_api_parity",
    oracle="""
    WITH covid AS (
        SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS city,
               CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_custkey END AS city_ibge_code,
               CASE WHEN c_custkey % 7 = 0 THEN ''
                    WHEN c_custkey % 7 = 1 THEN ' '
                    WHEN c_custkey % 7 = 2 THEN NULL
                    WHEN c_custkey % 7 = 3 THEN 'not-a-number'
                    ELSE CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR)
               END AS rate_raw
        FROM customer
    )
    SELECT city, city_ibge_code,
           COALESCE(TRY_CAST(NULLIF(TRIM(rate_raw), '') AS DOUBLE), 0.0) / 100.0
             AS rate_per_100k,
           TRUE AS audit_ok
    FROM covid
    WHERE city IS NOT NULL AND city_ibge_code IS NOT NULL
    """,
    section="2.2",
    doc="The reference's cleaning code run through the PANDAS API ON "
    "SPARK (pyspark.pandas): dropna(subset=...), sentinel replace, "
    "numeric coercion and the audit column are written as the same "
    "pandas idioms the reference uses (dags/create-data-lake.py:70-79 "
    "is literal pandas), but every operation compiles to distributed "
    "Catalyst plans — the migration path where the reference's own "
    "source runs nearly verbatim with import pandas -> import "
    "pyspark.pandas. Junk-to-0 follows the etl_sentinel_clean "
    "contract (to_numeric(errors='coerce').fillna(0)); the result "
    "hash-matches the pure-DataFrame pipeline's oracle.",
)
def etl_pandas_api_parity(spark: SparkSession, sf: str) -> DataFrame:
    import pyspark.pandas as ps

    k = F.col("c_custkey")
    rate = (
        F.when(k % 7 == 0, "")
        .when(k % 7 == 1, " ")
        .when(k % 7 == 2, None)
        .when(k % 7 == 3, "not-a-number")
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("long").cast("string"))
    )
    sdf = T(spark, sf, "customer").select(
        F.when(k % 11 == 0, None).otherwise(F.col("c_mktsegment")).alias("city"),
        F.when(k % 13 == 0, None).otherwise(k).alias("city_ibge_code"),
        rate.alias("rate_raw"),
    )
    psdf = sdf.pandas_api()
    # the reference's pandas lines, near-verbatim:
    psdf["created_at_datalake"] = "loaded"          # audit column (:70,:100)
    psdf = psdf.dropna(subset=["city", "city_ibge_code"])  # (:71-73)
    psdf["rate_per_100k"] = (
        ps.to_numeric(psdf["rate_raw"].str.strip(), errors="coerce").fillna(0.0)
        / 100.0
    )  # (:74-79) sentinel/junk -> 0, cents -> units
    psdf["audit_ok"] = psdf["created_at_datalake"].notnull()
    return psdf[["city", "city_ibge_code", "rate_per_100k", "audit_ok"]].to_spark()


@query(
    "etl_brazilian_currency_parse",
    oracle="""
    WITH cents AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    raw AS (
      SELECT o_orderkey,
             'R$ ' || replace(format('{:,}', c // 100), ',', '.')
                   || ',' || printf('%02d', CAST(c % 100 AS INT)) AS valor_brl
      FROM cents
    )
    SELECT o_orderkey, valor_brl,
           CAST(ROUND(CAST(replace(replace(replace(valor_brl, 'R$ ', ''),
                                           '.', ''), ',', '.') AS DOUBLE)
                      * 100) AS BIGINT) AS valor_cents
    FROM raw ORDER BY o_orderkey
    """,
    section="2.2",
    doc="Brazilian-locale currency parsing — the wire format the "
    "reference's actual feeds speak ('R$ 1.234,56': dot thousands, "
    "comma decimals, currency prefix): strip the prefix, drop "
    "thousands dots, swap the decimal comma, cast, and land exact "
    "cents. The synthesis side builds the BRL strings from the clean "
    "doubles with the inverse swap (via a '#' placeholder, since the "
    "two separators trade places), so the roundtrip proves the parse "
    "inverts the format exactly — the locale-aware ingest "
    "etl_sentinel_clean's plain-dot path can't handle. Pure string "
    "expressions both engines share; no locale-dependent parser is "
    "invoked, which is what makes it deterministic.",
)
def etl_brazilian_currency_parse(spark: SparkSession, sf: str) -> DataFrame:
    raw = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 17 == 0)
        .select(
            "o_orderkey",
            F.concat(
                F.lit("R$ "),
                F.translate(
                    F.format_number(F.col("o_totalprice"), 2), ".,", ",."
                ),
            ).alias("valor_brl"),
        )
    )
    cleaned = (
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("valor_brl"), r"R\$ ", ""), r"\.", ""
            ),
            ",",
            ".",
        )
    ).cast("double")
    return raw.select(
        "o_orderkey",
        "valor_brl",
        F.round(cleaned * 100).cast("long").alias("valor_cents"),
    ).orderBy("o_orderkey")
