"""etl_covid19_brasil_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query and data-processing capabilities of the
reference ETL study (Razborges/etl-covid19-brasil: Airflow + pandas +
Postgres, all logic in ``dags/create-data-lake.py``), re-expressed as an
idiomatic Spark engine:

- data model: ``pyspark.sql.DataFrame`` over Parquet/CSV/JSON/JDBC
  (reference: eager pandas frames bulk-loaded into Postgres "data lake",
  dags/create-data-lake.py:69,83,104)
- query surface: DataFrame builder API + ``spark.sql`` over temp views
  (reference: "para consultas" delegation to Postgres,
  dags/create-data-lake.py:23-24)
- execution: Catalyst/Tungsten/AQE; designed for 100 TB partitioned lakes,
  tested on local[*] at small scale factors.

Public entry points:
    get_spark()                  -- configured SparkSession factory
    registry.all_queries()       -- named query inventory (SURVEY.md §2)
    registry.all_oracle_sql()    -- DuckDB-equivalent SQL per query
"""

from etl_covid19_brasil_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
