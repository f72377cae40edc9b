"""SparkSession factory with scale-appropriate defaults.

The reference runs eager single-process pandas under Airflow
(dags/create-data-lake.py:69-79) with UTC as the scheduler timezone
(config/airflow.cfg:18). Here the session is configured once for the whole
engine: AQE on (runtime re-planning, skew-join splitting), UTC session
timezone (timestamp parity with the DuckDB oracle and the reference's
Airflow default), Arrow enabled for the Pandas-UDF paths.

``shuffle_partitions`` defaults to the local core count; on a real cluster
you would size it to ~2-3x total executor cores and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-covid19-brasil-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Honors $SPARK_GRAFT_CPUS for local parallelism so bench and tests share
    one knob.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(min(n, 32))))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Catalyst/AQE: runtime coalescing, skew-join splitting, dynamic
        # broadcast conversion — the knobs that matter at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Timestamp parity with DuckDB oracle + reference Airflow UTC default.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / applyInPandas / toPandas fast paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Small-dim broadcast threshold: every dim table in the star schema
        # (region/nation/customer/supplier/part) should broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ANSI off by default => permissive casts (nullable on failure),
        # matching the reference's lenient pandas coercions
        # (dags/create-data-lake.py:74-79). SPARK_GRAFT_ANSI=true runs
        # the engine under ANSI semantics — the full test suite passes
        # either way (CI runs both), so a 100 TB job that prefers
        # fail-loud arithmetic can turn it on without query changes.
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("SPARK_GRAFT_ANSI", "false"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
