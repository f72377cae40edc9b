"""Bucketed (pre-shuffled) tables for co-located joins (SURVEY.md §4).

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
shuffling both sides on the key. Bucketing pays that shuffle ONCE at write
time: both tables are hash-partitioned into the same number of buckets on
the join key and stored that way, so every subsequent join (and groupBy on
the key) reads matching buckets directly — Catalyst elides the Exchange on
both sides. This is the lakehouse equivalent of co-located storage in MPP
warehouses.

Bucketed writes go through the session catalog (``saveAsTable`` — bucket
metadata lives in the metastore), so callers pass a database created at a
controlled LOCATION; plain ``.parquet(path)`` cannot carry bucket info.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on
    ``bucket_cols``. Joins/aggregations between tables bucketed identically
    on the join key skip their shuffles; sorted buckets also skip the
    sort-merge sort. With ``path`` the table is EXTERNAL (data at the
    given location, bucket metadata still in the catalog) — the form the
    registered sink_bucketed_join_colocated query uses so its data lands
    in per-SF scratch space instead of the warehouse dir.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key —
    plans with zero Exchange on both sides (asserted in
    tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
