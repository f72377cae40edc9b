"""Top-k operators (SURVEY.md §2.6).

``top_k`` relies on Catalyst's ``TakeOrderedAndProject`` physical operator:
``orderBy(...).limit(k)`` computes a per-partition k-heap and merges k
rows per partition on the driver — no global sort, which is the difference
between O(n log k) and a full shuffle at 100 TB.

``top_k_per_group`` is the window formulation; Spark executes it as one
hash shuffle on the group key + per-partition sort, and (with AQE) skewed
groups split. Always pass a deterministic tie-break ordering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k; plans as TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: list[str], order: list[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """k best rows per group via row_number over a partitioned window."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
