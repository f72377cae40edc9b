"""Top-k operators (SURVEY.md §2.6).

``top_k`` relies on Catalyst's ``TakeOrderedAndProject`` physical operator:
``orderBy(...).limit(k)`` computes a per-partition k-heap and merges k
rows per partition on the driver — no global sort, which is the difference
between O(n log k) and a full shuffle at 100 TB.

``top_k_per_group`` is the window formulation. Spark 4's
``InferWindowGroupLimit`` rule plans it with a MAP-SIDE partial limit:
``WindowGroupLimit(row_number, k, Partial)`` runs below the group-key
Exchange, so each input partition forwards at most k rows per group and
the shuffle carries <= k x |groups| x |partitions| rows instead of the
whole input — the partial-TakeOrderedAndProject rewrite SURVEY.md §4
listed as an optional custom Catalyst rule is BUILT IN (pinned in
tests/test_plans.py::test_top_k_per_group_partial_window_group_limit;
requires the rank filter to be a literal bound directly over
row_number/rank/dense_rank, which ``top_k_per_group`` guarantees).
With AQE, skewed groups additionally split. Always pass a deterministic
tie-break ordering.
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
