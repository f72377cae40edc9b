"""As-of and range joins (SURVEY.md §2.3 join_asof / join_range).

The reference stages tables for Postgres to join (dags/create-data-lake.py:
23-24); these two shapes have no single Spark builtin, so they are built as
shuffle-lean compositions:

- ``asof_join``: union-and-window merge. One shuffle on the key, zero join
  explosion — each left row costs O(1) state in the window scan, vs the
  naive "join all earlier rows then argmax" whose worst case is
  O(|left| x |right per key|). This is the classic sorted-merge as-of
  algorithm expressed relationally.
- ``range_join``: equi-bucket prefix + residual predicate. Interval
  containment joins become an equi-join on overlapping bucket ids (so
  Catalyst uses a hash/sort-merge join) followed by the exact range
  filter, instead of a BroadcastNestedLoopJoin over the full cross
  product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the most recent
    right row with the same key and ``right_ts <= left_ts``
    (direction='backward'; 'forward' = nearest ``right_ts >= left_ts``).
    Output columns are named ``asof_<value_col>``.

    Implementation: tag both sides, union by name, and run one window per
    key ordered by timestamp, carrying the last non-null right-side
    values forward (``last(..., ignorenulls=True)``). All ``value_cols``
    travel as ONE struct, so the attached values always come from a
    single right row — per-column carries could mix columns from
    different right rows when the nearest row holds a null in one of
    them. Right rows sort before left rows at equal timestamps so ties
    honor the <=/>= contract; equal-ts duplicate right rows resolve
    deterministically regardless of partition layout: to the
    lexicographically MAXIMUM (value_cols-ordered) struct for
    direction='backward', and to the MINIMUM for 'forward' (the carry
    keeps the last struct in scan order, and the forward scan runs
    time-descending).

    Scale: one hash shuffle on ``on`` + per-partition sort — the same cost
    as a single sort-merge join, independent of how many right rows
    precede each left row (the naive join-then-argmax plan is
    O(|left| x |right per key|)).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    lcols = left.columns
    ltypes = dict(left.dtypes)
    vstruct_type = right.select(*value_cols).schema

    l = left.select(
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(on).alias("__key"),
        F.lit(None).cast(vstruct_type).alias("__v"),
        *lcols,
    )
    r = right.select(
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(on).alias("__key"),
        F.struct(*value_cols).alias("__v"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
    )
    u = l.unionByName(r)

    asc = direction == "backward"
    ts_ord = F.col("__ts").asc() if asc else F.col("__ts").desc()
    val_ord = F.col("__v").asc_nulls_first() if asc else F.col("__v").desc_nulls_first()
    frame = (
        Window.partitionBy("__key")
        .orderBy(ts_ord, F.col("__side").asc(), val_ord)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    carried = u.select("*", F.last("__v", ignorenulls=True).over(frame).alias("__asof"))
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__asof.{v}").alias(f"asof_{v}") for v in value_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float | int,
    how: str = "inner",
) -> DataFrame:
    """Join left points into right ``[lo, hi)`` intervals via bucketed
    equi-join + residual predicate.

    Each interval is replicated once per bucket it overlaps (choose
    ``bucket_width`` near the median interval width so replication stays
    ~2x), each point maps to exactly one bucket, and the equi-join on the
    bucket id lets Catalyst pick a hash/sort-merge join instead of a
    BroadcastNestedLoopJoin. The residual ``lo <= point < hi`` filter
    restores exact semantics. All numeric/timestamp-castable types work —
    values are bucketed on their double form.

    Inner-only by contract: the residual predicate runs AFTER the join,
    so an outer join here would silently drop the unmatched rows it just
    preserved (their null interval bounds fail the filter) — degrading to
    inner semantics. Raise instead of lying.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only: the residual range filter "
            "runs after the join and would drop outer-preserved rows"
        )
    w = float(bucket_width)
    pt = F.col(left_point).cast("double")
    l = left.withColumn("__bucket", F.floor(pt / w).cast("long"))

    lo_b = F.floor(F.col(right_lo).cast("double") / w).cast("long")
    # hi is exclusive: an interval ending exactly on a bucket edge does not
    # reach into that bucket.
    hi_b = F.floor(
        (F.col(right_hi).cast("double") - F.lit(1e-9)) / w
    ).cast("long")
    r = right.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, F.greatest(lo_b, hi_b)))
    )

    joined = l.join(r, l["__bucket"] == r["__bucket"], how).filter(
        (F.col(right_lo).cast("double") <= pt) & (pt < F.col(right_hi).cast("double"))
    )
    return joined.drop("__bucket")
