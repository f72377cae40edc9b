"""Hot-key-robust running aggregates (SURVEY.md §4 scale posture).

``SUM(v) OVER (PARTITION BY k ORDER BY o ROWS UNBOUNDED PRECEDING)``
hash-shuffles on ``k`` and sorts each key inside ONE task. Under key
skew (one customer owning 50% of a 100 TB order log) that task sorts
half the table: the stage runs at the straggler's speed and the sort
spills — AQE cannot split a window partition the way it splits a skewed
join, so the plain window has no runtime rescue.

For ASSOCIATIVE frame aggregates the fix is the two-pass chunk-prefix
pattern (the keyed generalization of ``id_assign_contiguous``,
queries/analytics.py):

1. ``repartitionByRange(n, *keys, *order)`` — the sampled range
   partitioner yields partitions that are globally ordered and
   non-overlapping on ``(keys..., order...)``, so a hot key is SPLIT
   across as many partitions as its volume demands (the hash
   partitioner, by construction, never splits a key).
2. Within each (partition, key) chunk: an ordinary prefix aggregate —
   the sort is bounded by the partition size, never by the key size.
3. Per-chunk totals -> per-key prefix offsets across partitions. Only
   keys that SPAN a partition boundary need an offset, and a range
   partitioning can split at most ``n - 1`` keys (one per boundary), so
   the broadcast is O(#partitions) rows regardless of key cardinality —
   broadcasting all per-key offsets would be O(|keys|) and die at
   100 TB key counts.
4. Broadcast-join the offsets back; chunk prefix + offset = the exact
   window result (exact because the order columns include a unique
   tiebreaker, making the per-key order total — same argument as
   id_assign_contiguous).

Cost vs the plain window: one extra aggregate over O(rows) that reduces
to O(#chunks) immediately (map-side partial), one O(#keys)-row shuffle
for the spanning-key filter, and a broadcast of <= 2(n-1) rows. What it
buys: the per-task sort bound drops from O(hottest key) to
O(partition), i.e. the operator's memory/straggler envelope no longer
depends on the data's key distribution at all.

The ``localCheckpoint(eager=False)`` pins the sampled range boundaries
so the chunk-prefix pass and the totals pass see identical partition
ids (the id_assign_contiguous lesson: recomputation may resample).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

_PID = "__cw_pid"
_LOCAL = "__cw_local"
_TOT = "__cw_tot"
_OFF = "__cw_off"


def chunked_running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    value: str,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``SUM(value) OVER (PARTITION BY keys ORDER BY order ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`` with the per-task
    sort bounded by partition size instead of hottest-key size.

    Requirements: ``order`` must make the per-key ordering total (include
    a unique tiebreaker) — same contract the plain window needs for a
    deterministic result; ``value`` should be an exact type (long cents,
    not double) — chunked summation reorders float rounding.
    """
    keys, order = list(keys), list(order)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    src = (
        df.repartitionByRange(n, *[F.col(c) for c in keys + order])
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    chunk = Window.partitionBy(_PID, *keys).orderBy(*order)
    local = src.withColumn(
        _LOCAL,
        F.sum(value).over(chunk.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # Per-chunk totals: O(rows) input but map-side partial aggregation
    # collapses it to one row per (partition, key) chunk before any
    # shuffle; <= n - 1 + |keys| chunks exist.
    totals = src.groupBy(_PID, *keys).agg(F.sum(value).alias(_TOT))
    # Keys needing a nonzero offset = keys present in >1 partition;
    # range partitioning bounds these at n - 1, so `offsets` is tiny no
    # matter how many distinct keys the data holds.
    spanning = (
        totals.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__cw_npid"))
        .filter(F.col("__cw_npid") > 1)
        .drop("__cw_npid")
    )
    w_off = (
        Window.partitionBy(*keys)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        totals.join(spanning, keys)
        .select(_PID, *keys, F.coalesce(F.sum(_TOT).over(w_off), F.lit(0)).alias(_OFF))
        .filter(F.col(_OFF) != 0)
    )
    return (
        local.join(F.broadcast(offsets), [_PID, *keys], "left")
        .withColumn(out, F.col(_LOCAL) + F.coalesce(F.col(_OFF), F.lit(0)))
        .drop(_PID, _LOCAL, _OFF)
    )
