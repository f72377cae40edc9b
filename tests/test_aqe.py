"""Adaptive Query Execution proofs (SURVEY.md §4): the session factory
turns AQE + skew-join splitting on; these tests show the runtime
re-planning actually engages — the mechanism the engine leans on at
100 TB for straggler-free joins and right-sized shuffle partitions.
Thresholds are lowered to test scale; the mechanism is identical.
"""

from __future__ import annotations

import contextlib
import io as pyio

import pyspark.sql.functions as F


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes plans only after execution
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _confs(spark, pairs):
    old = {k: spark.conf.get(k, None) for k in pairs}
    for k, v in pairs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    # one key carries ~100x the rows of every other key; with test-scale
    # thresholds AQE must mark the sort-merge join partition as skewed
    # and split it instead of letting one task straggle
    pairs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "24KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    with _confs(spark, pairs):
        left = spark.range(60_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
        )
        right = spark.range(2_000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("rv")
        )
        # bare join: a downstream agg that reuses the join's hash
        # distribution legitimately suppresses the split (splitting would
        # break the required partitioning), so assert on the join itself.
        # pad must survive projection — pruned away, the hot partition is
        # 60k identical longs, which compress under any skew threshold
        joined = left.join(right, "k").select("k", "rv", "pad")
        plan = _final_plan(joined)
    assert "skew=true" in plan, plan[:4000]


def test_aqe_coalesces_small_shuffle_partitions(spark):
    # 8 configured shuffle partitions for a few-KB aggregate: AQE must
    # coalesce the reads rather than schedule 8 near-empty tasks
    df = (
        spark.range(10_000)
        .select((F.col("id") % 5).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _final_plan(df)
    assert "AQEShuffleRead" in plan
    assert "coalesced" in plan.lower()
