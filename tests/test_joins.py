"""Unit tests for the composite join operators (SURVEY.md §2.3) against
naive reference formulations — the oracle gate covers join_asof backward
over the test tables; these pin the full operator contracts (forward
direction, tie handling, interval semantics) on adversarial micro-data.
"""

from __future__ import annotations

import datetime as dt

import pytest

from etl_covid19_brasil_spark.operators import asof_join, range_join


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, ts(0)), (1, ts(5)), (1, ts(10)), (2, ts(5)), (3, ts(5))],
        "k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(0), 10.0), (1, ts(7), 20.0), (2, ts(5), 30.0), (2, ts(9), 40.0)],
        "k long, rts timestamp, v double",
    )
    return left, right


def _naive_asof(left_rows, right_rows, backward=True):
    out = {}
    for k, lts in left_rows:
        cands = [
            (rts, v)
            for (rk, rts, v) in right_rows
            if rk == k and (rts <= lts if backward else rts >= lts)
        ]
        if backward:
            best = max(cands, default=None)
        else:
            best = min(cands, default=None)
        out[(k, lts)] = best[1] if best else None
    return out


def test_asof_backward_matches_naive(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["lts"]): r["asof_v"]
        for r in asof_join(left, right, "k", "lts", "rts", ["v"]).collect()
    }
    want = _naive_asof(
        [(r["k"], r["lts"]) for r in left.collect()],
        [(r["k"], r["rts"], r["v"]) for r in right.collect()],
        backward=True,
    )
    assert got == want
    # exact-timestamp tie honors <= (k=2 at 10:05 sees the 10:05 row)
    assert got[(2, ts(5))] == 30.0
    # no match at all -> null (k=3 has no right rows)
    assert got[(3, ts(5))] is None


def test_asof_forward_matches_naive(spark, sides):
    left, right = sides
    got = {
        (r["k"], r["lts"]): r["asof_v"]
        for r in asof_join(
            left, right, "k", "lts", "rts", ["v"], direction="forward"
        ).collect()
    }
    want = _naive_asof(
        [(r["k"], r["lts"]) for r in left.collect()],
        [(r["k"], r["rts"], r["v"]) for r in right.collect()],
        backward=False,
    )
    assert got == want
    # forward: 10:00 -> next right at 10:00 (ties count), 10:10 -> none
    assert got[(1, ts(0))] == 10.0
    assert got[(1, ts(10))] is None


@pytest.mark.slow  # full-lane tier (r15): >10 s wall-clock
def test_range_join_matches_naive_theta(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(50)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(100, 0.0, 10.0), (101, 5.0, 6.0), (102, 45.0, 60.0), (103, -5.0, 0.5)],
        "iid long, lo double, hi double",
    )
    got = range_join(points, intervals, "x", "lo", "hi", bucket_width=8.0)
    naive = points.crossJoin(intervals).filter("lo <= x AND x < hi")
    cols = ["pid", "iid"]
    g = {tuple(r) for r in got.select(*cols).collect()}
    w = {tuple(r) for r in naive.select(*cols).collect()}
    assert g == w
    # half-open semantics: x=10 not in [0,10), x=0 in [-5,0.5)
    assert (10, 100) not in g and (0, 103) in g


def test_asof_multi_value_cols_come_from_one_right_row(spark):
    """Regression: with several value_cols, the attached values must all
    originate from the SAME (nearest) right row — a per-column carry
    would backfill a null in the nearest row from an older row."""
    left = spark.createDataFrame([(1, ts(10))], "k long, lts timestamp")
    right = spark.createDataFrame(
        [
            (1, ts(0), 1.0, "old"),
            (1, ts(5), None, "new"),  # nearest row: null in v1
        ],
        "k long, rts timestamp, v1 double, v2 string",
    )
    row = asof_join(left, right, "k", "lts", "rts", ["v1", "v2"]).collect()[0]
    # both columns from the ts(5) row: v1 stays null, not backfilled with 1.0
    assert row["asof_v2"] == "new"
    assert row["asof_v1"] is None


def test_range_join_rejects_outer(spark):
    points = spark.createDataFrame([(1, 1.0)], "pid long, x double")
    intervals = spark.createDataFrame([(9, 0.0, 2.0)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="inner"):
        range_join(points, intervals, "x", "lo", "hi", bucket_width=1.0, how="left")


# --- property-based differential: asof_join vs pandas merge_asof -----------


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """pandas merge_asof is the canonical as-of reference; the union+window
    composite must agree with it on randomized keyed series (unique right
    timestamps per key — merge_asof's own tie rule for duplicates differs
    by insertion order, which no engine should promise)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    rng_state = 20260813
    for trial in range(3):
        # deterministic LCG; no runtime RNG in test data
        def nxt():
            nonlocal rng_state
            rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            return rng_state

        left_rows = [
            (nxt() % 5, 1000 + nxt() % 500) for _ in range(120)
        ]
        right_rows = {}
        for _ in range(60):
            k, ts = nxt() % 5, 1000 + nxt() % 500
            right_rows[(k, ts)] = ((k * 1000 + ts) % 997)  # unique ts per key
        lpdf = pd.DataFrame(left_rows, columns=["k", "ts"]).astype("int64")
        rpdf = pd.DataFrame(
            [(k, ts, v) for (k, ts), v in right_rows.items()],
            columns=["k", "ts", "v"],
        ).astype("int64")

        want = pd.merge_asof(
            lpdf.sort_values(["ts", "k"]).reset_index(drop=True),
            rpdf.sort_values(["ts", "k"]).reset_index(drop=True),
            on="ts",
            by="k",
            direction="backward",
        )

        got = (
            asof_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf.rename(columns={"ts": "rts"})),
                on="k",
                left_ts="ts",
                right_ts="rts",
                value_cols=["v"],
            )
            .select("k", "ts", F.col("asof_v").alias("v"))
            .toPandas()
        )

        wkey = want.fillna(-1).groupby(["k", "ts"])["v"].apply(sorted).to_dict()
        gkey = got.fillna(-1).groupby(["k", "ts"])["v"].apply(sorted).to_dict()
        assert gkey == wkey, f"trial {trial}"


def test_range_join_matches_naive_theta_randomized(spark):
    """The bucketed range join must equal the naive theta join on random
    point/interval sets spanning many bucket widths (intervals of width 0,
    exact boundary hits, and intervals far wider than the bucket)."""
    import pandas as pd
    import pyspark.sql.functions as F

    state = 4242
    def nxt():
        nonlocal state
        state = (state * 1103515245 + 12345) % (1 << 31)
        return state

    pts = pd.DataFrame(
        [(i, nxt() % 1000) for i in range(150)], columns=["pid", "x"]
    ).astype("int64")
    ivs = []
    for j in range(60):
        lo = nxt() % 1000
        width = (nxt() % 4) * (nxt() % 80)  # includes zero-width
        ivs.append((j, lo, lo + width))
    ivs = pd.DataFrame(ivs, columns=["iid", "lo", "hi"]).astype("int64")

    left = spark.createDataFrame(pts)
    right = spark.createDataFrame(ivs)
    got = (
        range_join(left, right, "x", "lo", "hi", bucket_width=50)
        .select("pid", "iid")
        .toPandas()
    )
    want = (
        left.join(right, (F.col("lo") <= F.col("x")) & (F.col("x") < F.col("hi")))
        .select("pid", "iid")
        .toPandas()
    )
    g = set(map(tuple, got.itertuples(index=False)))
    w = set(map(tuple, want.itertuples(index=False)))
    assert g == w


def test_scd2_golden_changelog(spark):
    """Hand-built changelog: runs compress, ranges chain, current row is
    open-ended — the SCD2 contract on a case small enough to eyeball."""
    import datetime as dt

    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark import registry

    rows = [
        # custkey, priority, date, orderkey
        (1, "LOW", dt.datetime(2024, 1, 1), 10),
        (1, "LOW", dt.datetime(2024, 1, 5), 11),   # same value -> compressed
        (1, "HIGH", dt.datetime(2024, 2, 1), 12),  # change
        (1, "LOW", dt.datetime(2024, 3, 1), 13),   # change back (new version)
        (2, "MED", dt.datetime(2024, 1, 2), 20),   # single-version key
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderpriority string, o_orderdate timestamp, o_orderkey long"
    )
    df.createOrReplaceTempView("_scd2_golden_src")

    # run the registered builder against a temp view via monkeypatched loader
    from etl_covid19_brasil_spark.queries import windows as wmod

    w = (
        df.withColumn("prev", F.lag("o_orderpriority").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
    )
    # call the real query logic by substituting the table loader
    import etl_covid19_brasil_spark.registry as reg

    orig_T = reg.load_table
    try:
        reg.load_table = lambda spark, sf, name: df  # noqa: ARG005
        out = {
            (r["o_custkey"], r["version"]): (r["priority"], r["is_current"])
            for r in wmod.scd2_dimension_build(spark, "ignored").collect()
        }
    finally:
        reg.load_table = orig_T

    assert out[(1, 1)] == ("LOW", False)
    assert out[(1, 2)] == ("HIGH", False)
    assert out[(1, 3)] == ("LOW", True)
    assert out[(2, 1)] == ("MED", True)
    assert len(out) == 4  # the duplicate LOW row was compressed away
