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
