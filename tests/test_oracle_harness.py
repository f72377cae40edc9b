"""Unit tests for the differential harness itself (oracle.compare_frames):
the whole correctness gate routes through this comparator, so its own
edge behavior — column order, row order, NaN/null, near-miss detection —
needs pinning as much as any operator."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_covid19_brasil_spark.oracle import compare_frames


def test_column_and_row_order_are_irrelevant():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"y": ["c", "a", "b"], "x": [3, 1, 2]})
    ok, detail = compare_frames(a, b)
    assert ok, detail


def test_value_difference_is_reported():
    a = pd.DataFrame({"x": [1, 2, 3]})
    b = pd.DataFrame({"x": [1, 2, 4]})
    ok, detail = compare_frames(a, b)
    assert not ok
    assert "x" in detail


def test_row_count_mismatch_is_reported():
    ok, detail = compare_frames(pd.DataFrame({"x": [1]}), pd.DataFrame({"x": [1, 1]}))
    assert not ok and "row count" in detail


def test_column_set_mismatch_is_reported():
    ok, detail = compare_frames(pd.DataFrame({"x": [1]}), pd.DataFrame({"y": [1]}))
    assert not ok and "column" in detail


def test_nulls_and_nans_compare_equal_to_themselves():
    a = pd.DataFrame({"x": [1.0, np.nan, None]})
    b = pd.DataFrame({"x": [None, 1.0, np.nan]})
    ok, detail = compare_frames(a, b)
    assert ok, detail


def test_bitwise_float_difference_fails():
    # the gate is bit-identity, not tolerance: 1 ulp must fail
    v = 1.0
    a = pd.DataFrame({"x": [v]})
    b = pd.DataFrame({"x": [np.nextafter(v, 2.0)]})
    ok, _ = compare_frames(a, b)
    assert not ok
