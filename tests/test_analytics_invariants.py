"""Semantic invariants for the r8 analytics/planning operators — the
properties the oracle hash CANNOT see (a hash proves Spark == DuckDB,
not that both compute the thing the operator claims). Each test states
an algebraic contract of the operator's definition and checks it on the
smoke corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_covid19_brasil_spark import registry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return registry.all_specs()[name].spark(spark, SF)


def test_apportionment_sums_exactly_and_stays_within_one_unit(spark):
    """Largest-remainder contract: allocations sum EXACTLY to the budget
    (the property float rounding breaks), and every allocation is within
    1 unit of its ideal proportional share (Hamilton's method never
    strays further on any single participant)."""
    rows = _q(spark, "corpus_token_apportion").collect()
    budget = 100_000
    assert sum(r.alloc_tokens for r in rows) == budget
    total = sum(r.toks for r in rows)
    for r in rows:
        ideal = budget * r.toks / total
        assert abs(r.alloc_tokens - ideal) < 1.0 + 1e-9, (r, ideal)


def test_survival_curve_is_monotone_and_conserves_cohort(spark):
    """Survival contract: survivors never increase over the horizon,
    cumulative conversions + survivors == cohort on every row, and
    day 0 starts from the full cohort minus same-day converters."""
    rows = sorted(_q(spark, "events_survival_curve").collect(), key=lambda r: r.day)
    assert rows, "empty curve"
    cohort = rows[0].n_surviving + rows[0].n_converted_cum
    prev = None
    for r in rows:
        assert r.n_converted_cum + r.n_surviving == cohort, r
        if prev is not None:
            assert r.n_surviving <= prev.n_surviving, (prev, r)
            assert r.n_converted_cum == prev.n_converted_cum + r.n_converted_day, r
        prev = r


def test_ewma_lies_within_trailing_window_envelope(spark):
    """A convex combination of the last 8 observations can never leave
    their [min, max] envelope; milli-quantization may touch the floor of
    the min. Catches weight/denominator bugs the oracle can't (the
    oracle replays the same formula)."""
    rows = sorted(_q(spark, "win_ewma_truncated").collect(), key=lambda r: r.day)
    window: list[int] = []
    for r in rows:
        window.append(r.rev)
        tail = window[-8:]
        assert min(tail) * 1000 - 1000 <= r.ewma_milli_cents <= max(tail) * 1000, r


def test_id_assign_is_a_gap_free_permutation(spark):
    """Contiguity contract: ids are exactly 1..N with no gaps or dupes —
    the property monotonically_increasing_id does NOT provide."""
    rows = _q(spark, "id_assign_contiguous").collect()
    ids = sorted(r.rid for r in rows)
    assert ids == list(range(1, len(rows) + 1))


def test_winsorize_clip_counts_respect_tail_bounds(spark):
    """Rank-percentile contract: at most ~5% of each group clips on each
    tail (ceil boundaries allow the discrete overshoot of one value's
    multiplicity at the cutpoint, so assert a loose 10% ceiling), and
    cutpoints are ordered."""
    for r in _q(spark, "dq_winsorize_clip").collect():
        assert r.p05_cents <= r.p95_cents, r
        assert r.n_clip_low <= r.n * 0.10 + 1, r
        assert r.n_clip_high <= r.n * 0.10 + 1, r


def test_upsample_multiplicity_matches_weight_floor_or_ceil(spark):
    """Stochastic-rounding contract: every document appears either
    floor(w) or ceil(w) times for its language's weight — never 0 for
    weights >= 1, never more than ceil(w)."""
    weights = {"en": 700, "de": 1500, "es": 2300, "zh": 1000}
    default = 3400
    counts = (
        _q(spark, "corpus_upsample_weighted")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("m"))
        .collect()
    )
    assert counts
    for r in counts:
        wm = weights.get(r.lang, default)
        lo, hi = wm // 1000, wm // 1000 + (1 if wm % 1000 else 0)
        assert lo <= r.m <= max(hi, 1), (r, wm)
