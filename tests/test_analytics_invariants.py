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


def test_pit_horizons_are_monotone(spark):
    """Trailing windows nest: orders_7d <= orders_30d <= orders_90d on
    every event, and all are non-negative."""
    for r in _q(spark, "features_pit_order_counts").collect():
        assert 0 <= r.orders_7d <= r.orders_30d <= r.orders_90d, r


def test_active_user_curves_nest(spark):
    """DAU <= WAU <= MAU per day (a day's actives are inside its trailing
    week, a week's inside its trailing month)."""
    rows = _q(spark, "events_active_users_rolling").collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau <= r.mau, r


def test_lpm_levels_are_valid_and_all_exercised(spark):
    """prefix_len is one of {0, 8, 16, 24}; every level occurs (the block
    samples are sized for non-vacuity), and a matched row's label
    encodes its own level."""
    rows = _q(spark, "join_ip_longest_prefix").collect()
    seen = set()
    for r in rows:
        assert r.prefix_len in (0, 8, 16, 24), r
        if r.prefix_len:
            assert r.block_label.startswith(f"blk{r.prefix_len}_"), r
        else:
            assert r.block_label == "unmatched", r
        seen.add(r.prefix_len)
    assert seen == {0, 8, 16, 24}, seen


def test_concurrency_sweep_opens_and_closes(spark):
    """The +1/-1 sweep's closure property: counts are never negative and
    the final day's running count is exactly zero (every open interval
    eventually closes)."""
    rows = sorted(_q(spark, "agg_peak_concurrency").collect(), key=lambda r: r.day)
    assert rows
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0, rows[-1]
    assert any(r.is_peak for r in rows)


def test_neyman_allocation_sums_to_budget(spark):
    rows = _q(spark, "sample_neyman_allocation").collect()
    assert sum(r.alloc_n for r in rows) == 10_000
    assert all(r.s_dollars >= 0 for r in rows)


def test_curation_pipeline_respects_quota_and_shards(spark):
    """Composed-pipeline contract: per-lang doc totals never exceed the
    60-doc quota, shard ids stay in [0, 8), and at least two shards per
    surviving language are populated (hash spreading)."""
    rows = _q(spark, "pipeline_curation_end_to_end").collect()
    assert rows
    per_lang: dict = {}
    for r in rows:
        assert 0 <= r.shard < 8, r
        per_lang.setdefault(r.lang, []).append(r)
    for lang, cells in per_lang.items():
        assert sum(c.n_docs for c in cells) <= 60, (lang, cells)
        assert len(cells) >= 2, (lang, cells)


def test_rolling_hll_tracks_exact_wau(spark):
    """The sketch tier must track the exact trailing-7-day distinct
    counts within 5% on every day (lgK=12 standard accuracy ~1.6% RSE)
    — the mergeability-correctness pin for the daily-sketch + window-
    union pattern."""
    from etl_covid19_brasil_spark.registry import all_specs

    sf = SF
    specs = all_specs()
    exact = {
        r["day"]: r["wau"]
        for r in specs["events_active_users_rolling"].spark(spark, sf).collect()
    }
    est = {
        r["day"]: r["wau_est"]
        for r in specs["events_active_users_rolling_hll"].spark(spark, sf).collect()
    }
    assert set(est) == set(exact)
    for day, wau in exact.items():
        assert abs(est[day] - wau) / wau <= 0.05, (day, est[day], wau)


def test_hll_overlap_tracks_exact_intersection(spark):
    """Inclusion-exclusion overlap must track the exact |viewers ∩
    purchasers| within 10% (compounded-error tolerance, see docstring)."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.registry import all_specs

    e = load_table(spark, SF, "events")
    viewers = {r["user_id"] for r in e.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    buyers = {r["user_id"] for r in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    exact = len(viewers & buyers)
    row = all_specs()["agg_hll_overlap_estimate"].spark(spark, SF).collect()[0]
    assert exact > 0
    assert abs(row["overlap_est"] - exact) / exact <= 0.10, (row, exact)
    assert abs(row["union_est"] - len(viewers | buyers)) / len(viewers | buyers) <= 0.05


def test_theta_set_algebra_tracks_exact(spark):
    """Theta intersection/difference/union estimates must track exact set
    algebra within 10% each — and the three must be mutually consistent
    (|A∪B| ~= |A∩B| + |A\\B| + |B\\A| is NOT asserted since each carries
    independent error; per-quantity accuracy is the contract)."""
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.io import load_table
    from etl_covid19_brasil_spark.registry import all_specs

    e = load_table(spark, SF, "events")
    viewers = {r["user_id"] for r in e.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    buyers = {r["user_id"] for r in e.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    row = all_specs()["agg_theta_set_algebra"].spark(spark, SF).collect()[0]
    assert len(viewers & buyers) > 0
    for est, exact in [
        (row["both_est"], len(viewers & buyers)),
        (row["viewers_only_est"], len(viewers - buyers)),
        (row["either_est"], len(viewers | buyers)),
    ]:
        if exact == 0:  # smoke corpus: every viewer may also purchase
            assert est <= 1, (est, exact)
        else:
            assert abs(est - exact) / exact <= 0.10, (est, exact)


def test_retrieval_quantization_boundaries_are_safe():
    """ADVICE r8: rank_tfidf_topk / rank_bm25_topk hash-exactness rests
    on JVM Math.log and libm log agreeing at every floor(x*1e6+0.5)
    quantization site. Make the assumption CHECKABLE: for the shipped
    corpora, every pre-floor value must sit >= 1e-6 quantization units
    away from a rounding boundary, so a 1-ulp log divergence (~1e-10
    relative) cannot flip any micro-unit."""
    import duckdb

    toks = ("'join'", "'vector'", "'stream'", "'filter'")
    inlist = ", ".join(toks)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        # tf-idf: one quantized value per query token
        dists = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')) AS token FROM documents),
        n_total AS (SELECT COUNT(*) AS n_docs FROM documents),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
               WHERE token IN ({inlist}) GROUP BY token)
        SELECT MIN(abs(x - round(x))) FROM (
          SELECT ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1000000.0 + 0.5 AS x
          FROM df, n_total)
        """).fetchone()[0]
        assert dists is not None and dists >= 1e-6, (sf, "tfidf", dists)
        # bm25: one quantized value per (doc, token) hit
        d2 = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')) AS token FROM documents),
        stats AS (SELECT COUNT(*) AS n_docs,
                         CAST(SUM(len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +'))) AS BIGINT) AS sum_dl
                  FROM documents),
        dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
               WHERE token IN ({inlist}) GROUP BY doc_id, token),
        dfs AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
                WHERE token IN ({inlist}) GROUP BY token)
        SELECT MIN(abs(x - round(x))) FROM (
          SELECT ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                 * (CAST(tf AS DOUBLE) * 2.2)
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                 * 1000000.0 + 0.5 AS x
          FROM tf JOIN dfs ON tf.token = dfs.token
                  JOIN dls ON tf.doc_id = dls.doc_id, stats)
        """).fetchone()[0]
        assert d2 is not None and d2 >= 1e-6, (sf, "bm25", d2)
        con.close()


def test_integer_division_semantics_match_across_engines(spark):
    """Half the registry's exactness rests on Spark `a DIV b` and DuckDB
    `a // b` agreeing on INTEGER operands — including NEGATIVE numerators
    (both truncate toward zero; DuckDB's `//` only floors for floats).
    Pin the full sign grid so an engine upgrade changing either side
    breaks CI instead of silently flipping quantized outputs (e.g.
    ts_excess_over_baseline's signed excess_ppm)."""
    import duckdb

    cases = [(a, b) for a in (-7, -6, -1, 0, 1, 6, 7, 1000001) for b in (2, 3, 7, -2)]
    values = ", ".join(f"({a}, {b})" for a, b in cases)
    got_spark = {
        (r["a"], r["b"]): r["q"]
        for r in spark.sql(
            f"SELECT a, b, a DIV b AS q FROM VALUES {values} t(a, b)"
        ).collect()
    }
    got_duck = {
        (a, b): duckdb.sql(f"SELECT {a} // ({b})").fetchone()[0] for a, b in cases
    }
    assert got_spark == got_duck
    # and both truncate toward zero (not floor) on the canonical case
    assert got_spark[(-7, 2)] == -3


def test_money_columns_are_two_decimal_by_contract():
    """cents() (registry.py) assumes every money column is a 2-decimal
    double, so ROUND(x*100) never sits on a .5 boundary where Spark's
    HALF_UP and another engine's HALF_EVEN could disagree. Verify the
    assumption on every shipped money column at every sf: x*100 is
    within 1e-6 of an integer for all rows."""
    import duckdb

    cols = {
        "orders": ["o_totalprice"],
        "lineitem": ["l_extendedprice", "l_discount", "l_tax", "l_quantity"],
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
        "part": ["p_retailprice"],
    }
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        for table, cs in cols.items():
            for c in cs:
                worst = duckdb.sql(
                    f"SELECT MAX(abs({c} * 100 - round({c} * 100))) "
                    f"FROM '{sf}/{table}.parquet'"
                ).fetchone()[0]
                assert worst is not None and worst < 1e-6, (sf, table, c, worst)
