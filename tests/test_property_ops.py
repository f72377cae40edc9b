"""Property-based differentials for the composite operators Spark lacks
natively (SURVEY.md §5 layer 3 applied to operators/): the fixed-corpus
oracle sweep (tests/test_oracle.py) checks each operator on ONE data
shape; these generate adversarial small inputs — duplicate timestamps,
heavy key skew, ties, empty sides — and compare against an independent
reference implementation (pandas.merge_asof / plain join / a pure-Python
fold). Examples stay tiny (<=30 rows) so each Spark round-trip is fast;
the value is in the shapes hypothesis finds, not the volume.
"""

from __future__ import annotations

import pandas as pd
import pytest

# full-lane tier (r15, VERDICT r14 item 6): hypothesis differentials vs naive references (~5 min)
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from etl_covid19_brasil_spark.operators.joins import asof_join
from etl_covid19_brasil_spark.operators.skew import salted_join
from etl_covid19_brasil_spark.operators.topk import top_k_per_group

PROP = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="session")
def spark_global(spark):
    # hypothesis forbids function-scoped fixtures; alias the session one
    return spark


# --- as-of join vs pandas.merge_asof ---------------------------------------

_left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40)), min_size=1, max_size=25
)
# right side unique on (key, ts): equal-ts duplicate resolution is a
# documented house rule pandas does not share, pinned separately
_right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40)), min_size=1, max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@given(left=_left_rows, right=_right_rows, direction=st.sampled_from(["backward", "forward"]))
@PROP
def test_asof_join_matches_pandas_merge_asof(spark_global, left, right, direction):
    spark = spark_global
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lts long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right], "k long, rts long, val long"
    )
    got = {
        r["lid"]: r["asof_val"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            value_cols=["val"], direction=direction,
        ).collect()
    }

    lpd = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(left)],
                       columns=["lid", "k", "lts"]).sort_values(["lts", "lid"])
    rpd = pd.DataFrame([(k, t, k * 1000 + t) for (k, t) in right],
                       columns=["k", "rts", "val"]).sort_values("rts")
    m = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="k", direction=direction
    )
    want = {
        int(r.lid): (None if pd.isna(r.val) else int(r.val))
        for r in m.itertuples()
    }
    assert got == want


# --- salted join vs plain join on skewed data ------------------------------

_skewed_fact = st.lists(
    # 0 is the hot key (~2/3 of draws land on it via the biased sample)
    st.tuples(st.sampled_from([0, 0, 0, 0, 1, 2, 3, 4]), st.integers(0, 99)),
    min_size=1,
    max_size=30,
)
_dim_keys = st.sets(st.integers(0, 5), min_size=0, max_size=6)


@given(fact=_skewed_fact, dim_keys=_dim_keys, how=st.sampled_from(["inner", "left"]))
@PROP
def test_salted_join_matches_plain_join_under_skew(spark_global, fact, dim_keys, how):
    spark = spark_global
    fdf = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(fact)], "fid long, k long, v long"
    )
    schema = "k long, dval long"
    ddf = spark.createDataFrame([(k, k * 10) for k in sorted(dim_keys)], schema)

    plain = fdf.join(ddf, "k", how)
    salted = salted_join(fdf, ddf, on="k", factor=4, how=how,
                         salt_source=F.col("fid"))
    cols = sorted(plain.columns)

    def rows(df):
        # None-safe sort key: unmatched left-join rows carry NULL dval
        return sorted(
            (tuple(r[c] for c in cols) for r in df.collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    assert rows(salted) == rows(plain)


# --- top-k per group (native WindowGroupLimit plan) vs pandas --------------

_grouped_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-5, 5)), min_size=1, max_size=30
)


@given(rows=_grouped_rows, k=st.integers(1, 4))
@PROP
def test_top_k_per_group_matches_pandas(spark_global, rows, k):
    spark = spark_global
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "rid long, g long, v long"
    )
    got = sorted(
        (r["g"], r["v"], r["rid"], r["rn"])
        for r in top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("rid").asc()], k
        ).collect()
    )

    pdf = pd.DataFrame([(i, g, v) for i, (g, v) in enumerate(rows)],
                       columns=["rid", "g", "v"])
    pdf = pdf.sort_values(["v", "rid"], ascending=[False, True], kind="mergesort")
    pdf["rn"] = pdf.groupby("g", sort=False).cumcount() + 1
    top = pdf[pdf["rn"] <= k]
    want = sorted(
        (int(r.g), int(r.v), int(r.rid), int(r.rn)) for r in top.itertuples()
    )
    assert got == want


# --- bloom semi-join: no false negatives on random key sets ----------------

_fact_keys = st.lists(st.integers(-100, 100), min_size=1, max_size=30)
_filter_keys = st.sets(st.integers(-100, 100), min_size=0, max_size=20)


@given(fact_keys=_fact_keys, filter_keys=_filter_keys)
@PROP
def test_bloom_semi_join_matches_plain_semi_join(spark_global, fact_keys, filter_keys):
    """The bloom prefilter may pass false POSITIVES (the exact semi join
    behind it removes them) but never false negatives — so the composed
    operator must equal the plain left_semi join on any key sets,
    including negatives, disjoint sets, and an empty filter side."""
    from etl_covid19_brasil_spark.operators.bloom import bloom_semi_join

    spark = spark_global
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "fid long, k long"
    )
    filt = spark.createDataFrame(
        [(k,) for k in sorted(filter_keys)], "fk long"
    )
    got = sorted(r["fid"] for r in bloom_semi_join(fact, filt, "k", "fk").collect())
    want = sorted(
        r["fid"]
        for r in fact.join(filt, fact["k"] == filt["fk"], "left_semi").collect()
    )
    assert got == want


# --- bucketed range join vs naive cross-join + filter ----------------------

_points = st.lists(st.integers(-20, 20), min_size=1, max_size=20)
_intervals = st.lists(
    st.tuples(st.integers(-20, 20), st.integers(0, 10)),  # (lo, width)
    min_size=1, max_size=15,
)


@given(points=_points, intervals=_intervals, width=st.sampled_from([1, 2, 5]))
@settings(
    # both plans in one example cost several Spark jobs — fewer, bigger
    # examples keep this test's wall-clock in line with the others
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_range_join_matches_naive_theta_join(spark_global, points, intervals, width):
    """range_join's bucket-replication + residual filter must equal the
    naive crossJoin theta plan on any point/interval mix — including
    empty intervals (lo == hi matches nothing: hi is exclusive), points
    on interval edges, and intervals spanning many buckets."""
    from etl_covid19_brasil_spark.operators.joins import range_join

    spark = spark_global
    l = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, pt long"
    )
    r = spark.createDataFrame(
        [(j, lo, lo + w) for j, (lo, w) in enumerate(intervals)],
        "iid long, lo long, hi long",
    )
    got = sorted(
        (x["pid"], x["iid"])
        for x in range_join(l, r, "pt", "lo", "hi", bucket_width=width).collect()
    )
    want = sorted(
        (x["pid"], x["iid"])
        for x in l.crossJoin(r)
        .filter((F.col("lo") <= F.col("pt")) & (F.col("pt") < F.col("hi")))
        .collect()
    )
    assert got == want


# --- SCD2 / CDC / interval family vs pure-Python folds ---------------------
#
# These drive the REGISTERED queries (the real code path, not a test-local
# copy): each example writes its generated change stream as orders.parquet
# in a temp dir and calls the query on that dir. The generated shapes are
# the high-semantic-risk ones: duplicate change timestamps, same-day
# flip-flops, tombstone-last streams, touching-vs-overlapping interval
# boundaries.

import datetime as _dt
import shutil as _shutil
import tempfile as _tempfile

_EPOCH = _dt.datetime(2020, 1, 1)

# (custkey 0-2, day 0-5, priority from a 2-letter alphabet): tiny domains
# force same-day ties and flip-flop runs constantly
_scd2_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.sampled_from(["A", "B"])),
    min_size=1, max_size=20,
)


def _write_orders(spark, rows):
    """rows: [(custkey, day, priority)] -> temp dir with orders.parquet
    (o_orderkey = list index: unique, the deterministic tie-breaker)."""
    d = _tempfile.mkdtemp(prefix="prop_orders_")
    pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_custkey": [k for k, _, _ in rows],
            "o_orderstatus": "O",
            "o_totalprice": [float(k * 10 + day) for k, day, _ in rows],
            "o_orderdate": [_EPOCH + _dt.timedelta(days=day) for _, day, _ in rows],
            "o_orderpriority": [p for _, _, p in rows],
        }
        # micros, not pandas' default nanos — TIMESTAMP(NANOS) parquet is
        # only readable through load_table's events-specific legacy path
    ).astype({"o_orderdate": "datetime64[us]"}).to_parquet(f"{d}/orders.parquet")
    return d


def _scd2_fold(rows):
    """Independent SCD2 compress: lag-compare over (date, orderkey) order,
    then version/valid_to per key. Returns {(key, version): (priority,
    valid_from_day, valid_to_day|None, is_current)}."""
    per_key: dict[int, list] = {}
    for okey, (k, day, pr) in enumerate(rows):
        per_key.setdefault(k, []).append((day, okey, pr))
    out = {}
    for k, rws in per_key.items():
        rws.sort()
        transitions = [
            (day, okey, pr)
            for i, (day, okey, pr) in enumerate(rws)
            if i == 0 or pr != rws[i - 1][2]
        ]
        for i, (day, okey, pr) in enumerate(transitions):
            nxt = transitions[i + 1][0] if i + 1 < len(transitions) else None
            out[(k, i + 1)] = (pr, day, nxt, nxt is None)
    return out


@given(rows=_scd2_rows)
@PROP
def test_scd2_dimension_build_matches_fold(spark_global, rows):
    from etl_covid19_brasil_spark import registry

    spark = spark_global
    d = _write_orders(spark, rows)
    try:
        got = {
            (r["o_custkey"], r["version"]): (
                r["priority"],
                (r["valid_from"] - _EPOCH).days,
                None if r["valid_to"] is None else (r["valid_to"] - _EPOCH).days,
                r["is_current"],
            )
            for r in registry.all_specs()["scd2_dimension_build"].spark(spark, d).collect()
        }
    finally:
        _shutil.rmtree(d, ignore_errors=True)
    assert got == _scd2_fold(rows)


@given(rows=_scd2_rows)
@PROP
def test_scd2_asof_lookup_matches_fold(spark_global, rows):
    """Every fact (event at its order date + 30d) must land in exactly
    the dimension version effective then — half-open [from, to) ranges,
    open-ended current row."""
    from etl_covid19_brasil_spark import registry

    spark = spark_global
    d = _write_orders(spark, rows)
    try:
        got = sorted(
            (r["fact_key"], r["o_custkey"], r["priority"], r["version"])
            for r in registry.all_specs()["scd2_asof_lookup"].spark(spark, d).collect()
        )
    finally:
        _shutil.rmtree(d, ignore_errors=True)

    dim = _scd2_fold(rows)  # {(key, version): (pr, from_day, to_day|None, cur)}
    want = []
    for okey, (k, day, _pr) in enumerate(rows):
        ed = day + 30
        for (kk, version), (pr, frm, to, _cur) in dim.items():
            if kk == k and frm <= ed and (to is None or ed < to):
                want.append((okey, k, pr, version))
    assert got == sorted(want)


# CDC: op is derived from o_orderkey % 10 (D / U / I), seq = o_orderkey.
# Generating the custkey list and deriving keys 0..n-1 as orderkeys means
# hypothesis controls which op each key's LAST change is — including
# tombstone-last (key vanishes) and tombstone-then-reinsert orders.
_cdc_rows = st.lists(st.integers(0, 3), min_size=1, max_size=25)


@given(custkeys=_cdc_rows)
@PROP
def test_cdc_apply_changes_matches_fold(spark_global, custkeys):
    from etl_covid19_brasil_spark import registry

    spark = spark_global
    rows = [(k, 0, "A") for k in custkeys]  # day/priority unused by CDC
    d = _write_orders(spark, rows)
    try:
        got = {
            r["key"]: (r["applied_seq"], r["last_op"], r["val_cents"])
            for r in registry.all_specs()["cdc_apply_changes"].spark(spark, d).collect()
        }
    finally:
        _shutil.rmtree(d, ignore_errors=True)

    want = {}
    for k in set(custkeys):
        seq = max(okey for okey, kk in enumerate(custkeys) if kk == k)
        op = "D" if seq % 10 == 0 else ("U" if seq % 10 < 4 else "I")
        if op != "D":
            want[k] = (seq, op, round((k * 10 + 0) * 100))
    assert got == want


# Interval merge: interval = [orderdate, orderdate + orderkey%20 days].
# Day domain 0-5 with widths 0-19 makes touching (s == running max e),
# contained, and overlapping intervals all common.
@given(rows=_scd2_rows)
@PROP
def test_win_interval_merge_matches_fold(spark_global, rows):
    from etl_covid19_brasil_spark import registry

    spark = spark_global
    d = _write_orders(spark, rows)
    try:
        got = sorted(
            (
                r["o_custkey"],
                r["island"],
                (r["merged_from"] - _EPOCH.date()).days,
                (r["merged_to"] - _EPOCH.date()).days,
                r["n_intervals"],
            )
            for r in registry.all_specs()["win_interval_merge"].spark(spark, d).collect()
        )
    finally:
        _shutil.rmtree(d, ignore_errors=True)

    per_key: dict[int, list] = {}
    for okey, (k, day, _pr) in enumerate(rows):
        per_key.setdefault(k, []).append((day, day + okey % 20))
    want = []
    for k, ivs in per_key.items():
        ivs.sort()
        island, max_e = 0, None
        cur = None  # (from, to, count)
        for s, e in ivs:
            if max_e is not None and s > max_e:
                want.append((k, island, *cur))
                island += 1
                cur = None
            if cur is None:
                cur = (s, e, 1)
            else:
                cur = (min(cur[0], s), max(cur[1], e), cur[2] + 1)
            max_e = e if max_e is None else max(max_e, e)
        want.append((k, island, *cur))
    assert got == sorted(want)


# --- chunked-window rewrites vs plain-window folds -------------------------
#
# The fixed-shape equality tests (tests/test_scale_ops.py) pin one hot
# distribution; these let hypothesis pick arbitrary key/order/value mixes
# — including all-one-key, all-distinct-keys, duplicate order values, and
# negative values — with a small partition count forcing every key to
# span chunks.

_cw_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 10), st.integers(-5, 5)),
    min_size=1, max_size=30,
)


@given(rows=_cw_rows)
@PROP
def test_chunked_running_sum_matches_fold(spark_global, rows):
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_running_sum

    spark = spark_global
    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rows)],
        "k long, t long, tb long, v long",
    )
    got = {
        (r["k"], r["tb"]): r["rs"]
        for r in chunked_running_sum(
            df, keys=["k"], order=["t", "tb"], value="v", out="rs",
            num_partitions=4,
        ).collect()
    }
    want, acc = {}, {}
    for k, t, tb, v in sorted(
        ((k, t, i, v) for i, (k, t, v) in enumerate(rows)),
        key=lambda r: (r[0], r[1], r[2]),
    ):
        acc[k] = acc.get(k, 0) + v
        want[(k, tb)] = acc[k]
    assert got == want


@given(rows=_cw_rows, gap=st.sampled_from([1, 3, 7]))
@PROP
def test_chunked_sessionize_matches_fold(spark_global, rows, gap):
    import datetime as dt

    from etl_covid19_brasil_spark.operators.chunked_window import chunked_sessionize

    spark = spark_global
    base = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=t), i) for i, (k, t, _v) in enumerate(rows)],
        "k long, ts timestamp, tb long",
    )
    gap_us = gap * 1_000_000
    got = {
        (r["k"], r["tb"]): r["session_seq"]
        for r in chunked_sessionize(
            df, key="k", ts="ts", tiebreak="tb", gap_us=gap_us, num_partitions=4
        ).collect()
    }
    want = {}
    prev_t, seq = {}, {}
    for k, t, tb in sorted(
        ((k, t, i) for i, (k, t, _v) in enumerate(rows)),
        key=lambda r: (r[0], r[1], r[2]),
    ):
        if k not in prev_t or (t - prev_t[k]) * 1_000_000 > gap_us:
            seq[k] = seq.get(k, 0) + 1
        prev_t[k] = t
        want[(k, tb)] = seq[k]
    assert got == want


@given(rows=_cw_rows)
@PROP
def test_chunked_scd2_matches_fold(spark_global, rows):
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_scd2

    spark = spark_global
    # value from a 2-letter alphabet derived from v's sign: flip-flops
    df = spark.createDataFrame(
        [(k, "A" if v >= 0 else "B", t, i) for i, (k, t, v) in enumerate(rows)],
        "k long, val string, t long, tb long",
    )
    got = {
        (r["k"], r["version"]): (r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in chunked_scd2(
            df, key="k", value="val", ts="t", tiebreak="tb", num_partitions=4
        ).collect()
    }
    per_key = {}
    for i, (k, t, v) in enumerate(rows):
        per_key.setdefault(k, []).append((t, i, "A" if v >= 0 else "B"))
    want = {}
    for k, rws in per_key.items():
        rws.sort()
        tr = [
            (t, val)
            for j, (t, _i, val) in enumerate(rws)
            if j == 0 or val != rws[j - 1][2]
        ]
        for j, (t, val) in enumerate(tr):
            nxt = tr[j + 1][0] if j + 1 < len(tr) else None
            want[(k, j + 1)] = (val, t, nxt, nxt is None)
    assert got == want


# --- text queries vs DuckDB oracle on adversarial Unicode ------------------
#
# The sf corpora are lowercase ASCII word-soup, so the oracle sweep never
# exercises the text pipeline on the inputs a real crawl delivers: emoji,
# CJK, combining marks, newlines, quotes, regex metacharacters. Spark and
# DuckDB embed DIFFERENT regex engines (java.util.regex vs RE2), so the
# shared tokenizer contract (`[^a-z0-9 ]` -> space) is only proven equal
# where it has been tested. These run the REGISTERED queries against
# their own oracle SQL over a generated documents.parquet.

_nasty_fragment = st.one_of(
    st.text(
        alphabet=st.sampled_from(
            list("abc 019 \t\n'\",.\\[](){}|^$*+?") + ["é", "ß", "中", "文", "🎉", "👍", "́", "‍", "�"]
        ),
        min_size=0,
        max_size=20,
    ),
    # coherent fragments so the markup/PII regexes actually MATCH, not
    # just scan: tags, entities, emails, phones, IPs, URLs — plus
    # truncated/malformed variants of each
    st.sampled_from(
        [
            "<b>bold</b>", "<p class='x'>", "</p>", "<script>x=1</script>",
            "&amp;", "&#39;", "<not closed", "a < b > c",
            "user@example.com", "a.b@c.d.e", "@nouser", "user@",
            "555-867-5309", "(12) 3456-7890", "12345",
            "192.168.1.1", "999.1.1.1", "http://x.y/z?q=1", "https://",
        ]
    ),
)
_nasty_text = st.lists(
    st.lists(_nasty_fragment, min_size=0, max_size=5).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=_nasty_text)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.parametrize(
    "qname",
    [
        "text_tokenize_freq",
        "text_stats",
        "exact_dedup",
        # the heavy-regex pair — the most engine-divergence-prone surface
        "text_strip_markup",
        "text_scrub_pii",
    ],
)
def test_text_queries_match_oracle_on_adversarial_unicode(spark_global, qname, texts):
    import duckdb

    from etl_covid19_brasil_spark import registry
    from etl_covid19_brasil_spark.oracle import compare_frames

    spark = spark_global
    d = _tempfile.mkdtemp(prefix="prop_docs_")
    try:
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["xx"] * len(texts),
                "source": ["gen"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ).to_parquet(f"{d}/documents.parquet")
        spec = registry.all_specs()[qname]
        got = spec.spark(spark, d).toPandas()
        con = duckdb.connect()
        try:
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
            )
            want = con.execute(spec.oracle).fetchdf()
        finally:
            con.close()
        ok, detail = compare_frames(got, want)
        assert ok, f"{qname} diverged on {texts!r}: {detail}"
    finally:
        _shutil.rmtree(d, ignore_errors=True)


@given(rows=_cw_rows, frame_w=st.sampled_from([2, 3, 5]))
@PROP
def test_chunked_moving_frame_matches_fold(spark_global, rows, frame_w):
    """Bounded-frame variant — tiny keys over 4 partitions force 1-row
    chunks constantly, so the multi-hop ghost selection is on the hot
    path of almost every example."""
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_moving_frame

    spark = spark_global
    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rows)],
        "k long, t long, tb long, v long",
    )
    got = {
        (r["k"], r["tb"]): (r["frame_sum"], r["frame_cnt"])
        for r in chunked_moving_frame(
            df, key="k", order=["t", "tb"], value="v", frame_w=frame_w,
            num_partitions=4,
        ).collect()
    }
    want = {}
    per_key: dict = {}
    for k, t, tb, v in sorted(
        ((k, t, i, v) for i, (k, t, v) in enumerate(rows)),
        key=lambda r: (r[0], r[1], r[2]),
    ):
        hist = per_key.setdefault(k, [])
        hist.append(v)
        frame = hist[-frame_w:]
        want[(k, tb)] = (sum(frame), len(frame))
    assert got == want


# --- chunked-window rewrites on NULL keys vs the plain windows --------------
#
# Window.partitionBy treats NULL as an ordinary partition value, and the
# chunked rewrites claim bit-identity with their plain twins — so the
# stitching joins must be null-safe (ADVICE r10: plain equi-joins silently
# chunk-restarted NULL-key groups that span a range-partition boundary).
# The reference here is the PLAIN Spark window on the same data, so NULL
# semantics are owned by Spark on both sides; every example is filtered to
# contain NULL keys, and num_partitions=4 over <=30 rows forces keys
# (including the NULL group) to span chunk boundaries constantly.

_cw_rows_nullkey = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 1)),
        st.integers(0, 10),
        st.integers(-5, 5),
    ),
    min_size=2,
    max_size=30,
).filter(lambda rs: sum(k is None for k, _, _ in rs) >= 2)


@given(rows=_cw_rows_nullkey)
@PROP
def test_chunked_running_sum_null_keys_match_plain_window(spark_global, rows):
    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.operators.chunked_window import chunked_running_sum

    spark = spark_global
    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rows)],
        "k long, t long, tb long, v long",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {r["tb"]: r["rs"] for r in df.withColumn("rs", F.sum("v").over(w)).collect()}
    got = {
        r["tb"]: r["rs"]
        for r in chunked_running_sum(
            df, keys=["k"], order=["t", "tb"], value="v", out="rs", num_partitions=4
        ).collect()
    }
    assert got == want


@given(rows=_cw_rows_nullkey, gap=st.sampled_from([1, 3]))
@PROP
def test_chunked_sessionize_null_keys_match_plain_window(spark_global, rows, gap):
    import datetime as dt

    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.operators.chunked_window import chunked_sessionize

    spark = spark_global
    base = dt.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=t), i) for i, (k, t, _v) in enumerate(rows)],
        "k long, ts timestamp, tb long",
    )
    gap_us = gap * 1_000_000
    w = Window.partitionBy("k").orderBy("ts", "tb")
    gap_col = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flag = F.when(gap_col.isNull() | (gap_col > gap_us), F.lit(1)).otherwise(F.lit(0))
    want = {
        r["tb"]: r["seq"]
        for r in df.withColumn("__f", flag)
        .withColumn(
            "seq", F.sum("__f").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .collect()
    }
    got = {
        r["tb"]: r["session_seq"]
        for r in chunked_sessionize(
            df, key="k", ts="ts", tiebreak="tb", gap_us=gap_us, num_partitions=4
        ).collect()
    }
    assert got == want


@given(rows=_cw_rows_nullkey)
@PROP
def test_chunked_scd2_null_keys_match_plain_window(spark_global, rows):
    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.operators.chunked_window import chunked_scd2

    spark = spark_global
    df = spark.createDataFrame(
        [(k, "A" if v >= 0 else "B", t, i) for i, (k, t, v) in enumerate(rows)],
        "k long, val string, t long, tb long",
    )
    w = Window.partitionBy("k").orderBy("t", "tb")
    prev = F.lag("val").over(w)
    plain = (
        df.withColumn(
            "__f", F.when(prev.isNull() | (prev != F.col("val")), 1).otherwise(0)
        )
        .withColumn("version", F.sum("__f").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(F.col("__f") == 1)
        .withColumn(
            "valid_to",
            F.lead("t").over(Window.partitionBy("k").orderBy("version")),
        )
    )
    key_of = lambda r: ("∅" if r["k"] is None else r["k"], r["version"])  # noqa: E731
    want = {
        key_of(r): (r["val"], r["t"], r["valid_to"], r["valid_to"] is None)
        for r in plain.collect()
    }
    got = {
        key_of(r): (r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in chunked_scd2(
            df, key="k", value="val", ts="t", tiebreak="tb", num_partitions=4
        ).collect()
    }
    assert got == want


@given(rows=_cw_rows_nullkey, frame_w=st.sampled_from([2, 3]))
@PROP
def test_chunked_moving_frame_null_keys_match_plain_window(spark_global, rows, frame_w):
    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.operators.chunked_window import chunked_moving_frame

    spark = spark_global
    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rows)],
        "k long, t long, tb long, v long",
    )
    w = Window.partitionBy("k").orderBy("t", "tb").rowsBetween(-(frame_w - 1), 0)
    want = {
        r["tb"]: (r["fs"], r["fc"])
        for r in df.withColumn("fs", F.sum("v").over(w))
        .withColumn("fc", F.count(F.lit(1)).over(w))
        .collect()
    }
    got = {
        r["tb"]: (r["frame_sum"], r["frame_cnt"])
        for r in chunked_moving_frame(
            df, key="k", order=["t", "tb"], value="v", frame_w=frame_w,
            num_partitions=4,
        ).collect()
    }
    assert got == want
