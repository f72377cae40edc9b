"""Window functions (SURVEY.md §2.5).

The reference's covid table is a per-municipality daily series whose
precomputed columns (``order_for_place`` = row_number per place,
``new_confirmed`` = lag-diff per place) are exactly these windows; here
they run over the orders/lineitem series per customer/part.

Execution note: every query here costs ONE hash shuffle on the partition
key plus a per-partition sort; unpartitioned windows (global rank) are
single-reducer and only appear over dim-scale inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from etl_covid19_brasil_spark.registry import T, cents, query

# per-customer order history, ordered by date with orderkey tie-break
# (o_orderdate has day resolution => ties are common; the tie-break makes
# every row-frame window deterministic).
_W = "PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC"


def _orders_w(spark: SparkSession, sf: str):
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return T(spark, sf, "orders"), w


@query(
    "win_row_number",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER ({_W}) AS order_seq
    FROM orders
    """,
    section="2.5",
    doc="row_number per customer — the reference's order_for_place column "
    "(FIXTURES.md A1) rebuilt as a window.",
)
def win_row_number(spark: SparkSession, sf: str) -> DataFrame:
    o, w = _orders_w(spark, sf)
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("order_seq"))


@query(
    "win_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           RANK()        OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank,
           DENSE_RANK()  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_dense_rank,
           NTILE(4)      OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_quartile
    FROM customer
    """,
    section="2.5",
    doc="rank / dense_rank / ntile over one shared partitioned ordering.",
)
def win_rank_dense_ntile(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return T(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "win_lag_lead",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice, 1, 0.0)  OVER ({_W}) AS prev_price,
           LEAD(o_totalprice, 1, 0.0) OVER ({_W}) AS next_price,
           ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER ({_W}), 2) AS price_delta
    FROM orders
    """,
    section="2.5",
    doc="lag/lead with defaults — the reference's new_confirmed = "
    "confirmed - lag(confirmed) rebuilt (FIXTURES.md A1). The delta of two "
    "2-decimal doubles is rounded back to cents in both engines.",
)
def win_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    o, w = _orders_w(spark, sf)
    prev = F.lag("o_totalprice", 1, 0.0).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice", 1, 0.0).over(w).alias("next_price"),
        F.round(F.col("o_totalprice") - prev, 2).alias("price_delta"),
    )


@query(
    "win_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS running_spend
    FROM orders
    """,
    section="2.5",
    doc="Cumulative sum per customer (exact cents accumulator — window sums "
    "of doubles are order-sensitive inside the frame evaluator).",
)
def win_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o, w = _orders_w(spark, sf)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(frame).cast("double") / F.lit(100.0)).alias(
            "running_spend"
        ),
    )


@query(
    "win_running_sum_chunked",
    added=10,  # r10 — sorts AFTER the not-yet-driver-sampled backlog
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS running_spend
    FROM orders
    """,
    section="2.5",
    doc="win_running_sum under key skew: the two-pass chunk-prefix "
    "rewrite (operators/chunked_window.py). A plain window sorts each "
    "key inside ONE task — a key owning 50% of a 100 TB log makes that "
    "task sort 50 TB and AQE cannot split a window partition. Here "
    "range partitioning on (key, order) splits the hot key across "
    "partitions, each chunk computes a local prefix sum, and per-key "
    "offsets (<= n_partitions - 1 spanning keys, O(#partitions) "
    "broadcast regardless of key cardinality) stitch chunks into the "
    "exact window result — bit-identical because the cents accumulator "
    "is associative and (o_orderdate, o_orderkey) totally orders each "
    "key. Same oracle as win_running_sum; skew envelope measured in "
    "scripts/skew_check.py --window.",
)
def win_running_sum_chunked(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_running_sum

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", cents("o_totalprice").alias("p_cents")
    )
    out = chunked_running_sum(
        o,
        keys=["o_custkey"],
        order=["o_orderdate", "o_orderkey"],
        value="p_cents",
        out="spend_cents",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        (F.col("spend_cents").cast("double") / F.lit(100.0)).alias("running_spend"),
    )


@query(
    "win_running_sum_auto",
    added=11,  # r11 — sorts AFTER the not-yet-driver-sampled backlog
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS running_spend
    FROM orders
    """,
    section="2.5",
    doc="Skew-AWARE running sum (operators/chunked_window.py:"
    "running_sum_auto, VERDICT r10 item 6): a sampled hot-key-mass "
    "estimate routes to the plain single-pass window below the measured "
    "~10M-hot-row crossover and to the chunk-prefix rewrite above it — "
    "the operator a caller uses when the key distribution is unknown. "
    "Both routes are exact (same oracle as win_running_sum; routing "
    "pinned both ways in tests/test_scale_ops.py); at sf scale the "
    "sample routes plain, so this also driver-verifies the dispatch "
    "plumbing end-to-end.",
)
def win_running_sum_auto(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import running_sum_auto

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", cents("o_totalprice").alias("p_cents")
    )
    out = running_sum_auto(
        o,
        keys=["o_custkey"],
        order=["o_orderdate", "o_orderkey"],
        value="p_cents",
        out="spend_cents",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        (F.col("spend_cents").cast("double") / F.lit(100.0)).alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             / COUNT(*) OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_price
    FROM orders
    """,
    section="2.5",
    doc="3-order moving average per customer (the reference workload's 7-day "
    "moving average shape), exact-cents numerator.",
)
def win_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    o, w = _orders_w(spark, sf)
    frame = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents("o_totalprice")).over(frame).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1)).over(frame)
        ).alias("moving_avg_price"),
    )


@query(
    "win_moving_avg_chunked",
    added=10,  # r10 — sorts AFTER the not-yet-driver-sampled backlog
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             / COUNT(*) OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_price
    FROM orders
    """,
    section="2.5",
    doc="win_moving_avg under key skew — the BOUNDED-frame member of the "
    "chunk rewrite family (operators/chunked_window.py:"
    "chunked_moving_frame): bounded frames need no offset stitching, "
    "only the last frame_w-1 rows of each chunk forwarded as ghost "
    "rows into the key's successor chunk (range partitions are "
    "contiguous, so ghosts sort strictly before every real row there); "
    "the boundary transfer is O(#spanning-chunks x frame) rows. The "
    "per-task sort bound drops to O(partition) exactly as in the "
    "prefix rewrites. Same oracle as win_moving_avg (exact-cents "
    "numerator); equality under a hot key pinned in "
    "tests/test_scale_ops.py.",
)
def win_moving_avg_chunked(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_moving_frame

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", cents("o_totalprice").alias("p_cents")
    )
    out = chunked_moving_frame(
        o,
        key="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        value="p_cents",
        frame_w=3,
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        (
            F.col("frame_sum").cast("double") / F.lit(100.0) / F.col("frame_cnt")
        ).alias("moving_avg_price"),
    )


@query(
    "win_moving_avg_auto",
    added=11,  # r11 — sorts AFTER the not-yet-driver-sampled backlog
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             / COUNT(*) OVER ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_price
    FROM orders
    """,
    section="2.5",
    doc="Skew-aware moving average (operators/chunked_window.py:"
    "moving_frame_auto): the sampled-key-mass dispatcher routing plain "
    "vs ghost-row chunked at the measured crossover — see "
    "win_running_sum_auto. Same oracle as win_moving_avg.",
)
def win_moving_avg_auto(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import moving_frame_auto

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", cents("o_totalprice").alias("p_cents")
    )
    out = moving_frame_auto(
        o,
        key="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        value="p_cents",
        frame_w=3,
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        (
            F.col("frame_sum").cast("double") / F.lit(100.0) / F.col("frame_cnt")
        ).alias("moving_avg_price"),
    )


@query(
    "win_first_last",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER ({_W}) AS first_order_date,
           LAST_VALUE(o_orderdate)  OVER ({_W} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS last_order_date
    FROM orders
    """,
    section="2.5",
    doc="first/last value across the partition (last needs the forward "
    "frame — the default frame ends at CURRENT ROW).",
)
def win_first_last(spark: SparkSession, sf: str) -> DataFrame:
    o, w = _orders_w(spark, sf)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(fwd).alias("last_order_date"),
    )


@query(
    "win_percent_cume",
    oracle="""
    SELECT s_suppkey,
           PERCENT_RANK() OVER (ORDER BY s_acctbal ASC, s_suppkey ASC) AS bal_pct_rank,
           CUME_DIST()    OVER (ORDER BY s_acctbal ASC, s_suppkey ASC) AS bal_cume_dist
    FROM supplier
    """,
    section="2.5",
    doc="percent_rank / cume_dist (global window over the dim-scale supplier "
    "table; both are ratios of identical integers => bit-identical).",
)
def win_percent_cume(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.orderBy(F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return T(spark, sf, "supplier").select(
        "s_suppkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@query(
    "win_range_interval",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT))
             OVER (PARTITION BY l_suppkey
                   ORDER BY date_diff('day', DATE '1970-01-01',
                                      CAST(l_shipdate AS DATE))
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS qty_7d
    FROM lineitem
    """,
    section="2.5",
    doc="Calendar-correct 7-day rolling quantity per supplier. Both engines "
    "frame over the INTEGER epoch-day number (Spark unix_date == DuckDB "
    "date_diff from 1970-01-01) with integer RANGE bounds — pure int64 "
    "arithmetic, immune to the oracle engine's timestamp precision and "
    "INTERVAL-boundary semantics (the epoch-seconds-vs-INTERVAL pairing "
    "went driver-red in r02 when the oracle read the parquet at a "
    "different precision). Unlike rowsBetween, gaps in the date series "
    "are handled correctly — the frame is defined by time distance, not "
    "row count. Quantities summed as exact integers.",
)
def win_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_date(F.col("l_shipdate").cast("date")))
        .rangeBetween(-6, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("long")).over(w).alias("qty_7d"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_orderkey, 2) OVER w AS second_order_key,
           nth_value(o_totalprice, 3) OVER w AS third_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    section="2.5",
    doc="nth_value over the full partition frame (explicit ROWS BETWEEN "
    "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING in both engines — the "
    "default frame stops at CURRENT ROW, where nth_value is null until "
    "row n). Values are picked, not computed, so doubles pass through "
    "bit-identical; the (date, key) ordering makes the pick unique.",
)
def win_nth_value(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return T(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order_key"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_order_price"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
    WITH src AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS p
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           lag(p IGNORE NULLS) OVER w AS prev_known_price,
           last_value(p IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_price
    FROM src
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    section="2.5",
    doc="IGNORE NULLS window navigation — lag skipping null observations and "
    "the last-observation-carried-forward (LOCF) gap-fill idiom via "
    "last_value(ignoreNulls), the standard fix for sparse sensor/price "
    "series. Nulls synthesized by key modulo; same one-shuffle window "
    "cost as the plain variants.",
)
def win_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    src = T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_totalprice")).alias("p"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    locf = w.rowsBetween(Window.unboundedPreceding, 0)
    return src.select(
        "o_custkey",
        "o_orderkey",
        # PySpark's F.lag has no ignoreNulls knob (only SQL does), so parse
        # the SQL form and attach the window spec to it.
        F.expr("lag(p) IGNORE NULLS").over(w).alias("prev_known_price"),
        F.last("p", ignorenulls=True).over(locf).alias("carried_price"),
    )


@query(
    "scd2_dimension_build",
    oracle="""
    WITH changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    transitions AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM changes
      WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority
    )
    SELECT o_custkey,
           o_orderpriority AS priority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w2 AS valid_to,
           (lead(o_orderdate) OVER w2 IS NULL) AS is_current,
           CAST(row_number() OVER w2 AS BIGINT) AS version
    FROM transitions
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    section="2.5",
    doc="SCD Type-2 dimension build — compress a per-key change stream "
    "(orders as priority observations per customer) into effective-date "
    "ranges: runs of equal values collapse via lag()-compare, then "
    "valid_from/valid_to come from lead() with an open-ended current row "
    "and a version counter. The standard warehouse pattern for applying "
    "a 100 TB changelog to a dimension: ONE shuffle on the dimension key "
    "serves both windows (Spark reuses the partitioning; lag, filter, "
    "lead, row_number all run in the same sort order). Ties broken by "
    "(date, orderkey) so the history is a deterministic total order.",
)
def scd2_dimension_build(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    transitions = (
        o.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .withColumn("prev_priority", F.lag("o_orderpriority").over(w))
        .filter(
            F.col("prev_priority").isNull()
            | (F.col("prev_priority") != F.col("o_orderpriority"))
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return transitions.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
        F.lead("o_orderdate").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


@query(
    "scd2_dimension_build_chunked",
    added=10,  # r10 — sorts AFTER the not-yet-driver-sampled backlog
    oracle="""
    WITH changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    transitions AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM changes
      WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority
    )
    SELECT o_custkey,
           o_orderpriority AS priority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w2 AS valid_to,
           (lead(o_orderdate) OVER w2 IS NULL) AS is_current,
           CAST(row_number() OVER w2 AS BIGINT) AS version
    FROM transitions
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    section="2.5",
    doc="scd2_dimension_build under key skew — the chunk-prefix rewrite "
    "completing the window family (operators/chunked_window.py:"
    "chunked_scd2). Pass 1 is the sessionize machinery with a value-"
    "change flag: chunk-local transition detection, predecessor-chunk "
    "last-value correction for each chunk's first row, corrected flag "
    "prefixes as contiguous version numbers. Pass 2 exploits that "
    "contiguity: valid_to is a plain self equi-join on (key, version+1) "
    "— a composite key that subdivides hot keys, so NO per-key sort "
    "exists anywhere in the plan. Same oracle as scd2_dimension_build; "
    "bit-equality under a 50%-hot key pinned in tests/test_scale_ops.py "
    "and the skew_check --window gate.",
)
def scd2_dimension_build_chunked(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_scd2

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return chunked_scd2(
        o, key="o_custkey", value="o_orderpriority", ts="o_orderdate",
        tiebreak="o_orderkey",
    ).select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        "valid_to",
        "is_current",
        "version",
    )


@query(
    "scd2_dimension_build_auto",
    added=11,  # r11 — sorts AFTER the not-yet-driver-sampled backlog
    oracle="""
    WITH changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    transitions AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM changes
      WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority
    )
    SELECT o_custkey,
           o_orderpriority AS priority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w2 AS valid_to,
           (lead(o_orderdate) OVER w2 IS NULL) AS is_current,
           CAST(row_number() OVER w2 AS BIGINT) AS version
    FROM transitions
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    section="2.5",
    doc="Skew-aware SCD2 build (operators/chunked_window.py:scd2_auto): "
    "the sampled-key-mass dispatcher routing the plain lag/lead build "
    "vs chunked_scd2 at the measured crossover — see "
    "win_running_sum_auto. Same oracle as scd2_dimension_build.",
)
def scd2_dimension_build_auto(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import scd2_auto

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return scd2_auto(
        o, key="o_custkey", value="o_orderpriority", ts="o_orderdate",
        tiebreak="o_orderkey",
    ).select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        "valid_to",
        "is_current",
        "version",
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(quantile_cont(o_totalprice, 0.5) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS median_3
    FROM orders
    """,
    section="2.5",
    doc="Rolling median (exact percentile as a window aggregate over a "
    "3-row frame) — the robust-smoothing twin of win_moving_avg: a "
    "single corrupted price skews a mean but not a median. Full frames "
    "pick the middle element exactly; 2-row edge frames interpolate to "
    "a half-cent, so the output rounds to 3 decimals where both "
    "engines' interpolation formulas agree beyond ulp noise.",
)
def win_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    o, w = _orders_w(spark, sf)
    frame = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.expr("percentile(o_totalprice, 0.5)").over(frame), 3).alias(
            "median_3"
        ),
    )


@query(
    "win_sessionize_events",
    oracle="""
    WITH src AS (
      SELECT user_id, event_id, ts,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN us - lag(us) OVER w > 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM src
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_seq
    FROM marked
    """,
    section="2.5",
    doc="Batch sessionization assigning a PER-EVENT session id (gaps-and-"
    "islands: flag gap > 30 min via lag, running sum of flags numbers "
    "the sessions) — the row-level twin of the session_window AGGREGATE "
    "(stream_session_window): downstream joins need the id on every "
    "event, not just per-session rollups. Both windows share one "
    "user_id shuffle + sort; ties broken by event_id. Boundary note: "
    "this per-event id keeps a gap of EXACTLY 30 min in the same "
    "session (strict >), which deliberately differs from session_window "
    "— whose [start, start+gap) windows close at exactly the gap (the "
    "stream_session_window oracle uses >=); both semantics are useful, "
    "the docs pin which is which. Gap compare is integer microseconds "
    "on BOTH sides (Spark unix_micros == oracle epoch_us(CAST(ts AS "
    "TIMESTAMP))) so a nanosecond-precision oracle read cannot flip the "
    "flag at the boundary (raw-timestamp interval compare went "
    "driver-red in r02).",
)
def win_sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: cast("long") truncates to seconds and would
    # disagree with the oracle's exact interval compare on sub-second gaps
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.sum(new_session).over(run).alias("session_seq"),
    )


@query(
    "win_sessionize_events_chunked",
    added=10,  # r10 — sorts AFTER the not-yet-driver-sampled backlog
    oracle="""
    WITH src AS (
      SELECT user_id, event_id, ts,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN us - lag(us) OVER w > 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM src
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_seq
    FROM marked
    """,
    section="2.5",
    doc="win_sessionize_events under key skew: the chunk-prefix rewrite "
    "extended to a LAG-dependent flag (operators/chunked_window.py:"
    "chunked_sessionize). Range partitioning on (user, ts, event_id) "
    "splits a hot user across partitions; each chunk sessionizes "
    "locally, then per-chunk boundary facts (first/last event time, "
    "flag totals) correct the cross-boundary gap compare and stitch "
    "session numbers — only boundary-spanning users (<= n_partitions-1) "
    "adjust, so the broadcast is O(#partitions) at any user count. "
    "Bit-identical to the plain window (same integer-microsecond gap "
    "compare); same oracle as win_sessionize_events; skew envelope in "
    "scripts/skew_check.py --window.",
)
def win_sessionize_events_chunked(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import chunked_sessionize

    e = T(spark, sf, "events").select("user_id", "event_id", "ts")
    return chunked_sessionize(
        e, key="user_id", ts="ts", tiebreak="event_id", gap_us=30 * 60 * 1_000_000
    ).select("user_id", "event_id", "session_seq")


@query(
    "win_sessionize_events_auto",
    added=11,  # r11 — sorts AFTER the not-yet-driver-sampled backlog
    oracle="""
    WITH src AS (
      SELECT user_id, event_id, ts,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN us - lag(us) OVER w > 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM src
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_seq
    FROM marked
    """,
    section="2.5",
    doc="Skew-aware sessionization (operators/chunked_window.py:"
    "sessionize_auto): the sampled-key-mass dispatcher routing the "
    "plain gaps-and-islands window vs chunked_sessionize at the "
    "measured crossover — see win_running_sum_auto. Same oracle as "
    "win_sessionize_events (integer-microsecond gap compare on both "
    "routes).",
)
def win_sessionize_events_auto(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.chunked_window import sessionize_auto

    e = T(spark, sf, "events").select("user_id", "event_id", "ts")
    return sessionize_auto(
        e, key="user_id", ts="ts", tiebreak="event_id", gap_us=30 * 60 * 1_000_000
    ).select("user_id", "event_id", "session_seq")


@query(
    "events_funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + (c.user_id IS NOT NULL)::INT
                  + (p.user_id IS NOT NULL)::INT AS BIGINT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    section="2.5",
    doc="Ordered conversion funnel (view -> first later click -> first "
    "later purchase) per user — the product-analytics sequence query. "
    "Each stage is a type-filtered min-timestamp aggregate joined on "
    "the user key with a strictly-later predicate, so the funnel "
    "respects event ORDER, not mere co-occurrence. Scale shape: the "
    "event_type filters push to the scan, all three aggregates and "
    "both assembly joins shuffle on the same user_id key (AQE reuses "
    "the partitioning), and no window materializes the full per-user "
    "event list.",
)
def events_funnel_stages(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            stage.cast("long").alias("stage"),
        )
    )


@query(
    "dq_sequence_gaps",
    oracle="""
    WITH kept AS (
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber <> 2
    ),
    nexts AS (
      SELECT l_orderkey, l_linenumber AS gap_after,
             LEAD(l_linenumber) OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber) AS next_ln
      FROM kept
    )
    SELECT l_orderkey, CAST(gap_after AS BIGINT) AS gap_after,
           CAST(next_ln AS BIGINT) AS next_ln
    FROM nexts WHERE next_ln - gap_after > 1
    """,
    section="2.5",
    doc="Sequence-integrity audit (gaps detection): per order, adjacent "
    "line numbers compared via LEAD — a hole (next - current > 1) "
    "means a lost/unloaded row, the completeness check an ingestion "
    "pipeline runs on sequenced feeds. The test data is gap-free by "
    "construction, so line 2 is excluded first to give the audit "
    "deterministic findings. Scale shape: ONE window shuffle on the "
    "sequence's partition key (never a global sort), emitted rows are "
    "only the violations.",
)
def dq_sequence_gaps(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").filter(F.col("l_linenumber") != 2)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    nexts = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("gap_after"),
        F.lead(F.col("l_linenumber").cast("long")).over(w).alias("next_ln"),
    )
    return nexts.filter(F.col("next_ln") - F.col("gap_after") > 1)


@query(
    "scd2_asof_lookup",
    oracle="""
    WITH src AS (
      SELECT o_custkey, o_orderpriority, CAST(o_orderdate AS DATE) AS od,
             o_orderkey
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_priority
      FROM src
      WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)
    ),
    transitions AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey
      FROM changes
      WHERE prev_priority IS NULL OR prev_priority <> o_orderpriority
    ),
    dim AS (
      SELECT o_custkey,
             o_orderpriority AS priority,
             od AS valid_from,
             lead(od) OVER w2 AS valid_to,
             CAST(row_number() OVER w2 AS BIGINT) AS version
      FROM transitions
      WINDOW w2 AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)
    ),
    facts AS (
      SELECT o_orderkey AS fact_key, o_custkey,
             od + 30 AS event_date
      FROM src
    )
    SELECT f.fact_key, f.o_custkey, f.event_date, d.priority, d.version
    FROM facts f JOIN dim d
      ON f.o_custkey = d.o_custkey
     AND d.valid_from <= f.event_date
     AND (d.valid_to IS NULL OR f.event_date < d.valid_to)
    """,
    section="2.5",
    doc="SCD2 point-in-time (as-of) lookup — the READ side of the "
    "scd2_dimension_build pattern: every fact row (orders with a "
    "+30-day event date) joins to the dimension version effective at "
    "its event time (valid_from <= t < valid_to, open-ended current "
    "row). The half-open ranges partition each key's timeline, so "
    "every in-range fact matches exactly one version. Plan shape: ONE "
    "equi-shuffle on the dimension key with the range predicate as a "
    "join residual — never a cross product; at 100 TB the dim side is "
    "orders of magnitude smaller than facts and broadcasts.",
)
def scd2_asof_lookup(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("od"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    transitions = o.withColumn(
        "prev_priority", F.lag("o_orderpriority").over(w)
    ).filter(
        F.col("prev_priority").isNull()
        | (F.col("prev_priority") != F.col("o_orderpriority"))
    )
    dim = transitions.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("od").alias("valid_from"),
        F.lead("od").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
    )
    facts = o.select(
        F.col("o_orderkey").alias("fact_key"),
        "o_custkey",
        F.date_add("od", 30).alias("event_date"),
    )
    return facts.join(
        dim,
        (facts.o_custkey == dim.o_custkey)
        & (dim.valid_from <= facts.event_date)
        & (dim.valid_to.isNull() | (facts.event_date < dim.valid_to)),
    ).select("fact_key", facts.o_custkey, "event_date", "priority", "version")


@query(
    "win_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 20 AS INTEGER) AS e
      FROM orders
    ),
    flagged AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT o_custkey, s, e,
             SUM(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    )
    SELECT o_custkey, CAST(island AS BIGINT) AS island,
           MIN(s) AS merged_from, MAX(e) AS merged_to,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM islands GROUP BY o_custkey, island
    """,
    section="2.5",
    doc="Overlapping-interval merge (gaps-and-islands): per customer, "
    "coalesce order-activity intervals [orderdate, orderdate + "
    "orderkey%20 days] into maximal disjoint spans. Classic single-"
    "shuffle formulation: sort within key, flag rows whose start "
    "exceeds the running max end (a new island), number islands with a "
    "running sum of flags, then aggregate each island — lag-free, no "
    "self-join, no quadratic interval pairing. The same one-shuffle "
    "sort serves the max-end window, the island counter, and feeds the "
    "final partial-aggregated groupBy; NULL new_island on each key's "
    "first row counts as 0 in both engines' SUM.",
)
def win_interval_merge(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    iv = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.expr(
            "date_add(CAST(o_orderdate AS DATE), CAST(o_orderkey % 20 AS INT))"
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w_run).cast("long")
    )
    return islands.groupBy("o_custkey", "island").agg(
        F.min("s").alias("merged_from"),
        F.max("e").alias("merged_to"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@query(
    "user_retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id),
    joined AS (
      SELECT e.user_id, c.cohort_wk,
             date_diff('day', c.cohort_wk, e.wk) // 7 AS week_offset
      FROM ev e JOIN cohorts c ON e.user_id = c.user_id
    )
    SELECT cohort_wk, CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM joined GROUP BY cohort_wk, week_offset
    """,
    section="2.5",
    doc="Cohort retention matrix — the product-analytics staple: users "
    "grouped by first-activity week (their cohort), counted distinct in "
    "every later week offset. ISO-Monday week truncation matches "
    "between engines; offsets are exact integer day-diffs "
    "floor-divided by 7. Scale shape: one user-keyed shuffle derives "
    "cohorts, the activity stream joins back on the user key (a dim "
    "that is DISTINCT-USERS sized, AQE-broadcastable), then one "
    "(cohort, offset) count-distinct shuffle.",
)
def user_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events").select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    joined = ev.join(cohorts, "user_id").select(
        "user_id",
        "cohort_wk",
        F.expr("datediff(wk, cohort_wk) div 7").alias("week_offset"),
    )
    return joined.groupBy("cohort_wk", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
    section="2.5",
    doc="Running DISTINCT count per key — a window shape Spark (and SQL) "
    "has no native frame for (COUNT(DISTINCT) OVER a running frame is "
    "unsupported everywhere): decompose into a first-occurrence flag "
    "(row_number over (key, value) = 1) plus a running sum of flags "
    "over the key's timeline. Two windows, but the second reuses the "
    "(user) partitioning of the first — one shuffle family; the same "
    "first-seen trick corpus_vocab_growth uses globally, here per key. "
    "Feature-engineering staple: 'how many distinct behaviors has this "
    "user shown so far' as of every event.",
)
def win_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


@query(
    "win_streak_longest",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grouped AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak_len
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           MAX(streak_len) AS longest_streak_days,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
    section="2.5",
    doc="Longest consecutive-day activity streak per user — the classic "
    "gaps-and-islands date trick: distinct active days, then "
    "date - row_number is CONSTANT within a consecutive run (each day "
    "forward steps both by one), so grouping by that anchor date counts "
    "each streak. One user-keyed shuffle serves the distinct, the "
    "window and both aggregates (same partitioning throughout). The "
    "engagement metric behind retention/churn features.",
)
def win_streak_longest(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak_days"),
        F.sum("streak_len").cast("long").alias("n_active_days"),
    )


@query(
    "win_changepoint_cusum",
    oracle="""
    WITH v AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    keyed AS (
      SELECT o_custkey, o_orderkey, x,
             CAST(SUM(x) OVER (PARTITION BY o_custkey) AS BIGINT) AS sx,
             CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
      FROM v
    ),
    dev AS (
      SELECT o_custkey, o_orderkey, n,
             CAST(SUM(x * n - sx)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS d
      FROM keyed
    ),
    peaks AS (
      SELECT o_custkey, o_orderkey, n, ABS(d) AS ad,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY ABS(d) DESC, o_orderkey ASC) AS rk
      FROM dev
    )
    SELECT o_custkey,
           o_orderkey AS changepoint_key,
           ad AS max_drift_num,
           n AS drift_den
    FROM peaks WHERE rk = 1 AND n >= 5
    """,
    section="2.5",
    doc="Offline CUSUM-style changepoint detection per key: the position "
    "where the cumulative deviation from the key's mean peaks — the "
    "point a level shift most plausibly occurred (the max-|CUSUM| "
    "estimator). EXACT integer formulation: deviations are scaled by "
    "the key's count (x*n - sum instead of x - mean) so the running "
    "sum is pure int64 arithmetic — the reported drift is a "
    "numerator over denominator n (divide downstream for the "
    "mean-scaled statistic). Two windows on ONE key partitioning "
    "(the per-key totals, then the ordered cumulative), a per-key "
    "argmax with deterministic ties, keys with < 5 points dropped. "
    "int64 envelope: |x*n| <= cents * rows-per-key — fine to ~1e5 "
    "orders per customer at 1e9 cents.",
)
def win_changepoint_cusum(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    v = o.select("o_custkey", "o_orderkey", cents("o_totalprice").alias("x"))
    w_all = Window.partitionBy("o_custkey")
    keyed = v.select(
        "o_custkey",
        "o_orderkey",
        "x",
        F.sum("x").over(w_all).cast("long").alias("sx"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = keyed.select(
        "o_custkey",
        "o_orderkey",
        "n",
        F.sum(F.col("x") * F.col("n") - F.col("sx"))
        .over(w_cum)
        .cast("long")
        .alias("d"),
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.abs(F.col("d"))), F.asc("o_orderkey")
    )
    peaks = dev.select(
        "o_custkey",
        "o_orderkey",
        "n",
        F.abs(F.col("d")).alias("ad"),
        F.row_number().over(w_rank).alias("rk"),
    )
    return peaks.filter((F.col("rk") == 1) & (F.col("n") >= 5)).select(
        "o_custkey",
        F.col("o_orderkey").alias("changepoint_key"),
        F.col("ad").alias("max_drift_num"),
        F.col("n").alias("drift_den"),
    )


@query(
    "win_ratio_to_report",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000
                // SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey) AS BIGINT) AS share_ppm
    FROM orders
    """,
    section="2.5",
    doc="RATIO_TO_REPORT / share-of-parent: each order's fraction of its "
    "customer's lifetime spend, as exact integer ppm (cents * 1e6 DIV "
    "the window sum of cents — no float division crosses the engines). "
    "One customer-keyed window sum; the named Oracle/Teradata pattern "
    "migrating warehouse SQL leans on, distinct from win_pareto_"
    "cumshare's CUMULATIVE share (running concentration) — this is the "
    "flat per-row share.",
)
def win_ratio_to_report(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey")
    price = cents("o_totalprice")
    return T(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        price.alias("price_cents"),
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000 DIV "
            "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
            "OVER (PARTITION BY o_custkey)"
        ).alias("share_ppm"),
    )


@query(
    "win_sliding_distinct_count",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(DISTINCT event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS variety_7
    FROM events
    """,
    section="2.5",
    doc="SLIDING distinct count (behavioral variety over the trailing 7 "
    "events per user): COUNT(DISTINCT) over a moving frame has no "
    "incremental form, so each engine recomputes the frame's set — "
    "Spark expresses it as size(collect_set() OVER frame) (no native "
    "windowed DISTINCT aggregate), DuckDB as COUNT(DISTINCT) OVER; "
    "the hash match pins the two formulations equal. Complements "
    "win_running_distinct (cumulative special case, which IS "
    "incrementalizable) and events_active_users_rolling (calendar-"
    "sliding, explode-to-window rewrite) — this is the row-frame "
    "sliding case, bounded state = frame size.",
)
def win_sliding_distinct_count(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return T(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("variety_7"),
    )
