"""Relational core: scans, filters, aggregations, joins, sorts, set ops.

SURVEY.md §2.1-2.4, 2.6, 2.7. Every query is REF-traceable or an EXT row
of the inventory; each carries its DuckDB oracle SQL. Money aggregates use
the exact integer-cents policy (registry module docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from etl_covid19_brasil_spark.operators import asof_join, range_join, top_k, top_k_per_group
from etl_covid19_brasil_spark.registry import (
    T,
    cents,
    mavg,
    msum,
    o_cents,
    o_mavg,
    o_msum,
    query,
)

# ---------------------------------------------------------------------------
# §2.1 / §2.2 — scans, projections, filters
# ---------------------------------------------------------------------------


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_quantity AS qty, l_returnflag AS flag
    FROM lineitem
    """,
    section="2.2",
    doc="Column pruning + rename: only 4 of 11 lineitem columns reach the scan "
    "(ReadSchema in .explain; reference always reads all columns, SURVEY.md §4).",
)
def scan_project(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("qty"),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "filter_predicate",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F','P')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey < 10)
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    section="2.2",
    doc="Compound θ-predicates: IN, BETWEEN, LIKE, NOT, >=; all pushed toward "
    "the parquet scan by Catalyst (PushedFilters).",
)
def filter_predicate(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("%URGENT%")
        & ~(F.col("o_custkey") < 10)
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status FROM lineitem",
    section="2.2",
    doc="Duplicate elimination; partial hash-aggregate per partition, then one "
    "shuffle on the distinct key — no row-level shuffle of the full table.",
)
def distinct_rows(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .select(F.col("l_returnflag").alias("flag"), F.col("l_linestatus").alias("status"))
        .distinct()
    )


@query(
    "schema_only_slice",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE FALSE",
    section="2.2",
    doc="df.limit(0): keep schema, zero rows — the reference's df[:0] DDL trick "
    "(dags/create-data-lake.py:50).",
)
def schema_only_slice(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").select("o_orderkey", "o_totalprice").limit(0)


@query(
    "drop_null_rows",
    oracle="""
    SELECT o_orderkey, CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status
    FROM orders
    WHERE (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END) IS NOT NULL
    """,
    section="2.2",
    doc="na.drop on a synthesized nullable column (test tables have no nulls): "
    "the reference's dropna(subset=...) contract (dags/create-data-lake.py:73).",
)
def drop_null_rows_q(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.etl import drop_null_rows

    o = T(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", None).otherwise(F.col("o_orderstatus")).alias("status"),
    )
    return drop_null_rows(o, ["status"])


# ---------------------------------------------------------------------------
# §2.4 — aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_groupby_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_msum('l_quantity', 'sum_qty')},
           {o_msum('l_extendedprice', 'sum_base_price')},
           {o_msum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {o_mavg('l_quantity', 'avg_qty')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    section="2.4",
    doc="TPC-H Q1-shaped pricing summary: filter + groupBy + sum/avg/count. "
    "Partial (map-side) aggregation shrinks the shuffle to |groups| rows "
    "per partition.",
)
def agg_groupby_pricing(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        msum("l_quantity", "sum_qty"),
        msum("l_extendedprice", "sum_base_price"),
        msum(disc_price, "sum_disc_price"),
        mavg("l_quantity", "avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {o_msum('o_totalprice', 'total_revenue')},
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
    section="2.4",
    doc="Keyless global aggregate: single-row result via partial+final agg.",
)
def agg_global(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").agg(
        F.count(F.lit(1)).alias("n_rows"),
        msum("o_totalprice", "total_revenue"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(DISTINCT o_orderpriority) AS distinct_priorities
    FROM orders GROUP BY o_orderstatus
    """,
    section="2.4",
    doc="Exact distinct counts per group (expand + two-phase aggregate).",
)
def agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.countDistinct("o_orderpriority").alias("distinct_priorities"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey)  AS exact_parts,
           TRUE AS parts_within_bounds,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS orders_within_bounds
    FROM lineitem
    """,
    section="2.4",
    doc="HyperLogLog++ distinct estimate — the 100 TB path where exact "
    "count-distinct's expand+shuffle is too expensive. The HLL estimate "
    "itself differs across engines by design, so the hashable contract is "
    "a *bounds check*: |approx - exact| <= 3*rsd*exact (rsd=0.01, so the "
    "estimate must land within ±3%, a >99.7% confidence band for HLL++). "
    "The oracle asserts TRUE for the bound and the exact counts for value "
    "parity.",
)
def agg_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    rsd = 0.01
    agg = T(spark, sf, "lineitem").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("a_parts"),
        F.count_distinct("l_partkey").alias("x_parts"),
        F.approx_count_distinct("l_orderkey", rsd).alias("a_orders"),
        F.count_distinct("l_orderkey").alias("x_orders"),
    )
    bound = F.lit(3.0 * rsd)
    return agg.select(
        F.col("x_parts").alias("exact_parts"),
        (F.abs(F.col("a_parts") - F.col("x_parts")) <= bound * F.col("x_parts")).alias(
            "parts_within_bounds"
        ),
        F.col("x_orders").alias("exact_orders"),
        (F.abs(F.col("a_orders") - F.col("x_orders")) <= bound * F.col("x_orders")).alias(
            "orders_within_bounds"
        ),
    )


@query(
    "agg_sum_distinct",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(DISTINCT {o_cents('l_quantity')}) AS DOUBLE) / 100.0 AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    section="2.4",
    doc="SUM(DISTINCT x) over exact cents.",
)
def agg_sum_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        (F.sum_distinct(cents("l_quantity")).cast("double") / F.lit(100.0)).alias("sum_distinct_qty")
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_qty,
           (CAST(SUM(q*q) AS DOUBLE) - CAST(SUM(q) AS DOUBLE) * SUM(q) / COUNT(*)) / (COUNT(*) - 1) AS var_qty,
           SQRT((CAST(SUM(q*q) AS DOUBLE) - CAST(SUM(q) AS DOUBLE) * SUM(q) / COUNT(*)) / (COUNT(*) - 1)) AS stddev_qty
    FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
    GROUP BY l_returnflag
    """,
    section="2.4",
    doc="Sample variance/stddev from exact integer moment sums — "
    "deterministic twin of F.variance/F.stddev (which accumulate in "
    "non-reproducible float order). Library callers use the builtins; "
    "this query is the hash-gate formulation.",
)
def agg_stats_moments(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    sum_q = F.sum("q").cast("double")
    sum_q2 = F.sum(F.col("q") * F.col("q")).cast("double")
    n = F.count(F.lit(1))
    var = (sum_q2 - sum_q * F.sum("q") / n) / (n - 1)
    return li.groupBy("l_returnflag").agg(
        (sum_q / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_linestatus,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.95) AS p95_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    section="2.4",
    doc="Exact interpolated percentiles (SQL percentile == DuckDB "
    "quantile_cont). F.percentile_approx is the sketch-based 100 TB path, "
    "checked rows-only elsewhere.",
)
def agg_percentile(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "lineitem").groupBy("l_linestatus").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations
    FROM nation GROUP BY n_regionkey
    """,
    section="2.4",
    doc="collect_list/collect_set; emitted as a sorted joined string so the "
    "check is order-insensitive.",
)
def agg_collect(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "nation").groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations")
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) AS n_total
    FROM orders GROUP BY o_orderstatus
    """,
    section="2.4",
    doc="FILTER-clause conditional aggregation (count over when()).",
)
def agg_filtered(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    section="2.4",
    doc="Hierarchical subtotals: (region, nation), (region), () levels.",
)
def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    section="2.4",
    doc="All 2^k grouping-set combinations.",
)
def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "orders").cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    section="2.4",
    doc="Explicit grouping sets via the SQL surface (spark.sql lowers to the "
    "same Expand operator as rollup/cube).",
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT n_name,
           COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
           COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS building,
           COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS machinery
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    section="2.4",
    doc="Pivot to wide form with explicit value list (explicit values avoid "
    "the extra distinct-scan Spark needs to discover pivot columns).",
)
def agg_pivot(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    piv = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", ["AUTOMOBILE", "BUILDING", "MACHINERY"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "n_name",
        F.coalesce("AUTOMOBILE", F.lit(0)).alias("automobile"),
        F.coalesce("BUILDING", F.lit(0)).alias("building"),
        F.coalesce("MACHINERY", F.lit(0)).alias("machinery"),
    )


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_revenue",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_lineitems,
           {o_msum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
    section="2.3",
    doc="Flagship star join: fact ⋈ orders ⋈ customer ⋈ nation with filter + "
    "group + exact money sum. nation broadcasts; orders⋈lineitem shuffles "
    "on the orderkey.",
)
def join_inner_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_lineitems"), msum(revenue, "revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    section="2.3",
    doc="Left outer join preserving order-less customers (count = 0).",
)
def join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    section="2.3",
    doc="Right outer join: every nation appears even with zero suppliers.",
)
def join_right_outer(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
    section="2.3",
    doc="Full outer join reconciling two aggregates with partially "
    "overlapping key sets.",
)
def join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    cn = T(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    sn = T(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return cn.join(sn, cn.k == sn.k, "full").select(
        F.coalesce(cn.k, sn.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    section="2.3",
    doc="Left semi join: existence filter, right side never duplicated into "
    "the output (shuffle carries only the distinct keys).",
)
def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    big = T(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    section="2.3",
    doc="Left anti join: customers with no urgent order. (The urgency "
    "filter keeps the check NON-vacuous: every customer in the shipped "
    "corpora has at least one order, so the unfiltered 'no orders at "
    "all' formulation returned zero rows at every SF and the hash "
    "compared empty-to-empty — r8 zero-row audit.)",
)
def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_broadcast",
    oracle=f"""
    SELECT r_name, {o_msum('s_acctbal', 'total_acctbal')}, COUNT(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    section="2.3",
    doc="Explicit broadcast() of both dims: plans BroadcastHashJoin with zero "
    "shuffle of the fact side — the default choice for every dim < "
    "autoBroadcastJoinThreshold at 100 TB.",
)
def join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(msum("s_acctbal", "total_acctbal"), F.count(F.lit(1)).alias("n_suppliers"))
    )


_PRICE_BANDS = [
    ("low", 0.0, 100_000.0),
    ("mid", 100_000.0, 300_000.0),
    ("high", 300_000.0, 1_000_000_000.0),
]
_BANDS_SQL = "(VALUES " + ", ".join(
    f"('{n}', {lo}, {hi})" for n, lo, hi in _PRICE_BANDS
) + ") AS bands(band, lo, hi)"


@query(
    "join_theta_bands",
    oracle=f"""
    SELECT band, COUNT(*) AS n_orders, {o_msum('o_totalprice', 'band_revenue')}
    FROM orders JOIN {_BANDS_SQL}
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    section="2.3",
    doc="θ-join (non-equi) of orders against a tiny in-memory band table; "
    "BroadcastNestedLoopJoin with the 3-row side broadcast.",
)
def join_theta_bands(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, ["band", "lo", "hi"])
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"), msum("o_totalprice", "band_revenue"))
    )


@query(
    "join_range_bucketed",
    oracle=f"""
    SELECT band, COUNT(*) AS n_orders
    FROM orders JOIN {_BANDS_SQL}
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    section="2.3",
    doc="Same interval-containment semantics as join_theta_bands but executed "
    "by the range_join operator: bucketed equi-join + residual predicate "
    "(operators/joins.py), which scales where the nested-loop θ-join "
    "cannot (both sides large).",
)
def join_range_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, ["band", "lo", "hi"])
    joined = range_join(o, bands, "o_totalprice", "lo", "hi", bucket_width=50_000.0)
    return joined.groupBy("band").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT MAX(o.o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_o_orderdate
    FROM events e
    """,
    section="2.3",
    doc="As-of join: latest order date per user at event time, via the "
    "union+window merge operator (operators/joins.py:asof_join) — one "
    "shuffle, no join explosion. Oracle is the correlated-subquery "
    "formulation (DuckDB ASOF JOIN drops unmatched rows; this keeps them).",
)
def join_asof_q(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select("event_id", "user_id", "ts")
    o = T(spark, sf, "orders").select("o_custkey", "o_orderdate").withColumnRenamed(
        "o_custkey", "user_id"
    )
    out = asof_join(
        e, o, on="user_id", left_ts="ts", right_ts="o_orderdate", value_cols=["o_orderdate"]
    )
    return out.select("event_id", "user_id", "asof_o_orderdate")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    section="2.3",
    doc="Cartesian product of the two smallest dims (basis for the "
    "similarity-search cross joins in §2.10).",
)
def join_cross(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "region").select("r_name").crossJoin(
        T(spark, sf, "nation").select("n_name")
    )


# ---------------------------------------------------------------------------
# §2.6 — sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    section="2.6",
    doc="Global top-k; Catalyst plans TakeOrderedAndProject (per-partition "
    "k-heap, no full sort). Tie-broken on the key for determinism.",
)
def top_k_orders(spark: SparkSession, sf: str) -> DataFrame:
    return top_k(
        T(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@query(
    "top_k_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    section="2.6",
    doc="k richest customers per market segment via partitioned row_number.",
)
def top_k_per_group_q(spark: SparkSession, sf: str) -> DataFrame:
    out = top_k_per_group(
        T(spark, sf, "customer").select("c_mktsegment", "c_custkey", "c_acctbal"),
        group=["c_mktsegment"],
        order=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        k=3,
    )
    return out.select("c_mktsegment", "c_custkey", "c_acctbal", "rn")


@query(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           ROW_NUMBER() OVER (ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC) AS pos
    FROM supplier
    """,
    section="2.6",
    doc="Multi-key sort made hash-visible by materializing the global rank "
    "(the value-hash itself is order-insensitive).",
)
def sort_multi_key(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.orderBy(F.col("s_nationkey").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    return T(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal", F.row_number().over(w).alias("pos")
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    )
    """,
    section="2.7",
    doc="Bag union (no dedup, no shuffle).",
)
def set_union_all(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    """,
    section="2.7",
    doc="Set union with dedup.",
)
def set_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
    section="2.7",
    doc="Nation keys present in both customer and supplier.",
)
def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT DISTINCT o_custkey AS k FROM orders
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    section="2.7",
    doc="Customers who ordered but never urgently. (Originally 'nation "
    "keys with customers but no suppliers' — every nation has both in "
    "the shipped corpora, so that formulation compared empty-to-empty "
    "at every SF; re-targeted by the r8 zero-row audit to keep the "
    "EXCEPT semantics under real data.)",
)
def set_except(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    all_cust = o.select(F.col("o_custkey").alias("k")).distinct()
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return all_cust.subtract(urgent)


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders, {o_msum('o_totalprice', 'total_price')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    section="2.3",
    doc="Skew-mitigated equi-join: fact keys salted into 8 buckets, dim "
    "replicated per salt, join on (key, salt) — byte-identical results to "
    "the plain join, but a hot key spreads across 8 tasks instead of "
    "stalling one. The plan-level tool for skew AQE can't see "
    "(operators/skew.py; AQE skew-split is also on in get_spark). No "
    "broadcast hint on the dim: under a broadcast join there is no "
    "key-shuffle for salt to fix (the r7 broadcast audit found the "
    "hint made the demonstrated mitigation inert), and a pinned hint "
    "on a dim that grows with the data is the minhash-OOM failure "
    "mode — the shuffle on (key, salt) IS the pattern.",
)
def join_skew_salted(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.skew import salted_join

    orders = T(spark, sf, "orders")
    customer = T(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        orders.withColumn("c_custkey", F.col("o_custkey")),
        customer,
        on="c_custkey",
        factor=8,
        salt_source=F.col("o_orderkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"), msum("o_totalprice", "total_price")
    )


@query(
    "filter_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
            * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > 2 * (SELECT SUM(CAST(ROUND(o3.o_totalprice * 100) AS BIGINT))
                 FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """,
    section="2.2",
    doc="Correlated scalar subqueries (orders above 2x their customer's "
    "average, compared in exact integer cents so the threshold is "
    "bit-identical across engines). Catalyst decorrelates both "
    "subqueries into aggregate+join (RewriteCorrelatedScalarSubquery, "
    "SURVEY.md §4) — no per-row re-execution; runs through the engine's "
    "SQL entry point (sql.py).",
)
def filter_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.sql import sql as run_sql

    return run_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
              > 2 * (SELECT SUM(CAST(ROUND(o3.o_totalprice * 100) AS BIGINT))
                     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        """,
        sf_dir=sf,
    )


@query(
    "agg_stats_higher",
    oracle="""
    SELECT l_returnflag,
           round((((CAST(s3 AS DOUBLE) / n) - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n))
                  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / power((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1.5),
                 6) AS skew_qty,
           round(((((CAST(s4 AS DOUBLE) / n) - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n))
                   + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n))
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / (((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * ((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 - 3, 6) AS kurt_qty,
           round((CAST(sxy AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(t1 AS DOUBLE) / n), 6) AS covar_qd,
           round(((CAST(sxy AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(t1 AS DOUBLE) / n))
                 / (sqrt((CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * sqrt((CAST(t2 AS DOUBLE) / n) - (CAST(t1 AS DOUBLE) / n) * (CAST(t1 AS DOUBLE) / n))),
                 6) AS corr_qd
    FROM (SELECT l_returnflag, COUNT(*) AS n,
                 SUM(q) AS s1, SUM(q*q) AS s2, SUM(q*q*q) AS s3, SUM(q*q*q*q) AS s4,
                 SUM(d) AS t1, SUM(d*d) AS t2, SUM(q*d) AS sxy
          FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                       CAST(round(l_discount * 100, 0) AS BIGINT) AS d
                FROM lineitem)
          GROUP BY l_returnflag)
    """,
    section="2.4",
    doc="Higher-moment statistics — population skewness, excess kurtosis, "
    "covar_pop, corr — from exact integer power sums (quantity <= 50, so "
    "sum(q^4) stays ~1e13, far inside BIGINT). Deterministic twin of "
    "F.skewness / F.kurtosis / F.covar_pop / F.corr, whose float "
    "accumulation order is partition-dependent; both engines evaluate the "
    "identical double expression over identical integers, with only the "
    "libm-backed power() term needing the 6-decimal round.",
)
def agg_stats_higher(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
    )
    q, d = F.col("q"), F.col("d")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
        F.sum(d).alias("t1"),
        F.sum(d * d).alias("t2"),
        F.sum(q * d).alias("sxy"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2r = F.col("s2").cast("double") / n
    m3r = F.col("s3").cast("double") / n
    m4r = F.col("s4").cast("double") / n
    u1 = F.col("t1").cast("double") / n
    u2r = F.col("t2").cast("double") / n
    mxy = F.col("sxy").cast("double") / n
    var_q = m2r - m1 * m1
    var_d = u2r - u1 * u1
    covar = mxy - m1 * u1
    return sums.select(
        "l_returnflag",
        F.round(((m3r - 3 * m1 * m2r) + 2 * m1 * m1 * m1) / F.pow(var_q, 1.5), 6).alias(
            "skew_qty"
        ),
        F.round(
            (((m4r - 4 * m1 * m3r) + 6 * m1 * m1 * m2r) - 3 * m1 * m1 * m1 * m1)
            / (var_q * var_q)
            - 3,
            6,
        ).alias("kurt_qty"),
        F.round(covar, 6).alias("covar_qd"),
        F.round(covar / (F.sqrt(var_q) * F.sqrt(var_d)), 6).alias("corr_qd"),
    )


@query(
    "filter_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '5-LOW')
    """,
    section="2.2",
    doc="EXISTS / NOT EXISTS predicate subqueries (customers with an "
    "urgent order and no low-priority one). Catalyst rewrites the pair "
    "into a left-semi + left-anti join (RewritePredicateSubquery) — set "
    "membership via hash joins, never per-row subquery re-execution; "
    "runs through the engine's SQL entry point (sql.py).",
)
def filter_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.sql import sql as run_sql

    return run_sql(
        spark,
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '5-LOW')
        """,
        sf_dir=sf,
    )


@query(
    "agg_regression",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sx,
             SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS sy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS sxy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
           (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
             / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS r2
    FROM sums
    """,
    section="2.4",
    doc="OLS regression aggregates (regr_slope / regr_intercept / regr_r2 "
    "of discount-cents on quantity per return flag) rebuilt from exact "
    "int64 power sums — F.regr_* accumulates doubles in partition order "
    "and is not bit-reproducible. quantity <= 50 and discount-cents <= 10 "
    "keep every sum and cross-product well under 2^53 through sf 1, so "
    "the final double arithmetic is an identical IEEE op sequence in both "
    "engines. One map-side-combined aggregation shuffle of |flags| rows.",
)
def agg_regression(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_discount") * 100).cast("long")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / denx
    return sums.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        (num * num / (denx * deny)).alias("r2"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS priciest_order,
           arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS cheapest_order
    FROM orders GROUP BY o_orderstatus
    """,
    section="2.4",
    doc="Deterministic min_by/max_by (DuckDB arg_min/arg_max): the order "
    "key carrying the extreme total price per status. Raw MAX_BY ties are "
    "resolved arbitrarily in both engines, so the ordering value is the "
    "composite bigint price_cents*1e10 + orderkey — price-cents <= 6e7 "
    "and orderkey < 1e10 keep the composite exact in int64 — making the "
    "argmax unique. Single two-phase aggregate, |statuses| result rows.",
)
def agg_minmax_by(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    rank = F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(
        10_000_000_000
    ) + F.col("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", rank).alias("priciest_order"),
        F.min_by("o_orderkey", rank).alias("cheapest_order"),
    )


@query(
    "agg_bool_bit",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.05) AS any_big_discount,
           bit_and(CAST(l_orderkey AS BIGINT)) AS keys_bit_and,
           bit_or(CAST(l_linenumber AS BIGINT)) AS lines_bit_or,
           bit_xor(CAST(l_suppkey AS BIGINT)) AS supp_bit_xor
    FROM lineitem GROUP BY l_returnflag
    """,
    section="2.4",
    doc="Boolean and bitwise reduction aggregates: bool_and/bool_or (SQL "
    "every/any) and bit_and/bit_or/bit_xor over int64 keys — all "
    "commutative-associative reductions, so partition order never "
    "matters and results are exact at any scale. bit_xor over a key "
    "column is the classic cheap set-difference check between table "
    "versions (identical multisets xor to the same value).",
)
def agg_bool_bit(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.05).alias("any_big_discount"),
        F.bit_and(F.col("l_orderkey")).alias("keys_bit_and"),
        F.bit_or(F.col("l_linenumber").cast("long")).alias("lines_bit_or"),
        F.bit_xor(F.col("l_suppkey")).alias("supp_bit_xor"),
    )


@query(
    "agg_histogram_width_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 25
                ELSE 1 + CAST(floor(o_totalprice / 25000.0) AS BIGINT) END AS bucket,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS bucket_value
    FROM orders GROUP BY bucket
    """,
    section="2.4",
    doc="Equi-width histogram via width_bucket(price, 0, 600k, 24 "
    "buckets) — the one-pass distribution profile used for skew "
    "detection and range-partition boundary picking before a big sort "
    "or range join. DuckDB has no width_bucket, so the oracle uses the "
    "equivalent 1+floor(x/width) with under/overflow buckets 0 and 25 — "
    "prices have cents resolution, never within an ulp of a 25000 "
    "boundary, so both formulas agree exactly. Counts are exact, the "
    "per-bucket mass uses the integer-cents sum; shuffles only "
    "|buckets| rows.",
)
def agg_histogram_width_bucket(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(24)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum("o_totalprice", "bucket_value"),
        )
    )


@query(
    "agg_unpivot_melt",
    oracle=f"""
    WITH wide AS (
      SELECT l_returnflag,
             {o_msum('l_quantity', 'sum_qty')},
             {o_msum('l_extendedprice', 'sum_price')},
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM wide
    """,
    section="2.4",
    doc="unpivot/melt — the inverse of pivot (wide measure columns -> long "
    "(metric, value) rows). Spark's unpivot lowers to ONE Expand "
    "projection (each input row fans out to |measures| rows map-side, no "
    "shuffle, no self-union); the oracle spells the same relation as "
    "UNION ALL. Measures ride the exact-cents policy so values "
    "hash-match.",
)
def agg_unpivot_melt(spark: SparkSession, sf: str) -> DataFrame:
    wide = T(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        msum("l_quantity", "sum_qty"),
        msum("l_extendedprice", "sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_exact,
           TRUE AS approx_within_rank_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
    section="2.4",
    doc="Sketch-based percentile (approx_percentile, accuracy=100) — the "
    "100 TB path where exact percentile's full sort per group is too "
    "expensive. The sketch guarantees rank error <= 1/accuracy, so the "
    "hashable contract (same pattern as agg_approx_count_distinct) is a "
    "bounds check: the estimate must land between the exact interpolated "
    "quantiles at p±1/accuracy. The oracle asserts TRUE plus the exact "
    "median for value parity.",
)
def agg_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    eps = 1.0 / 100.0
    agg = T(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 100)").alias("est"),
        F.expr(f"percentile(l_extendedprice, {0.5 - eps})").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
        F.expr(f"percentile(l_extendedprice, {0.5 + eps})").alias("hi"),
    )
    return agg.select(
        "l_returnflag",
        "p50_exact",
        ((F.col("est") >= F.col("lo")) & (F.col("est") <= F.col("hi"))).alias(
            "approx_within_rank_bounds"
        ),
    )


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           {o_msum('o.o_totalprice', 'total_value')}
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
    GROUP BY o.o_orderpriority
    """,
    section="2.3",
    doc="Semi-join with BLOOM-FILTER pre-pruning (operators/bloom.py): the "
    "selective build side (c_acctbal > 9000) is aggregated into a "
    "32k-bit bloom built from seeded xxhash64 positions + per-word "
    "bit_or (all registered built-ins — Spark's own bloom_filter_agg is "
    "not in the public registry), broadcast as ONE map row, and probe "
    "rows failing any of the 3 bit tests are dropped BEFORE the exact "
    "semi-join shuffles them. False negatives are impossible, false "
    "positives die in the exact join, so the result — and the oracle — "
    "is the plain semi-join. At 100 TB this is the difference between "
    "shuffling the whole fact table and shuffling the ~matching slice.",
)
def join_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.bloom import bloom_semi_join

    orders = T(spark, sf, "orders")
    rich = T(spark, sf, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    kept = bloom_semi_join(orders, rich, "o_custkey", "c_custkey")
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        msum("o_totalprice", "total_value"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS members,
           string_agg(CAST(n_nationkey AS VARCHAR), '|' ORDER BY n_nationkey DESC) AS keys_desc
    FROM nation GROUP BY n_regionkey
    """,
    section="2.4",
    doc="Ordered string aggregation — Spark 4's listagg ... WITHIN GROUP "
    "(ORDER BY) == DuckDB string_agg(... ORDER BY). The explicit "
    "in-group ordering is what makes a concatenation aggregate "
    "deterministic under partition-parallel execution; without it the "
    "result depends on merge order.",
)
def agg_listagg(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)").alias("members"),
        F.expr(
            "listagg(CAST(n_nationkey AS STRING), '|') WITHIN GROUP (ORDER BY n_nationkey DESC)"
        ).alias("keys_desc"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type, COUNT(*) AS est_count
    FROM events GROUP BY event_type
    ORDER BY est_count DESC, event_type ASC LIMIT 3
    """,
    section="2.4",
    doc="approx_top_k frequent-items sketch (Spark 4) — the heavy-hitters "
    "profile a corpus pipeline runs before deciding what to filter or "
    "salt. The sketch's default capacity far exceeds this column's "
    "cardinality, so every tracked count is exact and the oracle is the "
    "exact GROUP BY top-k; at real 100 TB cardinalities the same call "
    "degrades gracefully to approximate counts while the plan shape "
    "(one partial+merge agg, no full shuffle of distinct values) stays "
    "fixed. Output re-sorted (count desc, item asc) so row order is "
    "engine-independent.",
)
def agg_approx_top_k(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    sketch = e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return (
        sketch.select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("event_type"),
            F.col("x.count").alias("est_count"),
        )
        .orderBy(F.desc("est_count"), F.asc("event_type"))
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS merged_within_bounds,
           TRUE AS direct_within_bounds
    FROM orders
    """,
    section="2.4",
    doc="MERGEABLE distinct-count sketches (Datasketches HLL, Spark 3.5+): "
    "per-orderpriority hll_sketch_agg partials are hll_union_agg-merged "
    "and estimated — the re-aggregatable rollup pattern that lets a "
    "100 TB pipeline keep per-segment sketches and answer any coarser "
    "distinct count WITHOUT rescanning (plain approx_count_distinct "
    "composes nothing). Checked properties, hashable as booleans: the "
    "merged estimate equals the directly-built estimate exactly (both "
    "deterministic given data + lgConfigK), and lands within 3*rsd of "
    "the exact count (same contract as agg_approx_count_distinct).",
)
def agg_hll_sketch_merge(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    per_seg = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey, 12)").alias("sk")
    )
    merged = per_seg.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_merged")
    )
    direct = o.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))").alias("est_direct"),
        F.countDistinct("o_custkey").alias("n_exact"),
    )
    # 3*rsd bound for lgConfigK=12: rsd ~ 1.04/sqrt(2^12) ~ 1.63%
    bound = 3 * 1.04 / (2 ** 6)
    def in_band(est: str) -> F.Column:
        return F.abs(F.col(est) - F.col("n_exact")) <= F.col("n_exact") * F.lit(bound)

    return merged.crossJoin(direct).select(
        "n_exact",
        in_band("est_merged").alias("merged_within_bounds"),
        in_band("est_direct").alias("direct_within_bounds"),
    )


@query(
    "agg_incremental_update",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {o_msum('o_totalprice', 'total_value')}
    FROM orders GROUP BY o_orderpriority
    """,
    section="2.4",
    doc="Incremental aggregate maintenance: the standing aggregate (90% "
    "'base' partition) is updated by COMBINING it with the new batch's "
    "partial aggregate — counts add, exact-cents sums add — instead of "
    "rescanning the base. This is why the engine's money aggregates are "
    "kept re-aggregatable (cents stay integer until presentation): at "
    "100 TB the nightly delta touches the delta, never the lake. The "
    "oracle recomputes from scratch; combine-equals-recompute IS the "
    "correctness claim.",
)
def agg_incremental_update(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    delta = o.filter(F.col("o_orderkey") % 10 == 0)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("cents"),
        )

    combined = (
        partial(base).unionByName(partial(delta))
        .groupBy("o_orderpriority")
        .agg(F.sum("n_orders").alias("n_orders"), F.sum("cents").alias("cents"))
    )
    return combined.select(
        "o_orderpriority",
        "n_orders",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("total_value"),
    )


@query(
    "table_diff_by_key",
    oracle="""
    WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                WHERE o_orderkey % 7 <> 0),
    v2 AS (SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                       ELSE o_totalprice END AS o_totalprice
           FROM orders WHERE o_orderkey % 11 <> 0)
    SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                WHEN v1.o_orderstatus <> v2.o_orderstatus
                  OR v1.o_totalprice <> v2.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_kind,
           COUNT(*) AS n_rows
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    GROUP BY 1
    """,
    section="2.7",
    doc="Table diff by key — the reconciliation op run after a backfill or "
    "migration (which rows were added / removed / changed between two "
    "table versions?): one full outer join on the key, per-column "
    "comparison, one rollup. Versions are synthesized from orders with "
    "deterministic row drops and a price perturbation so all four "
    "outcomes occur. At 100 TB both sides shuffle once on the key — "
    "same cost class as any key join; with pre-bucketed tables "
    "(operators/bucketing.py) even that exchange disappears.",
)
def table_diff_by_key(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    v1 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    kind = (
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(
            (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return j.select(kind.alias("change_kind")).groupBy("change_kind").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH freq AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY o_custkey),
    stats AS (
      SELECT COUNT(*) AS n_keys, SUM(n) AS n_rows, MAX(n) AS max_key_rows
      FROM freq
    ),
    topk AS (SELECT SUM(n) AS top10_rows
             FROM (SELECT n FROM freq ORDER BY n DESC, k ASC LIMIT 10))
    SELECT s.n_keys, CAST(s.n_rows AS BIGINT) AS n_rows, s.max_key_rows,
           CAST(t.top10_rows AS BIGINT) AS top10_rows,
           CAST((s.max_key_rows * s.n_keys * 1000000) // s.n_rows AS BIGINT)
             AS skew_ppm,
           CAST((t.top10_rows * 1000000) // s.n_rows AS BIGINT) AS top10_ppm
    FROM stats s, topk t
    """,
    section="2.4",
    doc="Join-key skew diagnostics — the profile run BEFORE choosing a "
    "join strategy at 100 TB: per-key counts (one shuffle), then the "
    "max-key/mean ratio (skew_ppm: 1e6 = uniform; >> 1e6 = a hot key "
    "that will straggle a hash join) and the row mass of the 10 hottest "
    "keys. skew_ppm > ~4e6 is the signal to reach for "
    "operators/skew.py:salted_join or rely on AQE skew splitting; this "
    "query is the evidence, not the guess. Outputs are exact integers "
    "only — ratios are quantized to parts-per-million via integer "
    "floor-division, so the hash is immune to how the oracle engine "
    "formats/promotes doubles (raw-double ratios went driver-red in r02 "
    "despite matching a local DuckDB 1.0.0 bit-for-bit).",
)
def diag_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    freq = o.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
    )
    topk = (
        freq.orderBy(F.desc("n"), F.asc("k"))
        .limit(10)
        .agg(F.sum("n").alias("top10_rows"))
    )
    return stats.crossJoin(topk).select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        "top10_rows",
        F.expr("max_key_rows * n_keys * 1000000L div n_rows").alias("skew_ppm"),
        F.expr("top10_rows * 1000000L div n_rows").alias("top10_ppm"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct_custs
    FROM orders GROUP BY o_orderpriority
    """,
    section="2.4",
    doc="EXACT distinct counting via re-aggregatable bitmaps "
    "(bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg, "
    "Spark 3.5+): keys map to (bucket, bit), per-(group, bucket) bitmaps "
    "OR-combine map-side, and the final count is a sum of popcounts. "
    "Unlike COUNT(DISTINCT) — whose partial state is the raw key set, "
    "shuffled in full — bitmap partials are fixed-size per bucket, "
    "mergeable, and storable: the materialized-rollup path to exact "
    "distincts at 100 TB. The oracle is the plain COUNT(DISTINCT).",
)
def agg_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    per_bucket = (
        o.selectExpr(
            "o_orderpriority",
            "bitmap_bucket_number(o_custkey) AS bucket",
            "bitmap_bit_position(o_custkey) AS pos",
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("b"))
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.expr("sum(bitmap_count(b))").alias("n_distinct_custs")
    )


@query(
    "set_union_evolved_schema",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
          FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL BY NAME
          SELECT o_orderkey, o_orderpriority, o_totalprice
          FROM orders WHERE o_orderkey % 2 = 1)
    """,
    section="2.7",
    doc="Schema-evolving union: unionByName(allowMissingColumns=True) "
    "aligns batches by COLUMN NAME and null-fills what a side lacks — "
    "how a lake unions last year's table with this year's wider one "
    "(positional UNION would silently mismatch columns; here the two "
    "sides even declare their columns in different orders). DuckDB's "
    "UNION ALL BY NAME is the oracle twin.",
)
def set_union_evolved_schema(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    old_batch = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new_batch = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@query(
    "dedup_latest_by_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_date,
           o_totalprice AS latest_price
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
      FROM orders
    ) WHERE rk = 1
    """,
    section="2.4",
    doc="Keep-latest-record-per-key — the single most common lake "
    "compaction query (CDC snapshots, upsert resolution, 'current state' "
    "views): one row_number window over the key ordered by recency with "
    "a total tie-break, keep rank 1. One shuffle; at 100 TB this is the "
    "read-side half of merge_by_key (io.py), and AQE handles the hot "
    "keys a popular entity produces. QUALIFY-style semantics without "
    "the syntax (Spark has no QUALIFY clause).",
)
def dedup_latest_by_key(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_date"),
            F.col("o_totalprice").alias("latest_price"),
        )
    )


@query(
    "join_multiway_local_supplier",
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_lineitems,
           {o_msum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    section="2.3",
    doc="Six-table star-chain join (TPC-H Q5 shape: local-supplier "
    "revenue by nation): region filter -> nation -> customer -> orders "
    "-> lineitem -> supplier, with the extra same-nation residual "
    "(s_nationkey = c_nationkey) that makes the last join NOT a plain "
    "star edge. The query exists to exercise Catalyst's join reordering "
    "and dim broadcasting across a deep tree: region/nation/customer/"
    "supplier broadcast, the two fact tables meet in at most one "
    "shuffled join. Revenue in exact cents (the discount product rounds "
    "to cents first, identically in both engines).",
)
def join_multiway_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    r = T(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf, "nation")
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    s = T(spark, sf, "supplier")
    joined = (
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(c, c["c_nationkey"] == n["n_nationkey"])
        .join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        msum(revenue, "revenue"),
    )


@query(
    "project_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey,
           (SELECT MAX(l.l_shipdate) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS last_ship,
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS n_items
    FROM orders o
    WHERE o.o_orderkey % 50 = 0
    """,
    section="2.2",
    doc="Correlated SCALAR subqueries in the projection (not just WHERE): "
    "per-order last ship date and item count pulled inline. Catalyst "
    "de-correlates each into an aggregate + left outer join — the "
    "rewrite that makes per-row-looking lookups scale (a naive "
    "re-execution per row would be O(n) scans). Orders sampled by key "
    "modulo to keep the checked result compact.",
)
def project_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "orders").createOrReplaceTempView("sq_orders")
    T(spark, sf, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey,
               (SELECT MAX(l.l_shipdate) FROM sq_lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS last_ship,
               (SELECT COUNT(*) FROM sq_lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_items
        FROM sq_orders o
        WHERE o.o_orderkey % 50 = 0
        """
    )


@query(
    "project_lateral_alias",
    oracle="""
    SELECT o_orderkey,
           CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 9) // 10 AS DOUBLE) / 100.0 AS discounted,
           CAST(((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 9) // 10) * 17 // 100 AS DOUBLE) / 100.0 AS tax_on_discounted,
           CAST((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 9) // 10
                + ((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 9) // 10) * 17 // 100 AS DOUBLE) / 100.0 AS total_due
    FROM orders
    """,
    section="2.2",
    doc="Lateral column aliases (Spark 3.4+): a SELECT item referencing a "
    "sibling alias defined in the same list — the spreadsheet-style "
    "derivation chain (discounted -> tax -> total) without nesting "
    "subqueries or repeating expressions. The oracle expands the chain "
    "manually. The derivation runs in EXACT integer cents with floor "
    "division (round-the-double chains land on half-cent boundaries "
    "where Spark's decimal-string rounding and DuckDB's binary rounding "
    "disagree) — the same reason the engine's money policy exists.",
)
def project_lateral_alias(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "orders").createOrReplaceTempView("la_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) * 9 DIV 10 AS discounted_cents,
               discounted_cents * 17 DIV 100 AS tax_cents,
               discounted_cents + tax_cents AS total_cents,
               CAST(discounted_cents AS DOUBLE) / 100.0 AS discounted,
               CAST(tax_cents AS DOUBLE) / 100.0 AS tax_on_discounted,
               CAST(total_cents AS DOUBLE) / 100.0 AS total_due
        FROM la_orders
        """
    ).select("o_orderkey", "discounted", "tax_on_discounted", "total_due")


_PR_ITER = (
    "SELECT n.node, "
    "CAST(150000 + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS r "
    "FROM pr_nodes n LEFT JOIN ("
    "SELECT e.dst AS node, SUM(p.r // od.d) AS s "
    "FROM {prev} p JOIN pr_outdeg od ON od.src = p.node "
    "JOIN pr_edges e ON e.src = p.node GROUP BY e.dst) s "
    "ON s.node = n.node"
)


@query(
    "graph_pagerank_centrality",
    oracle=f"""
    WITH pr_edges AS (
      SELECT DISTINCT 2*l_suppkey AS src, 2*l_partkey+1 AS dst FROM lineitem
      UNION
      SELECT DISTINCT 2*l_partkey+1 AS src, 2*l_suppkey AS dst FROM lineitem
    ),
    pr_outdeg AS (SELECT src, COUNT(*) AS d FROM pr_edges GROUP BY src),
    pr_nodes AS (SELECT DISTINCT src AS node FROM pr_edges
                 UNION SELECT DISTINCT dst FROM pr_edges),
    it0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM pr_nodes),
    it1 AS ({_PR_ITER.format(prev="it0")}),
    it2 AS ({_PR_ITER.format(prev="it1")}),
    it3 AS ({_PR_ITER.format(prev="it2")}),
    it4 AS ({_PR_ITER.format(prev="it3")})
    SELECT node, r AS rank_u6 FROM it4
    """,
    section="2.4",
    doc="Iterative-algorithm tier: 4 power-method sweeps of INTEGER "
    "PageRank (operators/pagerank.py) over the bidirectional "
    "supplier-part supply graph (nodes 2*suppkey / 2*partkey+1 so the "
    "two key spaces cannot collide; bidirection gives every node "
    "out-degree >= 1, removing the dangling-mass term). The centrality "
    "signal corpus curation runs over link graphs, expressed as the "
    "same join+agg shuffle pair as everything else, repeated k times "
    "with lineage truncation. Rank arithmetic is integer micro-units "
    "end-to-end (r' = 150000 + (17*sum(r div outdeg)) div 20, the "
    "gcd-reduced exact form of 0.85; zero-in-degree nodes keep the "
    "teleport rank via a full-node-set left join) — "
    "order-independent and engine-independent, so a 4-deep iterative "
    "computation still hash-matches the oracle exactly; a double-typed "
    "PageRank cannot (shuffle-order float sums). Oracle = the same four "
    "sweeps as chained CTEs.",
)
def graph_pagerank_centrality(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators.pagerank import pagerank_integer

    li = T(spark, sf, "lineitem")
    fwd = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return pagerank_integer(edges, iterations=4).select(
        "node", "rank_u6"
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, qty, n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, qty ASC) AS rk
      FROM counts
    )
    SELECT l_returnflag, qty AS mode_qty, CAST(n AS BIGINT) AS mode_count
    FROM ranked WHERE rk = 1
    """,
    section="2.4",
    doc="Statistical mode per group with a DETERMINISTIC tie-break "
    "(highest count, then smallest value) — Spark 4's builtin mode() "
    "returns an arbitrary value on ties, which can never hash-match "
    "another engine, so the engine formulation is count -> "
    "row_number() == 1: two shuffles total (count keys, then the "
    "per-group window over the tiny count relation), both partial-"
    "aggregated map-side. The window runs over |distinct (flag, qty)| "
    "rows — domain-bounded, not row-bounded, so the plan is identical "
    "at 100 TB.",
)
def agg_mode_per_group(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("qty"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "dq_ks_drift",
    oracle="""
    WITH v AS (
      SELECT o_orderstatus AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ), per AS (
      SELECT v,
             SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS b
      FROM v GROUP BY v
    ), cum AS (
      SELECT CAST(SUM(a) OVER (ORDER BY v) AS BIGINT) AS ca,
             CAST(SUM(b) OVER (ORDER BY v) AS BIGINT) AS cb
      FROM per
    ), tot AS (
      SELECT CAST(SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM v
    )
    SELECT n1, n2,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS BIGINT) AS ks_num,
           CAST(MAX(ABS(ca * n2 - cb * n1)) * 1000000
                // (n1 * n2) AS BIGINT) AS ks_micro
    FROM cum, tot GROUP BY n1, n2
    """,
    section="2.4",
    doc="Two-sample Kolmogorov-Smirnov drift statistic between the "
    "fulfilled ('F') and open ('O') order-price distributions — the "
    "distribution-shift monitor a training-data pipeline runs between "
    "ingest batches before accepting a new snapshot. EXACT integer "
    "formulation: values quantized to cents, per-value cohort counts "
    "(one shuffle over distinct values), cumulative counts via an "
    "ordered window, and D expressed as the integer numerator "
    "max|ca*n2 - cb*n1| over the common denominator n1*n2 (reported "
    "quantized to ppm) — no float CDFs, so it hash-matches any engine. "
    "The global-order window runs over DISTINCT cent values only "
    "(domain-bounded; price domains don't grow with row count), and "
    "the count products stay in int64 up to ~3e9 rows per cohort — "
    "beyond that, switch the final ratio to double (D itself needs no "
    "exactness at that scale, only the counts do).",
)
def dq_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(F.col("o_orderstatus").isin("F", "O"))
    v = o.select(
        F.col("o_orderstatus").alias("g"), cents("o_totalprice").alias("v")
    )
    per = v.groupBy("v").agg(
        F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    tot = v.agg(
        F.sum(F.when(F.col("g") == "F", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("g") == "O", 1).otherwise(0)).cast("long").alias("n2"),
    )
    return (
        cum.crossJoin(tot)
        .groupBy("n1", "n2")
        .agg(F.max(F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1"))).alias("ks_num"))
        .select(
            "n1",
            "n2",
            "ks_num",
            F.expr("ks_num * 1000000L div (n1 * n2)").alias("ks_micro"),
        )
    )


@query(
    "dq_benford_profile",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT c.digit, c.n,
           CAST(c.n * 1000000 // t.total AS BIGINT) AS obs_ppm,
           CAST(floor(ln(1.0 + 1.0 / CAST(c.digit AS DOUBLE)) / ln(10.0)
                      * 1000000.0 + 0.5) AS BIGINT) AS benford_ppm
    FROM counts c, tot t
    """,
    section="2.4",
    doc="Benford first-digit profile of order prices — the anomaly / "
    "fabricated-data screen auditors run on financial columns: observed "
    "first-significant-digit frequency (quantized to ppm) next to the "
    "Benford expectation log10(1 + 1/d). The digit is extracted from "
    "the INTEGER-CENTS string (integer-to-text formatting is identical "
    "across engines; float-to-text is not, and a float log10 at a "
    "power-of-ten boundary could misclassify the digit). One count "
    "shuffle over a 9-value domain, one 1-row total crossJoin; "
    "log10(1+1/d) follows the house transcendental policy (ln/ln, "
    "engines agree to ~1 ulp, quantization boundaries far away).",
)
def dq_benford_profile(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.expr(
            "CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    return counts.crossJoin(tot).select(
        "digit",
        "n",
        F.expr("n * 1000000L div total").alias("obs_ppm"),
        F.expr(
            "CAST(floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("benford_ppm"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH wv AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, qty, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS total
      FROM wv
    ),
    hit AS (
      SELECT l_returnflag, qty,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY qty) AS rk
      FROM cum WHERE 2 * cw >= total
    )
    SELECT l_returnflag, qty AS weighted_median_qty FROM hit WHERE rk = 1
    """,
    section="2.4",
    doc="Weighted median: the smallest quantity v whose cumulative "
    "revenue weight reaches half the group's total — the robust center "
    "a price-weighted distribution summary needs (plain median treats "
    "a 1-cent and a 10k-dollar line item alike). EXACT integer "
    "formulation: weights are summed as cents per distinct value (one "
    "shuffle over the value domain), the cumulative/total windows run "
    "over DISTINCT values only (domain-bounded), and the 2*cw >= total "
    "comparison is pure int64 — no double quantile interpolation, so "
    "it hash-matches any engine.",
)
def agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    wv = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.sum(cents("l_extendedprice")).alias("w"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = wv.select(
        "l_returnflag",
        "qty",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("total"),
    )
    hit = cum.filter(2 * F.col("cw") >= F.col("total")).withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("l_returnflag").orderBy("qty")),
    )
    return hit.filter(F.col("rk") == 1).select(
        "l_returnflag", F.col("qty").alias("weighted_median_qty")
    )


@query(
    "cdc_apply_changes",
    oracle="""
    WITH log AS (
      SELECT o_custkey AS key, o_orderkey AS seq,
             CASE WHEN o_orderkey % 10 = 0 THEN 'D'
                  WHEN o_orderkey % 10 < 4 THEN 'U'
                  ELSE 'I' END AS op,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS val_cents
      FROM orders
    ),
    latest AS (
      SELECT key, seq, op, val_cents,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rk
      FROM log
    )
    SELECT key, seq AS applied_seq, op AS last_op, val_cents
    FROM latest WHERE rk = 1 AND op <> 'D'
    """,
    section="2.5",
    doc="CDC changelog application — collapse an insert/update/delete "
    "change stream (synthesized from orders: op from the order key, "
    "sequence = the key itself) into the final table state: latest "
    "change per key wins, keys whose last operation is a DELETE leave "
    "the snapshot. This is what Delta/Iceberg MERGE-from-CDC compiles "
    "to for last-writer-wins semantics — one shuffle on the merge key, "
    "a per-key window over that key's changes, a filter; the full "
    "dedup_latest_by_key shape plus tombstone handling. Deterministic: "
    "the sequence column totally orders each key's changes.",
)
def cdc_apply_changes(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    k = F.col("o_orderkey")
    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(k % 10 == 0, "D").when(k % 10 < 4, "U").otherwise("I").alias("op"),
        cents("o_totalprice").alias("val_cents"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        log.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("op") != "D"))
        .select(
            "key",
            F.col("seq").alias("applied_seq"),
            F.col("op").alias("last_op"),
            "val_cents",
        )
    )


@query(
    "join_spatial_grid",
    oracle="""
    WITH a AS (
      SELECT c_custkey,
             CAST(c_custkey % 100 AS DOUBLE) - 50.0 + 0.5 AS lat,
             CAST((c_custkey * 7) % 340 AS DOUBLE) - 170.0 + 0.25 AS lon
      FROM customer
    ),
    b AS (
      SELECT s_suppkey,
             CAST((s_suppkey * 3 + 1) % 100 AS DOUBLE) - 50.0 + 0.5 AS lat,
             CAST(((s_suppkey * 3 + 1) * 7) % 340 AS DOUBLE) - 170.0 + 0.25 AS lon
      FROM supplier
    )
    SELECT a.c_custkey, b.s_suppkey,
           CAST(floor(2.0 * 6371000.0 * asin(sqrt(
             sin((radians(b.lat) - radians(a.lat)) / 2.0)
               * sin((radians(b.lat) - radians(a.lat)) / 2.0)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin((radians(b.lon) - radians(a.lon)) / 2.0)
               * sin((radians(b.lon) - radians(a.lon)) / 2.0)
           )) + 0.5) AS BIGINT) AS dist_m
    FROM a JOIN b ON TRUE
    WHERE 2.0 * 6371000.0 * asin(sqrt(
             sin((radians(b.lat) - radians(a.lat)) / 2.0)
               * sin((radians(b.lat) - radians(a.lat)) / 2.0)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin((radians(b.lon) - radians(a.lon)) / 2.0)
               * sin((radians(b.lon) - radians(a.lon)) / 2.0)
           )) <= 80000.0
    """,
    section="2.3",
    doc="Spatial radius join via grid bucketing — the scale pattern for "
    "point-in-radius joins Spark has no native operator for: both point "
    "sets hash into 1.5-degree grid cells, one side expands to its 3x3 "
    "cell neighborhood (a 9x map-side fanout, NOT a 9x shuffle of the "
    "other side), candidates meet in an equi-join on the cell id, and "
    "the exact haversine predicate filters residually. Correct by "
    "geometry: within the synthesis envelope (|lat| <= 49.5 so a "
    "1.5-degree lon cell spans >= 108 km > the 80 km radius; points "
    "kept 10 degrees off the antimeridian) every true pair shares a "
    "neighborhood cell, so the grid join equals the oracle's full "
    "cross-join-and-filter — which is exactly what it replaces: "
    "candidate volume is O(points x neighborhood density), never "
    "O(n^2). Distances in integer meters (shared ~1-ulp transcendental "
    "policy, quantization boundary whole meters away).",
)
def join_spatial_grid(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.queries.functions import (
        _geo_lat,
        _geo_lon,
        _haversine_m,
    )

    cell = 1.5
    a = T(spark, sf, "customer").select(
        "c_custkey",
        F.expr(_geo_lat("c_custkey")).alias("lat_a"),
        F.expr(_geo_lon("c_custkey")).alias("lon_a"),
    )
    b = T(spark, sf, "supplier").select(
        "s_suppkey",
        F.expr(_geo_lat("(s_suppkey * 3 + 1)")).alias("lat_b"),
        F.expr(_geo_lon("(s_suppkey * 3 + 1)")).alias("lon_b"),
    )
    offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))
    a_cells = (
        a.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "*",
            (F.floor(F.col("lat_a") / cell) + F.col("dx")).alias("cx"),
            (F.floor(F.col("lon_a") / cell) + F.col("dy")).alias("cy"),
        )
        .drop("dx", "dy")
    )
    b_cells = b.select(
        "*",
        F.floor(F.col("lat_b") / cell).alias("cx"),
        F.floor(F.col("lon_b") / cell).alias("cy"),
    )
    dist = F.expr(_haversine_m("lat_a", "lon_a", "lat_b", "lon_b"))
    return (
        a_cells.join(b_cells, ["cx", "cy"])
        .select("c_custkey", "s_suppkey", dist.alias("dist_m"))
        .filter(F.col("dist_m") <= 80000)
    )


@query(
    "dq_null_profile",
    oracle="""
    SELECT 'o_orderstatus' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_status_nonopen', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(NULLIF(o_orderstatus, 'O')) AS BIGINT),
           CAST(COUNT(DISTINCT NULLIF(o_orderstatus, 'O')) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    """,
    section="2.4",
    doc="Column profiling (null counts + distinct cardinality per "
    "column) — the first pass any data-quality/contract system runs on "
    "a new table. The Spark side computes every column's metrics in "
    "ONE scan + one aggregate (count/count-distinct pairs side by "
    "side) and unpivots to long form map-side; the oracle spells the "
    "same thing as per-column UNION ALL aggregates. One column "
    "(o_orderstatus with 'O' nulled) is profiled via NULLIF so nonzero "
    "null counts are exercised. At 100 TB: exact count-distinct per "
    "column shuffles each column's domain — swap in "
    "approx_count_distinct for the profile-only use case (that tier "
    "exists as agg_approx_count_distinct).",
)
def dq_null_profile(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").withColumn(
        "o_status_n", F.expr("NULLIF(o_orderstatus, 'O')")
    )
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderstatus").alias("c1"),
        F.countDistinct("o_orderstatus").alias("d1"),
        F.count("o_orderpriority").alias("c2"),
        F.countDistinct("o_orderpriority").alias("d2"),
        F.count("o_status_n").alias("c3"),
        F.countDistinct("o_status_n").alias("d3"),
        F.count("o_custkey").alias("c4"),
        F.countDistinct("o_custkey").alias("d4"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderstatus").alias("column_name"),
                    F.col("n_rows"),
                    (F.col("n_rows") - F.col("c1")).alias("n_null"),
                    F.col("d1").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("column_name"),
                    F.col("n_rows"),
                    (F.col("n_rows") - F.col("c2")).alias("n_null"),
                    F.col("d2").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("o_status_nonopen").alias("column_name"),
                    F.col("n_rows"),
                    (F.col("n_rows") - F.col("c3")).alias("n_null"),
                    F.col("d3").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("o_custkey").alias("column_name"),
                    F.col("n_rows"),
                    (F.col("n_rows") - F.col("c4")).alias("n_null"),
                    F.col("d4").alias("n_distinct"),
                ),
            )
        ).alias("p")
    ).select("p.column_name", "p.n_rows", "p.n_null", "p.n_distinct")


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS dirty_key,
             substr(c_name, 1, 10) || 'x' || substr(c_name, 12) AS dirty_name
      FROM customer WHERE c_custkey % 3 = 0
    ),
    clean AS (SELECT c_custkey AS clean_key, c_name FROM customer)
    SELECT clean_key, dirty_key,
           CAST(levenshtein(c_name, dirty_name) AS BIGINT) AS edit_dist
    FROM clean JOIN dirty
      ON substr(c_name, 15, 4) = substr(dirty_name, 15, 4)
    WHERE levenshtein(c_name, dirty_name) <= 2
    """,
    section="2.3",
    doc="Fuzzy (edit-distance) join with blocking — the entity-"
    "resolution workhorse: a corrupted copy of every third customer "
    "name (one character overwritten) re-links to its clean source by "
    "levenshtein <= 2, but candidates meet ONLY within a blocking key "
    "(the name's last-4-digit substring, untouched by the corruption) "
    "— an equi-join whose candidate volume is block-size bounded, "
    "never the |clean| x |dirty| cross product a naive distance join "
    "needs. Same blocking discipline as join_spatial_grid (grid "
    "cells) and the LSH tiers (hash buckets): cheap exact key first, "
    "expensive residual predicate second. levenshtein agrees exactly "
    "between engines (integer DP, no floats).",
)
def join_fuzzy_blocked(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    dirty = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.concat(
            F.substring("c_name", 1, 10), F.lit("x"), F.expr("substring(c_name, 12)")
        ).alias("dirty_name"),
    )
    clean = c.select(F.col("c_custkey").alias("clean_key"), "c_name")
    joined = clean.join(
        dirty,
        F.substring("c_name", 15, 4) == F.substring("dirty_name", 15, 4),
    )
    return joined.select(
        "clean_key",
        "dirty_key",
        F.levenshtein("c_name", "dirty_name").cast("long").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 2)


@query(
    "agg_gini_coefficient",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS seg,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    ranked AS (
      SELECT seg, x,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY x, x) AS i,
             COUNT(*) OVER (PARTITION BY seg) AS n_seg
      FROM v
    ),
    sums AS (
      SELECT seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM((2 * i - n_seg - 1) * x) AS BIGINT) AS gini_num
      FROM ranked GROUP BY seg
    )
    SELECT seg, n, gini_num,
           CAST(n * sx AS BIGINT) AS gini_den,
           CAST(floor(CAST(gini_num AS DOUBLE) / CAST(n * sx AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS gini_ppm
    FROM sums
    """,
    section="2.4",
    doc="Gini coefficient of order value per market segment — the "
    "inequality/concentration statistic (is revenue dominated by a few "
    "giant orders?). Sorted-rank identity G = Sum((2i - n - 1) * x_i) "
    "/ (n * Sum(x)): values as cents, ranks from a per-segment sort "
    "(ties ordered by value, so any tie permutation yields the same "
    "numerator — equal x under adjacent i). The exact int64 numerator "
    "and denominator are OUTPUT; the ppm figure divides them as "
    "doubles (identical int64->double rounding and one division in "
    "both engines — deterministic cross-engine at any magnitude, "
    "unlike numerator*1e6 integer math, which overflows int64 past "
    "~sf0.1). One segment-keyed window + one aggregate — the same "
    "single sort a percentile needs.",
)
def agg_gini_coefficient(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    v = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), cents("o_totalprice").alias("x")
    )
    w = Window.partitionBy("seg").orderBy("x")
    ranked = v.withColumn("i", F.row_number().over(w)).withColumn(
        "n_seg", F.count(F.lit(1)).over(Window.partitionBy("seg"))
    )
    sums = ranked.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum((2 * F.col("i") - F.col("n_seg") - 1) * F.col("x"))
        .cast("long")
        .alias("gini_num"),
    )
    return sums.select(
        "seg",
        "n",
        "gini_num",
        (F.col("n") * F.col("sx")).alias("gini_den"),
        F.expr(
            "CAST(floor(CAST(gini_num AS DOUBLE) / CAST(n * sx AS DOUBLE)"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT o_custkey, o_orderkey AS key_a,
             CAST(o_orderdate AS DATE) AS s_a,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 15 AS INTEGER) AS e_a
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    b AS (
      SELECT o_custkey, o_orderkey AS key_b,
             CAST(o_orderdate AS DATE) AS s_b,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 10 AS INTEGER) AS e_b
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT a.o_custkey, key_a, key_b,
           CAST(date_diff('day',
                          greatest(s_a, s_b),
                          least(e_a, e_b)) + 1 AS BIGINT) AS overlap_days
    FROM a JOIN b ON a.o_custkey = b.o_custkey
    WHERE s_a <= e_b AND s_b <= e_a
    """,
    section="2.3",
    doc="Interval-overlap join (temporal twin of join_spatial_grid): two "
    "per-customer interval sets (even/odd orders with orderkey-derived "
    "durations) pair where their date ranges intersect, reporting the "
    "overlap length. Scale shape: each interval explodes map-side to "
    "the 7-day buckets it covers (spans <= 15 days -> <= 4 buckets), "
    "candidates meet in a (custkey, bucket) equi-join, duplicate "
    "bucket-pairings collapse with one distinct, and the exact overlap "
    "predicate filters residually — candidate volume is O(intervals x "
    "temporal density), never a per-key cross product (the oracle "
    "formulation, correct here only because synthetic customers have "
    "few orders). The same bucket-join discipline as join_range / "
    "join_spatial_grid / the LSH tiers.",
)
def join_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")

    def side(parity: int, span_mod: int, tag: str):
        return o.filter(F.col("o_orderkey") % 2 == parity).select(
            "o_custkey",
            F.col("o_orderkey").alias(f"key_{tag}"),
            F.col("o_orderdate").cast("date").alias(f"s_{tag}"),
            F.expr(
                f"date_add(CAST(o_orderdate AS DATE), CAST(o_orderkey % {span_mod} AS INT))"
            ).alias(f"e_{tag}"),
        )

    def with_buckets(df, tag: str):
        epoch = f"datediff(s_{tag}, DATE '1970-01-01')"
        epoch_e = f"datediff(e_{tag}, DATE '1970-01-01')"
        return df.withColumn(
            "bucket",
            F.explode(F.expr(f"sequence({epoch} div 7, {epoch_e} div 7)")),
        )

    a = with_buckets(side(0, 15, "a"), "a")
    b = with_buckets(side(1, 10, "b"), "b")
    return (
        a.join(b, ["o_custkey", "bucket"])
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        .select(
            "o_custkey",
            "key_a",
            "key_b",
            (
                F.datediff(
                    F.least("e_a", "e_b"), F.greatest("s_a", "s_b")
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
        .distinct()
    )


# Welch's t from exact integer sums, evaluated as ONE shared double
# expression tree (identical int64->double conversions and IEEE ops in
# both engines; sum-of-squares stays integer until the division, and
# the naive sum^2/n term is computed in doubles because sum^2 overflows
# int64 — determinism comes from identical operand trees, not integer
# exactness).
_WELCH_T_MICRO = (
    "CAST(floor(("
    " (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "  - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt("
    "   ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    "     / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))"
    "    / CAST(n1 AS DOUBLE)"
    "   + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
    "     / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))"
    "    / CAST(n2 AS DOUBLE)"
    " )) * 1000000.0 + 0.5) AS BIGINT)"
)


@query(
    "dq_welch_t_drift",
    oracle=f"""
    WITH v AS (
      SELECT o_orderstatus AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN g = 'F' THEN x ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN g = 'F' THEN x * x ELSE 0 END) AS BIGINT) AS q1,
             CAST(SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN g = 'O' THEN x ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN g = 'O' THEN x * x ELSE 0 END) AS BIGINT) AS q2
      FROM v
    )
    SELECT n1, n2, {_WELCH_T_MICRO} AS t_micro FROM s
    """,
    section="2.4",
    doc="Welch's two-sample t statistic between the fulfilled/open "
    "order-price cohorts — the parametric mean-shift companion to "
    "dq_ks_drift's distribution-shape test (a drift monitor typically "
    "runs both: KS catches shape changes, t catches mean drift with "
    "more power). Count/sum/sum-of-squares accumulate as exact int64 "
    "in ONE aggregate over the scan (x*x <= ~4e14 per row, sums safe "
    "to ~2e4 rows per 1e18; beyond that pre-scale cents to dollars); "
    "the t value itself is one shared double expression tree, "
    "quantized to micro-units. Zero shuffles beyond the single "
    "partial-agg reduce.",
)
def dq_welch_t_drift(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(F.col("o_orderstatus").isin("F", "O"))
    x = cents("o_totalprice")
    g = F.col("o_orderstatus")
    s = o.agg(
        F.sum(F.when(g == "F", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(g == "F", x).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(g == "F", x * x).otherwise(0)).cast("long").alias("q1"),
        F.sum(F.when(g == "O", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(g == "O", x).otherwise(0)).cast("long").alias("s2"),
        F.sum(F.when(g == "O", x * x).otherwise(0)).cast("long").alias("q2"),
    )
    return s.select("n1", "n2", F.expr(_WELCH_T_MICRO).alias("t_micro"))


@query(
    "join_nearest_value",
    oracle="""
    WITH v AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             (o_orderstatus = 'F') AS is_f
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    w AS (
      SELECT o_custkey, o_orderkey, x, is_f,
             LAST_VALUE(CASE WHEN is_f THEN x END IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY x, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_x,
             LAST_VALUE(CASE WHEN is_f THEN o_orderkey END IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY x, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_k,
             FIRST_VALUE(CASE WHEN is_f THEN x END IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY x, o_orderkey
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_x,
             FIRST_VALUE(CASE WHEN is_f THEN o_orderkey END IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY x, o_orderkey
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_k
      FROM v
    )
    SELECT o_custkey, o_orderkey AS query_key, x AS query_cents,
           CASE WHEN prev_x IS NULL THEN next_k
                WHEN next_x IS NULL THEN prev_k
                WHEN x - prev_x <= next_x - x THEN prev_k
                ELSE next_k END AS nearest_key,
           CASE WHEN prev_x IS NULL THEN next_x - x
                WHEN next_x IS NULL THEN x - prev_x
                WHEN x - prev_x <= next_x - x THEN x - prev_x
                ELSE next_x - x END AS dist_cents
    FROM w
    WHERE NOT is_f
      AND (prev_x IS NOT NULL OR next_x IS NOT NULL)
    """,
    section="2.3",
    doc="1-D nearest-neighbor join: every open order finds its "
    "customer's fulfilled order with the CLOSEST price — the "
    "bidirectional generalization of the as-of join (as-of keeps only "
    "the most-recent-<=; nearest considers both sides and picks the "
    "smaller distance, ties to the lower value). Same one-shuffle "
    "union+window shape as join_asof: both sets sort once per key by "
    "value, last/first IGNORE NULLS carry the flanking candidates to "
    "every probe row, a CASE picks the winner — candidate volume is "
    "2 per probe, never a per-key cross product, and all distances "
    "are exact integer cents.",
)
def join_nearest_value(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(F.col("o_orderstatus").isin("F", "O"))
    v = o.select(
        "o_custkey",
        "o_orderkey",
        cents("o_totalprice").alias("x"),
        (F.col("o_orderstatus") == "F").alias("is_f"),
    )
    ord_w = Window.partitionBy("o_custkey").orderBy("x", "o_orderkey")
    prev_w = ord_w.rowsBetween(Window.unboundedPreceding, -1)
    next_w = ord_w.rowsBetween(1, Window.unboundedFollowing)
    fx = F.when(F.col("is_f"), F.col("x"))
    fk = F.when(F.col("is_f"), F.col("o_orderkey"))
    w = v.select(
        "o_custkey",
        "o_orderkey",
        "x",
        "is_f",
        F.last(fx, ignorenulls=True).over(prev_w).alias("prev_x"),
        F.last(fk, ignorenulls=True).over(prev_w).alias("prev_k"),
        F.first(fx, ignorenulls=True).over(next_w).alias("next_x"),
        F.first(fk, ignorenulls=True).over(next_w).alias("next_k"),
    )
    pick_prev = (F.col("x") - F.col("prev_x")) <= (F.col("next_x") - F.col("x"))
    return (
        w.filter(~F.col("is_f"))
        .filter(F.col("prev_x").isNotNull() | F.col("next_x").isNotNull())
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("query_key"),
            F.col("x").alias("query_cents"),
            F.when(F.col("prev_x").isNull(), F.col("next_k"))
            .when(F.col("next_x").isNull(), F.col("prev_k"))
            .when(pick_prev, F.col("prev_k"))
            .otherwise(F.col("next_k"))
            .alias("nearest_key"),
            F.when(F.col("prev_x").isNull(), F.col("next_x") - F.col("x"))
            .when(F.col("next_x").isNull(), F.col("x") - F.col("prev_x"))
            .when(pick_prev, F.col("x") - F.col("prev_x"))
            .otherwise(F.col("next_x") - F.col("x"))
            .alias("dist_cents"),
        )
    )


@query(
    "agg_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    margins AS (
      SELECT s, p, o,
             CAST(SUM(o) OVER (PARTITION BY s) AS BIGINT) AS row_n,
             CAST(SUM(o) OVER (PARTITION BY p) AS BIGINT) AS col_n,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM obs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(
             (CAST(o AS DOUBLE)
              - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
              - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS chi2_micro
    FROM margins
    """,
    section="2.4",
    doc="Chi-square test of independence between order status and "
    "priority — the categorical-association screen completing the "
    "drift-statistics trio (dq_ks_drift: distribution shape, "
    "dq_welch_t_drift: mean shift, this: categorical dependence). "
    "Observed counts are exact int64 from one contingency aggregate; "
    "expected counts and per-cell terms are one shared double tree, "
    "each cell quantized to micro BEFORE the (tiny, domain-bounded) "
    "sum — associative integer math over a |statuses|x|priorities| "
    "table. Margins via windows over the contingency table, which is "
    "domain-bounded regardless of row count.",
)
def agg_chi_square_independence(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    margins = obs.select(
        "s",
        "p",
        "o",
        F.sum("o").over(Window.partitionBy("s")).cast("long").alias("row_n"),
        F.sum("o").over(Window.partitionBy("p")).cast("long").alias("col_n"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("n"),
    )
    term = (
        "CAST(floor((CAST(o AS DOUBLE)"
        " - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(o AS DOUBLE)"
        " - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))"
        " / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE))"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    return margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").alias("n_rows"),
        F.sum(F.expr(term)).cast("long").alias("chi2_micro"),
    )


@query(
    "agg_market_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey, l_partkey % 50 AS item
      FROM lineitem GROUP BY l_orderkey, l_partkey % 50
    ),
    n_baskets AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb
                  FROM baskets),
    item_n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM baskets GROUP BY item),
    pair_n AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY a.item, b.item
    ),
    scored AS (
      SELECT item_a, item_b, c_ab, ia.c AS c_a, ib.c AS c_b,
             CAST(floor(CAST(c_ab AS DOUBLE) * CAST(nb AS DOUBLE)
                        / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS lift_micro
      FROM pair_n JOIN item_n ia ON item_a = ia.item
                  JOIN item_n ib ON item_b = ib.item, n_baskets
      WHERE c_ab >= 5
    )
    SELECT item_a, item_b, c_ab, c_a, c_b, lift_micro
    FROM scored
    ORDER BY lift_micro DESC, item_a ASC, item_b ASC LIMIT 15
    """,
    section="2.4",
    doc="Market-basket association (pairwise lift) — the classic retail "
    "co-occurrence analysis: which item pairs appear in the same order "
    "more than independence predicts. Items are hashed part groups; "
    "pairs form by a self-equi-join ON THE BASKET KEY (per-basket "
    "fanout is |basket|^2 with baskets of ~4 items — bounded by data "
    "shape, never corpus-size quadratic), counts are exact int64 with "
    "a minimum-support cut BEFORE scoring, lift is one shared double "
    "tree quantized to micro, and the result is a deterministic "
    "top-15. The same support-threshold-then-score shape as "
    "A-priori's first pass.",
)
def agg_market_basket_lift(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    baskets = li.groupBy(
        "l_orderkey", (F.col("l_partkey") % 50).alias("item")
    ).agg(F.lit(1).alias("_one")).drop("_one")
    nb = baskets.agg(
        F.countDistinct("l_orderkey").cast("long").alias("nb")
    )
    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = baskets.select(F.col("l_orderkey"), F.col("item").alias("item_a"))
    b = baskets.select(F.col("l_orderkey"), F.col("item").alias("item_b"))
    pair_n = (
        a.join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("c").alias("c_a"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("c").alias("c_b"))
    scored = (
        pair_n.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                "CAST(floor(CAST(c_ab AS DOUBLE) * CAST(nb AS DOUBLE)"
                " / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("lift_micro"),
        )
    )
    return scored.orderBy(
        F.desc("lift_micro"), F.asc("item_a"), F.asc("item_b")
    ).limit(15)


@query(
    "agg_weekday_seasonality",
    oracle="""
    WITH v AS (
      SELECT isodow(CAST(o_orderdate AS DATE)) - 1 AS weekday,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    per AS (
      SELECT weekday, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(x) AS BIGINT) AS rev_cents
      FROM v GROUP BY weekday
    ),
    tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM per)
    SELECT weekday, n_orders, rev_cents,
           CAST(rev_cents * 1000000 // total AS BIGINT) AS rev_share_ppm
    FROM per, tot
    """,
    section="2.4",
    doc="Weekday seasonality profile: order count, exact-cents revenue "
    "and revenue share (ppm) per ISO weekday (0 = Monday — Spark's "
    "weekday() and DuckDB's isodow()-1 agree on that convention; "
    "Spark's dayofweek() and DuckDB's dayofweek() do NOT agree with "
    "each other, the classic cross-engine calendar trap this query "
    "pins down). One 7-group aggregate + a 1-row total crossJoin — "
    "the shape every calendar-dimension BI rollup takes.",
)
def agg_weekday_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    v = o.select(
        F.weekday(F.col("o_orderdate").cast("date")).alias("weekday"),
        cents("o_totalprice").alias("x"),
    )
    per = v.groupBy("weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("x").cast("long").alias("rev_cents"),
    )
    tot = per.agg(F.sum("rev_cents").cast("long").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "weekday",
        "n_orders",
        "rev_cents",
        F.expr("rev_cents * 1000000L div total").alias("rev_share_ppm"),
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    section="2.7",
    doc="Bag-semantics INTERSECT ALL (intersectAll): each key survives "
    "min(multiplicity_left, multiplicity_right) times — the "
    "multiset law the DISTINCT variant (set_intersect) destroys; "
    "needed when multiplicity IS the signal (per-order rows, not "
    "per-customer membership). Plans as a single count-compare "
    "aggregate family, one shuffle per side on the key.",
)
def set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    left = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return left.intersectAll(right)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    section="2.7",
    doc="Bag-semantics EXCEPT ALL (exceptAll): each key survives "
    "max(multiplicity_left - multiplicity_right, 0) times — the "
    "per-occurrence subtraction reconciliation needs (how many MORE "
    "finished orders than urgent ones per customer), which the "
    "DISTINCT variant (set_except) collapses to membership. Same "
    "count-compare plan family as set_intersect_all.",
)
def set_except_all(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    left = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return left.exceptAll(right)


@query(
    "sort_nulls_ordering",
    oracle="""
    WITH s AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_custkey, bal,
           ROW_NUMBER() OVER (ORDER BY bal DESC NULLS FIRST, c_custkey ASC)
             AS pos_nf,
           ROW_NUMBER() OVER (ORDER BY bal ASC NULLS LAST, c_custkey ASC)
             AS pos_nl
    FROM s
    """,
    section="2.6",
    doc="Explicit NULLS FIRST / NULLS LAST sort directions (the §2.6 "
    "spec row sort_multi_key leaves unexercised — the test tables carry "
    "no nulls, so a nullable balance is synthesized via the "
    "drop_null_rows sentinel trick). Both engines DEFAULT differently "
    "(Spark: nulls first for ASC; DuckDB: nulls last) — the query pins "
    "that EXPLICIT direction flags override those defaults identically, "
    "the portability trap a lake migration hits. Ranks materialize the "
    "order hash-visibly; both windows share one sort-free exchange "
    "(single partition ordering is the semantic under test, not the "
    "scale path — id_assign_contiguous is the distributed ranking).",
)
def sort_nulls_ordering(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    w_nf = Window.orderBy(F.col("bal").desc_nulls_first(), F.col("c_custkey").asc())
    w_nl = Window.orderBy(F.col("bal").asc_nulls_last(), F.col("c_custkey").asc())
    return s.select(
        "c_custkey",
        "bal",
        F.row_number().over(w_nf).alias("pos_nf"),
        F.row_number().over(w_nl).alias("pos_nl"),
    )


@query(
    "sql_pipe_syntax_revenue",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    section="2.4",
    doc="SQL PIPE SYNTAX (Spark 4, SPARK-49555): the linear |> form — "
    "FROM ... |> WHERE ... |> EXTEND ... |> AGGREGATE ... GROUP BY ... "
    "|> ORDER BY — compiling to the IDENTICAL Catalyst plan as the "
    "nested SELECT (the oracle is that nested form; the hash match IS "
    "the equivalence proof). Pipe syntax matters operationally: "
    "dataflow-ordered SQL is how the lakehouse's ad-hoc consulta layer "
    "reads top-to-bottom like the DataFrame API, with no optimization "
    "difference to pay for it.",
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |> EXTEND CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS disc_cents
        |> AGGREGATE SUM(disc_cents) AS revenue_cents, COUNT(*) AS n_lines
             GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


@query(
    "sql_scripting_param_report",
    oracle="""
    WITH thr AS (SELECT quantile_cont(o_totalprice, 0.5) AS t FROM orders)
    SELECT o.o_orderpriority, COUNT(*) AS n_above,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS above_cents
    FROM orders o, thr
    WHERE o.o_totalprice > thr.t
    GROUP BY 1 ORDER BY 1
    """,
    section="2.4",
    doc="SQL SCRIPTING (Spark 4, SQL/PSM BEGIN...END with DECLARE/SET): "
    "a data-derived parameter — the median order value — is computed "
    "into a script variable, then drives the report's predicate; the "
    "whole procedure is ONE spark.sql() call, the way a warehouse "
    "migrates its stored-procedure habits onto the lake without a "
    "driver-language round trip. The variable assignment is a scalar "
    "subquery under the hood (the oracle's CTE is the same plan), so "
    "nothing here escapes Catalyst. Exact interpolated median per the "
    "agg_percentile precedent; money compared and summed in exact "
    "cents.",
)
def sql_scripting_param_report(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "orders").createOrReplaceTempView("script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE;
          SET thr = (SELECT percentile(o_totalprice, 0.5) FROM script_orders);
          SELECT o_orderpriority, COUNT(*) AS n_above,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS above_cents
          FROM script_orders WHERE o_totalprice > thr
          GROUP BY 1 ORDER BY 1;
        END
        """
    )


@query(
    "join_lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(t.rn AS INT) AS rn
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_nationkey = 3
    """,
    section="2.3",
    doc="LATERAL correlated subquery join (SQL 'for each row, run this "
    "subquery'): each nation-3 customer pulls its top-2 orders by "
    "value. Catalyst DECORRELATES the lateral (DecorrelateInnerQuery): "
    "the per-row ORDER BY/LIMIT becomes one partitioned window over "
    "the orders side + a rank filter — a single customer-keyed "
    "shuffle, NOT a per-row subquery execution, which is why the "
    "lateral form is safe at 100 TB. Same result as the top_k_per_"
    "group window idiom; LATERAL is the surface the migrating SQL "
    "user writes.",
)
def join_lateral_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "customer").createOrReplaceTempView("lat_customer")
    T(spark, sf, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
               CAST(t.rn AS INT) AS rn
        FROM lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_nationkey = 3
        """
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           COUNT(*) AS n
    FROM lineitem GROUP BY ALL ORDER BY ALL
    """,
    section="2.4",
    doc="GROUP BY ALL / ORDER BY ALL (the DuckDB-pioneered shorthand, in "
    "Spark since 3.4): every non-aggregate select item becomes a group "
    "key and the full output column list the sort key — resolved at "
    "ANALYSIS time to the explicit forms, so the plan is byte-identical "
    "to GROUP BY 1,2 (the hash match against DuckDB's own GROUP BY ALL "
    "is the cross-engine semantics pin).",
)
def agg_group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "lineitem").createOrReplaceTempView("gba_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS price_cents,
               COUNT(*) AS n
        FROM gba_lineitem GROUP BY ALL ORDER BY ALL
        """
    )


@query(
    "agg_grouping_id_labels",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 0 AND GROUPING(o_orderpriority) = 0
                THEN 'cell'
                WHEN GROUPING(o_orderpriority) = 1 AND GROUPING(o_orderstatus) = 0
                THEN 'status_subtotal'
                WHEN GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 0
                THEN 'priority_subtotal'
                ELSE 'grand_total' END AS level,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY level, status, priority
    """,
    section="2.4",
    doc="GROUPING() indicator labels over a CUBE (the BI-report staple "
    "agg_cube leaves implicit): every output row carries WHICH "
    "aggregation level produced it — cell, either one-dimension "
    "subtotal, or grand total — via the GROUPING() bit, the only "
    "robust way to distinguish a real NULL group from a subtotal row "
    "(COALESCE alone is ambiguous when the data itself contains the "
    "sentinel). One Expand + one hash agg; the level tag is computed "
    "from the grouping bit vector, no second pass.",
)
def agg_grouping_id_labels(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "orders").createOrReplaceTempView("gid_orders")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(o_orderstatus) = 0 AND GROUPING(o_orderpriority) = 0
                    THEN 'cell'
                    WHEN GROUPING(o_orderpriority) = 1 AND GROUPING(o_orderstatus) = 0
                    THEN 'status_subtotal'
                    WHEN GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 0
                    THEN 'priority_subtotal'
                    ELSE 'grand_total' END AS level,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents
        FROM gid_orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY level, status, priority
        """
    )


@query(
    "join_obt_denormalize",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
             AS net_cents,
           o.o_orderpriority, CAST(o.o_orderdate AS DATE) AS orderdate,
           c.c_name, c.c_mktsegment,
           cn.n_name AS cust_nation, cr.r_name AS cust_region,
           s.s_name, sn.n_name AS supp_nation,
           p.p_brand, p.p_type
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
    """,
    section="2.3",
    doc="One-Big-Table denormalization: the full 8-way star flatten "
    "(fact + orders + customer + both nation roles + region + supplier "
    "+ part) that materializes the BI serving table every lakehouse "
    "eventually builds. Plan shape is the point: SEVEN joins, ONE "
    "fact-side shuffle (the orders equi-join on the order key) — every "
    "dimension including the double-role nation broadcasts, so the "
    "wide row is assembled map-side. The 13-column output is the "
    "pruned projection (ReadSchema discipline: the scan reads only "
    "what the OBT carries, not every source column).",
)
def join_obt_denormalize(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
    c = T(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    n = T(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = T(spark, sf, "region")
    s = T(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    p = T(spark, sf, "part").select("p_partkey", "p_brand", "p_type")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"), "n_regionkey")
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_cents"),
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "c_name",
            "c_mktsegment",
            "cust_nation",
            F.col("r_name").alias("cust_region"),
            "s_name",
            "supp_nation",
            "p_brand",
            "p_type",
        )
    )


@query(
    "filter_three_valued_logic",
    oracle="""
    WITH s AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT
      COUNT(*) AS n_rows,
      COUNT(bal) AS n_nonnull,
      COUNT(*) FILTER (bal > 1000) AS gt,
      COUNT(*) FILTER (NOT (bal > 1000)) AS not_gt,
      COUNT(*) FILTER (bal > 1000 OR bal <= 1000) AS gt_or_le,
      COUNT(*) FILTER (bal = NULL) AS eq_null,
      COUNT(*) FILTER (bal IS NULL) AS is_null,
      COUNT(*) FILTER (bal IS DISTINCT FROM NULL) AS distinct_from_null,
      COUNT(*) FILTER (COALESCE(bal > 1000, FALSE) OR bal IS NULL) AS rescued
    FROM s
    """,
    section="2.2",
    doc="Three-valued logic CONTRACT pin: with a synthesized nullable "
    "balance, one scan counts every classic NULL trap side by side — "
    "gt + not_gt < n_rows (NULLs satisfy NEITHER a predicate nor its "
    "negation), the tautology bal>1000 OR bal<=1000 still excludes "
    "NULLs, = NULL matches nothing ever, IS NULL vs IS DISTINCT FROM "
    "NULL are the null-safe forms, and the COALESCE rescue pattern "
    "restores two-valued totals. The hash match proves Spark "
    "(non-ANSI mode included) and DuckDB agree on every one of these "
    "counts — the semantics a SQL migration silently breaks on.",
)
def filter_three_valued_logic(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    b = F.col("bal")
    gt = b > 1000
    return s.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal").alias("n_nonnull"),
        F.count(F.when(gt, 1)).alias("gt"),
        F.count(F.when(~gt, 1)).alias("not_gt"),
        F.count(F.when(gt | (b <= 1000), 1)).alias("gt_or_le"),
        F.count(F.when(b == F.lit(None), 1)).alias("eq_null"),
        F.count(F.when(b.isNull(), 1)).alias("is_null"),
        F.count(F.when(~b.eqNullSafe(F.lit(None)), 1)).alias("distinct_from_null"),
        F.count(F.when(F.coalesce(gt, F.lit(False)) | b.isNull(), 1)).alias("rescued"),
    )
