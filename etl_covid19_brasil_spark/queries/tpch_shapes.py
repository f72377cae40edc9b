"""TPC-H completionist tier: the 15 logical query shapes not yet named in
the registry, adapted to the driver's star schema.

With this module every one of TPC-H's 22 logical plan shapes is present
(Q1 ``agg_groupby_pricing``, Q5 ``join_multiway_local_supplier``, Q8
``agg_market_share``, Q13 ``agg_count_of_counts``, Q14
``agg_promo_revenue_ratio``, Q19 ``filter_disjunctive_bands``, Q21
``join_multi_exists_waiting`` landed earlier; Q2/Q3/Q4/Q6/Q7/Q9/Q10/Q11/
Q12/Q15/Q16/Q17/Q18/Q20/Q22 land here). The value is NOT the benchmark
branding — it is that the 22 shapes are the canonical coverage grid of
decorrelation, multi-way join ordering, scalar-subquery broadcast, and
group-filter patterns an OLAP engine must plan well. Each docstring names
the distinctive plan feature and how Catalyst should execute it at 100 TB.

Schema adaptations (the driver's schema has no partsupp / ship modes /
commit+receipt dates / phone numbers / comments — SURVEY.md §1.2):
- ``partsupp`` is DERIVED: the distinct (l_partkey, l_suppkey) pairs of
  lineitem, with per-pair supply cost = MIN line price (exact cents) and
  availability = SUM quantity. Computed once per query that needs it —
  one agg over the fact table, the exact pre-aggregation a real
  deployment would materialize.
- "late" = shipped > 30/60 days after order date (no receipt date).
- ship MODE buckets = ship-latency bands (no mode column).
- nation "phone codes" = ``n_nationkey % 7`` (no phone column).
- "complaint" suppliers = negative account balance (no comments).

Determinism: money stays in exact integer cents end-to-end (BIGINT
columns, no float sums), counts/quantities are integral doubles cast to
BIGINT before arithmetic, ratios are integer ppm via DIV. The only
double comparisons (Q17's 0.2*avg, Q22's global avg) are computed from
exact integer sums by the identical expression tree in both engines.

Reference basis: the reference's lake exists "para consultas" (arbitrary
SQL over loaded tables, dags/create-data-lake.py:23-25); this tier is the
canonical consulta workload an analytics engine must serve.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_covid19_brasil_spark.registry import T, cents, query

# Shared oracle fragment: the derived partsupp relation (see module doc).
_O_PARTSUPP = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS ps_supplycost_cents,
           CAST(SUM(l_quantity) AS BIGINT) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
"""


def _partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """Derived partsupp: one map-side-combinable agg over the fact table."""
    li = T(spark, sf, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(cents("l_extendedprice")).alias("ps_supplycost_cents"),
        F.sum("l_quantity").cast("long").alias("ps_availqty"),
    )


_DISC_CENTS = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _disc_cents() -> F.Column:
    return cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@query(
    "join_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_O_PARTSUPP}),
    rps AS (
      SELECT ps.*, s.s_name, s.s_acctbal, n.n_name
      FROM ps JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey = 0
    )
    SELECT p.p_partkey, r.s_name, r.n_name,
           r.ps_supplycost_cents AS supplycost_cents,
           CAST(ROUND(r.s_acctbal * 100) AS BIGINT) AS s_acctbal_cents
    FROM part p JOIN rps r ON p.p_partkey = r.ps_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND r.ps_supplycost_cents = (
        SELECT MIN(r2.ps_supplycost_cents) FROM rps r2
        WHERE r2.ps_partkey = p.p_partkey)
    ORDER BY s_acctbal_cents DESC, r.n_name, r.s_name, p.p_partkey
    LIMIT 100
    """,
    section="2.3",
    doc="Minimum-cost supplier per part (TPC-H Q2 shape): the canonical "
    "correlated-MIN subquery, decorrelated into a per-part MIN aggregate "
    "joined back on (part, cost) — Catalyst's RewriteCorrelatedScalarQuery "
    "produces the same two-pass plan a hand decorrelation does. The "
    "region-filtered supplier dimension (20 suppliers after the region "
    "cut) broadcasts into the derived-partsupp agg, so the only "
    "fact-table shuffle is the (part,supp) pre-aggregation; the final "
    "top-100 is a TakeOrderedAndProject. partsupp is derived from "
    "lineitem (module doc) — at 100 TB that derivation is the "
    "materialized pre-agg a deployment maintains incrementally.",
)
def join_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    ps = _partsupp(spark, sf)
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation").filter(F.col("n_regionkey") == 0)
    rps = ps.join(
        F.broadcast(
            s.join(n, s.s_nationkey == n.n_nationkey).select(
                "s_suppkey", "s_name", "s_acctbal", "n_name"
            )
        ),
        ps.ps_suppkey == F.col("s_suppkey"),
    )
    best = rps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost")
    )
    p = T(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        rps.join(best, ["ps_partkey"])
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.col("ps_supplycost_cents").alias("supplycost_cents"),
            cents("s_acctbal").alias("s_acctbal_cents"),
        )
        .orderBy(
            F.desc("s_acctbal_cents"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "agg_shipping_priority_topk",
    oracle=f"""
    SELECT l.l_orderkey, CAST(SUM({_DISC_CENTS}) AS BIGINT) AS revenue_cents,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue_cents DESC, orderdate, l.l_orderkey
    LIMIT 10
    """,
    section="2.4",
    doc="Unshipped-order shipping priority (TPC-H Q3 shape): segment-"
    "filtered customer dimension broadcasts into orders, the date "
    "predicates on BOTH fact sides push to the parquet scans "
    "(order placed before the cutoff, line shipped after), and the "
    "revenue-per-order agg feeds a top-10 TakeOrderedAndProject — no "
    "global sort. The group key includes the order's attributes so the "
    "agg is a single shuffle on the join key it already has.",
)
def agg_shipping_priority_topk(spark: SparkSession, sf: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey")),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(_disc_cents()).alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "agg_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY 1 ORDER BY 1
    """,
    section="2.4",
    doc="Order-priority checking (TPC-H Q4 shape): EXISTS over the fact "
    "table with a CORRELATED inequality (line shipped >30 days after its "
    "own order's date — the late-delivery adaptation, module doc), "
    "counted per priority class. Catalyst rewrites the EXISTS into a "
    "left-semi join on the order key; the quarter filter prunes the "
    "orders scan before the join, and the 5-row result comes off a "
    "partial-agg shuffle. The semi join keeps at-least-one semantics "
    "without deduplicating the fact side.",
)
def agg_order_priority_check(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "agg_revenue_forecast_band",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
             AS forecast_delta_cents,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    section="2.4",
    doc="Forecasting revenue change (TPC-H Q6 shape): the pure scan-"
    "filter-aggregate — every predicate (year band, discount band, "
    "quantity cap) pushes to the parquet reader as min/max-prunable "
    "PushedFilters, and the single global sum is a two-stage partial/"
    "final agg with a one-row exchange. The canonical 'is the scan "
    "path clean' probe: at 100 TB this query is I/O-bound or the "
    "engine is broken.",
)
def agg_revenue_forecast_band(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "forecast_delta_cents"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_trade_volume_nation_pairs",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           CAST(SUM({_DISC_CENTS}) AS BIGINT) AS volume_cents
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    section="2.3",
    doc="Bilateral trade volume (TPC-H Q7 shape): the distinctive feature "
    "is the DISJUNCTIVE cross-dimension predicate — (supplier NATION_1 "
    "and customer NATION_2) OR the reverse — which cannot be pushed into "
    "either dimension alone but CAN be pre-narrowed to the two-nation "
    "set on each side (Catalyst derives n1 IN (...) AND n2 IN (...) as "
    "a weaker pushable filter, then applies the exact disjunction post-"
    "join). Both nation dims and the 2-nation-filtered supplier dim "
    "broadcast; the only shuffle is lineitem⋈orders on the order key, "
    "with the customer side narrowed before its shuffle by its nation "
    "filter. Year extraction groups two shipping years.",
)
def agg_trade_volume_nation_pairs(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_1", "NATION_2")
    s = (
        T(spark, sf, "supplier")
        .join(F.broadcast(n.filter(F.col("n_name").isin(*pair))), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        T(spark, sf, "customer")
        .join(F.broadcast(n.filter(F.col("n_name").isin(*pair))), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_disc_cents()).alias("volume_cents"))
        .select("supp_nation", "cust_nation", "l_year", "volume_cents")
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "agg_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, EXTRACT(YEAR FROM l.l_shipdate) AS o_year,
           CAST(SUM({_DISC_CENTS}
               - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) // 10) AS BIGINT) AS profit_cents
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    section="2.4",
    doc="Product-type profit (TPC-H Q9 shape): profit = discounted price "
    "minus imputed supply cost (retail price DIV 10 per unit — the "
    "schema carries no ps_supplycost, module doc), for parts whose name "
    "matches a substring, by supplier nation and ship year. The "
    "distinctive plan features: a non-sargable LIKE '%...%' that must "
    "evaluate post-scan but STILL prunes the broadcast part dimension "
    "before the fact join (13% selectivity), two broadcast dims into "
    "one fact pass, and exact integer profit arithmetic (cents x "
    "integral quantity) so the sum is order-insensitive.",
)
def agg_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        T(spark, sf, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf, "nation").select("n_nationkey", "n_name")
    li = T(spark, sf, "lineitem")
    # integer DIV semantics (oracle uses DIV): floor division on BIGINT
    profit = _disc_cents() - F.expr(
        "CAST(ROUND(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT) DIV 10"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_cents"))
        .orderBy("nation", "o_year")
    )


@query(
    "agg_returned_item_topk",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM({_DISC_CENTS}) AS BIGINT) AS revenue_cents,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3, 5
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
    section="2.4",
    doc="Returned-item reporting (TPC-H Q10 shape): who returned the most "
    "revenue last quarter. Quarter filter prunes orders before its fact "
    "join; the returnflag filter prunes lineitem at the scan; the agg "
    "groups by the full customer attribute tuple (key, name, nation, "
    "balance) — functionally dependent on the key, so the planner "
    "treats it as one wide group key with no extra shuffle — and the "
    "top-20 is a TakeOrderedAndProject on the aggregated (not raw) "
    "rows.",
)
def agg_returned_item_topk(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation").select("n_nationkey", "n_name")
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey), F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            cents("c_acctbal").alias("acctbal_cents"),
        )
        .agg(F.sum(_disc_cents()).alias("revenue_cents"))
        .select("c_custkey", "c_name", "nation", "revenue_cents", "acctbal_cents")
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


@query(
    "agg_important_stock_share",
    oracle=f"""
    WITH ps AS ({_O_PARTSUPP}),
    nat_ps AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_cents * ps.ps_availqty AS value_cents
      FROM ps JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 3
    )
    SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS part_value_cents
    FROM nat_ps
    GROUP BY 1
    HAVING SUM(value_cents) > (
      SELECT SUM(value_cents) // 500 FROM nat_ps)
    ORDER BY part_value_cents DESC, ps_partkey
    """,
    section="2.4",
    doc="Important-stock identification (TPC-H Q11 shape): parts whose "
    "inventory value within one nation exceeds a FRACTION OF THE GLOBAL "
    "TOTAL — the canonical HAVING-against-uncorrelated-scalar-subquery. "
    "The derived partsupp (module doc) is computed ONCE and reused for "
    "both the per-part agg and the global total (Spark: a cached local "
    "checkpoint would share it; here the two aggs re-derive from the "
    "same shuffle, and AQE reuses the exchange). The scalar total "
    "arrives as a one-row broadcast into the filter — no second pass "
    "over per-part groups. Integer value arithmetic (cents x integral "
    "qty, DIV 500 threshold) keeps the comparison exact.",
)
def agg_important_stock_share(spark: SparkSession, sf: str) -> DataFrame:
    ps = _partsupp(spark, sf)
    s3 = (
        T(spark, sf, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    nat = ps.join(F.broadcast(s3), ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents"),
    )
    per_part = nat.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("part_value_cents")
    )
    # floor-div semantics: sum DIV 500 (both sums are exact BIGINTs)
    total = nat.agg(F.expr("SUM(value_cents) DIV 500").alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value_cents") > F.col("threshold"))
        .select("ps_partkey", "part_value_cents")
        .orderBy(F.desc("part_value_cents"), "ps_partkey")
    )


@query(
    "agg_ship_latency_priority",
    oracle="""
    SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                THEN 'FAST' ELSE 'SLOW' END AS ship_band,
           COUNT(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    section="2.4",
    doc="Shipping-mode priority matrix (TPC-H Q12 shape, ship-latency "
    "bands standing in for ship modes — module doc): per latency band, "
    "how many lines belonged to high- vs low-priority orders. The "
    "distinctive features are the conditional-aggregation pair (two "
    "FILTERed counts in one pass — no self-join, no second scan) and a "
    "group key COMPUTED from both join sides, which forces the band "
    "derivation after the join but still collapses to a 2-row partial "
    "agg before the final exchange.",
)
def agg_ship_latency_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.col("l_shipdate")
                <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
                "FAST",
            )
            .otherwise("SLOW")
            .alias("ship_band"),
            high.alias("is_high"),
        )
        .groupBy("ship_band")
        .agg(
            F.count(F.when(F.col("is_high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("is_high"), 1)).alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


@query(
    "join_top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_DISC_CENTS}) AS BIGINT) AS total_revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-10-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM rev)
    ORDER BY s.s_suppkey
    """,
    section="2.3",
    doc="Top supplier by quarterly revenue (TPC-H Q15 shape): a derived "
    "revenue view consumed TWICE — once for the global MAX (scalar "
    "subquery) and once as the join input filtered to that max. Exact "
    "integer revenue makes 'equals the max' well-defined (the TPC-H "
    "spec itself warns about float ties here). Spark plan: one "
    "fact-table agg keyed on supplier (100 groups), the 1-row max "
    "broadcasts back into the filter, AQE reuses the aggregated "
    "exchange rather than re-scanning lineitem, and the supplier dim "
    "broadcasts into the surviving row(s).",
)
def join_top_revenue_supplier(spark: SparkSession, sf: str) -> DataFrame:
    rev = (
        T(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-10-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_cents()).alias("total_revenue_cents"))
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("mx"))
    s = T(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )


@query(
    "agg_supplier_variety_count",
    oracle=f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
                       l_suppkey AS ps_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    section="2.4",
    doc="Parts/supplier variety (TPC-H Q16 shape): how many DISTINCT "
    "suppliers can deliver each (brand, type, size) bucket, excluding "
    "'complaint' suppliers (negative balance — module doc) via NOT IN. "
    "Distinctive plan features: the NOT-IN anti-join against a scalar-"
    "safe key list (Catalyst plans a broadcast null-aware anti join — "
    "the notorious NOT-IN-with-nulls trap, exercised deliberately), a "
    "negated LIKE prefix that stays evaluable but un-pushable, and "
    "COUNT(DISTINCT) over the surviving derived-partsupp pairs keyed "
    "on a 3-attribute group.",
)
def agg_supplier_variety_count(spark: SparkSession, sf: str) -> DataFrame:
    ps = (
        T(spark, sf, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    bad = (
        T(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    p = T(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == F.col("bad_key"), "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "agg_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty FROM lineitem GROUP BY 1)
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT)
             AS avg_yearly_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < 0.2 * pa.avg_qty
    """,
    section="2.4",
    doc="Small-quantity-order revenue (TPC-H Q17 shape): lines ordering "
    "less than 20% of the part's average quantity — the canonical "
    "correlated-AVG subquery, decorrelated into a per-part AVG joined "
    "back to the fact. The brand/type filter narrows the part dim to "
    "~3% before broadcast; the per-part average is an exact division "
    "of an exact integral sum by an exact count, so the 0.2*avg "
    "comparison is the identical IEEE expression in both engines. "
    "Note the per-part agg runs over ALL lines (the subquery is not "
    "brand-filtered) — pushing the brand filter into it would be the "
    "classic decorrelation bug; here the part-filtered semi join "
    "prunes the agg input WITHOUT changing per-part averages.",
)
def agg_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    p = (
        T(spark, sf, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    # per-part averages only needed for filtered parts: semi-prune BOTH
    # the agg input and the fact side by the broadcast part list — the
    # average itself still uses every line of the surviving parts.
    li_p = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li_p.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_p.join(pa, li_p.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.expr(
                "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) DIV 7"
            ).alias("avg_yearly_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250)
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           b.total_qty
    FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice_cents DESC, o.o_orderkey
    LIMIT 100
    """,
    section="2.4",
    doc="Large-volume customers (TPC-H Q18 shape): orders whose total "
    "quantity clears a threshold (>250 ~= p99.8 of this corpus), joined "
    "back to their customers. The canonical IN-(GROUP BY ... HAVING) "
    "shape: the fact-side agg RUNS FIRST and acts as its own filter "
    "(the HAVING output is ~0.2% of orders), so the join to orders is "
    "tiny-side-broadcastable after AQE sees the real cardinality — the "
    "textbook case for adaptive join re-planning. Top-100 by price is "
    "a TakeOrderedAndProject.",
)
def agg_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    big = (
        T(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey", F.col("qty").cast("long").alias("total_qty"))
    )
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            cents("o_totalprice").alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice_cents"), "o_orderkey")
        .limit(100)
    )


@query(
    "join_excess_supply_parts",
    oracle=f"""
    WITH ps AS ({_O_PARTSUPP}),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(l_quantity) AS BIGINT) AS qty_97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2)
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 1
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey FROM ps
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps.ps_availqty > 2 * sh.qty_97)
    ORDER BY s.s_suppkey
    """,
    section="2.3",
    doc="Excess-supply suppliers (TPC-H Q20 shape): suppliers in one "
    "region holding more than 2x the quantity of 'small…' parts they "
    "actually shipped in 1997 — the deepest nesting in the suite: an "
    "IN whose subquery contains another IN plus a CORRELATED "
    "comparison between two different aggregates of the fact table "
    "(all-time availability vs 1997 shipments, availqty > 2*qty_97). "
    "Decorrelation: both aggregates key on (part, supplier), so they "
    "meet in ONE equi-join on the composite key (same shuffle "
    "partitioning on both sides — AQE coalesces), the part-name list "
    "broadcasts as a semi join, and the outer IN collapses to a "
    "distinct supplier set semi-joined to the region-filtered dim.",
)
def join_excess_supply_parts(spark: SparkSession, sf: str) -> DataFrame:
    ps = _partsupp(spark, sf)
    shipped = (
        T(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty_97"))
    )
    small = (
        T(spark, sf, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        ps.join(F.broadcast(small), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty_97"))
        .select("ps_suppkey")
        .distinct()
    )
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation").filter(F.col("n_regionkey") == 1)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(excess), s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


@query(
    "agg_idle_customer_balance",
    oracle="""
    WITH pos AS (
      SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
             c_custkey, c_nationkey % 7 AS cntrycode
      FROM customer),
    thresh AS (
      SELECT SUM(bal_cents) / COUNT(*) AS avg_bal FROM pos WHERE bal_cents > 0)
    SELECT p.cntrycode, COUNT(*) AS numcust, CAST(SUM(p.bal_cents) AS BIGINT) AS totacctbal_cents
    FROM pos p, thresh t
    WHERE p.cntrycode IN (1, 3, 5)
      AND p.bal_cents > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1 ORDER BY 1
    """,
    section="2.4",
    doc="Global-sales-opportunity (TPC-H Q22 shape): well-funded "
    "customers with no order since 1999 (every synthetic customer has "
    "SOME order, so 'lapsed' stands in for 'never ordered'), bucketed by "
    "'country code' "
    "(nationkey % 7 — no phone column, module doc). Three distinctive "
    "plan features in one query: an uncorrelated scalar AVG over a "
    "DIFFERENT filter of the same dimension (positive balances only) "
    "broadcast into the predicate; a NOT EXISTS planned as a left-anti "
    "join against the orders fact (the anti side's o_custkey is all "
    "that's read — column pruning matters at 100 TB); and the final "
    "3-row grouped agg. The avg is exact-integer-sum / exact count — "
    "the identical IEEE division in both engines.",
)
def agg_idle_customer_balance(spark: SparkSession, sf: str) -> DataFrame:
    pos = T(spark, sf, "customer").select(
        cents("c_acctbal").alias("bal_cents"),
        "c_custkey",
        (F.col("c_nationkey") % 7).alias("cntrycode"),
    )
    thresh = pos.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents") / F.count(F.lit(1))).alias("avg_bal")
    )
    o = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pos.filter(F.col("cntrycode").isin(1, 3, 5))
        .join(F.broadcast(thresh))
        .filter(F.col("bal_cents") > F.col("avg_bal"))
        .join(o, pos.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
        .orderBy("cntrycode")
    )
