"""Round-8 analytics tier: graph algorithms, sequence/transition analysis,
customer segmentation, distribution analytics.

These extend SURVEY.md §2.4/§2.5's statistics family with the remaining
warehouse-analytics workhorses a 100 TB deployment runs daily: triangle
counting and hierarchy flattening (graph tier beside
``graph_pagerank_centrality`` and ``dedup_connected_components``), Markov
event transitions, RFM segmentation, Pareto concentration, equi-depth
histograms (the range-partitioner's pre-pass), and skyline queries.

Every query follows the registry's determinism policy: money in exact
integer cents, ratios as integer ppm (``x * 1000000 DIV total``), doubles
only through shared expression trees identical in Spark and DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from etl_covid19_brasil_spark.registry import T, cents, query

# ---------------------------------------------------------------------------
# Graph tier
# ---------------------------------------------------------------------------


@query(
    "graph_triangle_count",
    oracle="""
    WITH cand AS (
      SELECT l_partkey
      FROM lineitem GROUP BY l_partkey
      HAVING COUNT(DISTINCT l_suppkey) BETWEEN 2 AND 15
    ),
    ps AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l JOIN cand c ON l.l_partkey = c.l_partkey
    ),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM ps a JOIN ps b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    tri AS (
      SELECT e1.u AS u, e1.v AS v, e2.v AS w
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    members AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    )
    SELECT node AS suppkey, COUNT(*) AS triangles
    FROM members GROUP BY node
    """,
    section="2.4",
    doc="Triangle counting over the co-supply graph (suppliers joined by a "
    "shared part) — the clustering-coefficient primitive of graph "
    "analytics, beside graph_pagerank_centrality (centrality) and "
    "dedup_connected_components (components). Built as the standard "
    "ordered-edge join: direct every edge small-id -> large-id, join "
    "edges on the shared middle vertex to enumerate wedges, then "
    "semi-close each wedge against the edge set — every triangle is "
    "found exactly once as u<v<w, all three steps plain equi-joins "
    "(no cartesian). Scale: edge generation fans out per part but the "
    "2..15-distinct-supplier blocking cap bounds it at C(15,2)=105 "
    "pairs per part (the same bounded-blocking argument as "
    "join_fuzzy_blocked; the cap is sized so the gate corpora produce "
    "REAL triangles — the original 2..5 cap matched zero parts at "
    "every shipped SF, making the check vacuous); the wedge join's "
    "fanout is the ordered "
    "degree, which the cap also bounds. Per-node counts (not one "
    "global scalar) make the value hash structural.",
)
def graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    cand = (
        li.groupBy("l_partkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns").between(2, 15))
        .select("l_partkey")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct().join(cand, "l_partkey")
    a = ps.alias("a")
    b = ps.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(F.col("e1.u").alias("u"), F.col("e1.v").alias("v"), F.col("e2.v").alias("w"))
    )
    members = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return members.groupBy(F.col("node").alias("suppkey")).agg(F.count("*").alias("triangles")).select(
        "suppkey", "triangles"
    )


@query(
    "graph_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE r AS (
      SELECT p_partkey AS key, p_partkey AS anc, 0 AS depth FROM part
      UNION ALL
      SELECT key, anc // 10, depth + 1 FROM r WHERE anc >= 10
    )
    SELECT key, anc AS root, depth
    FROM r WHERE anc < 10
    """,
    section="2.4",
    doc="Hierarchy flattening / transitive closure (BOM explosion, org "
    "chart, category tree): every part climbs a synthetic decimal-trie "
    "hierarchy (parent(k) = k DIV 10, roots are keys < 10) to its root, "
    "reporting (root, depth). The reference's world models this as "
    "WITH RECURSIVE (the DuckDB oracle does exactly that; Spark 4 can "
    "too — see recursive_cte_hierarchy for the native twin); this "
    "variant keeps the general DRIVER-LOOP form: each round, every "
    "still-climbing row joins the broadcast-free parent RULE (here a "
    "pure expression — in the general adjacency-table case the same "
    "loop joins the edge table, exactly like operators/concomp.py). "
    "Rounds = tree height = O(log n); the loop terminates via one "
    "scalar max() aggregate per round (the concomp fingerprint "
    "pattern, bounded driver traffic). Depth never exceeds "
    "len(str(max_key)), so the 12-round safety cap is unreachable.",
)
def graph_hierarchy_rollup(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part").select(
        F.col("p_partkey").alias("key"),
        F.col("p_partkey").alias("anc"),
        F.lit(0).alias("depth"),
    )
    # Iterative climb: anc := anc DIV 10 while anc >= 10. The parent rule
    # is an expression, so each round is a narrow map (no join needed for
    # this hierarchy); the loop structure is what a general adjacency
    # table would use, and the termination check is one scalar aggregate.
    for _ in range(12):
        still = p.agg(F.max(F.col("anc"))).collect()[0][0]
        if still is None or still < 10:
            break
        p = p.select(
            "key",
            F.when(F.col("anc") >= 10, F.expr("anc DIV 10")).otherwise(F.col("anc")).alias("anc"),
            F.when(F.col("anc") >= 10, F.col("depth") + 1).otherwise(F.col("depth")).alias("depth"),
        ).localCheckpoint(eager=False)
    return p.select("key", F.col("anc").alias("root"), "depth")


# ---------------------------------------------------------------------------
# Sequence / transition analysis
# ---------------------------------------------------------------------------


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cnt AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           n * 1000000 // CAST(SUM(n) OVER (PARTITION BY cur) AS BIGINT) AS prob_ppm
    FROM cnt
    """,
    section="2.5",
    doc="First-order Markov transition matrix over the event stream: for "
    "each (current, next) event-type pair per user timeline, the count "
    "and the transition probability in integer ppm (count*1e6 DIV "
    "row-count — exact integer arithmetic, no float division). The "
    "product-analytics companion to events_funnel_stages (funnel = "
    "chosen path; this = full transition structure, feeding next-action "
    "prediction and anomalous-flow detection). One window shuffle on "
    "user_id orders each timeline (ties broken by event_id), one "
    "aggregate shuffle on the type pair — the pair domain is "
    "|types|^2, tiny, so the second shuffle is trivial and the "
    "per-cur normalizing window runs over that tiny domain.",
)
def events_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    wn = Window.partitionBy("cur")
    return cnt.select(
        "cur",
        "nxt",
        "n",
        F.expr("n * 1000000 DIV sum(n) OVER (PARTITION BY cur)").alias("prob_ppm"),
    )


# ---------------------------------------------------------------------------
# Segmentation / concentration analytics
# ---------------------------------------------------------------------------


@query(
    "user_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             COUNT(*) AS frequency,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS m_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, last_day, frequency,
           CAST(m_cents AS DOUBLE) / 100.0 AS monetary,
           NTILE(4) OVER (ORDER BY last_day DESC, custkey) AS r_q,
           NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_q,
           NTILE(4) OVER (ORDER BY m_cents DESC, custkey) AS m_q
    FROM base
    """,
    section="2.5",
    doc="RFM (recency / frequency / monetary) customer segmentation — the "
    "classic marketing-warehouse quartile assignment: one aggregate "
    "over orders per customer, then three NTILE(4) rankings with "
    "deterministic tie-breaks (custkey). NTILE's definition (equal "
    "buckets, remainder to the front) is identical in Spark and "
    "DuckDB, so the assignment is hash-exact given the total order. "
    "Scale note: a global NTILE is a single-partition sort of the "
    "per-customer AGGREGATE (|customers| rows, not |orders|); at true "
    "100 TB scale the same quartiles come from approx_percentile "
    "cutpoints + a map-side bucket lookup — the exact formulation here "
    "is the oracle for that rewrite, like near_dedup_jaccard is for "
    "the LSH tiers.",
)
def user_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count("*").alias("frequency"),
        F.sum(cents("o_totalprice")).alias("m_cents"),
    )
    wr = Window.orderBy(F.col("last_day").desc(), "custkey")
    wf = Window.orderBy(F.col("frequency").desc(), "custkey")
    wm = Window.orderBy(F.col("m_cents").desc(), "custkey")
    return base.select(
        "custkey",
        "last_day",
        "frequency",
        (F.col("m_cents").cast("double") / F.lit(100.0)).alias("monetary"),
        F.ntile(4).over(wr).alias("r_q"),
        F.ntile(4).over(wf).alias("f_q"),
        F.ntile(4).over(wm).alias("m_q"),
    )


@query(
    "win_pareto_cumshare",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             o_orderkey
      FROM orders
    ),
    w AS (
      SELECT prio, x,
             CAST(SUM(x) OVER (PARTITION BY prio ORDER BY x DESC, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             ROW_NUMBER() OVER (PARTITION BY prio ORDER BY x DESC, o_orderkey) AS rn,
             CAST(SUM(x) OVER (PARTITION BY prio) AS BIGINT) AS total,
             COUNT(*) OVER (PARTITION BY prio) AS n_orders
      FROM v
    )
    SELECT prio, n_orders, total AS revenue_cents, rn AS n_top80,
           rn * 1000000 // n_orders AS top_frac_ppm,
           cum * 1000000 // total AS share_ppm
    FROM w
    WHERE 5 * cum >= 4 * total AND 5 * (cum - x) < 4 * total
    """,
    section="2.5",
    doc="Pareto 80/20 concentration: per order priority, how many of the "
    "largest orders carry 80% of revenue. One window shuffle on the "
    "group key does everything (descending cumulative sum, row number, "
    "group totals share the same partition); the crossing row is "
    "selected purely in exact integer cents (5*cum >= 4*total picks "
    "the first row reaching 80% — no float threshold, no second "
    "join). Reports group size, revenue, the crossing rank and its "
    "ppm shares. Complements agg_gini_coefficient (scalar "
    "inequality) with the actionable 'top-N carries X%' form.",
)
def win_pareto_cumshare(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        cents("o_totalprice").alias("x"),
        "o_orderkey",
    )
    wo = Window.partitionBy("prio").orderBy(F.col("x").desc(), "o_orderkey")
    wp = Window.partitionBy("prio")
    w = o.select(
        "prio",
        "x",
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum"),
        F.row_number().over(wo).alias("rn"),
        F.sum("x").over(wp).alias("total"),
        F.count("*").over(wp).alias("n_orders"),
    )
    return w.filter((5 * F.col("cum") >= 4 * F.col("total")) & (5 * (F.col("cum") - F.col("x")) < 4 * F.col("total"))).select(
        "prio",
        "n_orders",
        F.col("total").alias("revenue_cents"),
        F.col("rn").alias("n_top80"),
        F.expr("rn * 1000000 DIV n_orders").alias("top_frac_ppm"),
        F.expr("cum * 1000000 DIV total").alias("share_ppm"),
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x, o_orderkey
      FROM orders
    ),
    b AS (
      SELECT x, NTILE(16) OVER (ORDER BY x, o_orderkey) AS bucket FROM v
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(MIN(x) AS DOUBLE) / 100.0 AS lo,
           CAST(MAX(x) AS DOUBLE) / 100.0 AS hi
    FROM b GROUP BY bucket
    """,
    section="2.4",
    doc="Equi-depth (equi-height) histogram of order value: 16 buckets of "
    "equal row count with their [lo, hi] bounds — the statistics pass "
    "behind range partitioning, sort-merge skew planning and the "
    "optimizer's selectivity estimates (complements "
    "agg_histogram_width_bucket's equi-WIDTH profile: equi-depth "
    "adapts bucket bounds to density). NTILE with a deterministic "
    "tie-break is hash-exact across engines. Scale note: the exact "
    "global NTILE is one total sort; the 100 TB path samples bounds "
    "(repartitionByRange does exactly this internally) — "
    "sink_sorted_lake_layout exercises that sampled path, this query "
    "is its exact oracle.",
)
def agg_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    v = T(spark, sf, "orders").select(cents("o_totalprice").alias("x"), "o_orderkey")
    b = v.select("x", F.ntile(16).over(Window.orderBy("x", "o_orderkey")).alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        (F.min("x").cast("double") / F.lit(100.0)).alias("lo"),
        (F.max("x").cast("double") / F.lit(100.0)).alias("hi"),
    )


@query(
    "skyline_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             MIN(o_orderkey) AS okey
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY 1, 2
    ),
    sweep AS (
      SELECT day, x, okey,
             MIN(x) OVER (ORDER BY day DESC, x ASC, okey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best
      FROM pts
    )
    SELECT okey AS o_orderkey, day, CAST(x AS DOUBLE) / 100.0 AS price
    FROM sweep WHERE best IS NULL OR x < best
    """,
    section="2.5",
    doc="Skyline / Pareto-frontier query: open orders not dominated in "
    "(recency, price) — no other order is both at-least-as-recent and "
    "at-least-as-cheap (with one strict). Computed as the classic "
    "sort-sweep: distinct (day, price) points (min orderkey as the "
    "deterministic representative), sorted by day DESC then price ASC, "
    "keep a point iff it is strictly cheaper than every more-recent "
    "point (running MIN over the preceding window). One aggregate + "
    "one global-sort window — the sweep replaces the naive O(n^2) "
    "NOT-EXISTS anti-join formulation entirely. Scale note: the "
    "frontier sweep is sequential by nature but runs on the DISTINCT "
    "point set; a 100 TB deployment pre-aggregates per (day, cents) "
    "exactly as done here, shrinking the sorted set to the value "
    "domain.",
)
def skyline_pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    pts = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            cents("o_totalprice").alias("x"),
        )
        .agg(F.min("o_orderkey").alias("okey"))
    )
    w = Window.orderBy(F.col("day").desc(), F.col("x").asc(), "okey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sweep = pts.select("day", "x", "okey", F.min("x").over(w).alias("best"))
    return sweep.filter(F.col("best").isNull() | (F.col("x") < F.col("best"))).select(
        F.col("okey").alias("o_orderkey"),
        "day",
        (F.col("x").cast("double") / F.lit(100.0)).alias("price"),
    )


# ---------------------------------------------------------------------------
# Data-quality statistics
# ---------------------------------------------------------------------------

# Two-proportion z statistic from exact integer counts, micro-quantized.
# Shared expression tree (identical text runs as Spark F.expr and DuckDB
# SQL) — the _WELCH_T_MICRO policy from queries/relational.py.
_Z2P_MICRO = (
    "CAST(floor(("
    " (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "  - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt("
    "   (CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "   * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "   * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))"
    " )) * 1000000.0 + 0.5) AS BIGINT)"
)

# Pearson r from exact integer sums, micro-quantized (same policy).
_ACF_R_MICRO = (
    "CAST(floor(("
    " (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    ") * 1000000.0 + 0.5) AS BIGINT)"
)


@query(
    "dq_mad_outliers",
    oracle="""
    WITH v AS (
      SELECT o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    med AS (
      SELECT status, CAST(2 * quantile_cont(x, 0.5) AS BIGINT) AS m2
      FROM v GROUP BY status
    ),
    dev AS (
      SELECT v.status, v.x, med.m2, ABS(2 * v.x - med.m2) AS d2
      FROM v JOIN med USING (status)
    ),
    mad AS (
      SELECT status, CAST(2 * quantile_cont(d2, 0.5) AS BIGINT) AS mad4
      FROM dev GROUP BY status
    )
    SELECT dev.status, COUNT(*) AS n,
           CAST(ANY_VALUE(dev.m2) AS DOUBLE) / 200.0 AS median_price,
           CAST(ANY_VALUE(mad.mad4) AS DOUBLE) / 400.0 AS mad_price,
           CAST(SUM(CASE WHEN 1349 * dev.d2 > 3500 * mad.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (status)
    GROUP BY dev.status
    """,
    section="2.4",
    doc="Robust outlier detection via the modified z-score (median absolute "
    "deviation): per order status, the median price, the MAD and the "
    "count of rows whose modified z-score 0.6745*|x-med|/MAD exceeds "
    "3.5 — the robust-statistics screen that survives the heavy tails "
    "that break stddev-based rules. Exactness: medians are interpolated "
    "percentiles over integer cents, so 2*median is an exact integer "
    "(x.0 or x.5 halves only); deviations stay in doubled-cents "
    "integers and the 3.5/0.6745 threshold becomes the pure integer "
    "test 1349*d2 > 3500*mad4 — no float comparison anywhere. Two "
    "grouped percentile passes + broadcast-back of the tiny per-group "
    "stats (|status| rows), the same two-pass shape as dq_ks_drift.",
)
def dq_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    v = T(spark, sf, "orders").select(
        F.col("o_orderstatus").alias("status"), cents("o_totalprice").alias("x")
    )
    med = v.groupBy("status").agg(
        (2 * F.percentile("x", 0.5)).cast("long").alias("m2")
    )
    dev = v.join(F.broadcast(med), "status").select(
        "status", "x", "m2", F.abs(2 * F.col("x") - F.col("m2")).alias("d2")
    )
    mad = dev.groupBy("status").agg(
        (2 * F.percentile("d2", 0.5)).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "status")
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            (F.any_value("m2").cast("double") / F.lit(200.0)).alias("median_price"),
            (F.any_value("mad4").cast("double") / F.lit(400.0)).alias("mad_price"),
            F.sum(
                F.when(1349 * F.col("d2") > 3500 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "agg_two_proportion_ztest",
    oracle=f"""
    WITH v AS (
      SELECT c.c_mktsegment AS seg,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN hit ELSE 0 END) AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN hit ELSE 0 END) AS BIGINT) AS x2
      FROM v
    )
    SELECT n1, x1, n2, x2, {_Z2P_MICRO} AS z_micro FROM s
    """,
    section="2.4",
    doc="Two-proportion z-test (pooled) between customer segments on the "
    "order-fulfillment rate — the A/B-test primitive for conversion "
    "metrics, completing the drift-statistics trio (dq_welch_t_drift: "
    "means, dq_ks_drift: distributions, this: proportions). All four "
    "counts accumulate as exact int64 in ONE aggregate after the "
    "dim-broadcast join; the z value is one shared double expression "
    "tree micro-quantized (sqrt is correctly rounded per IEEE 754 in "
    "both JVM and libm, so the tree is bit-identical).",
)
def agg_two_proportion_ztest(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    o = T(spark, sf, "orders")
    v = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    s = v.agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("hit")).otherwise(0)).cast("long").alias("x1"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("seg") == "MACHINERY", F.col("hit")).otherwise(0)).cast("long").alias("x2"),
    )
    return s.select("n1", "x1", "n2", "x2", F.expr(_Z2P_MICRO).alias("z_micro"))


@query(
    "ts_acf_daily_orders",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    shifted AS (
      SELECT d.day + CAST(k AS INTEGER) AS day, CAST(k AS INTEGER) AS k, d.c
      FROM daily d, generate_series(1, 7) AS t(k)
    ),
    pairs AS (
      SELECT s.k, daily.c AS x, s.c AS y
      FROM shifted s JOIN daily ON daily.day = s.day
    ),
    sums AS (
      SELECT k, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY k
    )
    SELECT k AS lag_days, n AS n_pairs, {_ACF_R_MICRO} AS acf_micro FROM sums
    """,
    section="2.4",
    doc="Autocorrelation function of the daily order-count series at lags "
    "1..7 days — the time-series diagnostic behind seasonality "
    "detection (a weekly cycle shows as a lag-7 peak; complements "
    "agg_weekday_seasonality's calendar profile with the "
    "model-agnostic statistic). Lagged pairs come from ONE join: each "
    "daily point emits 7 shifted copies (explode of sequence(1,7)) "
    "that equi-join back to the series — no per-lag rescan, gaps in "
    "the calendar drop out naturally. Pearson r per lag from exact "
    "int64 sums via the shared micro-quantized expression tree. The "
    "series is a per-day AGGREGATE so every stage after the first "
    "group-by runs on |days| rows.",
)
def ts_acf_daily_orders(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    shifted = daily.select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"), "day", "c"
    ).select(F.expr("date_add(day, k)").alias("day"), "k", "c")
    pairs = shifted.alias("s").join(daily.alias("d"), "day").select(
        F.col("s.k").alias("k"), F.col("d.c").alias("x"), F.col("s.c").alias("y")
    )
    sums = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return sums.select(
        F.col("k").alias("lag_days"),
        F.col("n").alias("n_pairs"),
        F.expr(_ACF_R_MICRO).alias("acf_micro"),
    )


@query(
    "dq_referential_orphans",
    oracle="""
    WITH cust AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0
    ),
    ords AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 89 <> 0
    ),
    audit_orders AS (
      SELECT 'orders->customer' AS fk,
             COUNT(*) AS total,
             SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS orphans
      FROM orders o LEFT JOIN cust c ON o.o_custkey = c.c_custkey
    ),
    audit_lineitem AS (
      SELECT 'lineitem->orders' AS fk,
             COUNT(*) AS total,
             SUM(CASE WHEN x.o_orderkey IS NULL THEN 1 ELSE 0 END) AS orphans
      FROM lineitem l LEFT JOIN ords x ON l.l_orderkey = x.o_orderkey
    )
    SELECT fk, total, CAST(orphans AS BIGINT) AS orphans,
           CAST(orphans AS BIGINT) * 1000000 // total AS orphan_ppm
    FROM (SELECT * FROM audit_orders UNION ALL SELECT * FROM audit_lineitem)
    """,
    section="2.4",
    doc="Referential-integrity audit: orphan-row counts and rates for the "
    "orders->customer and lineitem->orders foreign keys, with 'lost' "
    "dimension rows simulated by modulus filters (the test data's FKs "
    "are fully consistent by construction). The contract-check every "
    "warehouse runs after each load. Physically an anti-join counted "
    "inside a left join (null-probe side counted map-side after the "
    "join); at 100 TB the same audit rides the existing join shuffle "
    "of the downstream pipeline — or the bloom-filter pre-screen of "
    "join_bloom_prefilter when only the rate is needed.",
)
def dq_referential_orphans(spark: SparkSession, sf: str) -> DataFrame:
    cust = T(spark, sf, "customer").filter(F.col("c_custkey") % 97 != 0).select("c_custkey")
    ords = T(spark, sf, "orders").filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey", "o_custkey"
    )
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    a1 = (
        o.join(cust, o.o_custkey == cust.c_custkey, "left")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).cast("long").alias("orphans"),
        )
        .select(F.lit("orders->customer").alias("fk"), "total", "orphans")
    )
    a2 = (
        li.join(ords.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).cast("long").alias("orphans"),
        )
        .select(F.lit("lineitem->orders").alias("fk"), "total", "orphans")
    )
    return a1.unionAll(a2).select(
        "fk", "total", "orphans", F.expr("orphans * 1000000 DIV total").alias("orphan_ppm")
    )


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT NULLIF(c_nationkey % 7, 3) AS grp, COUNT(*) AS customers
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT NULLIF(s_nationkey % 7, 3) AS grp,
             COUNT(*) AS suppliers,
             SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS bal_cents
      FROM supplier GROUP BY 1
    )
    SELECT c.grp, c.customers, s.suppliers,
           CAST(s.bal_cents AS DOUBLE) / 100.0 AS supplier_bal
    FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
    """,
    section="2.3",
    doc="Null-safe equi-join (Spark <=> / eqNullSafe, SQL IS NOT DISTINCT "
    "FROM): the NULL partition on each side joins like any other key "
    "instead of silently dropping — the semantics ETL needs when the "
    "join key itself carries a 'unknown' bucket (here NULLIF-derived "
    "groups). Ordinary inner equi-join physically (null-safe equality "
    "is still hash-partitionable: Spark plans a regular "
    "SortMergeJoin/HashJoin on the coalesced key, no nested loop). "
    "Both sides pre-aggregate so the join is dim-sized.",
)
def join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        T(spark, sf, "customer")
        .groupBy(F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("grp"))
        .agg(F.count("*").alias("customers"))
    )
    s = (
        T(spark, sf, "supplier")
        .groupBy(F.nullif(F.col("s_nationkey") % 7, F.lit(3)).alias("sgrp"))
        .agg(
            F.count("*").alias("suppliers"),
            F.sum(cents("s_acctbal")).alias("bal_cents"),
        )
    )
    return c.join(s, F.col("grp").eqNullSafe(F.col("sgrp"))).select(
        "grp",
        "customers",
        "suppliers",
        (F.col("bal_cents").cast("double") / F.lit(100.0)).alias("supplier_bal"),
    )


@query(
    "agg_count_min_sketch",
    oracle="""
    WITH top AS (
      SELECT o_custkey AS custkey, COUNT(*) AS exact_n
      FROM orders GROUP BY 1
      ORDER BY exact_n DESC, custkey LIMIT 20
    )
    SELECT custkey, exact_n, exact_n AS cms_estimate, 0 AS overestimate
    FROM top
    """,
    section="2.4",
    doc="Count-min sketch built entirely from DataFrame ops (depth 5 x "
    "width 131072 via seeded xxhash64), probed for the 20 heaviest "
    "keys against their exact counts — the MERGEABLE frequency sketch "
    "completing the sketch family (agg_hll_sketch_merge: distinct, "
    "agg_approx_top_k: heavy hitters, agg_approx_percentile: "
    "quantiles; this: point frequencies). Each row map-side emits its "
    "5 (seed, bucket) cells; ONE partial-aggregated shuffle builds the "
    "counter table (<= 5 x min(width, distinct-keys) rows — the sketch "
    "property that makes petabyte frequency profiles cheap), and "
    "per-sketch-row counters are min-combined per probe key. The "
    "oracle equates estimate with exact count: a CMS only "
    "OVER-estimates, and at this width the probability that any probed "
    "key collides in ALL 5 rows is <(n_keys/width)^5, ~2e-5 even at "
    "sf0.1's 15k distinct keys — verified exact on the fixed test "
    "corpora at sf0.001/0.01/0.1; the overestimate column pins the "
    "one-sided error bound structurally.",
)
def agg_count_min_sketch(spark: SparkSession, sf: str) -> DataFrame:
    DEPTH, WIDTH = 5, 131072
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    cells = o.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(DEPTH - 1)),
                lambda s: F.pmod(F.xxhash64(F.col("k"), s), F.lit(WIDTH)),
            )
        ).alias("seed", "bucket")
    )
    counters = cells.groupBy("seed", "bucket").agg(F.count("*").alias("c"))
    top = (
        o.groupBy("k")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "k")
        .limit(20)
    )
    probes = top.select(
        "k",
        "exact_n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(DEPTH - 1)),
                lambda s: F.pmod(F.xxhash64(F.col("k"), s), F.lit(WIDTH)),
            )
        ).alias("seed", "bucket"),
    )
    est = (
        probes.join(counters, ["seed", "bucket"])
        .groupBy("k", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        F.col("k").alias("custkey"),
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_n")).cast("int").alias("overestimate"),
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT MIN(o.o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
             AS asof_o_orderdate
    FROM events e
    """,
    section="2.3",
    doc="FORWARD as-of join (pandas merge_asof direction='forward'): the "
    "next order at-or-after each event — the lookahead twin of "
    "join_asof's most-recent-record semantics, needed for "
    "time-to-next-action and label-construction pipelines (what "
    "happened AFTER the signal?). Same operators/joins.py machinery "
    "with direction='forward' (one union + one descending-time window "
    "per key — a single shuffle, no join explosion); unmatched events "
    "are kept with NULL, which the correlated-subquery oracle mirrors.",
)
def join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators import asof_join

    e = T(spark, sf, "events").select("event_id", "user_id", "ts")
    o = (
        T(spark, sf, "orders")
        .select("o_custkey", "o_orderdate")
        .withColumnRenamed("o_custkey", "user_id")
    )
    out = asof_join(
        e,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderdate"],
        direction="forward",
    )
    return out.select("event_id", "user_id", "asof_o_orderdate")


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                             THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_id
      FROM events
    )
    SELECT COALESCE(touch_type, 'none') AS channel,
           COUNT(*) AS conversions,
           COUNT(DISTINCT user_id) AS users
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    section="2.5",
    doc="Last-touch marketing attribution: every purchase is credited to "
    "the user's most recent preceding touch event (click/view), "
    "'none' when the purchase had no prior touch — the conversion-"
    "credit query behind every channel-ROI dashboard, and the "
    "in-timeline special case of as-of semantics (the carry is LAST_"
    "VALUE IGNORE NULLS over the ordered user timeline, exactly the "
    "operators/joins.py asof mechanism without the union because both "
    "streams already share the table). One user-keyed window shuffle, "
    "then a tiny channel aggregate.",
)
def events_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "user_id",
        "event_type",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch_type"), F.lit("none")).alias("channel"))
        .agg(
            F.count("*").alias("conversions"),
            F.count_distinct("user_id").alias("users"),
        )
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    trended AS (
      SELECT day, rev,
             CAST(SUM(rev) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS win_sum,
             COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_n
      FROM daily
    ),
    resid AS (
      SELECT (isodow(day) - 1) AS weekday,
             7 * rev - win_sum AS resid7
      FROM trended WHERE win_n = 7
    )
    SELECT weekday, COUNT(*) AS n_days,
           CAST(SUM(resid7) AS BIGINT) AS resid7_sum,
           CAST(CAST(SUM(resid7) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_resid7
    FROM resid GROUP BY weekday
    """,
    section="2.5",
    doc="Additive seasonal decomposition of the daily revenue series: "
    "7-day centered moving-average trend, residual = observation minus "
    "trend, mean residual per ISO weekday = the seasonal component "
    "(complements agg_weekday_seasonality's raw shares and "
    "ts_acf_daily_orders' lag structure: this isolates the weekday "
    "effect FROM the trend instead of mixing both). Exactness: the "
    "centered mean is kept as the integer pair (7*rev - window_sum) — "
    "no division until the final shared one; edge days without a full "
    "7-day window drop out (win_n = 7), matching the classical "
    "decomposition's trimmed ends. The series is a per-day aggregate, "
    "so every window runs on |days| rows; weekday() == (dayofweek+5)%7 "
    "pins the cross-engine calendar (the agg_weekday_seasonality "
    "lesson).",
)
def ts_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w).alias("win_sum"),
        F.count("*").over(w).alias("win_n"),
    )
    resid = trended.filter(F.col("win_n") == 7).select(
        F.weekday("day").alias("weekday"),
        (7 * F.col("rev") - F.col("win_sum")).alias("resid7"),
    )
    # Mean residual as ONE shared double division (integer DIV would
    # diverge cross-engine on negative sums: Spark truncates, DuckDB
    # floors).
    return resid.groupBy("weekday").agg(
        F.count("*").alias("n_days"),
        F.sum("resid7").cast("long").alias("resid7_sum"),
        (
            F.sum("resid7").cast("long").cast("double")
            / F.count("*").cast("double")
        ).alias("mean_resid7"),
    )


@query(
    "ts_gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM orders WHERE o_orderstatus = 'P'
      GROUP BY 1
    ),
    bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
    ),
    calendar AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    joined AS (
      SELECT c.day, d.rev,
             LAST_VALUE(d.rev IGNORE NULLS) OVER (ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rev,
             LAST_VALUE(CASE WHEN d.rev IS NOT NULL THEN c.day END IGNORE NULLS)
               OVER (ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
             FIRST_VALUE(d.rev IGNORE NULLS) OVER (ORDER BY c.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rev,
             FIRST_VALUE(CASE WHEN d.rev IS NOT NULL THEN c.day END IGNORE NULLS)
               OVER (ORDER BY c.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      FROM calendar c LEFT JOIN daily d USING (day)
    )
    SELECT day,
           (rev IS NULL) AS was_gap,
           CASE WHEN rev IS NOT NULL THEN rev
                ELSE (prev_rev * (next_day - day) + next_rev * (day - prev_day))
                     // (next_day - prev_day)
           END AS rev_filled
    FROM joined
    """,
    section="2.5",
    doc="Calendar gap filling with linear interpolation — the series-"
    "repair pass every time-series consumer needs before modeling: a "
    "complete day calendar is generated from the observed bounds "
    "(sequence/generate_series — no driver loop), missing days take "
    "the linearly interpolated value between their flanking "
    "observations. The interpolation stays EXACT integer: "
    "(prev*(next-d) + next*(d-prev)) DIV (next-prev) — all weights "
    "are positive day-distances, so truncating and flooring division "
    "agree cross-engine and no float ratio is compared. The flanking "
    "carry is the LOCF window pair (win_ignore_nulls' mechanism, "
    "applied bidirectionally like join_nearest_value). Series is a "
    "per-day aggregate; a 100 TB deployment partitions the same "
    "windows by series key.",
)
def ts_gap_fill_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    cal = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("day"))
    j = cal.join(daily, "day", "left")
    back = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    w = j.select(
        "day",
        "rev",
        F.last("rev", ignorenulls=True).over(back).alias("prev_rev"),
        F.last(F.when(F.col("rev").isNotNull(), F.col("day")), ignorenulls=True)
        .over(back)
        .alias("prev_day"),
        F.first("rev", ignorenulls=True).over(fwd).alias("next_rev"),
        F.first(F.when(F.col("rev").isNotNull(), F.col("day")), ignorenulls=True)
        .over(fwd)
        .alias("next_day"),
    )
    staged = w.select(
        "day",
        "rev",
        (
            F.col("prev_rev") * F.datediff(F.col("next_day"), F.col("day"))
            + F.col("next_rev") * F.datediff(F.col("day"), F.col("prev_day"))
        )
        .cast("long")
        .alias("fill_num"),
        F.datediff(F.col("next_day"), F.col("prev_day")).cast("long").alias("fill_den"),
    )
    return staged.select(
        "day",
        F.col("rev").isNull().alias("was_gap"),
        F.when(F.col("rev").isNotNull(), F.col("rev"))
        .otherwise(F.expr("fill_num DIV fill_den"))
        .alias("rev_filled"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT MAX(o.o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id
               AND o.o_orderdate <= e.ts
               AND o.o_orderdate >= e.ts - INTERVAL 90 DAY)
             AS asof_o_orderdate
    FROM events e
    """,
    section="2.3",
    doc="As-of join with a TOLERANCE bound (pandas merge_asof tolerance=): "
    "the most recent order per user at event time, but only within a "
    "90-day lookback — stale matches become NULL instead of silently "
    "attaching years-old state (the correctness guard real feature "
    "pipelines need: a 'latest price' older than the staleness budget "
    "is worse than no price). Same one-shuffle union+window operator "
    "as join_asof; the tolerance is one post-carry comparison, no "
    "extra join or shuffle.",
)
def join_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.operators import asof_join

    e = T(spark, sf, "events").select("event_id", "user_id", "ts")
    o = (
        T(spark, sf, "orders")
        .select("o_custkey", "o_orderdate")
        .withColumnRenamed("o_custkey", "user_id")
    )
    out = asof_join(
        e, o, on="user_id", left_ts="ts", right_ts="o_orderdate", value_cols=["o_orderdate"]
    )
    within = F.col("asof_o_orderdate") >= F.col("ts") - F.expr("INTERVAL 90 DAY")
    return out.select(
        "event_id",
        "user_id",
        F.when(within, F.col("asof_o_orderdate")).alias("asof_o_orderdate"),
    )


@query(
    "dq_freshness_lag",
    oracle="""
    WITH per_type AS (
      SELECT event_type, MAX(ts) AS latest, COUNT(*) AS n
      FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(latest) AS global_latest FROM per_type)
    SELECT event_type, n, latest,
           (CAST(epoch(global_latest) AS BIGINT)
            - CAST(epoch(latest) AS BIGINT)) // 60 AS lag_minutes,
           (CAST(epoch(global_latest) AS BIGINT)
            - CAST(epoch(latest) AS BIGINT)) // 60 > 1440 AS is_stale
    FROM per_type, g
    """,
    section="2.4",
    doc="Feed-freshness audit: per event type, the latest arrival, its "
    "lag behind the freshest feed in minutes, and a staleness flag at "
    "the 24 h budget — the first alarm a streaming-lake SLO monitor "
    "fires (complements dq_sequence_gaps' completeness check with a "
    "RECENCY check). One aggregate + a one-row crossJoin; lag is the "
    "FLOOR of elapsed seconds over 60 in both engines — "
    "date_diff('minute') would count minute-BOUNDARY crossings and "
    "drift off by one (the calendar-trap family, see "
    "agg_weekday_seasonality).",
)
def dq_freshness_lag(spark: SparkSession, sf: str) -> DataFrame:
    per_type = (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.max("ts").alias("latest"), F.count("*").alias("n"))
    )
    g = per_type.agg(F.max("latest").alias("global_latest"))
    lag = (
        (F.unix_timestamp("global_latest") - F.unix_timestamp("latest")) / 60
    ).cast("long")
    return per_type.crossJoin(g).select(
        "event_type",
        "n",
        "latest",
        lag.alias("lag_minutes"),
        (lag > 1440).alias("is_stale"),
    )


@query(
    "id_assign_contiguous",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rid
    FROM orders
    """,
    section="2.6",
    doc="Contiguous global surrogate-key assignment (1..N in "
    "(o_orderdate, o_orderkey) order) WITHOUT a single-reducer global "
    "sort — the naive ROW_NUMBER() OVER (ORDER BY ...) funnels the "
    "whole table through one task at 100 TB, and "
    "monotonically_increasing_id() leaves gaps. Mechanism: "
    "repartitionByRange on the key (the sampled range partitioner "
    "keeps partitions ordered AND non-overlapping), count rows per "
    "partition, prefix-sum those counts into per-partition offsets "
    "(a window over <=|partitions| rows — bounded, never data-sized), "
    "broadcast the offsets back, and emit row_number within each "
    "partition plus its offset. The result is invariant to where the "
    "sampled boundaries land because the key order is total "
    "(o_orderkey is unique); the lazy localCheckpoint pins the sampled "
    "boundaries so the counts pass and the id pass see identical "
    "partition ids. This is the DataFrame-native equivalent of RDD "
    "zipWithIndex, kept declarative so Catalyst still prunes and "
    "pushes down the scan.",
)
def id_assign_contiguous(spark: SparkSession, sf: str) -> DataFrame:
    src = (
        T(spark, sf, "orders")
        .select("o_orderkey", "o_orderdate")
        .repartitionByRange(
            spark.sparkContext.defaultParallelism, "o_orderdate", "o_orderkey"
        )
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # counts + ids must see the SAME pids
    )
    counts = src.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.select(
        "pid",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("off"),
    )
    w = Window.partitionBy("pid").orderBy("o_orderdate", "o_orderkey")
    return src.join(F.broadcast(offsets), "pid").select(
        "o_orderkey",
        (F.row_number().over(w).cast("long") + F.col("off")).alias("rid"),
    )


@query(
    "dq_winsorize_clip",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, v,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM d
    ),
    cuts AS (
      SELECT o_orderpriority,
             MIN(CASE WHEN rn = (n + 19) // 20 THEN v END) AS lo,
             MIN(CASE WHEN rn = (19 * n + 19) // 20 THEN v END) AS hi
      FROM r GROUP BY o_orderpriority
    )
    SELECT r.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN r.v < c.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
           CAST(SUM(CASE WHEN r.v > c.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
           c.lo AS p05_cents, c.hi AS p95_cents,
           CAST(SUM(LEAST(GREATEST(r.v, c.lo), c.hi)) AS BIGINT) AS sum_winsor_cents
    FROM r JOIN cuts c USING (o_orderpriority)
    GROUP BY r.o_orderpriority, c.lo, c.hi
    """,
    section="2.4",
    doc="Winsorization audit: per order priority, clip order totals at the "
    "EXACT rank-based p05/p95 (value at row ceil(p*n) of the sorted "
    "group — the discrete percentile, no interpolation, so the cutpoint "
    "is an integer cents value both engines agree on bit-for-bit; "
    "interpolated percentile_cont would put a non-dyadic double into "
    "the hash). Reports clip counts on each tail and the winsorized "
    "sum — the outlier-robust alternative to dropping rows, sibling of "
    "dq_mad_outliers' detection pass. One per-group window shuffle "
    "serves rank and count; cutpoints broadcast back (5 rows). The "
    "value at a rank is tie-order-invariant, so ORDER BY v alone is "
    "deterministic. At 100 TB the exact tier runs per partition-key "
    "slice; the approx path swaps in approx_percentile cutpoints "
    "(user_rfm_segments' documented rewrite).",
)
def dq_winsorize_clip(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "orders").select(
        "o_orderpriority", cents("o_totalprice").alias("v")
    )
    grp = Window.partitionBy("o_orderpriority")
    ranked = d.select(
        "o_orderpriority",
        "v",
        F.row_number().over(grp.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(grp).alias("n"),
    )
    cuts = ranked.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("rn") == F.expr("(n + 19) DIV 20"), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.expr("(19 * n + 19) DIV 20"), F.col("v"))).alias("hi"),
    )
    return (
        d.join(F.broadcast(cuts), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0)).alias("n_clip_low"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0)).alias("n_clip_high"),
            F.min("lo").alias("p05_cents"),
            F.max("hi").alias("p95_cents"),
            F.sum(F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))).alias(
                "sum_winsor_cents"
            ),
        )
    )


@query(
    "graph_bfs_levels",
    oracle="""
    WITH RECURSIVE cand AS (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey
      HAVING COUNT(DISTINCT l_suppkey) BETWEEN 2 AND 15
    ),
    ps AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l JOIN cand c ON l.l_partkey = c.l_partkey
    ),
    half AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM ps a JOIN ps b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    edges AS (SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half),
    srcs AS (SELECT DISTINCT u AS node FROM edges WHERE u % 10 = 3),
    bfs(node, lvl) AS (
      SELECT node, CAST(0 AS BIGINT) AS lvl FROM srcs
      UNION
      SELECT e.v, b.lvl + 1 FROM bfs b JOIN edges e ON e.u = b.node
      WHERE b.lvl < 4
    )
    SELECT node AS suppkey, CAST(MIN(lvl) AS BIGINT) AS bfs_level
    FROM bfs GROUP BY node
    """,
    section="2.4",
    doc="Multi-source BFS levels over the co-supply graph (seed-set "
    "expansion: 'everything within 4 hops of these suppliers' — the "
    "neighborhood/blast-radius primitive next to pagerank's "
    "centrality, concomp's partition and triangle_count's clustering). "
    "Iterative frontier expansion, 4 fixed rounds: frontier joins the "
    "edge list, new nodes are anti-joined against the visited set and "
    "stamped with the round number = their MINIMUM hop distance. Each "
    "round is one equi-join + one anti-join; localCheckpoint per round "
    "keeps the plan from growing a join per iteration (the pagerank "
    "pattern) and the frontier only ever shrinks toward the fringe. "
    "The oracle is a recursive CTE with UNION dedup — DuckDB's "
    "fixpoint semantics against Spark's explicit loop, two genuinely "
    "different evaluation strategies agreeing on the hash. Scale: "
    "rounds are O(diameter-capped); per-round cost is |frontier "
    "adjacency|, never |V|x|E|.",
)
def graph_bfs_levels(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    cand = (
        li.groupBy("l_partkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns").between(2, 15))
        .select("l_partkey")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct().join(cand, "l_partkey")
    a, b = ps.alias("a"), ps.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    edges = half.union(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    frontier = (
        edges.select("u").distinct()
        .filter(F.col("u") % 10 == 3)
        .select(F.col("u").alias("node"))
        .localCheckpoint(eager=False)
    )
    visited = frontier.select("node", F.lit(0).cast("long").alias("bfs_level"))
    for lvl in range(1, 5):
        nxt = (
            frontier.join(edges, F.col("node") == F.col("u"))
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.union(
            nxt.select("node", F.lit(lvl).cast("long").alias("bfs_level"))
        ).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(F.col("node").alias("suppkey"), "bfs_level")


@query(
    "win_ewma_truncated",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT day, rev,
             """ + ",\n             ".join(
                 f"LAG(rev, {k}) OVER (ORDER BY day) AS l{k}" for k in range(8)
             ) + """
      FROM daily
    )
    SELECT day, rev,
           ("""
           + " + ".join(f"COALESCE(l{k}, 0) * {128 >> k}" for k in range(8))
           + """) * 1000
           // ("""
           + " + ".join(
               f"CASE WHEN l{k} IS NOT NULL THEN {128 >> k} ELSE 0 END"
               for k in range(8)
           )
           + """) AS ewma_milli_cents
    FROM lagged
    """,
    section="2.5",
    doc="Truncated exponentially-weighted moving average (alpha = 1/2, "
    "8 taps) of the daily revenue series — the smoothing pass real "
    "monitoring uses where the plain moving average lags too hard. "
    "The geometric weights 128,64,...,1 are exact powers of two, the "
    "numerator and the present-tap denominator are exact int64 sums, "
    "and the result is one integer floor-division in milli-cents — so "
    "the recursive definition (not expressible as an associative "
    "window aggregate) becomes 8 LAG taps with NO double anywhere. "
    "Partial windows at the series head renormalize over the taps "
    "that exist (denominator sums only present weights) instead of "
    "biasing toward zero. Per-day aggregate first; the window runs on "
    "|days| rows (ts_acf pattern) — a 100 TB deployment partitions "
    "the same taps by series key.",
)
def win_ewma_truncated(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day", "rev", *[F.lag("rev", k).over(w).alias(f"l{k}") for k in range(8)]
    )
    num = " + ".join(f"coalesce(l{k}, 0L) * {128 >> k}" for k in range(8))
    den = " + ".join(
        f"CASE WHEN l{k} IS NOT NULL THEN {128 >> k} ELSE 0 END" for k in range(8)
    )
    return lagged.select(
        "day", "rev", F.expr(f"(({num}) * 1000) DIV ({den})").alias("ewma_milli_cents")
    )


@query(
    "events_survival_curve",
    oracle="""
    WITH s0 AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             MIN(CAST(e.ts AS DATE) - CAST(s.t0 AS DATE)) AS cd
      FROM events e JOIN s0 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.t0
      GROUP BY e.user_id
    ),
    cal AS (SELECT CAST(unnest(range(0, 15)) AS BIGINT) AS day),
    cc AS (SELECT cd, CAST(COUNT(*) AS BIGINT) AS n FROM conv GROUP BY cd),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s0)
    SELECT day,
           COALESCE(cc.n, 0) AS n_converted_day,
           CAST(SUM(COALESCE(cc.n, 0)) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_converted_cum,
           CAST(n.total - SUM(COALESCE(cc.n, 0)) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_surviving,
           CAST((n.total - SUM(COALESCE(cc.n, 0)) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000000
             // n.total AS BIGINT) AS survival_ppm
    FROM cal LEFT JOIN cc ON cc.cd = cal.day, n
    """,
    section="2.5",
    doc="Time-to-event survival table (signup -> first purchase, 14-day "
    "horizon): per signup cohort member, days until the first "
    "at-or-after-signup purchase; per horizon day, the hazard "
    "(conversions that day), cumulative conversions, survivors still "
    "unconverted and the survival fraction in integer ppm — the "
    "Kaplan-Meier-shaped at-risk table (no censoring weights needed: "
    "one cohort, fixed horizon, users past the horizon simply stay in "
    "the surviving count). Heavy lifting is two user-keyed aggregates; "
    "the curve itself is a 15-row calendar joined to the day-count "
    "table with one running sum — data-sized work never touches the "
    "calendar. The cohort total rides a one-row crossJoin "
    "(dq_freshness_lag pattern).",
)
def events_survival_curve(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select("user_id", "ts", "event_type")
    s0 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(s0, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(F.datediff(F.to_date("ts"), F.to_date("t0"))).alias("cd"))
    )
    cc = conv.groupBy("cd").agg(F.count(F.lit(1)).alias("n"))
    cal = spark.range(0, 15).select(F.col("id").alias("day"))
    total = s0.agg(F.count(F.lit(1)).alias("total"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        cal.join(cc, cal.day == cc.cd, "left")
        .crossJoin(total)
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_converted_day"),
            "total",
        )
        .select(
            "day",
            "n_converted_day",
            F.sum("n_converted_day").over(w).alias("n_converted_cum"),
            "total",
        )
        .select(
            "day",
            "n_converted_day",
            "n_converted_cum",
            (F.col("total") - F.col("n_converted_cum")).alias("n_surviving"),
            F.expr("(total - n_converted_cum) * 1000000 DIV total").alias(
                "survival_ppm"
            ),
        )
    )


@query(
    "events_burst_rate_flag",
    oracle="""
    WITH b AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id
               ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 43200 PRECEDING AND CURRENT ROW) AS c
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(c) AS BIGINT) AS max_burst_12h,
           MAX(c) >= 6 AS is_burst
    FROM b GROUP BY user_id
    """,
    section="2.5",
    doc="Burst-rate (bot/abuse) screen: per user, the maximum number of "
    "events inside ANY trailing 12-hour window, flagged at >= 6 — the "
    "rate-anomaly filter run before user-generated data enters a "
    "training corpus (complements win_sessionize_events' grouping and "
    "text_repetition_signals' content screen with a BEHAVIORAL one). "
    "The sliding count is a rangeBetween frame over epoch seconds — "
    "the calendar-correct form; a rowsBetween frame would measure "
    "event count, not time (win_moving_avg's calendar lesson). Both "
    "engines floor the epoch to whole seconds before the range "
    "compare (DuckDB's epoch() returns fractional seconds; Spark's "
    "unix_timestamp truncates — unfloored, boundary rows diverge). "
    "One user-keyed shuffle serves the frame and the per-user rollup.",
)
def events_burst_rate_flag(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select(
        "user_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-43200, 0)
    b = e.select("user_id", F.count(F.lit(1)).over(w).alias("c"))
    return b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("c").cast("long").alias("max_burst_12h"),
        (F.max("c") >= 6).alias("is_burst"),
    )


@query(
    "agg_count_of_counts",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
    section="2.4",
    doc="Customer-distribution histogram (the TPC-H Q13 shape): customers "
    "bucketed by how many non-urgent orders they placed, INCLUDING the "
    "zero bucket — which forces the left join before the first "
    "aggregate (an inner join silently drops never-ordered customers; "
    "COUNT(o_orderkey) vs COUNT(*) is what makes the empty match count "
    "0, the classic outer-join-count trap). Double aggregation: the "
    "first groupBy shuffles on the customer key, the second on the "
    "count value — whose domain is tiny, so the second shuffle moves "
    "|distinct counts| partial rows. The join itself is "
    "dim-to-fact equi on the customer key.",
)
def agg_count_of_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select("c_custkey")
    o = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "win_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events WHERE event_type = 'click'
    ),
    d AS (
      SELECT user_id, v_cents,
             CAST(FLOOR(epoch(next_ts)) AS BIGINT)
               - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dur_s
      FROM s WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(SUM(v_cents * dur_s) * 1000 // SUM(dur_s) AS BIGINT)
             AS twap_milli_cents
    FROM d GROUP BY user_id
    """,
    section="2.5",
    doc="Time-weighted average (TWAP) over IRREGULAR samples: each click "
    "value holds until the user's next click, so it is weighted by its "
    "holding duration — the correct average for unevenly-sampled "
    "series (sensor readings, account balances, prices), where the "
    "row-weighted mean over-counts burst periods. One LEAD window per "
    "user supplies the interval end; the weighted sum is exact int64 "
    "(cents x whole seconds, both engines floor the epoch — "
    "events_burst_rate_flag's lesson) and the final ratio is one "
    "integer milli division. Last sample per user is open-ended and "
    "excluded (no duration exists). One user-keyed shuffle serves the "
    "window and the rollup.",
)
def win_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    e = (
        T(spark, sf, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id", "v_cents", "ts", F.lead("ts").over(w).alias("next_ts")
    ).filter(F.col("next_ts").isNotNull())
    d = s.select(
        "user_id",
        "v_cents",
        (F.unix_timestamp("next_ts") - F.unix_timestamp("ts")).alias("dur_s"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_s").alias("total_s"),
        F.expr("sum(v_cents * dur_s) * 1000 DIV sum(dur_s)").alias(
            "twap_milli_cents"
        ),
    )


@query(
    "events_active_users_rolling",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d AS day FROM act),
    dau AS (
      SELECT d AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM act GROUP BY d
    ),
    wau AS (
      SELECT day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
      FROM days JOIN act a ON a.d BETWEEN day - 6 AND day GROUP BY day
    ),
    mau AS (
      SELECT day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS mau
      FROM days JOIN act a ON a.d BETWEEN day - 27 AND day GROUP BY day
    )
    SELECT day, dau.dau, wau.wau, mau.mau
    FROM dau JOIN wau USING (day) JOIN mau USING (day)
    """,
    section="2.4",
    doc="DAU/WAU/MAU — daily, trailing-7-day and trailing-28-day distinct "
    "active users per observed day. The scalable formulation is the "
    "EXPLODE-TO-WINDOW trick: each (user, active-day) pair is emitted "
    "to every day whose trailing window it falls in (bounded map-side "
    "fanout of 7 or 28 rows carrying only user+day), then one distinct "
    "count per day — NO per-day rescan of the activity table and no "
    "range join, which is what the naive windowed-distinct rewrite "
    "costs (COUNT(DISTINCT) over a moving frame has no incremental "
    "form; win_running_distinct handles the cumulative special case, "
    "this handles the sliding one). The oracle computes the same thing "
    "AS the range join — two formulations, one hash. Observed-day "
    "restriction comes free from the inner join against the DAU day "
    "set.",
)
def events_active_users_rolling(spark: SparkSession, sf: str) -> DataFrame:
    act = (
        T(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    dau = act.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    def rolled(width: int, name: str) -> DataFrame:
        exp = act.select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.date_add("d", width - 1))).alias("day"),
        )
        return exp.groupBy("day").agg(F.countDistinct("user_id").alias(name))
    return (
        dau.join(rolled(7, "wau"), "day")
        .join(rolled(28, "mau"), "day")
        .select("day", "dau", "wau", "mau")
    )


@query(
    "dq_table_checksum",
    oracle="""
    WITH canon AS (
      SELECT o_orderkey % 8 AS chunk,
             CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               || '|' || strftime(o_orderdate, '%Y-%m-%d')
             ), 1, 8)) AS BIGINT) AS row_sig
      FROM orders
    )
    SELECT chunk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(row_sig) AS BIGINT) AS chunk_checksum
    FROM canon GROUP BY chunk
    """,
    section="2.4",
    doc="Order-insensitive table checksum — the migration/replication "
    "parity audit: every row serializes to a canonical string (ints "
    "verbatim, money as integer cents, dates ISO — no float "
    "formatting, the cross-engine trap), hashes to a 32-bit integer "
    "signature, and chunk checksums are the SUM of signatures — "
    "commutative, so partition order, shuffle order and engine "
    "parallelism cannot move the result, and one flipped row flips "
    "its chunk with probability 1 - 2^-32. Chunking by key % 8 "
    "localizes a mismatch to 1/8th of the table for bisection (the "
    "production pattern: re-chunk finer only where checksums "
    "diverge). Fully map-side until one tiny 8-row aggregate; "
    "complements table_diff_by_key (which finds WHICH rows differ, "
    "at full-join cost) as the cheap first-pass gate.",
)
def dq_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    canonical = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        cents("o_totalprice").cast("string"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
    )
    sig = F.conv(F.substring(F.md5(canonical), 1, 8), 16, 10).cast("long")
    return (
        o.select((F.col("o_orderkey") % 8).alias("chunk"), sig.alias("row_sig"))
        .groupBy("chunk")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("row_sig").alias("chunk_checksum"),
        )
    )


@query(
    "features_pit_order_counts",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = e.user_id
              AND o.o_orderdate >  CAST(e.ts AS DATE) - 7
              AND o.o_orderdate <= CAST(e.ts AS DATE)) AS orders_7d,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = e.user_id
              AND o.o_orderdate >  CAST(e.ts AS DATE) - 30
              AND o.o_orderdate <= CAST(e.ts AS DATE)) AS orders_30d,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = e.user_id
              AND o.o_orderdate >  CAST(e.ts AS DATE) - 90
              AND o.o_orderdate <= CAST(e.ts AS DATE)) AS orders_90d
    FROM events e
    """,
    section="2.3",
    doc="Point-in-time feature matrix — the feature-store primitive: for "
    "every event, the user's order count in the trailing 7/30/90 days "
    "AS OF the event instant (train/serve-skew-safe: only past state, "
    "half-open windows so today's orders count and the boundary day "
    "falls out exactly once). Scalable formulation: one merged stream "
    "of per-day order deltas and 4 probe rows per event (at d, d-7, "
    "d-30, d-90), ONE user-keyed cumulative window over it (orders "
    "sort before probes within a day), then each event's features are "
    "cum(d) - cum(d-w) — three trailing counts from ONE shuffle "
    "family, where the naive form runs three range joins. The oracle "
    "IS the three correlated range counts — different formulation, "
    "same hash (the events_active_users_rolling pattern applied to "
    "as-of feature engineering; join_asof_tolerance covers the "
    "carry-a-value case, this covers count-in-window).",
)
def features_pit_order_counts(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("user_id", "day", "cnt", F.lit(0).alias("kind"),
                F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("string").alias("tag"))
    )
    e = T(spark, sf, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("d")
    )
    probes = None
    for tag, off in (("d0", 0), ("d7", 7), ("d30", 30), ("d90", 90)):
        p = e.select(
            "user_id",
            F.date_sub("d", off).alias("day"),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(1).alias("kind"),
            "event_id",
            F.lit(tag).alias("tag"),
        )
        probes = p if probes is None else probes.unionByName(p)
    merged = daily.unionByName(probes)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day", "kind", "event_id", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = merged.select(
        "user_id", "event_id", "tag", "kind", F.sum("cnt").over(w).alias("cum")
    ).filter(F.col("kind") == 1)
    pivoted = cum.groupBy("event_id", "user_id").agg(
        F.min(F.when(F.col("tag") == "d0", F.col("cum"))).alias("c0"),
        F.min(F.when(F.col("tag") == "d7", F.col("cum"))).alias("c7"),
        F.min(F.when(F.col("tag") == "d30", F.col("cum"))).alias("c30"),
        F.min(F.when(F.col("tag") == "d90", F.col("cum"))).alias("c90"),
    )
    return pivoted.select(
        "event_id",
        "user_id",
        (F.col("c0") - F.col("c7")).alias("orders_7d"),
        (F.col("c0") - F.col("c30")).alias("orders_30d"),
        (F.col("c0") - F.col("c90")).alias("orders_90d"),
    )


@query(
    "dq_observe_inline_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonpositive,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_urgent
    FROM orders
    """,
    section="2.4",
    doc="INLINE observation metrics (pyspark.sql.Observation / "
    "df.observe): data-quality counters computed as a side effect of "
    "the pipeline's OWN pass — row count, violation count, checksum, "
    "status cardinality ride along with the write action instead of "
    "costing a second full scan, which is the difference between DQ "
    "that runs always and DQ that gets turned off at 100 TB. The "
    "query attaches the observation to the orders scan, drives it "
    "with the sink write (the real pipeline action), then returns the "
    "harvested metrics as a one-row frame; the oracle recomputes the "
    "same metrics relationally — proving observe() saw every row "
    "exactly once. (Observed metrics must be fully associative: "
    "DISTINCT aggregates are rejected at analysis — "
    "approx_count_distinct is the sanctioned cardinality metric.)",
)
def dq_observe_inline_metrics(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Observation

    obs = Observation("dq_orders")
    src = T(spark, sf, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpositive"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("long")
        .alias("n_urgent"),
    )
    # the observation is harvested from the pipeline's own action — here
    # the sink write every real pipeline ends with (scratch + overwrite
    # keeps the query idempotent)
    from pathlib import Path

    tag = Path(sf).name or "sf"
    path = f"/tmp/etl_spark_roundtrip/observe_sink_{tag}"
    src.write.mode("overwrite").parquet(path)
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_nonpositive"], m["total_cents"], m["n_urgent"])],
        "n_rows long, n_nonpositive long, total_cents long, n_urgent long",
    )


@query(
    "win_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    ),
    m AS (SELECT CAST(SUM(rev) // COUNT(*) AS BIGINT) AS mean_rev FROM daily),
    centered AS (
      SELECT day,
             CAST(SUM(rev - m.mean_rev) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM daily, m
    ),
    peaks AS (
      SELECT day, cum,
             CAST(MAX(cum) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS peak
      FROM centered
    )
    SELECT day, cum, peak,
           CAST(peak - cum AS BIGINT) AS drawdown_cents,
           peak - cum = MAX(peak - cum) OVER () AS is_max_drawdown
    FROM peaks
    """,
    section="2.5",
    doc="Running-peak drawdown of the cumulative net series — the "
    "risk/monitoring statistic for anything cumulative (PnL, quota "
    "consumption, inventory): cumulative sum of the daily revenue "
    "DEMEANED by the series' own integer mean (SUM DIV n — drawdown "
    "of a monotone series is vacuous in either direction, so the "
    "baseline must self-calibrate per SF; the zero-row-audit lesson), "
    "running MAX of that, and drawdown = peak - current, "
    "flagging the maximum. Three stacked windows share ONE global "
    "ordering over |days| rows (per-day aggregate first, ts_acf "
    "pattern); all arithmetic exact int64 cents.",
)
def win_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    m = daily.agg(F.expr("sum(rev) DIV count(*)").alias("mean_rev"))
    centered = daily.crossJoin(m).select(
        "day", F.sum(F.col("rev") - F.col("mean_rev")).over(run).alias("cum")
    )
    peaks = centered.select(
        "day", "cum", F.max("cum").over(run).alias("peak")
    ).withColumn("drawdown_cents", F.col("peak") - F.col("cum"))
    whole = Window.partitionBy()
    return peaks.select(
        "day",
        "cum",
        "peak",
        "drawdown_cents",
        (
            F.col("drawdown_cents") == F.max("drawdown_cents").over(whole)
        ).alias("is_max_drawdown"),
    )


@query(
    "agg_peak_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT CAST(o_orderdate AS DATE) + 8 AS day, -1 AS delta
      FROM orders WHERE o_orderstatus = 'O'
    ),
    daily AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS d FROM deltas GROUP BY day),
    open_counts AS (
      SELECT day,
             CAST(SUM(d) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_open
      FROM daily
    )
    SELECT day, n_open,
           n_open = MAX(n_open) OVER () AS is_peak
    FROM open_counts
    """,
    section="2.4",
    doc="Peak interval concurrency via the +1/-1 SWEEP — the scalable "
    "answer to 'how many were open at once' (sessions, orders in "
    "flight, reservations): each interval contributes a +1 at its "
    "start day and a -1 past its end (open orders modeled as an "
    "8-day half-open fulfillment window), deltas aggregate per day "
    "FIRST (the shuffle carries |days| rows, not |intervals|), and a "
    "running sum over the day series is the exact open count — where "
    "the naive form joins every interval against every day it covers "
    "(O(intervals x duration)) or self-joins intervals "
    "(O(n^2)). The peak flag marks the busiest day(s). Same "
    "change-point mechanics as win_interval_merge's islands, applied "
    "to counting instead of merging.",
)
def agg_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    o = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderdate").cast("date").alias("d"))
    )
    deltas = o.select(F.col("d").alias("day"), F.lit(1).alias("delta")).unionByName(
        o.select(F.date_add("d", 8).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").cast("long").alias("d"))
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    counts = daily.select("day", F.sum("d").over(run).alias("n_open"))
    return counts.select(
        "day",
        "n_open",
        (F.col("n_open") == F.max("n_open").over(Window.partitionBy())).alias("is_peak"),
    )


@query(
    "join_ip_longest_prefix",
    oracle="""
    WITH ips AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 4294967296 AS ip
      FROM orders
    ),
    b24 AS (
      SELECT DISTINCT ip - (ip % 256) AS net,
             'blk24_' || CAST(ip - (ip % 256) AS VARCHAR) AS label
      FROM ips WHERE o_orderkey % 100 = 0
    ),
    b16 AS (
      SELECT DISTINCT ip - (ip % 65536) AS net,
             'blk16_' || CAST(ip - (ip % 65536) AS VARCHAR) AS label
      FROM ips WHERE o_orderkey % 40 = 7
    ),
    b8 AS (
      SELECT DISTINCT ip - (ip % 16777216) AS net,
             'blk8_' || CAST(ip - (ip % 16777216) AS VARCHAR) AS label
      FROM ips WHERE o_orderkey % 20 = 3
    )
    SELECT i.o_orderkey, i.ip,
           COALESCE(b24.label, b16.label, b8.label, 'unmatched') AS block_label,
           CASE WHEN b24.label IS NOT NULL THEN 24
                WHEN b16.label IS NOT NULL THEN 16
                WHEN b8.label IS NOT NULL THEN 8
                ELSE 0 END AS prefix_len
    FROM ips i
    LEFT JOIN b24 ON i.ip - (i.ip % 256) = b24.net
    LEFT JOIN b16 ON i.ip - (i.ip % 65536) = b16.net
    LEFT JOIN b8 ON i.ip - (i.ip % 16777216) = b8.net
    """,
    section="2.3",
    doc="Longest-prefix-match (CIDR) enrichment join — how 100 TB of "
    "clickstream/firewall logs actually attach threat-intel or geo "
    "blocks: the general 'ip BETWEEN net_lo AND net_hi' range join "
    "decomposes into ONE EQUI-JOIN PER PREFIX LEVEL (the ip truncated "
    "to each level's network is the join key), with COALESCE in "
    "specificity order implementing the longest-match rule — every "
    "join is hash-partitionable and the block tables broadcast, where "
    "the naive interval formulation degenerates to a nested loop. "
    "Block tables are sampled from the observed address population "
    "(the threat-intel reality) so every level matches non-vacuously; "
    "match levels are disjoint samples, so the specificity "
    "coalesce is exercised, not just decorative. Completes "
    "fn_ipv4_cidr (the scalar prep) and join_range_bucketed (the "
    "general range-join mechanism) with the networking-specific "
    "decomposition.",
)
def join_ip_longest_prefix(spark: SparkSession, sf: str) -> DataFrame:
    ip = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 4294967296
    )
    ips = T(spark, sf, "orders").select("o_orderkey", ip.alias("ip")).localCheckpoint(
        eager=False  # feeds the probe side and all three sampled block tables
    )

    def blocks(mod: int, rem: int, width: int, tag: str) -> DataFrame:
        net = F.col("ip") - (F.col("ip") % width)
        return (
            ips.filter(F.col("o_orderkey") % mod == rem)
            .select(net.alias("net"), F.concat(F.lit(f"blk{tag}_"), net.cast("string")).alias("label"))
            .distinct()
        )

    b24 = blocks(100, 0, 256, "24")
    b16 = blocks(40, 7, 65536, "16")
    b8 = blocks(20, 3, 16777216, "8")
    out = (
        ips.join(F.broadcast(b24).withColumnRenamed("label", "l24"),
                 (F.col("ip") - (F.col("ip") % 256)) == b24.net, "left")
        .drop("net")
        .join(F.broadcast(b16).withColumnRenamed("label", "l16"),
              (F.col("ip") - (F.col("ip") % 65536)) == b16.net, "left")
        .drop("net")
        .join(F.broadcast(b8).withColumnRenamed("label", "l8"),
              (F.col("ip") - (F.col("ip") % 16777216)) == b8.net, "left")
        .drop("net")
    )
    return out.select(
        "o_orderkey",
        "ip",
        F.coalesce("l24", "l16", "l8", F.lit("unmatched")).alias("block_label"),
        F.when(F.col("l24").isNotNull(), 24)
        .when(F.col("l16").isNotNull(), 16)
        .when(F.col("l8").isNotNull(), 8)
        .otherwise(0)
        .alias("prefix_len"),
    )


@query(
    "agg_promo_revenue_ratio",
    oracle="""
    WITH j AS (
      SELECT CAST(strftime(l.l_shipdate, '%Y-%m') AS VARCHAR) AS ship_month,
             p.p_type = 'ECONOMY' AS is_promo,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS net_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT ship_month,
           CAST(SUM(CASE WHEN is_promo THEN net_cents ELSE 0 END) AS BIGINT)
             AS promo_cents,
           CAST(SUM(net_cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN is_promo THEN net_cents ELSE 0 END) * 1000000
                // SUM(net_cents) AS BIGINT) AS promo_share_ppm
    FROM j GROUP BY ship_month
    """,
    section="2.4",
    doc="Promotional revenue share per ship month (the TPC-H Q14 shape): "
    "fact-to-dim join on the part key with the dim BROADCAST, "
    "conditional revenue aggregation, and the share as exact integer "
    "ppm. The net revenue expression rounds extendedprice*(1-discount) "
    "to cents BEFORE summation in both engines — the one shared "
    "double multiply per row lands well clear of rounding boundaries "
    "(2-decimal price x 2-decimal discount), then everything is "
    "order-insensitive int64 (registry determinism policy). Monthly "
    "bucketing via string formatting agreed byte-for-byte "
    "(strftime '%Y-%m' == date_format 'yyyy-MM').",
)
def agg_promo_revenue_ratio(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select(
        "l_partkey",
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM").alias("ship_month"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("net_cents"),
    )
    p = T(spark, sf, "part").select(
        "p_partkey", (F.col("p_type") == "ECONOMY").alias("is_promo")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return (
        j.groupBy("ship_month")
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("net_cents")).otherwise(0)).alias(
                "promo_cents"
            ),
            F.sum("net_cents").alias("total_cents"),
        )
        .select(
            "ship_month",
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 1000000 DIV total_cents").alias("promo_share_ppm"),
        )
    )


@query(
    "fact_accumulating_snapshot",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           MIN(CAST(l.l_shipdate AS DATE)) AS first_ship,
           MAX(CAST(l.l_shipdate AS DATE)) AS last_ship,
           CAST(MIN(CAST(l.l_shipdate AS DATE))
                - CAST(o.o_orderdate AS DATE) AS BIGINT) AS days_to_first_ship,
           CAST(MAX(CAST(l.l_shipdate AS DATE))
                - MIN(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS ship_window_days,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    section="2.4",
    doc="Accumulating-snapshot fact build (the Kimball milestone "
    "pattern): each order collapses to ONE row carrying its lifecycle "
    "milestones — order date, first shipment, last shipment — plus "
    "the lag between stages in exact integer days, the table every "
    "fulfillment-latency dashboard reads. One fact-fact equi-join on "
    "the order key (both sides shuffle on it — the bucketed-write "
    "layout of sink_bucketed_join_colocated amortizes exactly this) "
    "and one aggregate per order; milestone semantics are MIN/MAX "
    "over the line items, so late-arriving lines simply re-aggregate "
    "(the accumulating part: the snapshot is re-derived, not "
    "mutated in place — cdc_apply_changes covers the mutate-in-place "
    "alternative).",
)
def fact_accumulating_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("order_date")
    )
    li = T(spark, sf, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "order_date")
        .agg(
            F.min("ship").alias("first_ship"),
            F.max("ship").alias("last_ship"),
            F.datediff(F.min("ship"), F.first("order_date")).cast("long").alias(
                "days_to_first_ship"
            ),
            F.datediff(F.max("ship"), F.min("ship")).cast("long").alias(
                "ship_window_days"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "win_ytd_running",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
             CAST(strftime(o_orderdate, '%m') AS BIGINT) AS mo,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mo, rev,
           CAST(SUM(rev) OVER (PARTITION BY yr ORDER BY mo
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS ytd_rev,
           mo = 12 AS is_year_close
    FROM monthly
    """,
    section="2.5",
    doc="Year-to-date running revenue — the RESETTING cumulative: the "
    "window partitions by year so the accumulator restarts every "
    "January (win_running_sum is the never-resetting sibling; the "
    "reset is free — it IS the partition key, no lag-compare reset "
    "logic needed, the idiom worth pinning because hand-rolled reset "
    "flags are how production YTD reports go wrong). Monthly "
    "pre-aggregate first, so the windows run on |year x month| rows; "
    "exact integer cents.",
)
def win_ytd_running(spark: SparkSession, sf: str) -> DataFrame:
    monthly = (
        T(spark, sf, "orders")
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
            F.month(F.col("o_orderdate").cast("date")).cast("long").alias("mo"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    w = Window.partitionBy("yr").orderBy("mo").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "yr",
        "mo",
        "rev",
        F.sum("rev").over(w).alias("ytd_rev"),
        (F.col("mo") == 12).alias("is_year_close"),
    )


@query(
    "ts_mom_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
             + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS mnum,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT mnum, rev,
             LAG(rev, 1) OVER (ORDER BY mnum) AS prev_mo,
             LAG(mnum, 1) OVER (ORDER BY mnum) AS prev_mnum,
             LAG(rev, 12) OVER (ORDER BY mnum) AS prev_yr,
             LAG(mnum, 12) OVER (ORDER BY mnum) AS prev_yr_mnum
      FROM monthly
    )
    SELECT mnum // 12 AS yr, mnum % 12 + 1 AS mo, rev,
           CASE WHEN prev_mnum = mnum - 1
                THEN (rev - prev_mo) * 1000000 // prev_mo END AS mom_ppm,
           CASE WHEN prev_yr_mnum = mnum - 12
                THEN (rev - prev_yr) * 1000000 // prev_yr END AS yoy_ppm
    FROM lagged
    """,
    section="2.5",
    doc="Month-over-month and year-over-year growth — the reporting "
    "staple, with the GAP GUARD hand-rolled versions miss: LAG(n) "
    "returns the n-th PRECEDING ROW, which is only the previous "
    "month/year if the series has no holes, so each lag also carries "
    "its month number and the delta only publishes when the lagged "
    "row is exactly 1 (resp. 12) months back — a missing month yields "
    "NULL, not a silently-wrong comparison against an older period. "
    "Growth in integer ppm of the base (floor division toward "
    "negative infinity agrees between engines for negative growth "
    "too, since both // and DIV floor here). Monthly pre-aggregate; "
    "windows on |months| rows.",
)
def ts_mom_yoy_growth(spark: SparkSession, sf: str) -> DataFrame:
    monthly = (
        T(spark, sf, "orders")
        .groupBy(
            (
                F.year(F.col("o_orderdate").cast("date")).cast("long") * 12
                + F.month(F.col("o_orderdate").cast("date")).cast("long")
                - 1
            ).alias("mnum")
        )
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("mnum")
    lagged = monthly.select(
        "mnum",
        "rev",
        F.lag("rev", 1).over(w).alias("prev_mo"),
        F.lag("mnum", 1).over(w).alias("prev_mnum"),
        F.lag("rev", 12).over(w).alias("prev_yr"),
        F.lag("mnum", 12).over(w).alias("prev_yr_mnum"),
    )
    return lagged.select(
        F.expr("mnum DIV 12").alias("yr"),
        (F.col("mnum") % 12 + 1).alias("mo"),
        "rev",
        F.when(
            F.col("prev_mnum") == F.col("mnum") - 1,
            F.expr("(rev - prev_mo) * 1000000 DIV prev_mo"),
        ).alias("mom_ppm"),
        F.when(
            F.col("prev_yr_mnum") == F.col("mnum") - 12,
            F.expr("(rev - prev_yr) * 1000000 DIV prev_yr"),
        ).alias("yoy_ppm"),
    )


_PSI_TERM_N9 = (
    "CAST(floor(("
    " ((CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))"
    "  - (CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)))"
    " * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))"
    "      / (CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)))"
    ") * 1000000000.0 + 0.5) AS BIGINT)"
)


@query(
    "dq_drift_psi",
    oracle=f"""
    WITH vals AS (
      SELECT CASE WHEN CAST(strftime(o_orderdate, '%Y') AS BIGINT) < 1996
                  THEN 'a' ELSE 'b' END AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    a_ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
             COUNT(*) OVER () AS n
      FROM vals WHERE grp = 'a'
    ),
    cuts AS (
      SELECT DISTINCT v AS cv
      FROM a_ranked, (SELECT unnest(range(1, 10)) AS k)
      WHERE rn = (k * n + 9) // 10
    ),
    vc AS (SELECT grp, v, COUNT(*) AS cnt FROM vals GROUP BY grp, v),
    binned AS (
      SELECT vc.grp, vc.v, vc.cnt,
             (SELECT COUNT(*) FROM cuts WHERE cuts.cv < vc.v) AS bin
      FROM vc
    ),
    bins AS (
      SELECT bin,
             CAST(SUM(CASE WHEN grp = 'a' THEN cnt ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN grp = 'b' THEN cnt ELSE 0 END) AS BIGINT) AS cb
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM bins
    )
    SELECT MIN(na) AS na, MIN(nb) AS nb,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM({_PSI_TERM_N9}) AS BIGINT) AS psi_nano,
           CAST(SUM({_PSI_TERM_N9}) AS BIGINT) > 100000000 AS drift_alert
    FROM bins, tot
    """,
    section="2.4",
    doc="Population Stability Index — THE industry drift gauge for "
    "feature monitoring, completing the drift trio (dq_ks_drift's "
    "distribution test, corpus_js_divergence's corpus distance): "
    "order totals before 1996 define decile bins by EXACT rank (the "
    "winsorize cutpoint mechanism; approx_percentile is the 100 TB "
    "swap), the later period drops into them, and PSI = "
    "sum((p_i - q_i) * ln(p_i/q_i)) with Laplace-smoothed "
    "proportions so empty current-period bins stay defined. Each "
    "bin's term is ONE shared double expression tree quantized to "
    "integer nano (floor(x*1e9 + 0.5) — the JS-divergence idiom) "
    "before the 10-term sum, so no accumulated double enters the "
    "hash; the 0.1 alert threshold becomes an integer compare. "
    "Bin assignment joins the 9-row cutpoint table against "
    "per-(grp, value) counts — never per-row.",
)
def dq_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    vals = T(spark, sf, "orders").select(
        F.when(F.year(F.col("o_orderdate").cast("date")) < 1996, "a")
        .otherwise("b")
        .alias("grp"),
        cents("o_totalprice").alias("v"),
    )
    a = vals.filter(F.col("grp") == "a")
    wn = Window.orderBy("v")
    a_ranked = a.select(
        "v",
        F.row_number().over(wn).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    cuts = (
        a_ranked.join(ks, F.col("rn") == F.expr("(k * n + 9) DIV 10"))
        .select(F.col("v").alias("cv"))
        .distinct()
    )
    vc = vals.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("cnt"))
    binned = (
        vc.crossJoin(F.broadcast(cuts))
        .groupBy("grp", "v", "cnt")
        .agg(F.sum(F.when(F.col("cv") < F.col("v"), 1).otherwise(0)).alias("bin"))
    )
    bins = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == "a", F.col("cnt")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == "b", F.col("cnt")).otherwise(0)).alias("cb"),
    )
    tot = bins.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    return (
        bins.crossJoin(tot)
        .agg(
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(F.expr(_PSI_TERM_N9)).cast("long").alias("psi_nano"),
        )
        .select(
            "na",
            "nb",
            "n_bins",
            "psi_nano",
            (F.col("psi_nano") > 100000000).alias("drift_alert"),
        )
    )


@query(
    "user_cohort_ltv",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey,
             MIN(CAST(strftime(o_orderdate, '%Y') AS BIGINT)) AS cohort_yr
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT f.cohort_yr,
             CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) - f.cohort_yr
               AS yr_offset,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    ),
    per_cell AS (
      SELECT cohort_yr, yr_offset,
             CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM rev GROUP BY cohort_yr, yr_offset
    ),
    sized AS (
      SELECT cohort_yr, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM first_order GROUP BY cohort_yr
    )
    SELECT p.cohort_yr, p.yr_offset, s.cohort_users, p.rev_cents,
           CAST(SUM(p.rev_cents) OVER (PARTITION BY p.cohort_yr
             ORDER BY p.yr_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_rev_cents,
           CAST(SUM(p.rev_cents) OVER (PARTITION BY p.cohort_yr
             ORDER BY p.yr_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             // s.cohort_users AS BIGINT) AS ltv_cents_per_user
    FROM per_cell p JOIN sized s ON p.cohort_yr = s.cohort_yr
    """,
    section="2.4",
    doc="Cohort lifetime-value curve — the REVENUE twin of "
    "user_retention_cohorts (which counts who comes back; this sums "
    "what they spend): customers cohort by first-order year, every "
    "order's revenue lands in its (cohort, year-offset) cell, and the "
    "running sum along each cohort row divided by the cohort's "
    "population is the per-user LTV trajectory finance reads off the "
    "diagonal. First-order derivation is one customer-keyed "
    "aggregate; the curve windows run on |cohorts x offsets| cells; "
    "LTV-per-user is integer floor division of exact cents — no "
    "average enters the hash.",
)
def user_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
        cents("o_totalprice").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort_yr"))
    rev = o.join(first, "o_custkey").select(
        "cohort_yr", (F.col("yr") - F.col("cohort_yr")).alias("yr_offset"), "cents"
    )
    per_cell = rev.groupBy("cohort_yr", "yr_offset").agg(
        F.sum("cents").alias("rev_cents")
    )
    sized = first.groupBy("cohort_yr").agg(F.count(F.lit(1)).alias("cohort_users"))
    w = (
        Window.partitionBy("cohort_yr")
        .orderBy("yr_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_cell.join(sized, "cohort_yr")
        .select(
            "cohort_yr",
            "yr_offset",
            "cohort_users",
            "rev_cents",
            F.sum("rev_cents").over(w).alias("cum_rev_cents"),
        )
        .withColumn(
            "ltv_cents_per_user", F.expr("cum_rev_cents DIV cohort_users")
        )
    )


@query(
    "win_rank_movement",
    oracle="""
    WITH per_yr AS (
      SELECT o_custkey,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders
      WHERE CAST(strftime(o_orderdate, '%Y') AS BIGINT) IN (1995, 1996)
      GROUP BY o_custkey, yr
    ),
    ranked AS (
      SELECT o_custkey, yr, rev,
             ROW_NUMBER() OVER (PARTITION BY yr ORDER BY rev DESC, o_custkey)
               AS rk
      FROM per_yr
    )
    SELECT a.o_custkey,
           a.rev AS rev_1995, b.rev AS rev_1996,
           a.rk AS rank_1995, b.rk AS rank_1996,
           CAST(a.rk - b.rk AS BIGINT) AS rank_gain
    FROM ranked a JOIN ranked b
      ON a.o_custkey = b.o_custkey AND a.yr = 1995 AND b.yr = 1996
    """,
    section="2.5",
    doc="Leaderboard MOVEMENT between two periods: customers ranked by "
    "1995 revenue and again by 1996, joined on the customer, with "
    "rank_gain = old rank minus new (positive = climbed) — the "
    "period-over-period ranking diff every sales/leaderboard review "
    "runs, which a single window cannot express (two independent "
    "orderings must meet in a join). Deterministic tie-break by "
    "customer key keeps row_number stable cross-engine. Both rankings "
    "come from ONE shuffle family (same year-partitioned window "
    "spec); the self-join is customer-keyed. Customers active in only "
    "one year drop out (inner join) — the movement metric is defined "
    "on the intersection.",
)
def win_rank_movement(spark: SparkSession, sf: str) -> DataFrame:
    per_yr = (
        T(spark, sf, "orders")
        .select(
            "o_custkey",
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
            cents("o_totalprice").alias("cents"),
        )
        .filter(F.col("yr").isin(1995, 1996))
        .groupBy("o_custkey", "yr")
        .agg(F.sum("cents").alias("rev"))
    )
    w = Window.partitionBy("yr").orderBy(F.col("rev").desc(), "o_custkey")
    ranked = per_yr.withColumn("rk", F.row_number().over(w))
    a = ranked.filter(F.col("yr") == 1995).alias("a")
    b = ranked.filter(F.col("yr") == 1996).alias("b")
    return a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey")).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.rev").alias("rev_1995"),
        F.col("b.rev").alias("rev_1996"),
        F.col("a.rk").cast("long").alias("rank_1995"),
        F.col("b.rk").cast("long").alias("rank_1996"),
        (F.col("a.rk") - F.col("b.rk")).cast("long").alias("rank_gain"),
    )


# ---------------------------------------------------------------------------
# TPC-H plan shapes (Q8 / Q19 / Q21) — the remaining distinctive optimizer
# shapes from the canonical warehouse suite, adapted to the testdata schema
# ---------------------------------------------------------------------------


@query(
    "agg_market_share",
    oracle="""
    WITH sales AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS net_cents,
             sn.n_name = 'NATION_3' AS is_target
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT yr,
           CAST(SUM(CASE WHEN is_target THEN net_cents ELSE 0 END) AS BIGINT)
             AS target_cents,
           CAST(SUM(net_cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN is_target THEN net_cents ELSE 0 END) * 1000000
                // SUM(net_cents) AS BIGINT) AS share_ppm
    FROM sales GROUP BY yr ORDER BY yr
    """,
    section="2.4",
    doc="National market share by year (the TPC-H Q8 shape): the ASIA "
    "ECONOMY-part market, asking what fraction of yearly revenue one "
    "supplier nation captured. The distinctive plan feature is the "
    "DOUBLE ROLE-PLAY of the nation dim — once on the customer path "
    "(region filter, prunes rows) and once on the supplier path (share "
    "numerator flag, prunes nothing) — which a correct optimizer treats "
    "as two independent broadcast joins, not a self-join. All five dims "
    "broadcast; the only shuffles are fact-fact lineitem-orders on the "
    "order key and the final 7-row year aggregate. Share in exact "
    "integer ppm off cents rounded before summation (registry policy).",
)
def agg_market_share(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("net_cents"),
    )
    o = T(spark, sf, "orders").select(
        "o_orderkey", "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
    )
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    cust_nations = (
        c.join(
            F.broadcast(
                n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey")
            ),
            c.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    s = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    supp_flag = s.join(
        F.broadcast(n.select("n_nationkey", (F.col("n_name") == "NATION_3").alias("is_target"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "is_target")
    p = T(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    sales = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_nations), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_flag), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
    )
    return (
        sales.groupBy("yr")
        .agg(
            F.sum(F.when(F.col("is_target"), F.col("net_cents")).otherwise(0)).alias(
                "target_cents"
            ),
            F.sum("net_cents").alias("total_cents"),
        )
        .select(
            "yr",
            "target_cents",
            "total_cents",
            F.expr("target_cents * 1000000 DIV total_cents").alias("share_ppm"),
        )
        .orderBy("yr")
    )


@query(
    "filter_disjunctive_bands",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    section="2.2",
    doc="Disjunction-of-conjunctions predicate (the TPC-H Q19 shape): "
    "three (brand, size-band, quantity-band) OR-arms spanning BOTH join "
    "sides. The optimizer test is partial pushdown of a disjunction: "
    "the union of the part-only arms (brand IN (...) AND size <= 15) "
    "prunes the dim scan and the quantity envelope (1..30) prunes the "
    "fact scan BEFORE the join — Catalyst extracts both via "
    "constraint propagation from the OR, so the residual cross-side "
    "disjunction evaluates on a pre-filtered broadcast join, not on "
    "the raw fact stream. Note Brand#34 does not exist in this corpus "
    "(brands run 1..25) — a deliberately empty arm, proving the OR "
    "evaluates arm-independently rather than vacuously.",
)
def filter_disjunctive_bands(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("net_cents"),
    )
    p = T(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    arm = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(arm).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("net_cents").cast("long").alias("revenue_cents"),
    )


@query(
    "join_multi_exists_waiting",
    oracle="""
    WITH lines AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CAST(l.l_shipdate AS DATE)
               > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT a.l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_waiting_orders
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late) a
    WHERE EXISTS (SELECT 1 FROM lines b
                  WHERE b.l_orderkey = a.l_orderkey
                    AND b.l_suppkey <> a.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines c
                      WHERE c.l_orderkey = a.l_orderkey
                        AND c.l_suppkey <> a.l_suppkey AND c.is_late)
    GROUP BY a.l_suppkey ORDER BY n_waiting_orders DESC, suppkey LIMIT 20
    """,
    section="2.3",
    doc="Suppliers who kept others waiting (the TPC-H Q21 shape, late = "
    "shipped >60 days after order date since this schema carries no "
    "receipt/commit dates): for multi-supplier orders, find the SOLE "
    "late supplier — one EXISTS (another supplier participated) and one "
    "NOT EXISTS (no OTHER supplier was late) over the same fact. Plan: "
    "the order-keyed lineitem-orders join computes lateness once; both "
    "correlated quantifiers then resolve as ONE per-order aggregate "
    "(count of supplier partners, count of late partners) joined back "
    "on the order key — semi/anti semantics as order-local counters, "
    "three order-keyed shuffles total and no per-row subquery re-scan. "
    "Top-20 by waiting count is a TakeOrderedAndProject.",
)
def join_multi_exists_waiting(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate").cast("date") > F.date_add(F.col("odate"), 60)
            ).alias("is_late"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
        .distinct()
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late = lines.filter(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    sole_late = late.join(
        per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1)),
        "l_orderkey",
    )
    return (
        sole_late.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_waiting_orders"))
        .orderBy(F.desc("n_waiting_orders"), F.asc("suppkey"))
        .limit(20)
    )


@query(
    "recursive_cte_hierarchy",
    oracle="""
    WITH RECURSIVE r AS (
      SELECT p_partkey AS key, p_partkey AS anc, 0 AS depth FROM part
      UNION ALL
      SELECT key, anc // 10, depth + 1 FROM r WHERE anc >= 10
    )
    SELECT key, anc AS root, depth
    FROM r WHERE anc < 10
    """,
    section="2.4",
    doc="NATIVE recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): "
    "the same decimal-trie hierarchy flattening as "
    "graph_hierarchy_rollup, but executed by the engine's UnionLoop "
    "operator instead of a driver-orchestrated loop — the anchor seeds "
    "every part, each iteration re-plans only the STILL-CLIMBING rows "
    "(the recursion's working set shrinks geometrically), and "
    "termination is the empty-iteration fixpoint, not a driver-side "
    "max() probe. Identical SQL text runs on both engines. The driver-"
    "loop twin stays registered deliberately: on a cluster the native "
    "form wins (no per-round driver round-trip / Python overhead), "
    "while the loop form generalizes to iteration Spark's recursion "
    "cannot express (damped PageRank sweeps, Lloyd k-means).",
)
def recursive_cte_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "part").createOrReplaceTempView("rc_part")
    return spark.sql(
        """
        WITH RECURSIVE r AS (
          SELECT p_partkey AS key, p_partkey AS anc, 0 AS depth FROM rc_part
          UNION ALL
          SELECT key, anc DIV 10 AS anc, depth + 1 AS depth FROM r WHERE anc >= 10
        )
        SELECT key, anc AS root, depth
        FROM r WHERE anc < 10
        """
    )


@query(
    "recursive_cte_referral_path",
    oracle="""
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS custkey, c_custkey AS node,
             0 AS depth,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS path_bal_cents
      FROM customer
      UNION ALL
      SELECT w.custkey, w.node // 2 AS node, w.depth + 1,
             w.path_bal_cents + CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
      FROM walk w JOIN customer c ON c.c_custkey = w.node // 2
      WHERE w.node > 1
    )
    SELECT custkey, CAST(depth AS INT) AS chain_depth,
           path_bal_cents AS chain_bal_cents
    FROM walk WHERE node = 1 AND custkey % 100 = 0
    ORDER BY custkey
    """,
    section="2.4",
    doc="Recursive CTE with a JOIN in the recursive step (the shape the "
    "expression-only trie walk doesn't cover): each customer walks a "
    "synthetic referral tree (parent = custkey DIV 2, root = 1), "
    "JOINING the customer table at every hop to accumulate the exact "
    "integer-cents balance along the root path. Depth is data-"
    "dependent (~log2 n, ~11 at sf0.01 — well under Spark's 100-level "
    "recursion default); every iteration is a broadcast-able equi-join "
    "of the shrinking frontier against the dimension. The %100 output "
    "cut keeps the checked result small while the recursion itself "
    "still runs over every customer.",
)
def recursive_cte_referral_path(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "customer").createOrReplaceTempView("rc_customer")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT c_custkey AS custkey, c_custkey AS node,
                 0 AS depth,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) AS path_bal_cents
          FROM rc_customer
          UNION ALL
          SELECT w.custkey, w.node DIV 2 AS node, w.depth + 1 AS depth,
                 w.path_bal_cents + CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                   AS path_bal_cents
          FROM walk w JOIN rc_customer c ON c.c_custkey = w.node DIV 2
          WHERE w.node > 1
        )
        SELECT custkey, CAST(depth AS INT) AS chain_depth,
               path_bal_cents AS chain_bal_cents
        FROM walk WHERE node = 1 AND custkey % 100 = 0
        ORDER BY custkey
        """
    )


@query(
    "events_attribution_linear",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.pid, e.event_type AS channel
      FROM purchases p JOIN events e
        ON e.user_id = p.user_id
       AND e.ts < p.pts
       AND e.ts >= p.pts - INTERVAL 7 DAY
       AND e.event_type IN ('view', 'click', 'signup')
    ),
    credited AS (
      SELECT pid, channel,
             1000000 // COUNT(*) OVER (PARTITION BY pid) AS credit_ppm
      FROM touches
    )
    SELECT channel, COUNT(*) AS n_touches,
           CAST(SUM(credit_ppm) AS BIGINT) AS total_credit_ppm
    FROM credited GROUP BY 1 ORDER BY 1
    """,
    section="2.5",
    doc="Multi-touch LINEAR attribution (the equal-credit sibling of "
    "events_attribution_last_touch): every view/click/signup in the 7 "
    "days before a purchase shares that purchase's credit equally — "
    "credit per touch = 1e6 DIV n_touches (exact integer ppm; the "
    "remainder is deliberately dropped, both engines identically). "
    "Plan: the purchase<-touch pairing is a user-keyed equi-join with "
    "a time-range residual (the join_interval_overlap shape, ONE "
    "shuffle on user_id), the per-purchase touch count is a window "
    "over the pair set partitioned by the purchase id, and the final "
    "channel rollup is a 3-row agg. At 100 TB the 7-day bound keeps "
    "per-user pair fan-out constant.",
)
def events_attribution_linear(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = T(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    t = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id", F.col("ts").alias("tts"), F.col("event_type").alias("channel")
    )
    pairs = p.join(
        t,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    ).select("pid", "channel")
    credited = pairs.withColumn(
        "credit_ppm", F.expr("1000000 DIV COUNT(1) OVER (PARTITION BY pid)")
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_ppm").alias("total_credit_ppm"),
        )
        .orderBy("channel")
    )


@query(
    "events_path_analysis_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
    section="2.5",
    doc="Top-10 most-travelled 3-step event paths (the product-analytics "
    "'path analysis' view, generalizing events_markov_transitions from "
    "pairs to trigrams): two LEADs over one user-keyed time-ordered "
    "window — ONE shuffle on user_id serves both offsets (same window "
    "frame), then a path-string agg and a TakeOrderedAndProject. "
    "Deterministic tie-break on the path string. At 100 TB the "
    "trigram fan-out is exactly n_events rows (each event starts at "
    "most one path) — never combinatorial.",
)
def events_path_analysis_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = T(spark, sf, "events").select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "events_funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(ts) FILTER (event_type = 'view') AS first_view,
             MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
      FROM events GROUP BY 1
    ),
    converts AS (
      SELECT user_id,
             CAST((epoch_ns(first_purchase) // 1000 - epoch_ns(first_view) // 1000)
                  // 1000000 AS BIGINT) AS secs
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase > first_view
    )
    SELECT COUNT(*) AS n_converts,
           CAST(MIN(secs) AS BIGINT) AS min_secs,
           quantile_cont(secs, 0.5) AS median_secs,
           quantile_cont(secs, 0.9) AS p90_secs,
           CAST(MAX(secs) AS BIGINT) AS max_secs
    FROM converts
    """,
    section="2.5",
    doc="Funnel TIME-to-convert (the latency companion to "
    "events_funnel_stages' conversion counts): per user, seconds from "
    "first 'view' to first later 'purchase', summarized as min/median/"
    "p90/max. One user-keyed agg computes both firsts with FILTERed "
    "MINs (no self-join, no window), the delta is exact integer "
    "seconds, exact interpolated percentiles follow the "
    "agg_percentile precedent (Spark percentile() == DuckDB "
    "quantile_cont, bit-identical on exact-integer inputs). The "
    "5-number summary is one final 1-row agg.",
)
def events_funnel_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converts = firsts.filter(
        F.col("first_view").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        F.expr(
            "(unix_micros(first_purchase) - unix_micros(first_view)) DIV 1000000"
        ).alias("secs")
    )
    return converts.agg(
        F.count(F.lit(1)).alias("n_converts"),
        F.min("secs").alias("min_secs"),
        F.expr("percentile(secs, 0.5)").alias("median_secs"),
        F.expr("percentile(secs, 0.9)").alias("p90_secs"),
        F.max("secs").alias("max_secs"),
    )


@query(
    "events_active_users_rolling_hll",
    oracle=None,  # sketch-based by contract — relative error vs the exact
    # tier pinned in tests/test_analytics_invariants.py
    section="2.4",
    doc="SCALE TWIN of events_active_users_rolling: trailing-7-day "
    "active users via DAILY HLL SKETCHES (Spark 3.5 Apache DataSketches "
    "surface) merged over a 7-row window — hll_sketch_agg(user_id) per "
    "day, hll_union_agg over the trailing frame, hll_sketch_estimate "
    "out. The exact tier's explode-to-window fanout carries 7 rows per "
    "(user, day) pair; the sketch tier carries ONE fixed-size sketch "
    "per day regardless of user cardinality, the difference that "
    "matters when daily actives are 10^9. Mergeability (union of "
    "sketches == sketch of union) is the algebraic property the whole "
    "pattern rests on; standard-accuracy lgK=12 gives ~1.6% RSE, "
    "pinned <= 5%% against the exact counts.",
)
def events_active_users_rolling_hll(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "events")
        .select(F.col("user_id"), F.col("ts").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        F.hll_sketch_estimate(F.expr("hll_union_agg(sk)").over(w)).alias("wau_est"),
    ).orderBy("day")


@query(
    "agg_hll_overlap_estimate",
    oracle=None,  # sketch inclusion-exclusion — error-pinned vs the exact
    # intersection in tests/test_analytics_invariants.py
    section="2.4",
    doc="Audience-overlap estimation via HLL INCLUSION-EXCLUSION: "
    "|viewers ∩ purchasers| ~= est(A) + est(B) - est(A ∪ B), with the "
    "union estimated from the MERGED sketches — three numbers off two "
    "fixed-size sketches, no join, no shuffle of user ids, the "
    "audience-overlap question ad/analytics stacks answer at 10^9 "
    "users. The well-known caveat is baked into the pin: subtraction "
    "compounds the union's relative error against the (smaller) "
    "intersection, so tolerance is wider than the rolling-HLL twin's "
    "(intersection >= ~half of each set here; for tiny overlaps "
    "production uses theta sketches instead — documented trade).",
)
def agg_hll_overlap_estimate(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    side = (
        e.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    return side.agg(
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sk))"
        ).alias("union_est"),
        F.expr(
            "sum(hll_sketch_estimate(sk))"
        ).alias("sum_est"),
    ).select(
        F.col("union_est").cast("long").alias("union_est"),
        (F.col("sum_est") - F.col("union_est")).cast("long").alias("overlap_est"),
    )


@query(
    "agg_theta_set_algebra",
    oracle=None,  # sketch-based — error-pinned vs exact set algebra in
    # tests/test_analytics_invariants.py
    section="2.4",
    doc="Theta-sketch SET ALGEBRA (Spark 4 Apache DataSketches theta "
    "surface): viewers and purchasers each compress to one theta "
    "sketch, then intersection, difference (viewers-only) and union "
    "estimates come from sketch-level operators — the production "
    "upgrade over agg_hll_overlap_estimate's inclusion-exclusion, "
    "because theta supports NATIVE intersection (error scales with "
    "the result set, not the union), which is why ad/audience stacks "
    "use theta when overlaps are small. Two fixed-size sketches "
    "travel; user ids never shuffle.",
)
def agg_theta_set_algebra(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    e.filter(F.col("event_type").isin("view", "purchase")).createOrReplaceTempView(
        "theta_events"
    )
    return spark.sql(
        """
        WITH v AS (SELECT theta_sketch_agg(user_id) s FROM theta_events
                   WHERE event_type = 'view'),
             p AS (SELECT theta_sketch_agg(user_id) s FROM theta_events
                   WHERE event_type = 'purchase')
        SELECT CAST(theta_sketch_estimate(theta_intersection(v.s, p.s)) AS BIGINT)
                 AS both_est,
               CAST(theta_sketch_estimate(theta_difference(v.s, p.s)) AS BIGINT)
                 AS viewers_only_est,
               CAST(theta_sketch_estimate(theta_union(v.s, p.s)) AS BIGINT)
                 AS either_est
        FROM v, p
        """
    )


@query(
    "ab_ratio_metric_delta",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             o_custkey % 2 AS arm,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100 AS BIGINT)
               AS x,
             COUNT(*) AS y
      FROM orders GROUP BY 1, 2
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM cust GROUP BY 1
    ),
    d AS (
      SELECT arm, n,
             CAST(sx AS DOUBLE) / sy AS ratio,
             ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
              / ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
              + (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)
                / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
              - 2 * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
                / ((CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
             * (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy) / n
               AS var_ratio
      FROM arms
    )
    SELECT CAST(a.n AS BIGINT) AS n_control, CAST(b.n AS BIGINT) AS n_treat,
           CAST(floor(a.ratio * 100 + 0.5) AS BIGINT) AS control_ratio_centidollars,
           CAST(floor(b.ratio * 100 + 0.5) AS BIGINT) AS treat_ratio_centidollars,
           CAST(floor((b.ratio - a.ratio)
                      / sqrt(a.var_ratio + b.var_ratio) * 1000000 + 0.5)
             AS BIGINT) AS z_u6
    FROM (SELECT * FROM d WHERE arm = 0) a, (SELECT * FROM d WHERE arm = 1) b
    """,
    section="2.4",
    doc="Clustered RATIO-METRIC A/B analysis by the DELTA METHOD (Deng "
    "et al. 2011 — the standard correction every experimentation "
    "platform applies): the metric is revenue-per-ORDER but "
    "randomization is per-CUSTOMER (arm = custkey parity), so order-"
    "level variance is wrong — the per-customer (revenue, orders) "
    "pairs are the iid units (revenue kept in whole dollars so the "
    "integer power sums stay in BIGINT range at any sf) and var(X/Y) "
    "expands via the delta "
    "method from their variances and COVARIANCE. Every moment (sx, "
    "sy, sxx, syy, sxy) is an exact integer sum, so the z-statistic "
    "is one shared double expression over identical integers in both "
    "engines — the dq_welch_t_drift determinism discipline extended "
    "to covariance. Two customer-keyed aggs, a 2-row reduce, O(1) "
    "output.",
)
def ab_ratio_metric_delta(spark: SparkSession, sf: str) -> DataFrame:
    T(spark, sf, "orders").createOrReplaceTempView("ab_orders")
    return spark.sql(
        """
        WITH cust AS (
          SELECT o_custkey, o_custkey % 2 AS arm,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) DIV 100 AS x,
                 COUNT(*) AS y
          FROM ab_orders GROUP BY 1, 2
        ),
        arms AS (
          SELECT arm, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
          FROM cust GROUP BY 1
        ),
        d AS (
          SELECT arm, n,
                 CAST(sx AS DOUBLE) / sy AS ratio,
                 ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
                  / ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                  + (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)
                    / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                  - 2 * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
                    / ((CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
                 * (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy) / n
                   AS var_ratio
          FROM arms
        )
        SELECT a.n AS n_control, b.n AS n_treat,
               CAST(floor(a.ratio * 100 + 0.5) AS BIGINT) AS control_ratio_centidollars,
               CAST(floor(b.ratio * 100 + 0.5) AS BIGINT) AS treat_ratio_centidollars,
               CAST(floor((b.ratio - a.ratio)
                          / sqrt(a.var_ratio + b.var_ratio) * 1000000 + 0.5)
                 AS BIGINT) AS z_u6
        FROM (SELECT * FROM d WHERE arm = 0) a, (SELECT * FROM d WHERE arm = 1) b
        """
    )


@query(
    "agg_bayes_smoothed_rate",
    oracle="""
    WITH per_brand AS (
      SELECT p.p_brand,
             COUNT(*) AS n,
             COUNT(*) FILTER (l.l_returnflag = 'R') AS r,
             CAST(COUNT(*) FILTER (l.l_returnflag = 'R') * 1000000 // COUNT(*)
               AS BIGINT) AS raw_u6
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    mom AS (
      SELECT CAST(SUM(raw_u6) AS BIGINT) AS s1,
             CAST(SUM(raw_u6 * raw_u6) AS BIGINT) AS s2,
             COUNT(*) AS k
      FROM per_brand
    ),
    prior AS (
      SELECT CAST(s1 AS DOUBLE) / k / 1000000 AS m,
             ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1))
               / 1000000.0 / 1000000.0 AS v
      FROM mom
    ),
    strength AS (
      SELECT m, v, (m * (1 - m) / v - 1) AS s FROM prior
    )
    SELECT b.p_brand, CAST(b.n AS BIGINT) AS n_lines, b.raw_u6,
           CAST(floor((b.r + st.s * st.m) / (b.n + st.s) * 1000000 + 0.5)
             AS BIGINT) AS smoothed_u6
    FROM per_brand b, strength st
    ORDER BY b.p_brand
    """,
    section="2.4",
    doc="Empirical-Bayes rate smoothing (beta-binomial, method of "
    "moments): each brand's return rate shrinks toward the cross-brand "
    "prior mean with strength s = m(1-m)/v - 1 estimated FROM THE DATA "
    "— the standard fix for small-sample rate rankings (CTR, defect "
    "and return rates) where raw rates over-rank tiny groups. "
    "Determinism: per-brand raw rates are quantized to integer ppm "
    "BEFORE the cross-brand moment sums (exact integers; a float "
    "variance over groups would be partition-order-dependent), and "
    "the prior (m, v, s) then flows through one shared double "
    "expression. Two aggs (brand-keyed, then a 1-row moment reduce "
    "broadcast back), smoothed output per brand.",
)
def agg_bayes_smoothed_rate(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select("l_partkey", "l_returnflag")
    p = T(spark, sf, "part").select("p_partkey", "p_brand")
    per_brand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r"),
        )
        .withColumn("raw_u6", F.expr("r * 1000000 DIV n"))
    )
    mom = per_brand.agg(
        F.sum("raw_u6").alias("s1"),
        F.sum(F.col("raw_u6") * F.col("raw_u6")).alias("s2"),
        F.count(F.lit(1)).alias("k"),
    )
    prior = mom.select(
        (F.col("s1").cast("double") / F.col("k") / 1000000).alias("m"),
        (
            (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("k"))
            / (F.col("k") - 1)
            / 1000000.0
            / 1000000.0
        ).alias("v"),
    ).select("m", "v", (F.col("m") * (1 - F.col("m")) / F.col("v") - 1).alias("s"))
    return (
        per_brand.join(F.broadcast(prior))
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n_lines"),
            "raw_u6",
            F.floor(
                (F.col("r") + F.col("s") * F.col("m"))
                / (F.col("n") + F.col("s"))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("smoothed_u6"),
        )
        .orderBy("p_brand")
    )


@query(
    "events_window_funnel_strict",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    starts AS (SELECT user_id, ts AS t0 FROM seq WHERE event_type = 'view'),
    s2 AS (
      SELECT st.user_id, st.t0, MIN(e.ts) AS t1
      FROM starts st JOIN seq e
        ON e.user_id = st.user_id AND e.event_type = 'click'
       AND e.ts > st.t0 AND e.ts <= st.t0 + INTERVAL 6 HOUR
      GROUP BY 1, 2
    ),
    s3 AS (
      SELECT s2.user_id, s2.t0, MIN(e.ts) AS t2
      FROM s2 JOIN seq e
        ON e.user_id = s2.user_id AND e.event_type = 'purchase'
       AND e.ts > s2.t1 AND e.ts <= s2.t0 + INTERVAL 6 HOUR
      GROUP BY 1, 2
    ),
    per_user AS (
      SELECT u.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2m.user_id IS NOT NULL THEN 2
                  WHEN stm.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS max_stage
      FROM (SELECT DISTINCT user_id FROM seq) u
      LEFT JOIN (SELECT DISTINCT user_id FROM starts) stm USING (user_id)
      LEFT JOIN (SELECT DISTINCT user_id FROM s2) s2m USING (user_id)
      LEFT JOIN (SELECT DISTINCT user_id FROM s3) s3 USING (user_id)
    )
    SELECT max_stage, COUNT(*) AS n_users
    FROM per_user GROUP BY 1 ORDER BY 1
    """,
    section="2.5",
    doc="Strict-ORDER window funnel (the ClickHouse windowFunnel "
    "semantics, vs events_funnel_stages' any-order stage counts): a "
    "user reaches stage k only via view -> first later click -> first "
    "later purchase, ALL within 6 hours of the anchoring view — "
    "ordering constraints between stages, a shared deadline from the "
    "anchor, and first-match semantics at each hop. Plan: each hop is "
    "a user-keyed equi-join with a time-band residual + MIN-collapse "
    "(the join_asof family's shape, chained); every shuffle is on "
    "user_id so the chain reuses one partitioning. Per-user max stage "
    "then a 4-row rollup.",
)
def events_window_funnel_strict(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "ts", "event_type")
    starts = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("t0")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    s2 = (
        starts.join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") > F.col("t0"))
            & (F.col("cts") <= F.col("t0") + F.expr("INTERVAL 6 HOUR")),
        )
        .groupBy("user_id", "t0")
        .agg(F.min("cts").alias("t1"))
    )
    s3 = (
        s2.join(
            buys,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") > F.col("t1"))
            & (F.col("pts") <= F.col("t0") + F.expr("INTERVAL 6 HOUR")),
        )
        .groupBy("user_id", "t0")
        .agg(F.min("pts").alias("t2"))
    )
    users = ev.select("user_id").distinct()
    stage = (
        users.join(starts.select("user_id").distinct().withColumn("m1", F.lit(1)), "user_id", "left")
        .join(s2.select("user_id").distinct().withColumn("m2", F.lit(1)), "user_id", "left")
        .join(s3.select("user_id").distinct().withColumn("m3", F.lit(1)), "user_id", "left")
        .select(
            F.when(F.col("m3").isNotNull(), 3)
            .when(F.col("m2").isNotNull(), 2)
            .when(F.col("m1").isNotNull(), 1)
            .otherwise(0)
            .alias("max_stage")
        )
    )
    return stage.groupBy("max_stage").agg(F.count(F.lit(1)).alias("n_users")).orderBy("max_stage")


@query(
    "ts_threshold_aligned_curves",
    oracle="""
    WITH daily AS (
      SELECT c.c_nationkey AS nation, CAST(o.o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT nation, d,
             CAST(SUM(day_cents) OVER (PARTITION BY nation ORDER BY d) AS BIGINT)
               AS cum_cents
      FROM daily
    ),
    day0 AS (
      SELECT nation, MIN(d) AS d0 FROM cum
      WHERE cum_cents >= 100000000 GROUP BY nation
    )
    SELECT c.nation, CAST(c.d - z.d0 AS BIGINT) AS days_since, c.cum_cents
    FROM cum c JOIN day0 z ON c.nation = z.nation
    WHERE c.d >= z.d0 AND c.d <= z.d0 + 14
    ORDER BY c.nation, days_since
    """,
    section="2.5",
    doc="Threshold-aligned growth curves — the COVID-dashboard idiom the "
    "reference's lake existed to serve ('days since the 100th case'): "
    "each nation's cumulative revenue series is re-indexed to day 0 = "
    "the first day its cumulative total crossed 1M dollars, and the "
    "first 15 aligned days are emitted so differently-timed series "
    "become comparable. One group-keyed daily rollup, one running-sum "
    "window on the same key (no extra shuffle), the day-0 anchor as a "
    "per-key MIN-over-threshold joined back, and a bounded date-band "
    "cut. Exact integer cents and integer day offsets end-to-end.",
)
def ts_threshold_aligned_curves(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("day_cents"))
    )
    w = Window.partitionBy("nation").orderBy("d")
    cum = daily.select(
        "nation", "d", F.sum("day_cents").over(w).alias("cum_cents")
    )
    day0 = (
        cum.filter(F.col("cum_cents") >= 100000000)
        .groupBy("nation")
        .agg(F.min("d").alias("d0"))
    )
    return (
        cum.join(day0, "nation")
        .filter((F.col("d") >= F.col("d0")) & (F.col("d") <= F.date_add(F.col("d0"), 14)))
        .select(
            "nation",
            F.datediff(F.col("d"), F.col("d0")).cast("long").alias("days_since"),
            "cum_cents",
        )
        .orderBy("nation", "days_since")
    )


@query(
    "ts_sliding_growth_factor",
    oracle="""
    WITH daily AS (
      SELECT c.c_nationkey AS nation, CAST(o.o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
        AND o.o_orderdate < TIMESTAMP '2000-04-01'
      GROUP BY 1, 2
    ),
    win AS (
      SELECT nation, d,
             CAST(SUM(day_cents) OVER (PARTITION BY nation ORDER BY d
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cur7,
             CAST(SUM(day_cents) OVER (PARTITION BY nation ORDER BY d
                   RANGE BETWEEN INTERVAL 13 DAY PRECEDING
                             AND INTERVAL 7 DAY PRECEDING)
               AS BIGINT) AS prev7
      FROM daily
    )
    SELECT nation, d, cur7, prev7,
           CAST(cur7 * 1000000 // prev7 AS BIGINT) AS growth_ppm
    FROM win
    WHERE prev7 IS NOT NULL AND prev7 > 0 AND d >= DATE '2000-01-14'
    ORDER BY nation, d
    """,
    section="2.5",
    doc="Sliding growth factor (the simplified R_t estimator of epidemic "
    "dashboards — current 7-day total over the PRECEDING 7-day total, "
    "the reference's core consulta domain): two RANGE-interval window "
    "sums over one nation-keyed time ordering — the distinctive plan "
    "feature is the OFFSET frame (13-to-7 days preceding), the frame "
    "type calendar analytics needs for week-over-week on IRREGULAR "
    "daily series where ROWS frames miscount gaps. Ratio as exact "
    "integer ppm; one shuffle serves both frames.",
)
def ts_sliding_growth_factor(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("day_cents"))
    )
    daily.createOrReplaceTempView("growth_daily")
    return spark.sql(
        """
        SELECT nation, d, cur7, prev7,
               cur7 * 1000000 DIV prev7 AS growth_ppm
        FROM (
          SELECT nation, d,
                 SUM(day_cents) OVER (PARTITION BY nation ORDER BY d
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                   AS cur7,
                 SUM(day_cents) OVER (PARTITION BY nation ORDER BY d
                     RANGE BETWEEN INTERVAL 13 DAY PRECEDING
                               AND INTERVAL 7 DAY PRECEDING)
                   AS prev7
          FROM growth_daily
        )
        WHERE prev7 IS NOT NULL AND prev7 > 0 AND d >= DATE '2000-01-14'
        ORDER BY nation, d
        """
    )


@query(
    "ts_excess_over_baseline",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM orders GROUP BY 1, 2
    ),
    baseline AS (
      SELECT dow,
             CAST(SUM(day_cents) AS BIGINT) AS s, COUNT(*) AS k
      FROM daily WHERE d >= DATE '1996-01-01' AND d < DATE '1999-01-01'
      GROUP BY dow
    )
    SELECT d.d, d.dow, d.day_cents,
           CAST(b.s // b.k AS BIGINT) AS baseline_cents,
           CAST((d.day_cents - b.s // b.k) * 1000000
                // (b.s // b.k) AS BIGINT) AS excess_ppm
    FROM daily d JOIN baseline b ON d.dow = b.dow
    WHERE d.d >= DATE '2000-01-01' AND d.d < DATE '2000-02-01'
    ORDER BY d.d
    """,
    section="2.5",
    doc="Excess-over-baseline (the 'excess mortality' estimator pattern "
    "from the reference's epidemiology domain): each analysis-period "
    "day is compared against its SAME-WEEKDAY baseline mean from a "
    "3-year reference window — weekday matching removes the weekly "
    "seasonality that a flat baseline would alias into the excess "
    "signal (agg_weekday_seasonality measures that cycle; this "
    "controls for it). Baseline means as exact integer floor-division "
    "(sum DIV count, both engines identical); excess in signed ppm. "
    "One 7-row baseline agg broadcast into the daily series.",
)
def ts_excess_over_baseline(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        T(spark, sf, "orders")
        .groupBy(
            F.col("o_orderdate").cast("date").alias("d"),
            # DuckDB dayofweek is 0=Sunday..6; Spark is 1..7 — align here
            (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("dow"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("day_cents"))
    )
    baseline = (
        daily.filter(
            (F.col("d") >= F.lit("1996-01-01").cast("date"))
            & (F.col("d") < F.lit("1999-01-01").cast("date"))
        )
        .groupBy("dow")
        .agg(F.sum("day_cents").alias("s"), F.count(F.lit(1)).alias("k"))
    )
    return (
        daily.filter(
            (F.col("d") >= F.lit("2000-01-01").cast("date"))
            & (F.col("d") < F.lit("2000-02-01").cast("date"))
        )
        .join(F.broadcast(baseline), "dow")
        .select(
            "d",
            "dow",
            "day_cents",
            F.expr("s DIV k").alias("baseline_cents"),
            F.expr("(day_cents - s DIV k) * 1000000 DIV (s DIV k)").alias(
                "excess_ppm"
            ),
        )
        .orderBy("d")
    )


@query(
    "agg_hierarchy_shares",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS nat_cents
      FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    reg AS (
      SELECT region, CAST(SUM(nat_cents) AS BIGINT) AS reg_cents
      FROM nat GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(reg_cents) AS BIGINT) AS all_cents FROM reg)
    SELECT nat.region, nat.nation, nat.nat_cents,
           CAST(nat.nat_cents * 1000000 // reg.reg_cents AS BIGINT)
             AS share_of_region_ppm,
           CAST(reg.reg_cents * 1000000 // tot.all_cents AS BIGINT)
             AS region_share_ppm
    FROM nat JOIN reg USING (region), tot
    ORDER BY nat.region, nat.nation
    """,
    section="2.4",
    doc="Two-level HIERARCHY SHARES (the IBGE municipality->region "
    "roll-up consulta shape, dags/create-data-lake.py:97's flattened "
    "hierarchy put to its intended use): each nation's share of its "
    "region and each region's share of the whole, in one result — the "
    "drill-down ratio set a choropleth dashboard reads. Three "
    "cascading aggs where each level is O(levels-above) smaller, so "
    "the region and grand-total sides broadcast back into the leaf "
    "level; exact integer ppm at both levels.",
)
def agg_hierarchy_shares(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("region"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("nat_cents"))
    )
    reg = nat.groupBy("region").agg(F.sum("nat_cents").alias("reg_cents"))
    tot = reg.agg(F.sum("reg_cents").alias("all_cents"))
    return (
        nat.join(F.broadcast(reg), "region")
        .join(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "nat_cents",
            F.expr("nat_cents * 1000000 DIV reg_cents").alias("share_of_region_ppm"),
            F.expr("reg_cents * 1000000 DIV all_cents").alias("region_share_ppm"),
        )
        .orderBy("region", "nation")
    )


@query(
    "ts_cumulative_crossover",
    oracle="""
    WITH b AS (
      SELECT CAST(o.o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY 1
    ),
    m AS (
      SELECT CAST(o.o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'MACHINERY'
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY 1
    ),
    aligned AS (
      SELECT COALESCE(b.d, m.d) AS d, b.v AS bv, m.v AS mv
      FROM b FULL OUTER JOIN m ON b.d = m.d
    ),
    cum AS (
      SELECT d,
             CAST(SUM(COALESCE(bv, 0)) OVER (ORDER BY d) AS BIGINT) AS cum_b,
             CAST(SUM(COALESCE(mv, 0)) OVER (ORDER BY d) AS BIGINT) AS cum_m
      FROM aligned
    )
    SELECT d, cum_b, cum_m, building_leads FROM (
      SELECT d, cum_b, cum_m, cum_b > cum_m AS building_leads,
             LAG(cum_b > cum_m) OVER (ORDER BY d) AS prev
      FROM cum
    )
    WHERE building_leads <> COALESCE(prev, building_leads)
    ORDER BY d
    """,
    section="2.5",
    doc="Cumulative-series CROSSOVER detection (the TPC-DS Q51 shape): "
    "two segments' daily revenue series are FULL-OUTER aligned on the "
    "calendar (each side keeps days the other lacks), both cumulative "
    "sums run over the aligned spine with absent days contributing 0, "
    "and the output is exactly the days where the LEAD CHANGES HANDS "
    "(lag of the comparison flips). The distinctive plan features: a "
    "full outer join feeding windows, and a window over a window "
    "(the lag reads the running sums). Exact integer cents; the "
    "single-spine ordering is the semantic under test — per-segment "
    "PARTITIONed variants are the scale path, as in win_ytd_running.",
)
def ts_cumulative_crossover(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    c = T(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)

    def daily(seg):
        return (
            joined.filter(F.col("c_mktsegment") == seg)
            .groupBy(F.col("o_orderdate").cast("date").alias("d"))
            .agg(F.sum(cents("o_totalprice")).alias("v"))
        )

    b = daily("BUILDING").select(F.col("d").alias("bd"), F.col("v").alias("bv"))
    m = daily("MACHINERY").select(F.col("d").alias("md"), F.col("v").alias("mv"))
    aligned = b.join(m, b.bd == m.md, "full_outer").select(
        F.coalesce("bd", "md").alias("d"), "bv", "mv"
    )
    w = Window.orderBy("d")
    cum = aligned.select(
        "d",
        F.sum(F.coalesce("bv", F.lit(0))).over(w).alias("cum_b"),
        F.sum(F.coalesce("mv", F.lit(0))).over(w).alias("cum_m"),
    )
    lead = (F.col("cum_b") > F.col("cum_m")).alias("building_leads")
    flagged = cum.select("d", "cum_b", "cum_m", lead).withColumn(
        "prev", F.lag("building_leads").over(w)
    )
    return (
        flagged.filter(
            F.col("building_leads") != F.coalesce(F.col("prev"), F.col("building_leads"))
        )
        .select("d", "cum_b", "cum_m", "building_leads")
        .orderBy("d")
    )


@query(
    "agg_rollup_topk_per_level",
    oracle="""
    WITH r AS (
      SELECT COALESCE(c.c_mktsegment, 'ALL') AS segment,
             COALESCE(o.o_orderpriority, 'ALL') AS priority,
             GROUPING(c.c_mktsegment) * 2 + GROUPING(o.o_orderpriority)
               AS lvl,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY ROLLUP (c.c_mktsegment, o.o_orderpriority)
    )
    SELECT lvl, segment, priority, total_cents, CAST(rk AS INT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lvl
                                   ORDER BY total_cents DESC, segment, priority)
                  AS rk
      FROM r
    ) WHERE rk <= 3
    ORDER BY lvl, rk
    """,
    section="2.4",
    doc="Top-k WITHIN EACH ROLLUP LEVEL (the TPC-DS Q67 shape): one "
    "ROLLUP produces cells, segment subtotals and the grand total; a "
    "window PARTITIONED BY GROUPING LEVEL then ranks within each — "
    "'top 3 segment+priority cells, top 3 segments, and the total' in "
    "ONE pass over the fact, where the naive report runs one query "
    "per level. The grouping-bit vector doubles as the window "
    "partition key, which is the trick: subtotal rows never compete "
    "with leaf cells. Expand + hash agg + one window on the tiny "
    "rollup output.",
)
def agg_rollup_topk_per_level(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    o.join(F.broadcast(c), o.o_custkey == c.c_custkey).createOrReplaceTempView(
        "rtk_base"
    )
    return spark.sql(
        """
        WITH r AS (
          SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
                 COALESCE(o_orderpriority, 'ALL') AS priority,
                 GROUPING(c_mktsegment) * 2 + GROUPING(o_orderpriority) AS lvl,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents
          FROM rtk_base
          GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
        )
        SELECT lvl, segment, priority, total_cents, CAST(rk AS INT) AS rk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY lvl
                                       ORDER BY total_cents DESC, segment, priority)
                      AS rk
          FROM r
        ) WHERE rk <= 3
        ORDER BY lvl, rk
        """
    )
