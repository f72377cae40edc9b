"""Scalar function surface (SURVEY.md §2.8).

One query per function family, each over a dim-scale table so the check
stays cheap. All expressions are JVM-side built-ins (whole-stage codegen;
no UDFs). Transcendentals are rounded to 6 decimals — both engines agree
to ~1 ulp, and 6 decimals puts the rounding boundary ~9 orders of
magnitude away from that error.

REF anchors: timestamp generation (dags/create-data-lake.py:70,100),
blank-string numeric coercion (:74-79), JSON field access (:95-97 —
rebuilt engine-side as from_json/get_json_object over events.props).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from etl_covid19_brasil_spark.registry import T, query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           trim(concat('  ', p_type, ' ')) AS type_trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           substring(p_name, 1, 8) AS name_prefix,
           concat_ws('/', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           levenshtein(p_brand, 'Brand#11') AS brand_dist,
           reverse(p_brand) AS brand_rev,
           replace(p_type, ' ', '_') AS type_snake
    FROM part
    """,
    section="2.8",
    doc="String batch: upper/lower/trim/lpad/substring/concat_ws/length/"
    "levenshtein/reverse/replace.",
)
def fn_string(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.levenshtein("p_brand", F.lit("Brand#11")).cast("long").alias("brand_dist"),
        F.reverse("p_brand").alias("brand_rev"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           (p_name LIKE '%al%') AS has_al,
           regexp_matches(p_name, '^[a-z]') AS starts_lower
    FROM part
    """,
    section="2.8",
    doc="Regex batch. DuckDB regexp_replace needs the 'g' flag for "
    "replace-all (Spark's default); regexp_matches == rlike.",
)
def fn_regex(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").like("%al%").alias("has_al"),
        F.col("p_name").rlike("^[a-z]").alias("starts_lower"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofmonth(o_orderdate) AS order_day,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           o_orderdate + INTERVAL 90 DAY AS plus_90d
    FROM orders
    """,
    section="2.8",
    doc="Date/time batch: year/month/day extraction, truncation, datediff, "
    "date arithmetic, epoch seconds (UTC session timezone matches the "
    "oracle's naive timestamps).",
)
def fn_datetime(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), d).cast("long").alias("days_to_2002"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.unix_timestamp(d).alias("epoch_s"),
        (d + F.expr("INTERVAL 90 DAY")).alias("plus_90d"),
    )


@query(
    "fn_datetime_week",
    oracle="""
    SELECT event_id,
           CAST(weekofyear(ts) AS BIGINT) AS iso_week,
           CAST(dayofweek(ts) AS BIGINT) + 1 AS dow_sun1,
           CAST(hour(ts) AS BIGINT) AS event_hour,
           CAST(minute(ts) AS BIGINT) AS event_minute,
           date_trunc('day', ts) AS event_date
    FROM events
    """,
    section="2.8",
    doc="ISO week (== reference epidemiological_week shape, FIXTURES.md A1) "
    "and day-of-week: Spark dayofweek is 1=Sunday, DuckDB is 0=Sunday — "
    "oracle shifts by +1.",
)
def fn_datetime_week(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.weekofyear("ts").cast("long").alias("iso_week"),
        F.dayofweek("ts").cast("long").alias("dow_sun1"),
        F.hour("ts").cast("long").alias("event_hour"),
        F.minute("ts").cast("long").alias("event_minute"),
        F.date_trunc("day", F.col("ts")).alias("event_date"),
    )


@query(
    "fn_math",
    oracle="""
    WITH c AS (
      SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer
    )
    SELECT c_custkey,
           CAST(CASE WHEN cents < 0 THEN -1 ELSE 1 END
                * CAST(floor((abs(cents) + 5) / 10) AS BIGINT) AS DOUBLE)
             / 10.0 AS bal_r1,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           abs(c_acctbal - 5000) AS bal_centered,
           CAST(floor(sqrt(abs(c_acctbal)) * 1000000 + 0.5) AS BIGINT)
             AS bal_sqrt_u6,
           CAST(floor(ln(abs(c_acctbal) + 1) * 1000000 + 0.5) AS BIGINT)
             AS bal_ln_u6,
           CAST(floor(exp(c_acctbal / 10000) * 1000000 + 0.5) AS BIGINT)
             AS bal_exp_u6,
           CAST(sign(c_acctbal - 5000) AS DOUBLE) AS bal_sign,
           greatest(c_acctbal, 5000.0) AS bal_hi,
           least(c_acctbal, 5000.0) AS bal_lo,
           c_acctbal * c_acctbal AS bal_sq
    FROM c
    """,
    section="2.8",
    doc="Math batch, version-proof edition. bal_r1 (round-to-1-decimal on "
    "2-decimal money) is derived entirely in integer cents — half-up in "
    "integer arithmetic — because engine round(double, 1) semantics differ "
    "(Spark rounds the decimal rendering HALF_UP, binary-rounding engines "
    "round the nearest double) and .x5 money values land exactly on the "
    "disagreement (went driver-red in r02). Transcendentals are quantized "
    "to integer micro-units with the *same literal formula* "
    "floor(x*1e6 + 0.5) on both sides instead of round(x, 6), so the "
    "quantizer itself cannot diverge; sqrt is IEEE-correctly-rounded and "
    "ln/exp agree to ~1 ulp, which a micro-unit grid absorbs except on "
    "measure-zero boundaries. x*x / abs / sign / greatest are single "
    "identical IEEE ops on identical inputs.",
)
def fn_math(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    b = F.col("c_acctbal")
    cents = F.round(b * 100).cast("long")
    r1_deci = (
        F.when(cents < 0, -1).otherwise(1)
        * F.floor((F.abs(cents) + 5) / 10).cast("long")
    )

    def u6(col: Column) -> Column:
        return F.floor(col * 1000000 + 0.5).cast("long")

    return c.select(
        "c_custkey",
        (r1_deci.cast("double") / 10.0).alias("bal_r1"),
        F.floor(b).alias("bal_floor"),
        F.ceil(b).alias("bal_ceil"),
        F.abs(b - 5000).alias("bal_centered"),
        u6(F.sqrt(F.abs(b))).alias("bal_sqrt_u6"),
        u6(F.log(F.abs(b) + 1)).alias("bal_ln_u6"),
        u6(F.exp(b / 10000)).alias("bal_exp_u6"),
        F.signum(b - 5000).alias("bal_sign"),
        F.greatest(b, F.lit(5000.0)).alias("bal_hi"),
        F.least(b, F.lit(5000.0)).alias("bal_lo"),
        (b * b).alias("bal_sq"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
           IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'floor') AS priority_or_floor
    FROM orders
    """,
    section="2.8",
    doc="Conditional/null batch: when/otherwise, coalesce, nullif, nvl "
    "(ifnull), isnull — the null algebra behind the reference's sentinel "
    "cleaning (dags/create-data-lake.py:74-79).",
)
def fn_conditional(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p > 300000, "big").when(p > 100000, "medium").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias("status_resolved"),
        F.isnull(F.nullif("o_orderstatus", F.lit("O"))).alias("is_open"),
        F.nvl(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("floor")).alias("priority_or_floor"),
    )


@query(
    "fn_array",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           len(tokens) AS n_tokens,
           array_to_string(list_sort(list_distinct(tokens)), ' ') AS vocab,
           len(list_distinct(tokens)) AS n_distinct,
           list_contains(tokens, 'spark') AS has_spark,
           array_to_string(list_slice(tokens, 1, 5), ' ') AS first5,
           tokens[1] AS first_token
    FROM toks
    """,
    section="2.8",
    doc="Array batch over tokenized documents: split/size/array_distinct/"
    "array_sort/array_contains/slice/element_at (1-based in both engines).",
)
def fn_array(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias("vocab"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),
        F.element_at(toks, 1).alias("first_token"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           array_to_string(list_transform(list_slice(tokens, 1, 8), x -> upper(x)), ',') AS first8_upper,
           len(list_filter(tokens, x -> length(x) > 4)) AS n_long_tokens,
           CAST(list_sum(list_transform(tokens, x -> length(x))) AS BIGINT) AS total_chars
    FROM toks
    """,
    section="2.8",
    doc="Higher-order array functions: transform (map), filter, aggregate "
    "(fold) — all on integer/string lambdas so results are exact.",
)
def fn_array_higher_order(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(F.transform(F.slice(toks, 1, 8), lambda x: F.upper(x)), ",").alias(
            "first8_upper"
        ),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("total_chars"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}), ',') AS meta_keys,
           array_to_string(map_values(MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}), ',') AS meta_values,
           (MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)}['type'])[1] AS type_via_map
    FROM events
    """,
    section="2.8",
    doc="Map batch: create_map / map_keys / map_values / element access, "
    "surfaced as joined strings for engine-neutral hashing.",
)
def fn_map(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("meta_keys"),
        F.array_join(F.map_values(m), ",").alias("meta_values"),
        F.element_at(m, "type").alias("type_via_map"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    """,
    section="2.8",
    doc="JSON batch over events.props — the engine-internal rebuild of the "
    "reference's json.loads + json_normalize path "
    "(dags/create-data-lake.py:95-97): get_json_object string access and "
    "from_json typed struct access.",
)
def fn_json(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_num"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    )


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
             / length(text) AS vowel_ratio
    FROM documents WHERE length(text) > 0
    """,
    section="2.11",
    doc="Arrow-vectorized scalar pandas_udf (SURVEY.md §2.11 tier 2 — the "
    "engine's slow-path contract when built-ins can't express the logic): "
    "per-batch pandas string kernel, exact-integer counts so the single "
    "double division is bit-identical to the oracle. Row-at-a-time Python "
    "UDFs are banned from the hot path by design.",
)
def udf_pandas_vectorized(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def vowel_ratio(text: pd.Series) -> pd.Series:
        return text.str.count("[aeiou]").astype("float64") / text.str.len()

    d = T(spark, sf, "documents")
    return d.filter(F.length("text") > 0).select(
        "doc_id", vowel_ratio("text").alias("vowel_ratio")
    )


@query(
    "fn_hash",
    oracle="""
    SELECT o_orderkey,
           md5(o_orderpriority) AS md5_hex,
           sha256(o_orderpriority) AS sha256_hex,
           length(md5(o_orderpriority)) AS md5_len
    FROM orders
    """,
    section="2.8",
    doc="Cryptographic digest functions (md5 / sha2-256) — content "
    "fingerprints for exact dedup keys and change detection; hex output "
    "is engine-independent.",
)
def fn_hash(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.md5("o_orderpriority").alias("md5_hex"),
        F.sha2("o_orderpriority", 256).alias("sha256_hex"),
        F.length(F.md5("o_orderpriority")).alias("md5_len"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 15 AS ored,
           xor(o_orderkey, 85) AS xored,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r
    FROM orders
    """,
    section="2.8",
    doc="Bitwise ops (&, |, xor, shifts) — the primitives under hash "
    "bucketing, bloom probes, and the SimHash band rotation "
    "(llm/simhash.py).",
)
def fn_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(15)).alias("ored"),
        k.bitwiseXOR(F.lit(85)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
    )


@query(
    "fn_string_extra",
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform(string_split(p_name, ' '),
                            w -> upper(w[1]) || lower(w[2:])), ' ') AS name_title,
           split_part(p_type, ' ', 2) AS type_mid,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
           starts_with(p_brand, 'Brand#1') AS is_brand1,
           translate(p_brand, '#', '_') AS brand_safe,
           repeat(p_brand, 2) AS brand_twice,
           round_even(CAST(p_size AS DOUBLE) + 0.5, 0) AS size_banker
    FROM part
    """,
    section="2.8",
    doc="Second string batch: initcap (DuckDB lacks it — the oracle rebuilds "
    "it word-wise), split_part, instr/strpos, startswith, translate, repeat, "
    "and banker's rounding (bround == round_even) probed on size+0.5 — an "
    "exact binary tie, so HALF_EVEN semantics are observable; arbitrary "
    "doubles would diverge because Spark rounds the shortest-decimal "
    "rendering while DuckDB rounds the binary value.",
)
def fn_string_extra(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_title"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.col("p_brand").startswith("Brand#1").alias("is_brand1"),
        F.translate("p_brand", "#", "_").alias("brand_safe"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.bround(F.col("p_size").cast("double") + 0.5, 0).alias("size_banker"),
    )


@query(
    "fn_datetime_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus_2mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CASE WHEN day(o_orderdate) = 1
                THEN CAST((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS DOUBLE)
                ELSE round((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
                           + (1 - day(o_orderdate)) / 31.0, 6) END AS months_to_2002,
           o_orderdate + to_days(2) + to_hours(3) + to_minutes(4) + to_seconds(5) AS shifted,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso_str
    FROM orders
    """,
    section="2.8",
    doc="Interval arithmetic batch: add_months (month-clamped in both "
    "engines: Jan 31 + 1 month == Feb 29), last_day, months_between (no "
    "DuckDB builtin — the oracle restates Spark's 31-day-month formula, "
    "integer when the days-of-month match; both sides rounded to 6), "
    "make_interval composition, and the from_unixtime(unix_timestamp()) "
    "epoch roundtrip (UTC session).",
)
def fn_datetime_interval(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 2).cast("timestamp").alias("plus_2mo"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.round(F.months_between(F.lit("2002-01-01").cast("timestamp"), d), 6).alias(
            "months_to_2002"
        ),
        (d + F.expr("make_interval(0, 0, 0, 2, 3, 4, 5)")).alias("shifted"),
        F.from_unixtime(F.unix_timestamp(d)).alias("iso_str"),
    )


@query(
    "fn_array_explode",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_slice(string_split(text, ' '), 1, 6) AS f6 FROM documents
    )
    SELECT doc_id,
           CAST(split_part(pe, '@', 1) AS BIGINT) AS pos,
           split_part(pe, '@', 2) AS tok,
           array_to_string(list_transform(f6, x -> x || ':' || CAST(length(x) AS VARCHAR)), ',') AS tok_len_zip,
           array_to_string(list_sort(list_distinct(list_concat(f6, ['key','table','zzz']))), ',') AS with_refs,
           array_to_string(list_sort(list_distinct(list_filter(f6, x -> NOT list_contains(['key','table'], x)))), ',') AS minus_refs
    FROM (SELECT doc_id, f6,
                 unnest(list_transform(f6, (x, i) -> CAST(i - 1 AS VARCHAR) || '@' || x)) AS pe
          FROM toks)
    """,
    section="2.8",
    doc="Generator + set-algebra array batch: posexplode (0-based position; "
    "the oracle unnests an index-tagged list), arrays_zip surfaced through "
    "a struct-field projection, array_union / array_except against a "
    "constant list. Union/except outputs are sorted because DuckDB's "
    "list_distinct does not preserve first-occurrence order.",
)
def fn_array_explode(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    f6 = F.slice(F.split(F.col("text"), " "), 1, 6)
    zipped = F.arrays_zip(f6, F.transform(f6, lambda x: F.length(x)))
    refs = F.array(F.lit("key"), F.lit("table"), F.lit("zzz"))
    return d.select(
        "doc_id",
        F.posexplode(f6).alias("pos", "tok"),
        F.array_join(
            F.transform(
                zipped,
                lambda s: F.concat(s.getField("0"), F.lit(":"), s.getField("1").cast("string")),
            ),
            ",",
        ).alias("tok_len_zip"),
        F.array_join(F.array_sort(F.array_union(f6, refs)), ",").alias("with_refs"),
        F.array_join(
            F.array_sort(F.array_except(f6, F.slice(refs, 1, 2))), ","
        ).alias("minus_refs"),
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "fn_map_entries",
    oracle="""
    WITH ent AS (
      SELECT doc_id,
             map_from_entries(
               list_transform(list_slice(string_split(text, ' '), 1, 4),
                              (t, i) -> {'k': CAST(i - 1 AS VARCHAR) || ':' || t,
                                         'v': CAST(length(t) AS BIGINT)})) AS m
      FROM documents
    )
    SELECT doc_id,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           CAST(cardinality(m) AS BIGINT) AS n_entries,
           (m['0:' || split_part((SELECT text FROM documents d2 WHERE d2.doc_id = ent.doc_id), ' ', 1)])[1] AS first_len
    FROM ent
    """,
    section="2.8",
    doc="map_from_entries over an index-keyed entry array (position prefix "
    "makes keys unique — Spark's default mapKeyDedupPolicy=EXCEPTION throws "
    "on duplicate keys), map_keys (sorted: map iteration order is "
    "engine-specific), map cardinality, and element_at lookup.",
)
def fn_map_entries(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    f4 = F.slice(F.split(F.col("text"), " "), 1, 4)
    entries = F.transform(
        f4,
        lambda t, i: F.struct(
            F.concat(i.cast("string"), F.lit(":"), t).alias("k"),
            F.length(t).cast("long").alias("v"),
        ),
    )
    m = F.map_from_entries(entries)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).cast("long").alias("n_entries"),
        F.element_at(m, F.concat(F.lit("0:"), F.split_part(F.col("text"), F.lit(" "), F.lit(1)))).alias(
            "first_len"
        ),
    )


@query(
    "fn_json_tuple",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str2,
           to_json({'k': CAST(json_extract(props, '$.k') AS BIGINT)}) AS canon
    FROM events
    """,
    section="2.8",
    doc="json_tuple multi-field extraction (generator form of "
    "get_json_object) and the from_json -> to_json canonicalization "
    "roundtrip; schema_of_json is asserted in tests/test_plans.py (its "
    "DDL-string output is engine-specific, so it has no oracle twin).",
)
def fn_json_tuple(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.json_tuple(F.col("props"), "k").alias("k_str2"),
        F.to_json(F.from_json("props", "k BIGINT")).alias("canon"),
    )


@query(
    "fn_explode_outer",
    oracle="""
    WITH src AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(n_name), ' +') END AS toks
      FROM nation
    ),
    padded AS (
      SELECT n_nationkey,
             CASE WHEN len(toks) = 0 THEN [NULL]::VARCHAR[] ELSE toks END AS toks
      FROM src
    )
    SELECT n_nationkey, u.tok
    FROM padded, unnest(toks) AS u(tok)
    """,
    section="2.8",
    doc="explode_outer: generator that PRESERVES rows whose array is empty "
    "(emitting a null element) — the left-outer twin of explode, needed "
    "whenever fan-out must not silently drop parents (every 3rd nation "
    "gets an empty token array here). DuckDB has no outer unnest, so the "
    "oracle pads empty lists with [NULL] before unnesting — the exact "
    "semantics explode_outer implements natively.",
)
def fn_explode_outer(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation").select(
        "n_nationkey",
        F.when(
            F.col("n_nationkey") % 3 == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split(F.trim("n_name"), " +"))
        .alias("toks"),
    )
    return n.select("n_nationkey", F.explode_outer("toks").alias("tok"))


@query(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT c_custkey,
             'https://seg-' || lower(replace(c_mktsegment, ' ', '')) ||
             '.example.com/c/' || c_custkey || '/orders?nation=' ||
             c_nationkey || '&page=2' AS url
      FROM customer
    )
    SELECT c_custkey,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]nation=([^&#]*)', 1) AS nation_param,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol
    FROM urls
    """,
    section="2.8",
    doc="URL dissection batch — parse_url(HOST/PATH/QUERY/QUERY:key/"
    "PROTOCOL) over synthesized per-customer URLs, the provenance-"
    "filtering primitive of web-corpus curation (domain allowlists, "
    "path-based boilerplate rules). DuckDB has no parse_url, so the "
    "oracle re-derives each part with the equivalent RFC-3986-ish "
    "regexes. Pure per-row projection: zero shuffle at any scale.",
)
def fn_url(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    url = F.concat(
        F.lit("https://seg-"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit(""))),
        F.lit(".example.com/c/"),
        F.col("c_custkey").cast("string"),
        F.lit("/orders?nation="),
        F.col("c_nationkey").cast("string"),
        F.lit("&page=2"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("nation")).alias("nation_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_inline_structs",
    oracle="""
    WITH src AS (
      SELECT s_suppkey,
             list_transform(string_split_regex(trim(s_name), ' +'),
                            (t, i) -> {'pos': i, 'token': t, 'n_chars': len(t)}) AS parts
      FROM supplier
    )
    SELECT s_suppkey, u.pos, u.token, u.n_chars
    FROM src, unnest(parts) AS t(u)
    """,
    section="2.8",
    doc="inline(): generator that explodes an array<struct> into one row "
    "per element with the struct fields as top-level columns — the "
    "struct-typed twin of explode, and the natural unnesting for "
    "parsed-log / nested-JSON arrays (SURVEY.md §1.1's nested-document "
    "model). Built per-row from tokenized supplier names (pos, token, "
    "n_chars); map-side Generate, no shuffle.",
)
def fn_inline_structs(spark: SparkSession, sf: str) -> DataFrame:
    s = T(spark, sf, "supplier")
    toks = F.split(F.trim("s_name"), " +")
    parts = F.transform(
        toks,
        lambda t, i: F.struct(
            (i + 1).alias("pos"), t.alias("token"), F.length(t).cast("long").alias("n_chars")
        ),
    )
    return s.select("s_suppkey", F.inline(parts))


@query(
    "udtf_sentence_split",
    oracle="""
    WITH pieces AS (
      SELECT doc_id,
             list_transform(string_split(text, '.'), (p, i) -> {'idx': i, 'p': trim(p)}) AS ps
      FROM documents
    )
    SELECT doc_id, u.idx AS sent_idx, u.p AS sentence, len(u.p) AS n_chars
    FROM pieces, unnest(ps) AS t(u)
    WHERE len(u.p) > 0
    """,
    section="2.11",
    doc="Python UDTF (SURVEY.md §2.11 tier 4): one-to-many sentence "
    "splitting — eval() yields one row per non-empty '.'-separated "
    "piece, joined laterally to the source row. Row-at-a-time Python is "
    "the engine's LAST-resort tier (the same split is expressible as "
    "explode, which is how the oracle states it); the query exists to "
    "pin the UDTF contract — registration, LATERAL join, deterministic "
    "output — for the operators that genuinely need imperative fan-out.",
)
def udtf_sentence_split(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars long")
    class SentenceSplit:
        def eval(self, text):  # noqa: ANN001
            if text is None:
                return
            for i, piece in enumerate(str(text).split("."), start=1):
                p = piece.strip()
                if p:
                    yield i, p, len(p)

    spark.udtf.register("sentence_split", SentenceSplit)
    T(spark, sf, "documents").createOrReplaceTempView("udtf_docs_src")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM udtf_docs_src d, LATERAL sentence_split(d.text) s
        """
    )


@query(
    "udaf_grouped_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)))
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    section="2.11",
    doc="Aggregator-style pandas UDAF (SURVEY.md §2.11 item 5): a "
    "GROUPED_AGG pandas_udf (Series -> scalar over Arrow batches) "
    "computing the quantity-weighted mean price in exact integer cents, "
    "so the two final double ops are bit-identical to the oracle. Scale "
    "note, stated honestly: a pandas grouped-agg UDAF shuffles raw group "
    "rows with NO map-side partial aggregation — at 100 TB the built-in "
    "sum/count composition is strictly better; this exists as the "
    "engine's worked contract for aggregation logic that built-ins "
    "genuinely cannot express.",
)
def udaf_grouped_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg_cents(price: pd.Series, qty: pd.Series) -> float:
        # Exact int64 arithmetic; both sums are order-insensitive, and the
        # one cast-to-double stays under 2^53 so it is exact too.
        pc = np.rint(price.to_numpy() * 100.0).astype(np.int64)
        qc = np.rint(qty.to_numpy() * 100.0).astype(np.int64)
        return float(int((pc * qc).sum())) / (100.0 * float(int(qc.sum())))

    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg_cents("l_extendedprice", "l_quantity").alias("wavg_price")
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 2) END AS safe_div,
           CASE WHEN o_orderkey = 0 THEN 9223372036854775807 ELSE NULL END AS overflow_add,
           [o_orderkey, o_custkey][5] AS oob_element
    FROM orders
    """,
    section="2.8",
    doc="try_* error-safe arithmetic (Spark 4 runs ANSI by default, where "
    "bare arithmetic THROWS on /0, overflow, and bad index — at 100 TB a "
    "single poisoned row must not kill a 6-hour job): try_divide -> NULL "
    "on zero denominator, try_add -> NULL on bigint overflow, "
    "try_element_at -> NULL out of bounds. The oracle spells each as the "
    "equivalent guarded CASE (DuckDB list indexing is NULL-on-OOB "
    "natively). Even order keys give a 0 denominator, exercising the "
    "division guard on half the corpus.",
)
def fn_try_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 2).alias("safe_div"),
        F.try_add(F.lit(9223372036854775807), F.col("o_orderkey")).alias("overflow_add"),
        F.try_element_at(F.array("o_orderkey", "o_custkey"), F.lit(5)).alias("oob_element"),
    )


@query(
    "fn_map_higher_order",
    oracle="""
    WITH m AS (
      SELECT event_id,
             [struct_pack(k := 'base', v := value),
              struct_pack(k := 'doubled', v := value * 2),
              struct_pack(k := 'neg', v := -value)] AS entries
      FROM events
    )
    SELECT event_id,
           array_to_string(
             list_transform(
               list_filter(entries, e -> e.v > 0),
               e -> e.k || '=' || CAST(CAST(ROUND(e.v * 100) AS BIGINT) AS VARCHAR)),
             ',') AS positive_entries,
           array_to_string(
             list_transform(entries,
               e -> e.k || '=' || CAST(CAST(ROUND(e.v * 200) AS BIGINT) AS VARCHAR)),
             ',') AS doubled_values
    FROM m
    """,
    section="2.8",
    doc="Higher-order MAP functions: map_filter and transform_values over a "
    "constructed map (base/doubled/neg of events.value). Maps are "
    "unordered, so outputs are canonicalized through map_entries -> "
    "'k=v' joined strings in construction order, values in exact cents; "
    "the oracle replays the same lambdas on the entries list (DuckDB "
    "lambdas on list<struct>).",
)
def fn_map_higher_order(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    m = F.create_map(
        F.lit("base"), F.col("value"),
        F.lit("doubled"), F.col("value") * 2,
        F.lit("neg"), -F.col("value"),
    )
    def fmt(mp):  # canonical "k=<cents>" join, entry order = construction order
        return F.array_join(
            F.transform(
                F.map_entries(mp),
                lambda kv: F.concat_ws(
                    "=", kv["key"], F.round(kv["value"] * 100).cast("long").cast("string")
                ),
            ),
            ",",
        )
    return e.select(
        "event_id",
        fmt(F.map_filter(m, lambda k, v: v > 0)).alias("positive_entries"),
        fmt(F.transform_values(m, lambda k, v: v * 2)).alias("doubled_values"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.k') AS INTEGER) % 7 AS k_bucket,
           (json_extract(props, '$.absent') IS NULL) AS missing_path
    FROM events
    """,
    section="2.8",
    doc="VARIANT semi-structured handling (Spark 4's native open-schema "
    "type): parse_json once into a variant, then typed try_variant_get "
    "path extraction — the shredded-JSON pattern that replaces "
    "per-query string re-parsing at 100 TB (parse once, extract many; "
    "the variant's binary encoding skips the text scan per path). "
    "Missing paths yield NULL, not errors. The oracle replays the "
    "same paths with DuckDB json_extract.",
)
def fn_variant_json(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    v = F.parse_json("props")
    src = e.select("event_id", v.alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    return src.select(
        "event_id",
        k.alias("k"),
        (k % 7).alias("k_bucket"),
        F.try_variant_get("v", "$.absent", "int").isNull().alias("missing_path"),
    )


@query(
    "udtf_polymorphic_split",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
    )
    SELECT doc_id, w[1] AS tok_0, w[2] AS tok_1, w[3] AS tok_2, w[4] AS tok_3
    FROM toks
    """,
    section="2.11",
    doc="POLYMORPHIC Python UDTF (Spark 4 analyze() API): the output "
    "schema — here tok_0..tok_{n-1} — is computed at plan time from the "
    "literal width argument by a static analyze() method, so one "
    "registration serves any requested width with full Catalyst schema "
    "knowledge (column pruning and downstream resolution see real "
    "columns, not a generic map). eval() pads short rows with NULLs. "
    "The oracle replays width=4 with list extracts (DuckDB lists "
    "NULL-pad out-of-range indexes natively).",
)
def udtf_polymorphic_split(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitToCols:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"tok_{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):  # noqa: ANN001
            toks = [] if text is None else str(text).strip().split()
            yield tuple(toks[i] if i < len(toks) else None for i in range(int(n)))

    spark.udtf.register("split_to_cols", udtf(SplitToCols))
    T(spark, sf, "documents").createOrReplaceTempView("udtf_poly_src")
    return spark.sql(
        """
        SELECT d.doc_id, s.*
        FROM udtf_poly_src d, LATERAL split_to_cols(d.text, 4) s
        """
    )


@query(
    "fn_xml_roundtrip",
    oracle="""
    SELECT n_nationkey,
           n_nationkey AS parsed_key,
           n_name AS parsed_name,
           n_regionkey AS parsed_region
    FROM nation
    """,
    section="2.8",
    doc="XML handling (Spark 4 native from_xml): each nation row is "
    "serialized to an XML fragment with concat, then parsed back through "
    "from_xml with an explicit struct schema and re-projected. DuckDB "
    "has no XML parser, so the oracle states the fixpoint directly: a "
    "correct serialize->parse roundtrip returns the original columns. "
    "Any parser regression (entity handling, whitespace, numeric "
    "coercion) breaks the hash.",
)
def fn_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation")
    xml = F.concat(
        F.lit("<rec><key>"), F.col("n_nationkey"),
        F.lit("</key><name>"), F.col("n_name"),
        F.lit("</name><region>"), F.col("n_regionkey"),
        F.lit("</region></rec>"),
    )
    parsed = n.select(
        "n_nationkey",
        F.from_xml(xml, "key BIGINT, name STRING, region BIGINT").alias("s"),
    )
    return parsed.select(
        "n_nationkey",
        F.col("s.key").alias("parsed_key"),
        F.col("s.name").alias("parsed_name"),
        F.col("s.region").alias("parsed_region"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT n_nationkey,
           n_name AS decrypted,
           TRUE AS ciphertext_differs
    FROM nation
    """,
    section="2.8",
    doc="Column-level encryption (aes_encrypt/aes_decrypt, GCM): the "
    "at-rest PII protection pattern — encrypt on write, decrypt for "
    "entitled readers. GCM ciphertexts are salted (random IV), so the "
    "checkable contract is the fixpoint: decrypt(encrypt(x)) == x and "
    "the ciphertext never equals the plaintext. Deterministic-needing "
    "pipelines (joins on encrypted values) would pin the IV via the "
    "ECB/CBC modes or hash instead.",
)
def fn_aes_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation")
    key = F.lit("0123456789abcdef")  # 16-byte demo key
    enc = F.aes_encrypt(F.col("n_name").cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary")).cast("string")
    return n.select(
        "n_nationkey",
        dec.alias("decrypted"),
        (F.base64(enc) != F.col("n_name")).alias("ciphertext_differs"),
    )


@query(
    "fn_try_cast_batch",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_partkey END AS maybe_int,
           TRY_CAST(p_brand AS BIGINT) AS brand_as_int,
           CASE WHEN p_partkey % 4 = 0
                THEN TIMESTAMP '2024-03-01 12:00:00' ELSE NULL END AS parsed_ts
    FROM part
    """,
    section="2.8",
    doc="Error-safe CASTS — the ingestion half of the try_* family "
    "(fn_try_arithmetic covers math): try_cast on a poisoned int column "
    "(every third key swapped for a non-numeric token), try_cast on a "
    "never-numeric brand string (always NULL, never a throw — under "
    "ANSI a plain CAST here kills the job), and try_to_timestamp on a "
    "mixed good/garbage timestamp column. The oracle states the "
    "expected outcomes with guards.",
)
def fn_try_cast_batch(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    k = F.col("p_partkey")
    dirty_int = F.when(k % 3 == 0, F.lit("oops")).otherwise(k.cast("string"))
    dirty_ts = F.when(k % 4 == 0, F.lit("2024-03-01 12:00:00")).otherwise(
        F.lit("not a time")
    )
    return p.select(
        "p_partkey",
        dirty_int.try_cast("bigint").alias("maybe_int"),
        F.col("p_brand").try_cast("bigint").alias("brand_as_int"),
        F.try_to_timestamp(dirty_ts).alias("parsed_ts"),
    )


@query(
    "fn_from_csv",
    oracle="""
    WITH src AS (
      SELECT n_nationkey,
             CAST(n_nationkey AS VARCHAR) || ',' || n_name || ',' ||
               CAST(n_regionkey AS VARCHAR) AS line
      FROM nation
    )
    SELECT n_nationkey,
           CAST(string_split(line, ',')[1] AS BIGINT) AS csv_key,
           string_split(line, ',')[2] AS csv_name,
           CAST(string_split(line, ',')[3] AS BIGINT) AS csv_region
    FROM src
    """,
    section="2.8",
    doc="from_csv scalar parsing: a CSV-encoded string column (the shape "
    "Kafka values and log lines arrive in) parsed to a typed struct with "
    "an explicit schema — the per-row twin of the scan_csv source. "
    "DuckDB replays it with string_split + casts.",
)
def fn_from_csv(spark: SparkSession, sf: str) -> DataFrame:
    n = T(spark, sf, "nation")
    line = F.concat_ws(
        ",",
        F.col("n_nationkey").cast("string"),
        F.col("n_name"),
        F.col("n_regionkey").cast("string"),
    )
    parsed = F.from_csv(line, "csv_key BIGINT, csv_name STRING, csv_region BIGINT")
    return n.select(
        "n_nationkey",
        parsed["csv_key"].alias("csv_key"),
        parsed["csv_name"].alias("csv_name"),
        parsed["csv_region"].alias("csv_region"),
    )


@query(
    "fn_datetime_calendar",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) / 30.4375 * 10000 + 0.5) AS BIGINT) AS approx_months_since_95_u4,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus_3mo,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_trunc('quarter', o_orderdate) AS quarter_start,
           CAST(quarter(o_orderdate) AS BIGINT) AS q
    FROM orders
    """,
    section="2.8",
    doc="Calendar arithmetic batch #4: month offsets (add_months), "
    "month-end snapping (last_day), quarter truncation and extraction. "
    "months_between's fractional convention differs between engines "
    "(Spark's 31-day rule vs interval months), so the oracle-checkable "
    "months measure is day-diff / mean-month-length quantized to "
    "integer 1e-4 units with the identical floor(x*1e4 + 0.5) formula "
    "on both sides (round(x, 4) semantics are engine-version-"
    "dependent); exact month arithmetic is covered by the "
    "add_months/last_day round values.",
)
def fn_datetime_calendar(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    d = F.col("o_orderdate")
    days = F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
    return o.select(
        "o_orderkey",
        F.floor(days.cast("double") / 30.4375 * 10000 + 0.5)
        .cast("long")
        .alias("approx_months_since_95_u4"),
        F.add_months(d.cast("date"), 3).alias("plus_3mo"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_trunc("quarter", d).alias("quarter_start"),
        F.quarter(d).cast("long").alias("q"),
    )


@query(
    "fn_string_surgery",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 2) AS second_word,
           array_to_string(string_split(p_name, ' ')[1:2], ' ') AS first_two_words,
           translate(p_brand, '#', '-') AS brand_dashed,
           CAST(position('a' IN p_name) AS BIGINT) AS first_a_pos,
           repeat(p_brand, 2) AS brand_doubled,
           substr(p_type, 1, 3) || 'XX' || substr(p_type, 6) AS type_patched
    FROM part
    """,
    section="2.8",
    doc="String surgery batch #3: split_part (field extraction), "
    "substring_index (prefix up to the Nth delimiter — DuckDB emulates "
    "via list slice+join), translate (char mapping), position/instr, "
    "repeat, and overlay (in-place patch — emulated as substr concat; "
    "Spark's overlay REPLACES len chars at pos).",
)
def fn_string_surgery(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.substring_index(F.col("p_name"), " ", 2).alias("first_two_words"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dashed"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a_pos"),
        F.repeat(F.col("p_brand"), 2).alias("brand_doubled"),
        F.overlay(F.col("p_type"), F.lit("XX"), F.lit(4), F.lit(2)).alias(
            "type_patched"
        ),
    )


@query(
    "fn_math_trig",
    oracle="""
    SELECT c_custkey,
           CAST(floor(sin(c_acctbal / 1000) * 1000000 + 0.5) AS BIGINT) AS sin_u6,
           CAST(floor(cos(c_acctbal / 1000) * 1000000 + 0.5) AS BIGINT) AS cos_u6,
           CAST(floor(atan2(c_acctbal, 5000.0) * 1000000 + 0.5) AS BIGINT) AS angle_u6,
           CAST(floor(degrees(atan2(c_acctbal, 5000.0)) * 1000000 + 0.5) AS BIGINT) AS angle_deg_u6,
           CAST(floor(tan(c_acctbal / 10000) * 1000000 + 0.5) AS BIGINT) AS tan_u6,
           CAST(floor(radians(c_acctbal / 100) * 1000000 + 0.5) AS BIGINT) AS rad_u6
    FROM customer
    """,
    section="2.8",
    doc="Trigonometry batch: sin/cos/atan2/degrees/tan/radians — the "
    "periodic-feature encodings (hour-of-day embeddings) feature "
    "pipelines apply (tanh is absent from this DuckDB build, so "
    "tan/radians stand in). House transcendental policy (fn_math): "
    "engines agree to ~1 ulp, quantized to integer micro-units with the "
    "identical floor(x*1e6 + 0.5) formula on both sides — round(x, 6) "
    "semantics are engine-version-dependent, the literal formula is not.",
)
def fn_math_trig(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    b = F.col("c_acctbal")
    angle = F.atan2(b, F.lit(5000.0))

    def u6(col: Column) -> Column:
        return F.floor(col * 1000000 + 0.5).cast("long")

    return c.select(
        "c_custkey",
        u6(F.sin(b / 1000)).alias("sin_u6"),
        u6(F.cos(b / 1000)).alias("cos_u6"),
        u6(angle).alias("angle_u6"),
        u6(F.degrees(angle)).alias("angle_deg_u6"),
        u6(F.tan(b / 10000)).alias("tan_u6"),
        u6(F.radians(b / 100)).alias("rad_u6"),
    )


_O_MASK = (
    "regexp_replace(regexp_replace(regexp_replace({c}, "
    "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')"
)


@query(
    "fn_mask_redact",
    oracle=f"""
    SELECT c_custkey,
           {_O_MASK.format(c='c_name')} AS name_masked,
           {_O_MASK.format(c='c_mktsegment')} AS segment_masked,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_hash_digits,
           substr(c_name, 1, 9) ||
             {_O_MASK.format(c='substr(c_name, 10)')} AS name_keep_prefix
    FROM customer
    """,
    section="2.8",
    doc="Data-masking batch — the column-level redaction a lake applies "
    "before exporting PII-adjacent tables: Spark's mask() (upper->X, "
    "lower->x, digit->n, punctuation kept — structure stays legible for "
    "debugging while content is destroyed), a digit-only variant with a "
    "custom replacement char, and a keep-prefix pattern (the entity "
    "prefix survives, the identifying suffix is masked). The oracle "
    "rebuilds mask() as three chained regexp_replace calls — a pure "
    "per-character map, so both engines agree byte-for-byte. "
    "Complements text_scrub_pii (regex entity scrubbing INSIDE free "
    "text) with whole-column redaction.",
)
def fn_mask_redact(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("name_masked"),
        F.mask(F.col("c_mktsegment")).alias("segment_masked"),
        F.mask(
            F.col("c_name"),
            upperChar=F.lit(None),
            lowerChar=F.lit(None),
            digitChar=F.lit("#"),
        ).alias("name_hash_digits"),
        F.concat(
            F.substring(F.col("c_name"), 1, 9),
            F.mask(F.expr("substring(c_name, 10)")),
        ).alias("name_keep_prefix"),
    )


# Haversine great-circle distance in integer meters. ONE expression
# string evaluated by both engines (identical function names and
# left-associative IEEE tree in Spark SQL and DuckDB): transcendentals
# agree to ~1 ulp (the fn_math policy) and the +0.5-floor quantization
# boundary sits whole meters away from any ulp-scale divergence.
def _haversine_m(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    s_lat = f"sin((radians({lat2}) - radians({lat1})) / 2.0)"
    s_lon = f"sin((radians({lon2}) - radians({lon1})) / 2.0)"
    h = (
        f"{s_lat} * {s_lat} + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * {s_lon} * {s_lon}"
    )
    return f"CAST(floor(2.0 * 6371000.0 * asin(sqrt({h})) + 0.5) AS BIGINT)"


# Synthetic geocoding: deterministic lat/lon from an integer key,
# confined to |lat| <= 49.5 deg (fixed-degree grid cells keep a usable
# minimum longitudinal width) and |lon| <= 169.75 deg (no points within
# grid-radius of the antimeridian seam, which a rectangular cell grid
# cannot see across but haversine wraps through) — the correctness
# envelope join_spatial_grid's +-1-cell neighborhood relies on.
def _geo_lat(key: str) -> str:
    return f"CAST({key} % 100 AS DOUBLE) - 50.0 + 0.5"


def _geo_lon(key: str) -> str:
    return f"CAST(({key} * 7) % 340 AS DOUBLE) - 170.0 + 0.25"


@query(
    "fn_geo_haversine",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             {_geo_lat('c_custkey')} AS lat,
             {_geo_lon('c_custkey')} AS lon
      FROM customer
    )
    SELECT c_custkey, lat, lon,
           {_haversine_m('lat', 'lon', '-23.55', '-46.63')} AS dist_sao_paulo_m
    FROM pts
    """,
    section="2.8",
    doc="Great-circle (haversine) distance — the geo scalar a spatial "
    "enrichment pass needs: every synthesized customer point's distance "
    "to a fixed reference (Sao Paulo), in INTEGER METERS. The same "
    "expression string runs in Spark SQL and DuckDB (radians/sin/cos/"
    "asin/sqrt agree to ~1 ulp; meter-floor quantization is 9 orders "
    "of magnitude above that). Pure per-row projection — zero shuffle "
    "at any scale.",
)
def fn_geo_haversine(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        F.expr(_geo_lat("c_custkey")).alias("lat"),
        F.expr(_geo_lon("c_custkey")).alias("lon"),
    )
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr(_haversine_m("lat", "lon", "-23.55", "-46.63")).alias(
            "dist_sao_paulo_m"
        ),
    )


@query(
    "fn_parse_dates_multiformat",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
               WHEN 1 THEN strftime(CAST(o_orderdate AS DATE), '%d/%m/%Y')
               ELSE strftime(CAST(o_orderdate AS DATE), '%Y%m%d')
             END AS raw_date
      FROM orders
    )
    SELECT o_orderkey, raw_date,
           CAST(COALESCE(try_strptime(raw_date, '%Y-%m-%d'),
                         try_strptime(raw_date, '%d/%m/%Y'),
                         try_strptime(raw_date, '%Y%m%d')) AS DATE) AS parsed
    FROM raw
    """,
    section="2.8",
    doc="Multi-format date parsing — the messy-feed staple: dates arrive "
    "in three wire formats (ISO, day-first slashed, compact) and a "
    "COALESCE of per-format try-parses recovers every row without a "
    "job-killing cast (try_to_date chain on Spark, try_strptime chain "
    "on the oracle — Java and strptime pattern LANGUAGES differ, so "
    "each engine states its own patterns for the same three formats; "
    "the FORMATS, not the pattern strings, are the shared contract). "
    "Ambiguity note baked into the design: format order matters — "
    "'%d/%m/%Y' never collides with ISO because the separators "
    "differ, and the compact form only parses when the others "
    "failed. Pure per-row projection, zero shuffle.",
)
def fn_parse_dates_multiformat(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date")
    raw = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format(d, "dd/MM/yyyy"))
        .otherwise(F.date_format(d, "yyyyMMdd"))
        .alias("raw_date"),
    )
    return raw.select(
        "o_orderkey",
        "raw_date",
        F.coalesce(
            F.expr("try_to_date(raw_date, 'yyyy-MM-dd')"),
            F.expr("try_to_date(raw_date, 'dd/MM/yyyy')"),
            F.expr("try_to_date(raw_date, 'yyyyMMdd')"),
        ).alias("parsed"),
    )


@query(
    "fn_timezone_convert",
    oracle="""
    WITH e AS (
      SELECT event_id, ts + (event_id % 365) * INTERVAL 1 DAY AS ts2
      FROM events
    )
    SELECT event_id,
           strftime(ts2, '%Y-%m-%d %H:%M') AS utc_wall,
           strftime((ts2 AT TIME ZONE 'UTC') AT TIME ZONE 'America/Sao_Paulo',
                    '%Y-%m-%d %H:%M') AS sao_paulo_wall,
           strftime((ts2 AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York',
                    '%Y-%m-%d %H:%M') AS new_york_wall,
           strftime((ts2 AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata',
                    '%Y-%m-%d %H:%M') AS kolkata_wall,
           CAST((ts2 AT TIME ZONE 'UTC') AT TIME ZONE 'America/Sao_Paulo' AS DATE)
             <> CAST(ts2 AS DATE) AS day_shifted
    FROM e
    """,
    section="2.8",
    doc="IANA timezone conversion batch — the localization pass the "
    "reference's Brasilia-time COVID feed implies (its timestamps are "
    "wall-clock Brazilian dates; any cross-feed join must normalize "
    "instants first). Event instants are spread across a full year "
    "(+event_id%365 days) so the check crosses real DST transitions: "
    "America/New_York shifts in Mar/Nov 2024, America/Sao_Paulo is "
    "fixed -03:00 post-2019 abolition, Asia/Kolkata exercises the "
    "half-hour offset. Both engines resolve the SAME IANA zone ids "
    "(JVM tzdata vs DuckDB ICU) and results are compared as formatted "
    "wall-clock strings — a one-minute divergence in any rule would "
    "hash-fail. day_shifted flags rows whose local calendar date "
    "differs from UTC (the silent killer in daily-partitioned lakes). "
    "Pure per-row expressions: no shuffle, fully codegen'd.",
)
def fn_timezone_convert(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select(
        "event_id",
        F.expr("timestampadd(DAY, CAST(event_id % 365 AS INT), ts)").alias("ts2"),
    )
    def wall(tz: str) -> F.Column:
        return F.date_format(F.from_utc_timestamp(F.col("ts2"), tz), "yyyy-MM-dd HH:mm")
    return e.select(
        "event_id",
        F.date_format("ts2", "yyyy-MM-dd HH:mm").alias("utc_wall"),
        wall("America/Sao_Paulo").alias("sao_paulo_wall"),
        wall("America/New_York").alias("new_york_wall"),
        wall("Asia/Kolkata").alias("kolkata_wall"),
        (
            F.to_date(F.from_utc_timestamp(F.col("ts2"), "America/Sao_Paulo"))
            != F.to_date("ts2")
        ).alias("day_shifted"),
    )


@query(
    "fn_ipv4_cidr",
    oracle="""
    WITH ips AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 4294967296 AS ip
      FROM orders
    )
    SELECT o_orderkey,
           CAST(ip // 16777216 AS VARCHAR) || '.' ||
           CAST((ip // 65536) % 256 AS VARCHAR) || '.' ||
           CAST((ip // 256) % 256 AS VARCHAR) || '.' ||
           CAST(ip % 256 AS VARCHAR) AS dotted,
           ip // 16777216 = 10 AS in_10_slash8,
           CAST(ip - (ip % 65536) AS BIGINT) AS net_slash16,
           CAST(ip % 65536 AS BIGINT) AS host_slash16
    FROM ips
    """,
    section="2.8",
    doc="IPv4/CIDR scalar batch over synthesized addresses (md5-slot of "
    "the key, the cross-engine hash idiom): dotted-quad formatting by "
    "integer div/mod (each octet is an exact integer — no string "
    "library dependency), 10.0.0.0/8 membership as a first-octet "
    "compare, and /16 network/host split as subtraction and modulus — "
    "the log-enrichment scalars every clickstream/firewall feed needs "
    "before a subnet join. Pure integer arithmetic end to end, so "
    "both engines agree bit-for-bit; at scale these are zero-shuffle "
    "codegen expressions feeding a broadcast join against a CIDR "
    "block table (join_range_bucketed's shape for longest-prefix "
    "matching).",
)
def fn_ipv4_cidr(spark: SparkSession, sf: str) -> DataFrame:
    ip = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 4294967296
    )
    o = T(spark, sf, "orders").select("o_orderkey", ip.alias("ip"))
    return o.select(
        "o_orderkey",
        F.concat_ws(
            ".",
            (F.col("ip") / 16777216).cast("long").cast("string"),
            ((F.col("ip") / 65536).cast("long") % 256).cast("string"),
            ((F.col("ip") / 256).cast("long") % 256).cast("string"),
            (F.col("ip") % 256).cast("string"),
        ).alias("dotted"),
        ((F.col("ip") / 16777216).cast("long") == 10).alias("in_10_slash8"),
        (F.col("ip") - (F.col("ip") % 65536)).alias("net_slash16"),
        (F.col("ip") % 65536).alias("host_slash16"),
    )


@query(
    "fn_base64_hex",
    oracle="""
    SELECT n_nationkey,
           base64(encode(n_name)) AS b64,
           decode(from_base64(base64(encode(n_name)))) AS b64_roundtrip,
           lower(hex(encode(n_name))) AS hex_lower,
           decode(unhex(hex(encode(n_name)))) AS hex_roundtrip,
           CAST(octet_length(encode(n_name)) AS BIGINT) AS n_bytes
    FROM nation
    """,
    section="2.8",
    doc="Binary wire-codec batch: base64 and hex encode/decode "
    "roundtrips over UTF-8 bytes plus the byte length — the scalars "
    "every payload-bearing pipeline touches (webhook bodies, binary "
    "keys in text transports, parquet BINARY columns surfaced for "
    "debugging; the multimodal tier's payloads ride exactly these on "
    "their way in). Both engines implement RFC 4648 base64 with "
    "padding and case-stable hex (Spark upper-cases hex, so the "
    "shared form is lower()); roundtrips re-decode to the original "
    "string so a single corrupted byte anywhere in the "
    "encode-transport-decode chain flips the hash. Zero shuffle, "
    "all codegen.",
)
def fn_base64_hex(spark: SparkSession, sf: str) -> DataFrame:
    bin_name = F.encode(F.col("n_name"), "UTF-8")
    return T(spark, sf, "nation").select(
        "n_nationkey",
        F.base64(bin_name).alias("b64"),
        F.decode(F.unbase64(F.base64(bin_name)), "UTF-8").alias("b64_roundtrip"),
        F.lower(F.hex(bin_name)).alias("hex_lower"),
        F.decode(F.unhex(F.hex(bin_name)), "UTF-8").alias("hex_roundtrip"),
        F.octet_length(bin_name).cast("long").alias("n_bytes"),
    )


@query(
    "fn_collation_case_insensitive",
    oracle="""
    WITH v AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 2 = 0 THEN upper(s_name)
                  ELSE lower(s_name) END AS variant
      FROM supplier
    )
    SELECT lower(variant) AS name_ci, COUNT(*) AS n
    FROM v GROUP BY 1 ORDER BY 1
    """,
    section="2.8",
    doc="Spark 4 COLLATIONS (SPARK-46830): a deterministically case-"
    "mangled name column (upper for even keys, lower for odd) groups "
    "under UTF8_LCASE collation, merging case variants WITHOUT "
    "rewriting every row through lower() — the engine-level collation "
    "is what makes case-insensitive joins/groups sargable and "
    "pushdown-safe at 100 TB, vs the expression-wrapping workaround "
    "that blinds statistics. The emitted group key is canonicalized "
    "via lower() so the representative is deterministic (a collated "
    "group's surface form is otherwise first-seen). Oracle groups by "
    "lower() — same partition of the value space.",
)
def fn_collation_case_insensitive(spark: SparkSession, sf: str) -> DataFrame:
    v = T(spark, sf, "supplier").select(
        F.when(F.col("s_suppkey") % 2 == 0, F.upper("s_name"))
        .otherwise(F.lower("s_name"))
        .alias("variant")
    )
    return (
        v.groupBy(F.expr("variant COLLATE UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("k")).alias("name_ci"), "n")
        .orderBy("name_ci")
    )


@query(
    "udf_sql_declarative",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_totalprice > 150000
                         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) * 2
                         ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
             AS BIGINT) AS weighted_cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    section="2.11",
    doc="Declarative SQL UDF (Spark 4, CREATE FUNCTION ... RETURN expr): "
    "the function body is a pure SQL expression, so Catalyst INLINES it "
    "at plan time — it optimizes, pushes down, and codegens exactly "
    "like the hand-written expression (the oracle is that inlined "
    "form), unlike opaque Python UDFs which fence off optimization. "
    "The right tool for shared business logic (here: a big-ticket "
    "double-weighting rule) published to every consulta user of the "
    "lake.",
)
def udf_sql_declarative(spark: SparkSession, sf: str) -> DataFrame:
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION weighted_cents_fn(p DOUBLE)
        RETURNS BIGINT
        RETURN CASE WHEN p > 150000
                    THEN CAST(ROUND(p * 100) AS BIGINT) * 2
                    ELSE CAST(ROUND(p * 100) AS BIGINT) END
        """
    )
    T(spark, sf, "orders").createOrReplaceTempView("sqludf_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               SUM(weighted_cents_fn(o_totalprice)) AS weighted_cents
        FROM sqludf_orders GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "udf_arrow_optimized",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) % 97 AS bucket97,
           length(o_orderpriority) + CAST(o_orderkey % 7 AS INT) AS mix
    FROM orders
    """,
    section="2.11",
    doc="ARROW-OPTIMIZED Python UDF (Spark 4 useArrow=True — SPARK-40307): "
    "the same scalar Python logic as a legacy pickle UDF, but arguments "
    "and results cross the JVM/Python boundary as Arrow batches instead "
    "of per-row pickled tuples (~2-5x on scalar UDFs, without the "
    "pandas_udf rewrite). The remaining cost vs built-ins is the "
    "Python round-trip itself, which is why the registry's hot paths "
    "stay JVM-side — this row exists to cover the escape hatch's "
    "MODERN form; udf_pandas_vectorized covers the pandas form. The "
    "UDF body is pure integer arithmetic so the oracle can replay it "
    "as SQL exactly.",
)
def udf_arrow_optimized(spark: SparkSession, sf: str) -> DataFrame:
    @F.udf("long", useArrow=True)
    def bucket97(cents: int) -> int:
        return cents % 97

    @F.udf("int", useArrow=True)
    def mix(prio: str, key: int) -> int:
        return len(prio) + key % 7

    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        bucket97(F.round(F.col("o_totalprice") * 100).cast("long")).alias("bucket97"),
        mix(F.col("o_orderpriority"), F.col("o_orderkey")).alias("mix"),
    )


@query(
    "fn_accent_fold",
    oracle="""
    WITH named AS (
      SELECT n_nationkey,
             CASE n_nationkey % 5
               WHEN 0 THEN 'São ' || n_name
               WHEN 1 THEN 'Goiânia-' || n_name
               WHEN 2 THEN 'Brasília/' || n_name
               WHEN 3 THEN 'Paraná ' || n_name
               ELSE 'Maceió ' || n_name END AS municipio
      FROM nation
    )
    SELECT n_nationkey, municipio,
           lower(translate(municipio,
                 'áàâãäéèêëíìîïóòôõöúùûüçÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇ',
                 'aaaaaeeeeiiiiooooouuuucAAAAAEEEEIIIIOOOOOUUUUC'))
             AS municipio_ascii
    FROM named ORDER BY n_nationkey
    """,
    section="2.8",
    doc="Accent folding for Brazilian place-name matching — the join-key "
    "normalization the reference's own domain demands (IBGE municipality "
    "names carry the full Portuguese diacritic set; feeds spell them "
    "inconsistently): translate() with an explicit diacritic map plus "
    "lower(), the deterministic ASCII-fold that makes 'São Paulo' and "
    "'SAO PAULO' join. Identical translate maps run in both engines "
    "(no locale-dependent ICU call — explicit maps are WHY this is "
    "portable). Accented names are synthesized onto nation keys since "
    "the test tables ship ASCII-only.",
)
def fn_accent_fold(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("n_nationkey")
    municipio = (
        F.when(k % 5 == 0, F.concat(F.lit("São "), F.col("n_name")))
        .when(k % 5 == 1, F.concat(F.lit("Goiânia-"), F.col("n_name")))
        .when(k % 5 == 2, F.concat(F.lit("Brasília/"), F.col("n_name")))
        .when(k % 5 == 3, F.concat(F.lit("Paraná "), F.col("n_name")))
        .otherwise(F.concat(F.lit("Maceió "), F.col("n_name")))
    )
    return (
        T(spark, sf, "nation")
        .select("n_nationkey", municipio.alias("municipio"))
        .withColumn(
            "municipio_ascii",
            F.lower(
                F.translate(
                    F.col("municipio"),
                    "áàâãäéèêëíìîïóòôõöúùûüçÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇ",
                    "aaaaaeeeeiiiiooooouuuucAAAAAEEEEIIIIOOOOOUUUUC",
                )
            ),
        )
        .orderBy("n_nationkey")
    )


@query(
    "fn_deterministic_uuid",
    oracle="""
    WITH h AS (
      SELECT c_custkey, md5('customer:' || CAST(c_custkey AS VARCHAR)) AS hx
      FROM customer
    )
    SELECT c_custkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5' ||
           substr(hx, 14, 3) || '-8' || substr(hx, 18, 3) || '-' ||
           substr(hx, 21, 12) AS stable_uuid
    FROM h ORDER BY c_custkey
    """,
    section="2.8",
    doc="Deterministic name-based UUIDs (the UUIDv5 idea via md5 "
    "formatting): a stable surrogate identifier derived from a "
    "namespaced natural key — the cross-system entity id a lake mints "
    "so re-runs, backfills and downstream joins all agree, where "
    "uuid()/rand() would mint a different id per run (and is banned "
    "from this registry for exactly that reason). Version and variant "
    "nibbles are pinned to 5 and 8 per RFC 4122 layout; pure "
    "md5+substr string algebra both engines share.",
)
def fn_deterministic_uuid(spark: SparkSession, sf: str) -> DataFrame:
    hx = F.md5(F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")))
    return (
        T(spark, sf, "customer")
        .select("c_custkey", hx.alias("hx"))
        .select(
            "c_custkey",
            F.concat(
                F.substring("hx", 1, 8), F.lit("-"),
                F.substring("hx", 9, 4), F.lit("-5"),
                F.substring("hx", 14, 3), F.lit("-8"),
                F.substring("hx", 18, 3), F.lit("-"),
                F.substring("hx", 21, 12),
            ).alias("stable_uuid"),
        )
        .orderBy("c_custkey")
    )
