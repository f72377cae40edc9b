"""Corpus-quality and sequence-preparation operators (SURVEY.md §2.10
extensions): Gopher-style repetition signals, sliding-window chunking,
greedy sequence packing, and a deterministic mode aggregate.

These are the operators a pretraining-data pipeline runs between raw
ingestion and tokenized shards:

- repetition signals (Rae et al., *Gopher*, 2021 §A1.1) gate documents
  whose content is dominated by duplicated lines or a single n-gram;
- sliding-window chunking turns long documents into fixed-size training
  windows with overlap (the standard causal-LM data prep);
- sequence packing assigns documents to fixed-capacity context bins so
  shard files pack densely (here: deterministic sequential fill, the
  SQL-expressible variant of first-fit);
- mode() with explicit tie-breaks replaces Spark's `F.mode`, whose tie
  resolution is undefined and therefore un-oracle-able.

Design for 100 TB:
- every per-document computation here is a map-side projection (tokenize,
  shingle, slice) feeding ONE aggregation shuffle keyed by doc_id — the
  line/bigram frequency tables never leave their document, unlike
  line_dedup_global's corpus-wide frequency join;
- chunking is a Generate (explode) with no shuffle at all: rows fan out
  inside the scan stage and stream straight into the sink;
- packing needs a per-language prefix sum — one shuffle on lang; at real
  scale the window runs per (lang, shard) salt so no single language
  serializes through one task.

All fractions are ratios of exact int64 counts, divided once as doubles
(one IEEE op — bit-identical between Spark and DuckDB; see
registry.py's determinism policy).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from etl_covid19_brasil_spark.registry import T, query

def _TOKENS() -> F.Column:
    """Tokenization identical to queries/llm.py so the corpus ops compose."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " ")), " +"
    )
_O_TOKENS = (
    "string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')"
)

_LINE_LEN = 5  # tokens per pseudo-line (documents.text has no newlines)


def _lines(w: F.Column) -> F.Column:
    """Split a token array into consecutive 5-token 'lines' (same
    convention as line_dedup_global)."""
    return F.transform(
        F.sequence(F.lit(1), F.ceil(F.size(w) / F.lit(float(_LINE_LEN))).cast("long")),
        lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * _LINE_LEN + 1, _LINE_LEN)),
    )


def _bigrams(w: F.Column) -> F.Column:
    # Guard the degenerate 1-token document: sequence(1, 0) counts DOWN in
    # Spark (default step -1), emitting index 0, which element_at rejects.
    return F.when(F.size(w) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        )
    )


@query(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_TOKENS} AS w FROM documents),
    lines AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, CAST(ceil(len(w) / {_LINE_LEN}.0) AS BIGINT) + 1),
               i -> array_to_string(list_slice(w, (i-1)*{_LINE_LEN} + 1, i*{_LINE_LEN}), ' '))) AS line
      FROM toks
    ),
    line_freq AS (SELECT doc_id, line, COUNT(*) AS n FROM lines GROUP BY doc_id, line),
    line_sig AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_lines,
             CAST(COALESCE(SUM(n) FILTER (WHERE n > 1), 0) AS BIGINT) AS n_dup_lines
      FROM line_freq GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i+1])) AS bg
      FROM toks
    ),
    bg_freq AS (SELECT doc_id, bg, COUNT(*) AS n FROM bigrams GROUP BY doc_id, bg),
    bg_sig AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams, MAX(n) AS top_bigram_n
      FROM bg_freq GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_lines, l.n_dup_lines,
           CAST((l.n_dup_lines * 1000000) // l.n_lines AS BIGINT) AS dup_line_ppm,
           b.n_bigrams, b.top_bigram_n,
           CAST((b.top_bigram_n * 1000000) // b.n_bigrams AS BIGINT) AS top_bigram_ppm
    FROM line_sig l JOIN bg_sig b USING (doc_id)
    """,
    section="2.10",
    doc="Gopher-style repetition signals (Rae et al. 2021 §A1.1): per-doc "
    "duplicate-line fraction (over 5-token pseudo-lines) and most-frequent-"
    "bigram mass fraction — the filters that drop boilerplate-heavy and "
    "degenerate-repetition documents from a pretraining corpus. Fractions "
    "are reported as integer parts-per-million (integer floor-division of "
    "the exact counts, which are also output) — the hashable form that "
    "survives any oracle engine's double promotion rules. All "
    "frequency tables are PER DOCUMENT, so the whole operator is a map-side "
    "projection plus one doc_id-keyed aggregation — no corpus-wide shuffle.",
)
def text_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", _TOKENS().alias("w"))
    lines = d.select("doc_id", F.explode(_lines(F.col("w"))).alias("line"))
    line_sig = (
        lines.groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_lines"),
            F.coalesce(
                F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0)
            ).alias("n_dup_lines"),
        )
    )
    bigrams = d.select("doc_id", F.explode(_bigrams(F.col("w"))).alias("bg"))
    bg_sig = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n_bigrams"), F.max("n").alias("top_bigram_n"))
    )
    return (
        line_sig.join(bg_sig, "doc_id")
        .select(
            "doc_id",
            "n_lines",
            "n_dup_lines",
            F.expr("n_dup_lines * 1000000L div n_lines").alias("dup_line_ppm"),
            "n_bigrams",
            "top_bigram_n",
            F.expr("top_bigram_n * 1000000L div n_bigrams").alias("top_bigram_ppm"),
        )
    )


_CHUNK = 64  # tokens per training window
_STRIDE = 32  # window stride (50% overlap)


@query(
    "doc_chunk_sliding",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_TOKENS} AS w FROM documents),
    spans AS (
      SELECT doc_id, w,
             1 + CAST(floor(greatest(len(w) - {_CHUNK}, 0) / {_STRIDE}.0) AS BIGINT)
               + CASE WHEN greatest(len(w) - {_CHUNK}, 0) % {_STRIDE} = 0 THEN 0 ELSE 1 END
             AS n_chunks
      FROM toks
    )
    SELECT doc_id, k AS chunk_id,
           array_to_string(list_slice(w, k*{_STRIDE} + 1, k*{_STRIDE} + {_CHUNK}), ' ') AS chunk_text,
           least(len(w) - k*{_STRIDE}, {_CHUNK}) AS n_tokens
    FROM spans, unnest(range(0, n_chunks)) AS t(k)
    """,
    section="2.10",
    doc=f"Causal-LM training-window chunking: each document fans out into "
    f"{_CHUNK}-token windows with stride {_STRIDE} (50% overlap), covering "
    f"the tail with one final short window. Pure Generate (explode) inside "
    f"the scan stage — zero shuffle at any scale; rows stream from the "
    f"parquet scan straight to the sink. n_chunks = 1 + ceil(max(n-"
    f"{_CHUNK},0)/{_STRIDE}) computed in exact integer arithmetic.",
)
def doc_chunk_sliding(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", _TOKENS().alias("w"))
    overflow = F.greatest(F.size("w") - F.lit(_CHUNK), F.lit(0))
    n_chunks = (
        F.lit(1)
        + F.floor(overflow / F.lit(float(_STRIDE)))
        + F.when(overflow % _STRIDE == 0, F.lit(0)).otherwise(F.lit(1))
    ).cast("long")
    return (
        d.select("doc_id", "w", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"))
        .select(
            "doc_id",
            F.col("k").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(F.col("w"), F.col("k") * _STRIDE + 1, _CHUNK)
            ).alias("chunk_text"),
            F.least(F.size("w") - F.col("k") * _STRIDE, F.lit(_CHUNK))
            .cast("long")
            .alias("n_tokens"),
        )
    )


_CAPACITY = 256  # tokens per packed context bin


@query(
    "pack_sequences_bins",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len({_O_TOKENS}) AS n_tok FROM documents
    ),
    placed AS (
      SELECT doc_id, lang, n_tok,
             CAST(floor(COALESCE(SUM(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {_CAPACITY}.0)
             AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM placed GROUP BY lang, bin
    """,
    section="2.10",
    doc=f"Sequence packing for shard assembly: per language, stream "
    f"documents in doc_id order into {_CAPACITY}-token context bins — "
    f"bin = floor(exclusive-prefix-sum / capacity), the deterministic "
    f"sequential-fill packing (SQL-expressible cousin of first-fit-"
    f"decreasing). One shuffle on lang for the prefix-sum window; at 100 TB "
    f"the partition key becomes (lang, shard-salt) so no language "
    f"serializes through a single task, at the cost of per-shard rather "
    f"than global bin numbering.",
)
def pack_sequences_bins(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select(
        "doc_id", "lang", F.size(_TOKENS()).cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = d.select(
        "lang",
        "n_tok",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(float(_CAPACITY))
        ).alias("bin"),
    )
    return placed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH freq AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority
      ) AS rk
      FROM freq
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
    FROM ranked WHERE rk = 1
    """,
    section="2.4",
    doc="Deterministic mode(): most frequent o_orderpriority per order "
    "status, ties broken by the smallest value. Spark's F.mode leaves tie "
    "resolution undefined (and so un-oracle-able); this is the classic "
    "count + partitioned row_number rewrite — two aggregations over tiny "
    "group cardinality, the frequency table being |statuses|x|priorities| "
    "rows regardless of input scale.",
)
def agg_mode_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    freq = (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )


@query(
    "zorder_interleave_key",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_partkey & 65535 AS x, l_suppkey & 65535 AS y,
           list_sum(list_transform(range(0, 16), i ->
             (((l_partkey & 65535) >> i) & 1)::BIGINT * (1::BIGINT << (2*i))
             + (((l_suppkey & 65535) >> i) & 1)::BIGINT * (1::BIGINT << (2*i + 1))
           ))::BIGINT AS zkey
    FROM lineitem
    """,
    section="2.1",
    doc="Z-order (Morton) clustering key: bit-interleave of the low 16 "
    "bits of (l_partkey, l_suppkey) — sort-or-range-partition the lake "
    "files by zkey and scans filtering on EITHER dimension prune most "
    "files, which one-dimensional clustering (io.py's "
    "sink_parquet_clustered) cannot give for the second column. Pure "
    "per-row bit math via a higher-order fold over sequence(0,15) — "
    "codegen'd, zero shuffle; the companion write path is "
    "sink_parquet_clustered ordered by this key.",
)
def zorder_interleave_key(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    zkey = F.expr(
        """
        aggregate(
          sequence(0, 15), CAST(0 AS BIGINT),
          (acc, i) -> acc
            + shiftleft(CAST(shiftright(l_partkey & 65535, i) & 1 AS BIGINT), 2*i)
            + shiftleft(CAST(shiftright(l_suppkey & 65535, i) & 1 AS BIGINT), 2*i + 1)
        )
        """
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey").bitwiseAND(65535)).alias("x"),
        (F.col("l_suppkey").bitwiseAND(65535)).alias("y"),
        zkey.alias("zkey"),
    )


# Per-language keep rates (percent) for the stratified sampler: downsample
# the over-represented head language hard, keep the tail nearly whole —
# the standard rebalancing move before pretraining-corpus mixing.
_STRATA_PCT = {"en": 25, "de": 80, "es": 80, "fr": 80, "zh": 80}
_DEFAULT_PCT = 50


@query(
    "sample_stratified_hash",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS slot,
             CASE lang
               {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_STRATA_PCT.items()))}
               ELSE {_DEFAULT_PCT} END AS keep_pct
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM gated WHERE slot < keep_pct GROUP BY lang
    """,
    section="2.10",
    doc="Deterministic stratified sampling: per-language keep rates "
    "applied by content-hash slot (first 8 md5 hex digits mod 100 < "
    "rate) — downsamples the dominant language to rebalance a corpus "
    "mix. Hash-gating instead of rand(seed) because Bernoulli sampling "
    "is not reproducible across engines or partitionings, while the "
    "md5 slot is a pure function of the row. Map-side filter + one "
    "|langs|-row aggregate; composes with sample_hash_split (disjoint "
    "hex digits) and sample_quota_per_lang.",
)
def sample_stratified_hash(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    slot = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 100
    keep = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(_STRATA_PCT.items())
        ],
        F.lit(_DEFAULT_PCT),
    )
    return (
        d.filter(slot < keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# Curation thresholds (Gopher-flavored, tuned to the synthetic corpus so
# both kept and dropped documents exist at every SF).
_MIN_WORDS, _MAX_WORDS = 5, 500
_MAX_DUP_LINE_FRAC = 0.30
_MAX_TOP_BIGRAM_FRAC = 0.20
_MIN_MEAN_WORD_LEN, _MAX_MEAN_WORD_LEN = 2.0, 12.0


@query(
    "curation_filter_gopher",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_O_TOKENS} AS w FROM documents),
    base AS (
      SELECT doc_id, len(w) AS n_words,
             len(array_to_string(w, '')) AS n_letters
      FROM toks
    ),
    lines AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, CAST(ceil(len(w) / {_LINE_LEN}.0) AS BIGINT) + 1),
               i -> array_to_string(list_slice(w, (i-1)*{_LINE_LEN} + 1, i*{_LINE_LEN}), ' '))) AS line
      FROM toks
    ),
    line_freq AS (SELECT doc_id, line, COUNT(*) AS n FROM lines GROUP BY doc_id, line),
    line_sig AS (
      SELECT doc_id,
             CAST(COALESCE(SUM(n) FILTER (WHERE n > 1), 0) AS BIGINT) AS n_dup_lines,
             CAST(SUM(n) AS BIGINT) AS n_lines
      FROM line_freq GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
      FROM toks WHERE len(w) >= 2
    ),
    bg_freq AS (SELECT doc_id, bg, COUNT(*) AS n FROM bigrams GROUP BY doc_id, bg),
    bg_sig AS (
      SELECT doc_id, CAST(MAX(n) AS BIGINT) AS top_bigram_n,
             CAST(SUM(n) AS BIGINT) AS n_bigrams
      FROM bg_freq GROUP BY doc_id
    )
    SELECT b.doc_id,
           CASE
             WHEN b.n_words < {_MIN_WORDS} THEN 'too_short'
             WHEN b.n_words > {_MAX_WORDS} THEN 'too_long'
             WHEN b.n_letters < {int(_MIN_MEAN_WORD_LEN)} * b.n_words
               OR b.n_letters > {int(_MAX_MEAN_WORD_LEN)} * b.n_words THEN 'word_len_outlier'
             WHEN l.n_dup_lines * 10 > l.n_lines * 3 THEN 'repeated_lines'
             WHEN g.top_bigram_n * 5 > g.n_bigrams THEN 'repeated_bigram'
             ELSE 'keep'
           END AS verdict
    FROM base b
    JOIN line_sig l USING (doc_id)
    LEFT JOIN bg_sig g USING (doc_id)
    """,
    section="2.10",
    doc="Composite pretraining curation filter (Gopher-rule shape, Rae et "
    "al. 2021 §A1.1): word-count window, mean-word-length window "
    "(2..12), duplicate-line fraction (> 0.30), and top-bigram mass "
    "(> 0.20), folded into one keep/drop verdict with the FIRST violated "
    "rule as the reason — the operator a corpus pipeline runs to gate "
    "documents before tokenization. Every threshold is evaluated by "
    "EXACT integer cross-multiplication (n_letters < 2*n_words, "
    "10*n_dup > 3*n_lines, 5*top_bigram > n_bigrams, ...) — no double "
    "ratio ever exists, so a document sitting exactly on a threshold "
    "cannot flip between engines (aggregate-derived double ratios went "
    "driver-red in r02 on diag_key_skew). A missing bigram row (1-token "
    "doc) makes the bigram predicate NULL, which falls through to "
    "'keep' in both engines' CASE semantics. Same scale shape as "
    "text_repetition_signals: all frequency tables are per-document, "
    "one doc_id-keyed aggregation shuffle, no corpus-wide exchange; the "
    "rule cascade itself is a pure projection.",
)
def curation_filter_gopher(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", _TOKENS().alias("w"))
    base = d.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.length(F.array_join("w", "")).alias("n_letters"),
    )
    lines = d.select("doc_id", F.explode(_lines(F.col("w"))).alias("line"))
    line_sig = (
        lines.groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0)).alias(
                "n_dup_lines"
            ),
            F.sum("n").alias("n_lines"),
        )
    )
    bigrams = d.filter(F.size("w") >= 2).select(
        "doc_id", F.explode(_bigrams(F.col("w"))).alias("bg")
    )
    bg_sig = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"), F.sum("n").alias("n_bigrams"))
    )
    joined = base.join(line_sig, "doc_id").join(bg_sig, "doc_id", "left")
    verdict = (
        F.when(F.col("n_words") < _MIN_WORDS, "too_short")
        .when(F.col("n_words") > _MAX_WORDS, "too_long")
        .when(
            (F.col("n_letters") < int(_MIN_MEAN_WORD_LEN) * F.col("n_words"))
            | (F.col("n_letters") > int(_MAX_MEAN_WORD_LEN) * F.col("n_words")),
            "word_len_outlier",
        )
        .when(F.col("n_dup_lines") * 10 > F.col("n_lines") * 3, "repeated_lines")
        .when(F.col("top_bigram_n") * 5 > F.col("n_bigrams"), "repeated_bigram")
        .otherwise("keep")
    )
    return joined.select("doc_id", verdict.alias("verdict"))


@query(
    "sample_bernoulli_bounds",
    oracle="""
    SELECT COUNT(*) AS n_total, TRUE AS sample_within_bounds
    FROM lineitem
    """,
    section="2.10",
    doc="Seeded Bernoulli sampling (df.sample(fraction, seed)) — the "
    "cheap corpus down-sampler (per-row coin flip, zero shuffle, exact "
    "fraction NOT guaranteed). Spark's RNG stream is engine-specific, so "
    "the hashable contract is a bounds check (same pattern as the approx "
    "aggregates): the sampled count must land within 6 sigma of the "
    "binomial expectation. For EXACT deterministic splits use "
    "sample_hash_split, which derives membership from the key hash.",
)
def sample_bernoulli_bounds(spark: SparkSession, sf: str) -> DataFrame:
    frac = 0.1
    li = T(spark, sf, "lineitem")
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    sampled = li.sample(fraction=frac, seed=42).agg(F.count(F.lit(1)).alias("k"))
    stats = total.crossJoin(sampled)
    # 6-sigma binomial band: P(outside) ~ 2e-9 — effectively never flaky,
    # still catches a broken sampler (off-by-10x fraction, constant RNG).
    sigma = (F.col("n_total").cast("double") * frac * (1 - frac)) ** 0.5
    ok = F.abs(F.col("k") - F.col("n_total") * frac) <= 6 * sigma
    return stats.select("n_total", ok.alias("sample_within_bounds"))


@query(
    "dq_constraint_audit",
    oracle="""
    SELECT 'null_custkey' AS rule,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_violations,
           COUNT(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'nonpositive_price' AS rule,
           COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_violations,
           COUNT(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'bad_status_domain' AS rule,
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS n_violations,
           COUNT(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'orphan_custkey' AS rule,
           COUNT(*) FILTER (WHERE c_custkey IS NULL) AS n_violations,
           COUNT(*) AS n_checked
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    section="2.10",
    doc="Data-quality constraint audit — the expectations pass a lake "
    "pipeline runs before publishing a table: null checks, range checks, "
    "domain checks as ONE conditional-aggregation scan (not one job per "
    "rule), plus referential integrity as a broadcast left join counting "
    "orphans. Violation counts instead of assert_true so the report "
    "itself is the deterministic, oracle-checkable artifact; a gate "
    "would filter n_violations > 0.",
)
def dq_constraint_audit(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").select("c_custkey")

    def rule(name: str, violated: F.Column, src: DataFrame) -> DataFrame:
        return src.agg(
            F.lit(name).alias("rule"),
            F.count(F.when(violated, 1)).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    scans = rule("null_custkey", F.col("o_custkey").isNull(), o).unionByName(
        rule("nonpositive_price", F.col("o_totalprice") <= 0, o)
    ).unionByName(
        rule("bad_status_domain", ~F.col("o_orderstatus").isin("O", "F", "P"), o)
    )
    # Hint-free referential check: the dim grows with the data, so the
    # broadcast decision belongs to AQE's runtime sizes, not a pinned
    # hint (r7 broadcast audit — the minhash-OOM failure class).
    orphans = rule(
        "orphan_custkey",
        F.col("c_custkey").isNull(),
        o.join(c, F.col("o_custkey") == F.col("c_custkey"), "left"),
    )
    return scans.unionByName(orphans)


@query(
    "pack_sequences_concat",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_O_TOKENS} AS w FROM documents
    ),
    placed AS (
      SELECT doc_id, lang, len(w) AS n_tok, array_to_string(w, ' ') AS norm_text,
             CAST(floor(COALESCE(SUM(len(w)) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
             AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           string_agg(norm_text, ' <|doc|> ' ORDER BY doc_id) AS packed_text
    FROM placed GROUP BY lang, bin
    """,
    section="2.10",
    doc="Shard ASSEMBLY — the step after pack_sequences_bins assigns bins: "
    "concatenate each bin's normalized documents in deterministic "
    "doc_id order with a <|doc|> separator into the packed training "
    "sequence itself. Ordered listagg makes the concatenation "
    "engine-independent; the shuffle story is the same single "
    "lang-keyed exchange reused by the prefix-sum window AND the final "
    "group-concat (one sort order serves both).",
)
def pack_sequences_concat(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.size(_TOKENS()).cast("long").alias("n_tok"),
        F.array_join(_TOKENS(), " ").alias("norm_text"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = d.select(
        "doc_id",
        "lang",
        "n_tok",
        "norm_text",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(512.0)).alias("bin"),
    )
    return placed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.expr(
            "listagg(norm_text, ' <|doc|> ') WITHIN GROUP (ORDER BY doc_id)"
        ).alias("packed_text"),
    )


_SOURCE_CAP = 150  # max documents any one source may contribute


@query(
    "curation_source_caps",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rk
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_SOURCE_CAP} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk > {_SOURCE_CAP} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN rk <= {_SOURCE_CAP} THEN n_chars ELSE 0 END)
             AS BIGINT) AS kept_chars
    FROM ranked
    GROUP BY source
    """,
    section="2.10",
    doc=f"Per-source contribution caps — the C4/RefinedWeb domain-cap "
    f"move: no single source (domain, crawl, dump) may contribute more "
    f"than {_SOURCE_CAP} documents, preventing one boilerplate-heavy "
    f"site from dominating the mixture. Which documents survive is "
    f"decided in content-hash order (md5-ranked — deterministic across "
    f"engines, reruns, and partitionings; 'first N by crawl order' is "
    f"none of those). One window shuffle on source; at 100 TB the rank "
    f"runs per (source, shard-salt) exactly like pack_sequences_bins.",
)
def curation_source_caps(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    # hash before the shuffle: the window sort key carries 32 hex chars,
    # not the document text
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = (
        d.select("source", "n_chars", "doc_id", F.md5("text").alias("h"))
        .withColumn("rk", F.row_number().over(w))
    )
    kept = F.col("rk") <= _SOURCE_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


# source priority for the cross-source canonical pick: lower = preferred
_SOURCE_PRIO_SQL = "CASE source WHEN 'wiki' THEN 0 WHEN 'books' THEN 1 ELSE 2 END"


@query(
    "dedup_cross_source",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, 'mirror', text
      FROM documents WHERE doc_id % 10 = 0
    ),
    hashed AS (
      SELECT doc_id, source, md5(text) AS h FROM corpus
    ),
    groups AS (
      SELECT h, COUNT(*) AS n_copies, COUNT(DISTINCT source) AS n_sources,
             MIN(doc_id) FILTER (WHERE prio = best) AS canonical_doc
      FROM (SELECT *, {_SOURCE_PRIO_SQL} AS prio,
                   MIN({_SOURCE_PRIO_SQL}) OVER (PARTITION BY h) AS best
            FROM hashed)
      GROUP BY h
      HAVING COUNT(DISTINCT source) >= 2
    )
    SELECT n_sources,
           COUNT(*) AS n_groups,
           CAST(SUM(n_copies) AS BIGINT) AS n_copies,
           MIN(canonical_doc) AS first_canonical,
           MAX(canonical_doc) AS last_canonical
    FROM groups
    GROUP BY n_sources
    """,
    section="2.10",
    doc="Provenance-aware exact dedup: find texts that appear in two or "
    "more DIFFERENT sources (the cross-domain duplicates a naive "
    "per-source dedup misses) and pick each group's canonical copy by "
    "declared source priority (wiki > books > rest), tie-broken by "
    "doc_id. The shape is one md5 group shuffle carrying (hash, source, "
    "doc_id) — never the text — plus a window min over the same "
    "partitioning; output is the per-multiplicity summary (group and "
    "copy counts, canonical id range) so the checked result stays "
    "small at any corpus size. The driver corpus has no natural exact "
    "duplicates, so a deterministic 'mirror' source re-contributes every "
    "10th document (the decontaminate_ngram_overlap stand-in trick) — "
    "without it the operator would be verified against an always-empty "
    "result.",
)
def dedup_cross_source(spark: SparkSession, sf: str) -> DataFrame:
    base = T(spark, sf, "documents").select("doc_id", "source", "text")
    mirror = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            F.lit("mirror").alias("source"),
            "text",
        )
    )
    d = base.unionByName(mirror)
    prio = (
        F.when(F.col("source") == "wiki", 0)
        .when(F.col("source") == "books", 1)
        .otherwise(2)
    )
    hashed = d.select("doc_id", "source", F.md5("text").alias("h"), prio.alias("prio"))
    best = Window.partitionBy("h")
    tagged = hashed.withColumn("best", F.min("prio").over(best))
    groups = (
        tagged.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.min(F.when(F.col("prio") == F.col("best"), F.col("doc_id"))).alias(
                "canonical_doc"
            ),
        )
        .filter(F.col("n_sources") >= 2)
    )
    return groups.groupBy("n_sources").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_copies").alias("n_copies"),
        F.min("canonical_doc").alias("first_canonical"),
        F.max("canonical_doc").alias("last_canonical"),
    )


# A-ES (Efraimidis–Spirakis) weighted-reservoir score, quantized to
# integer micro-units for the output/order key. ONE expression string
# for both engines: u in (0,1) derives from the first 8 md5 hex digits
# of the key (the engine-portable hash trick sample_stratified_hash
# pins), the weight is the exact-cents money value, and
# score = ln(u)/w is the log-domain A-ES key (u^(1/w) order-isomorphic).
_WRES_SCORE_U6 = (
    "CAST(floor("
    "ln((CAST(h32 AS DOUBLE) + 0.5) / 4294967296.0)"
    " / (CAST(w_cents AS DOUBLE) / 100.0)"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h32,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_cents
      FROM orders
    ),
    scored AS (SELECT o_orderkey, w_cents, {_WRES_SCORE_U6} AS score_u6 FROM keyed)
    SELECT o_orderkey, w_cents, score_u6
    FROM scored ORDER BY score_u6 DESC, o_orderkey LIMIT 50
    """,
    section="2.10",
    doc="Deterministic WEIGHTED sampling without replacement (A-ES, "
    "Efraimidis–Spirakis 2006): each row draws u from its key's md5 "
    "(reproducible across engines and partitionings, unlike rand()), "
    "keys sort by ln(u)/weight — order-isomorphic to u^(1/w) — and the "
    "top-k IS a weighted sample without replacement. High-value orders "
    "are proportionally favored; the score is quantized to integer "
    "micro-units so the cross-engine order key is integer, with "
    "o_orderkey breaking ties. Scale shape: pure map-side scoring, one "
    "TakeOrderedAndProject — no shuffle beyond the top-k merge; the "
    "standard corpus-curation move for value-weighted subset selection.",
)
def sample_weighted_reservoir(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    keyed = o.select(
        "o_orderkey",
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h32"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("w_cents"),
    )
    return (
        keyed.select("o_orderkey", "w_cents", F.expr(_WRES_SCORE_U6).alias("score_u6"))
        .orderBy(F.desc("score_u6"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "corpus_shard_assign",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(h32 % 16 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h32 % 16 ORDER BY h32 // 16, doc_id)
                AS BIGINT) AS pos
    FROM keyed
    """,
    section="2.10",
    doc="Deterministic training-shard assignment: the corpus -> N-shard "
    "epoch-shuffle step a pretraining pipeline runs before packing. "
    "Shard = content-independent hash slot (md5 of the key — "
    "reproducible across engines/partitionings, unlike rand or "
    "monotonically_increasing_id); within-shard position = rank of the "
    "REMAINING hash bits (doc_id tie-break), so the order inside each "
    "shard is a reshuffle uncorrelated with the shard choice itself. "
    "ONE shuffle on the shard key; each shard orders independently "
    "(window per partition, no global sort); downstream "
    "pack_sequences_* consumes (shard, pos) as its processing order.",
)
def corpus_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    h32 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
    )
    keyed = d.select("doc_id", "n_chars", h32.alias("h32"))
    w = Window.partitionBy(F.col("h32") % 16).orderBy(
        F.expr("h32 div 16"), F.col("doc_id")
    )
    return keyed.select(
        "doc_id",
        "n_chars",
        (F.col("h32") % 16).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


@query(
    "sample_balanced_class",
    oracle="""
    WITH sized AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    floor_n AS (SELECT MIN(n) AS min_n FROM sized),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(text), doc_id) AS rk
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM ranked, floor_n
    WHERE rk <= min_n
    GROUP BY lang
    """,
    section="2.10",
    doc="Class-balanced downsampling: every language keeps exactly "
    "min-class-count documents, chosen by content-hash order "
    "(md5(text), doc_id tie-break) — the deterministic, engine-"
    "portable version of 'shuffle each class and take N', used to "
    "equalize class priors before training a classifier (langid, "
    "quality) on the corpus. Scale shape: one |langs|-row count "
    "aggregate broadcasts the floor, one lang-keyed window ranks each "
    "class (the same single shuffle a per-class sort needs), map-side "
    "filter. Differs from sample_quota_per_lang (fixed byte budget) "
    "and sample_stratified_hash (fixed keep RATES): the target here is "
    "derived from the data — equal class sizes.",
)
def sample_balanced_class(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = T(spark, sf, "documents")
    floor_n = d.groupBy("lang").count().agg(F.min("count").alias("min_n"))
    w = W.partitionBy("lang").orderBy(F.md5("text"), F.col("doc_id"))
    ranked = d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rk"))
    return (
        ranked.crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("min_n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "corpus_upsample_weighted",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 700 WHEN 'de' THEN 1500
                       WHEN 'es' THEN 2300 WHEN 'zh' THEN 1000
                       ELSE 3400 END AS wm,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1000 AS slot
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             wm // 1000 + CASE WHEN slot < wm % 1000 THEN 1 ELSE 0 END AS copies
      FROM d
    )
    SELECT doc_id, lang,
           CAST(unnest(generate_series(1, copies)) AS BIGINT) AS copy_idx
    FROM c WHERE copies >= 1
    """,
    section="2.10",
    doc="Weighted corpus UP/DOWN-sampling with stochastic rounding — the "
    "epoch-multiplier materialization step of a training mix: each "
    "language carries a milli-weight (en 0.7x down, es 2.3x, fr 3.4x "
    "up, ...) and every document is emitted floor(w) times plus one "
    "more iff its content-hash slot falls under frac(w) — so expected "
    "multiplicity equals the weight EXACTLY, per-document, with zero "
    "RNG state (the md5-slot idiom of sample_stratified_hash: "
    "reproducible across engines, runs, and partitionings). "
    "Complements corpus_mix_weighted (which PLANS the mix; this one "
    "EMITS it) and sample_weighted_reservoir (bounded output; this is "
    "the unbounded epoch replication). Map-side explode of a "
    "sequence(1..copies) — no shuffle, no driver loop; at 100 TB the "
    "fan-out is bounded by max weight and each replica carries only "
    "(doc_id, copy_idx), the text joining back lazily downstream.",
)
def corpus_upsample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    wm = F.coalesce(
        F.element_at(
            F.create_map(
                F.lit("en"), F.lit(700),
                F.lit("de"), F.lit(1500),
                F.lit("es"), F.lit(2300),
                F.lit("zh"), F.lit(1000),
            ),
            F.col("lang"),
        ),
        F.lit(3400),
    ).cast("long")
    slot = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 1000
    staged = (
        T(spark, sf, "documents")
        .select("doc_id", "lang", wm.alias("wm"), slot.alias("slot"))
        .withColumn(
            "copies",
            F.expr("wm DIV 1000 + CASE WHEN slot < wm % 1000 THEN 1 ELSE 0 END"),
        )
    )
    return staged.filter(F.col("copies") >= 1).select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("copies"))).alias("copy_idx"),
    )


@query(
    "sample_temporal_split",
    oracle="""
    WITH b AS (SELECT CAST(MIN(ts) AS DATE) + 21 AS cutoff FROM events),
    e AS (SELECT user_id, CAST(ts AS DATE) < cutoff AS is_train FROM events, b),
    u AS (
      SELECT user_id,
             SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS nt,
             SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS nv
      FROM e GROUP BY user_id
    )
    SELECT (SELECT cutoff FROM b) AS cutoff,
           CAST(SUM(nt) AS BIGINT) AS n_train,
           CAST(SUM(nv) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN nt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_users,
           CAST(SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS test_users,
           CAST(SUM(CASE WHEN nt > 0 AND nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS leak_users
    FROM u
    """,
    section="2.10",
    doc="Temporal train/test split with a LEAKAGE audit — the eval-set "
    "discipline every model pipeline needs: the cutoff is derived "
    "in-engine (first event date + 21 days), events partition into "
    "train (before) and test (at/after) by local calendar date, and "
    "the audit counts users appearing on BOTH sides — the population "
    "whose test rows leak training-time signal (user-level "
    "contamination, the temporal sibling of "
    "decontaminate_ngram_overlap's content-level check). One "
    "user-keyed aggregate + one scalar rollup; the cutoff rides a "
    "one-row crossJoin (dq_freshness_lag pattern). Disjoint-by-user "
    "splits would swap the date predicate for sample_hash_split's "
    "hash band — this query MEASURES why: leak_users > 0 quantifies "
    "the overlap a purely temporal cut leaves.",
)
def sample_temporal_split(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select("user_id", "ts")
    b = e.agg(F.date_add(F.to_date(F.min("ts")), 21).alias("cutoff"))
    per_user = (
        e.crossJoin(b)
        .withColumn("is_train", F.to_date("ts") < F.col("cutoff"))
        .groupBy("user_id", "cutoff")
        .agg(
            F.sum(F.when(F.col("is_train"), 1).otherwise(0)).alias("nt"),
            F.sum(F.when(F.col("is_train"), 0).otherwise(1)).alias("nv"),
        )
    )
    return per_user.groupBy("cutoff").agg(
        F.sum("nt").cast("long").alias("n_train"),
        F.sum("nv").cast("long").alias("n_test"),
        F.sum(F.when(F.col("nt") > 0, 1).otherwise(0)).cast("long").alias("train_users"),
        F.sum(F.when(F.col("nv") > 0, 1).otherwise(0)).cast("long").alias("test_users"),
        F.sum(F.when((F.col("nt") > 0) & (F.col("nv") > 0), 1).otherwise(0))
        .cast("long")
        .alias("leak_users"),
    )


@query(
    "corpus_token_apportion",
    oracle="""
    WITH s AS (
      SELECT lang,
             CAST(SUM(len(string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g')), ' +'))) AS BIGINT) AS toks
      FROM documents GROUP BY lang
    ),
    t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM s),
    q AS (
      SELECT s.lang, s.toks,
             (100000 * s.toks) // t.total AS floor_q,
             (100000 * s.toks) % t.total AS rem
      FROM s, t
    ),
    k AS (SELECT CAST(100000 - SUM(floor_q) AS BIGINT) AS leftover FROM q),
    r AS (
      SELECT lang, toks, floor_q,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
      FROM q
    )
    SELECT r.lang, r.toks,
           CAST(r.floor_q + CASE WHEN r.rk <= k.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM r, k
    """,
    section="2.10",
    doc="Token-budget apportionment by the largest-remainder (Hamilton) "
    "method: a 100k-token budget is split across languages "
    "proportionally to their corpus token mass — integer floor quotas "
    "first, then the leftover units go to the largest fractional "
    "remainders (deterministic lang tie-break), so the allocations sum "
    "EXACTLY to the budget with no float rounding drift (naive "
    "round(budget*share) over- or under-shoots). This is the planning "
    "step corpus_mix_weighted's sampling executes and "
    "corpus_upsample_weighted materializes. One corpus aggregate; the "
    "quota arithmetic runs on |langs| rows (scalar totals ride one-row "
    "crossJoins; the remainder rank is a window over |langs| rows, "
    "never data-sized).",
)
def corpus_token_apportion(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.size(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " ")), " +"
        )
    ).cast("long")
    s = (
        T(spark, sf, "documents")
        .select("lang", toks.alias("tk"))
        .groupBy("lang")
        .agg(F.sum("tk").alias("toks"))
    )
    t = s.agg(F.sum("toks").alias("total"))
    q = s.crossJoin(t).select(
        "lang",
        "toks",
        F.expr("(100000 * toks) DIV total").alias("floor_q"),
        F.expr("(100000 * toks) % total").alias("rem"),
    )
    k = q.agg((F.lit(100000) - F.sum("floor_q")).cast("long").alias("leftover"))
    r = q.select(
        "lang",
        "toks",
        "floor_q",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), "lang")).alias("rk"),
    )
    return r.crossJoin(k).select(
        "lang",
        "toks",
        (F.col("floor_q") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc_tokens"),
    )


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100) AS BIGINT)
               AS sum_d,
             CAST(SUM((CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100)
                      * (CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100))
               AS BIGINT) AS sumsq_d
      FROM orders GROUP BY o_orderpriority
    ),
    sd AS (
      SELECT stratum, n_h,
             CAST(FLOOR(SQRT((n_h * sumsq_d - sum_d * sum_d) // (n_h * n_h)))
               AS BIGINT) AS s_dollars
      FROM s
    ),
    w AS (SELECT stratum, n_h, s_dollars, n_h * s_dollars AS wt FROM sd),
    t AS (SELECT CAST(SUM(wt) AS BIGINT) AS total FROM w),
    q AS (
      SELECT w.stratum, w.n_h, w.s_dollars,
             (10000 * w.wt) // t.total AS floor_q,
             (10000 * w.wt) % t.total AS rem
      FROM w, t
    ),
    k AS (SELECT CAST(10000 - SUM(floor_q) AS BIGINT) AS leftover FROM q),
    r AS (
      SELECT stratum, n_h, s_dollars, floor_q,
             ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk
      FROM q
    )
    SELECT r.stratum, r.n_h, r.s_dollars,
           CAST(r.floor_q + CASE WHEN r.rk <= k.leftover THEN 1 ELSE 0 END
             AS BIGINT) AS alloc_n
    FROM r, k
    """,
    section="2.10",
    doc="Neyman-optimal stratified sample allocation: a 10k-row budget "
    "splits across order-priority strata proportionally to N_h * S_h "
    "(population size x standard deviation) — the variance-minimizing "
    "allocation for a fixed budget, which proportional allocation "
    "(sample_quota_per_lang's rule) only matches when strata are "
    "equally dispersed. Determinism chain: per-stratum variance from "
    "EXACT integer power sums over whole-dollar values (dollars, not "
    "cents, keep n*sumsq inside int64 at every shipped SF and the 32x "
    "derived corpus), S_h = floor(sqrt(var)) — sqrt is IEEE "
    "correctly-rounded in both engines so the floor cannot flip — and "
    "the final split reuses corpus_token_apportion's largest-remainder "
    "method, so allocations sum EXACTLY to the budget. One aggregate "
    "over the data; everything after runs on |strata| rows.",
)
def sample_neyman_allocation(spark: SparkSession, sf: str) -> DataFrame:
    from etl_covid19_brasil_spark.registry import cents

    d = F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100")
    s = (
        T(spark, sf, "orders")
        .select(F.col("o_orderpriority").alias("stratum"), d.alias("d"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.sum("d").alias("sum_d"),
            F.sum(F.col("d") * F.col("d")).alias("sumsq_d"),
        )
    )
    sd = s.select(
        "stratum",
        "n_h",
        F.floor(
            F.sqrt(F.expr("(n_h * sumsq_d - sum_d * sum_d) DIV (n_h * n_h)"))
        )
        .cast("long")
        .alias("s_dollars"),
    )
    w = sd.withColumn("wt", F.col("n_h") * F.col("s_dollars"))
    t = w.agg(F.sum("wt").alias("total"))
    q = w.crossJoin(t).select(
        "stratum",
        "n_h",
        "s_dollars",
        F.expr("(10000 * wt) DIV total").alias("floor_q"),
        F.expr("(10000 * wt) % total").alias("rem"),
    )
    k = q.agg((F.lit(10000) - F.sum("floor_q")).cast("long").alias("leftover"))
    r = q.select(
        "stratum",
        "n_h",
        "s_dollars",
        "floor_q",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), "stratum")).alias("rk"),
    )
    return r.crossJoin(k).select(
        "stratum",
        "n_h",
        "s_dollars",
        (F.col("floor_q") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc_n"),
    )


@query(
    "pipeline_curation_end_to_end",
    oracle="""
    WITH canon AS (
      SELECT doc_id, lang, text,
             md5(trim(regexp_replace(lower(text), '[ \\t]+', ' ', 'g')))
               AS canon_hash,
             len(string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g')), ' +')) AS n_tokens
      FROM documents
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY canon_hash
                                     ORDER BY doc_id) AS rn
        FROM canon
      ) WHERE rn = 1
    ),
    quality AS (
      SELECT * FROM dedup WHERE n_tokens BETWEEN 50 AND 1000
    ),
    quota AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY md5(text), doc_id) AS qrank
        FROM quality
      ) WHERE qrank <= 60
    ),
    sharded AS (
      SELECT lang,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 8 AS shard,
             n_tokens
      FROM quota
    )
    SELECT lang, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM sharded GROUP BY lang, shard
    """,
    section="2.10",
    doc="The FULL curation path composed into one operator — what a "
    "pretraining-data team actually ships, end to end: (1) "
    "normalized-exact dedup (dedup_normalized_exact's canon hash, "
    "keep-lowest-id); (2) quality gate (text_quality's token-count "
    "band); (3) per-language quota in content-hash order "
    "(sample_quota_per_lang's deterministic rule, 60/lang); (4) shard "
    "assignment by content-hash slot (corpus_shard_assign's rule, 8 "
    "shards); reported as the per-(lang, shard) manifest a training "
    "launcher consumes. Each stage is the registered single operator, "
    "so this query certifies the STAGES COMPOSE — the interfaces "
    "(column contracts, hash idioms, determinism rules) survive "
    "chaining, the property unit queries cannot show. Shuffle "
    "profile: one canon-hash aggregate window, one lang window, one "
    "(lang, shard) aggregate — three key-families, no data ever "
    "collected; the dedup sibling composition is "
    "dedup_minhash_components.",
)
def pipeline_curation_end_to_end(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "lang", "text")
    canon_hash = F.md5(F.trim(F.regexp_replace(F.lower("text"), "[ \\t]+", " ")))
    n_tokens = F.size(
        F.split(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " ")), " +")
    )
    canon = d.select(
        "doc_id", "lang", "text", canon_hash.alias("canon_hash"), n_tokens.alias("n_tokens")
    )
    dedup = (
        canon.withColumn(
            "rn", F.row_number().over(Window.partitionBy("canon_hash").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    quality = dedup.filter(F.col("n_tokens").between(50, 1000))
    quota = (
        quality.withColumn(
            "qrank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
            ),
        )
        .filter(F.col("qrank") <= 60)
    )
    shard = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 8
    return (
        quota.select("lang", shard.alias("shard"), "n_tokens")
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
