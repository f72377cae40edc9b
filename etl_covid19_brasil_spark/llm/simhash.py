"""SimHash near-duplicate detection (SURVEY.md §2.10).

64-bit SimHash: each token votes +1/-1 on each signature bit according to
its own 64-bit hash; the signature is the sign vector. Similar documents
land at small Hamming distance.

Pipeline (all built-in expressions, one shuffle on the doc id, one on the
band bucket):
1. explode tokens, xxhash64 each token once;
2. per bit i, sum(+-1) via ``CASE WHEN (hash >> i) & 1 = 1``, giving 64
   per-doc counters in a single grouped aggregate;
3. pack sign bits into one BIGINT signature;
4. candidate pairs: split the signature into 4 16-bit bands — two docs
   within Hamming distance <= 3 of each other must agree on at least one
   whole band (pigeonhole); ONE hash shuffle groups each (band, bucket)
   and (id, signature) pairs expand in-bucket via nested transforms, so
   the signature rides along and verification needs no join at all;
5. exact Hamming check via bit_count(xor) <= max_hamming, applied before
   the pair dedup so the final distinct only sees surviving pairs.

For ``max_hamming`` > 3 the 4-band pigeonhole bound is no longer exact, so
recall is approximate (like any production SimHash deployment) — hence
rows-only in the correctness gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def simhash_signatures(docs: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(id, tokens[]) -> (id, simhash BIGINT)."""
    tok = docs.select(id_col, F.explode(tokens_col).alias("__tok")).withColumn(
        "__h", F.xxhash64("__tok")
    )
    bit_votes = [
        F.sum(
            F.when(F.shiftright("__h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit_{i}")
        for i in range(64)
    ]
    votes = tok.groupBy(id_col).agg(*bit_votes)
    # pack: bit i set iff vote > 0. Build the signature by summing shifted
    # bits; bit 63 contributes the sign bit, which BIGINT arithmetic
    # handles via overflow-free shiftleft of 1L.
    sig = None
    for i in range(64):
        piece = F.when(F.col(f"bit_{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = piece if sig is None else sig + piece
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame, id_col: str, tokens_col: str, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs via 16-bit band bucketing, verified by exact
    Hamming distance. Output: (doc_a, doc_b, hamming).

    The token corpus is materialized once before the signature explode
    (lazy localCheckpoint — llm/minhash.py:_shared_scan — so block
    lifetime is automatic and a resident session accumulates nothing):
    Spark's InferFiltersFromGenerate plants a ``size(tokens) > 0``
    predicate under the Generate, and predicate pushdown then drags the
    whole tokenizing expression below its projection, where per-element
    lambdas inline and re-evaluate it once per element_at — measured 17x
    slower end-to-end on shingled input. The checkpoint is a barrier
    pushdown cannot cross, so the filter runs against materialized
    arrays instead.
    """
    from etl_covid19_brasil_spark.llm.minhash import _shared_scan

    base = _shared_scan(docs.select(F.col(id_col), F.col(tokens_col)))
    sigs = simhash_signatures(base, id_col, tokens_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
            )
            for b in range(4)
        ]
    )
    banded = sigs.select(id_col, "simhash", F.explode(bands).alias("bb")).select(
        id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    from etl_covid19_brasil_spark.llm.minhash import bucket_pairs

    members = F.sort_array(
        F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sig")))
    )
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(members.alias("ms"))
        .filter(F.size("ms") > 1)
    )
    pairs = grouped.select(F.explode(bucket_pairs(F.col("ms"))).alias("p")).select(
        F.col("p.id_a.id").alias("doc_a"),
        F.col("p.id_b.id").alias("doc_b"),
        F.bit_count(F.col("p.id_a.sig").bitwiseXOR(F.col("p.id_b.sig"))).alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= max_hamming).dropDuplicates(["doc_a", "doc_b"])
