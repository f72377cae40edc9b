"""MinHash + LSH banding near-duplicate detection (SURVEY.md §2.10).

The scale path for near-dup at 100 TB, replacing the quadratic pairwise
Jaccard join:

1. signatures: hash each token ONCE (xxhash64), then derive the
   ``num_perms`` permutations as ``xxhash64(h, i)`` — re-hashing the
   8-byte token hash with the permutation index as a second column — and
   take ``array_min`` per permutation: entirely map-side, zero shuffle,
   zero explode. (The naive explode + groupBy + per-seed string-hash
   formulation was ~25x slower: |docs|x|tokens| rows through a shuffle
   and num_perms string hashes per row. An affine-map family ``a_i*h+b_i``
   would be marginally cheaper still, but wrapping long multiplication
   throws under ANSI mode — Spark 4's default — so the engine must not
   rely on it.)
2. banding: split the signature into ``bands`` groups of ``rows_per_band``
   values; hash each group to a bucket id. Documents sharing any
   (band, bucket) become candidates — an equi-join on the bucket key, so
   Catalyst uses a hash join; no cross product ever materializes.
3. verification: candidates (a tiny fraction of all pairs) are joined back
   to their token sets and kept iff exact Jaccard >= threshold.

With 32 permutations as 8 bands x 4 rows, the S-curve gives
P(candidate) = 1-(1-s^4)^8: ~0.97 at s=0.8, ~0.03 at s=0.3.

Built entirely from DataFrame ops + xxhash64 (JVM codegen); no Python
UDFs. Probabilistic by construction -> registered rows-only in the
correctness gate; exactness is covered by near_dedup_jaccard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def minhash_signatures(
    docs: DataFrame, id_col: str, tokens_col: str, num_perms: int = 32
) -> DataFrame:
    """(id, tokens[]) -> (id, minhash_0..minhash_{n-1}).

    One xxhash64 per token, then permutation i is ``xxhash64(h, i)``
    (hashing the long, not the string — ANSI-safe, JVM codegen)
    minimized over the token-hash array — no explode, no shuffle.
    """
    hashed = docs.select(
        id_col, F.transform(F.col(tokens_col), lambda t: F.xxhash64(t)).alias("__h")
    )

    def perm(i: int):
        # single-parameter lambda is REQUIRED: a two-parameter transform
        # lambda receives (element, array_index), so capturing the
        # permutation index as a default arg (lambda h, i=i: ...) silently
        # shadows it with the element position — every permutation
        # degenerates to the same position-sensitive hash.
        lit_i = F.lit(i)
        return lambda h: F.xxhash64(h, lit_i)

    mins = [
        F.array_min(F.transform(F.col("__h"), perm(i))).alias(f"mh_{i}")
        for i in range(num_perms)
    ]
    return hashed.select(F.col(id_col), *mins)


def lsh_candidates(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Band the signatures and emit candidate (id_a, id_b) pairs that share
    at least one (band, bucket). Distinct so a pair colliding in several
    bands appears once.
    """
    buckets = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(buckets).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float = 0.8,
    num_perms: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Full pipeline: signatures -> banded candidates -> exact-Jaccard
    verification. Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    rows_per_band = num_perms // bands
    sigs = minhash_signatures(docs, id_col, tokens_col, num_perms)
    cand = lsh_candidates(sigs, id_col, bands, rows_per_band)

    toks = docs.select(F.col(id_col), F.array_distinct(F.col(tokens_col)).alias("__toks"))
    ta = toks.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("toks_a"))
    tb = toks.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("toks_b"))
    joined = cand.join(ta, "id_a").join(tb, "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = inter.cast("double") / union
    return (
        joined.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), jac.alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )
