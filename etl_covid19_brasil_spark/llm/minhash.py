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
   (band, bucket) become candidates — ONE hash shuffle groups each
   (band, bucket) and pairs expand in-bucket via nested array transforms
   (a banded self-join costs two shuffles of the same rows and, without
   exchange reuse, recomputes the whole signature subtree per side — the
   join formulation measured ~2x slower end-to-end).
3. verification: candidates (a tiny fraction of all pairs) broadcast into
   two joins against the persisted token sets and are kept iff exact
   Jaccard >= threshold.

The shingled corpus is materialized once (lazy localCheckpoint) for the pipeline's
lifetime: signatures + both verification sides otherwise re-tokenize the
documents table several times (Catalyst does not dedupe common subplans
across join sides — measured 8 parquet scans in the unpersisted plan).
That is also the 100 TB posture: a multi-pass LSH index build checkpoints
its tokenized corpus rather than re-deriving it per pass.

With 32 permutations as 8 bands x 4 rows, the S-curve gives
P(candidate) = 1-(1-s^4)^8: ~0.97 at s=0.8, ~0.03 at s=0.3.

Built entirely from DataFrame ops + xxhash64 (JVM codegen); no Python
UDFs. Probabilistic by construction -> registered rows-only in the
correctness gate; exactness is covered by near_dedup_jaccard; the recall
floor against the exact tier is pinned in tests/test_ann_recall.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _shared_scan(df: DataFrame) -> DataFrame:
    """Materialize-once barrier for a DataFrame consumed by several plan
    branches, with AUTOMATIC lifetime: lazy ``localCheckpoint`` stores the
    computed partitions as RDD blocks on first use, every consumer reads
    those blocks instead of recomputing the subtree, and Spark's
    ContextCleaner frees them when the DataFrame is garbage-collected.

    Chosen over ``persist()`` deliberately: persisted plans live in the
    CacheManager until an explicit ``unpersist()``, which (a) leaks in a
    resident session when callers never unpersist, and (b) cannot be tied
    to the result's lifetime with a finalizer because CacheManager
    matches by logical-plan EQUALITY — a finalizer for run N's cache
    evicts run N+1's identical just-registered cache (measured: every
    steady-state bench run of the minhash pipeline executed uncached,
    ~1.7x slower). An RDD checkpoint is identity-based, so repeated
    invocations never interfere.
    """
    return df.localCheckpoint(eager=False)


def bucket_pairs(grouped_ids: F.Column) -> F.Column:
    """All ordered pairs (a < b) from a SORTED id array, as structs —
    the in-bucket candidate expansion shared by the LSH families. Buckets
    are overwhelmingly singletons (size-0 output); a hot bucket expands
    quadratically, which is inherent to LSH banding (identical docs must
    all pair) — threshold tuning, not the engine, bounds that."""
    ids = grouped_ids
    return F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    num_perms: int = 32,
    tokens_hashed: bool = False,
) -> DataFrame:
    """(id, tokens[]) -> (id, sig: array<long>[num_perms]).

    With ``tokens_hashed=True`` the column already holds xxhash64 token
    hashes (array<long>) and the string-hash pass is skipped.

    One xxhash64 per token, then permutation p is ``xxhash64(h, p)``
    (hashing the long, not the string — ANSI-safe) minimized over the
    token-hash array — no explode, no shuffle. The whole signature is ONE
    nested-transform expression over ``sequence(0, n-1)`` rather than n
    per-permutation columns: n separate ``array_min(transform(...))``
    subtrees made the analyzed plan O(n) in size and dominated cold-run
    latency with analyzer + codegen time (~2s at n=32), for identical
    per-element work at execution.

    The outer lambda's element IS the permutation index (single-parameter
    lambda — a two-parameter transform lambda receives (element, index),
    which would shadow a captured index and collapse every permutation to
    the same hash).
    """
    hashed = docs.select(
        id_col,
        (
            F.col(tokens_col)
            if tokens_hashed
            else F.transform(F.col(tokens_col), lambda t: F.xxhash64(t))
        ).alias("__h"),
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perms - 1)),
        lambda p: F.array_min(F.transform(F.col("__h"), lambda h: F.xxhash64(h, p))),
    )
    return hashed.select(F.col(id_col), sig.alias("sig"))


def lsh_candidates(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Band the signatures and emit candidate (id_a, id_b) pairs that share
    at least one (band, bucket). Distinct so a pair colliding in several
    bands appears once.
    """
    # Band b's bucket is the hash of the signature slice it owns — two
    # docs collide iff those rows_per_band minhashes are all equal, the
    # same collision condition as hashing the rows individually. The band
    # index explodes BEFORE the slice+hash projection: a Generate is a
    # projection barrier CollapseProject cannot cross, so the signature
    # expression evaluates once per doc; slicing it inside a per-band
    # lambda instead inlines (and re-evaluates) the whole signature per
    # band — measured ~8x signature work.
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        id_col,
        F.col("band").cast("int").alias("band"),
        F.xxhash64(
            F.slice(F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band)
        ).alias("bucket"),
    )
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        grouped.select(F.explode(bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
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

    The distinct-token corpus is materialized once (lazy localCheckpoint,
    see :func:`_shared_scan`) and reused by the signature stage and both
    verification sides. The candidate pairs hash-join to their token
    arrays on each id — two ordinary shuffle joins whose volume is the
    candidate count (a tiny FRACTION of all pairs by the S-curve, but
    still O(corpus) in absolute rows: the r7 32x probe OOM'd the
    previous formulation, which broadcast candidates-with-token-arrays
    and therefore built an O(corpus) table on the driver; a broadcast
    side must be O(1) in corpus size, never O(n)). Block lifetime is
    automatic — freed when the returned DataFrame is dropped — so a
    long-lived session invoking this repeatedly does not accumulate
    cached blocks.
    """
    rows_per_band = num_perms // bands
    # The shared per-doc representation is the distinct TOKEN-HASH array
    # (xxhash64 per token, once): the signature stage permutes these
    # longs anyway, and the verification joins then shuffle 8-byte longs
    # instead of token strings — same exact Jaccard (set intersection is
    # preserved under the injective-in-practice 64-bit hash; a collision
    # merges two tokens corpus-wide with probability ~|vocab|^2/2^64,
    # far below the pinned recall floors of this rows-only tier) at a
    # fraction of the shuffle bytes.
    toks = _shared_scan(
        docs.select(
            F.col(id_col),
            F.array_distinct(
                F.transform(F.col(tokens_col), lambda t: F.xxhash64(t))
            ).alias("__th"),
        )
    )
    sigs = minhash_signatures(toks, id_col, "__th", num_perms, tokens_hashed=True)
    cand = lsh_candidates(sigs, id_col, bands, rows_per_band)

    ta = toks.select(F.col(id_col).alias("id_a"), F.col("__th").alias("toks_a"))
    tb = toks.select(F.col(id_col).alias("id_b"), F.col("__th").alias("toks_b"))
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
