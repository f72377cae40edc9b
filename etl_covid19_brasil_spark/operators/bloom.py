"""Bloom-filter semi-join pruning — cut a huge probe side down BEFORE the
exact join shuffles it.

At 100 TB the expensive part of ``fact ⋉ dim_subset`` is shuffling the
fact; when the dim subset is selective, most fact rows will not survive
the join, yet a plain semi-join ships them all to the exchange. The fix
every warehouse engine applies (and Spark itself applies as the internal
"runtime bloom filter" rewrite when statistics allow) is: aggregate the
build keys into a bloom filter, broadcast it, and drop probe rows whose
keys cannot possibly match before the shuffle. False positives only cost
a little pruning efficiency — the exact join behind the filter removes
them — and false negatives are impossible by construction, so the result
is EXACTLY the plain semi-join.

Spark's ``bloom_filter_agg``/``might_contain`` expressions are not in the
public function registry, so the filter here is built from registered
built-ins only, keeping every step JVM-side and codegen-friendly:

- build: k = ``n_hashes`` positions per key via seeded ``xxhash64``; each
  position sets one bit in a ``num_bits``-wide bitmap stored as 64-bit
  words; per-word OR masks come from a map-side ``explode`` + ``bit_or``
  aggregation (the shuffle carries at most ``num_bits/64`` word rows);
  the finished bitmap is ONE row: a ``map<word_idx, word>``.
- probe: broadcast that row, test all k bits with ``element_at`` + bitwise
  AND — a scalar projection, no shuffle, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _positions(key: Column, num_bits: int, n_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    build: DataFrame, key: str, num_bits: int = 1 << 15, n_hashes: int = 3
) -> DataFrame:
    """One-row DataFrame ``(bf: map<long,long>)`` — the bitmap as words."""
    pos = F.explode(F.array(*_positions(F.col(key), num_bits, n_hashes))).alias("pos")
    words = (
        build.select(pos)
        .select((F.col("pos") / 64).cast("long").alias("w"),
                F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")).alias("m"))
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bf")
    )


def might_contain(bf: Column, key: Column, num_bits: int, n_hashes: int) -> Column:
    """True unless some hash position's bit is unset (no false negatives)."""
    checks = []
    for p in _positions(key, num_bits, n_hashes):
        word = F.coalesce(F.element_at(bf, (p / 64).cast("long")), F.lit(0).cast("long"))
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 15,
    n_hashes: int = 3,
) -> DataFrame:
    """``probe ⋉ build`` with bloom pre-pruning; result == plain semi-join.

    The filter column carries an internal name and the join condition uses
    dataframe-qualified columns, so ``probe_key == build_key`` (the common
    natural-key case) and a pre-existing ``bf`` column both work."""
    bf = build_bloom(build.select(build_key), build_key, num_bits, n_hashes).withColumnRenamed(
        "bf", "__bloom_bf"
    )
    pruned = (
        probe.crossJoin(F.broadcast(bf))  # one-row build side: trivial broadcast
        .filter(might_contain(F.col("__bloom_bf"), probe[probe_key], num_bits, n_hashes))
        .drop("__bloom_bf")
    )
    return pruned.join(
        build, pruned[probe_key] == build[build_key], "left_semi"
    )
