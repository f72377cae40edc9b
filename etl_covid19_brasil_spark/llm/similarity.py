"""Brute-force cosine top-k via bounded broadcast tiles + Arrow kernel
(SURVEY.md §2.10 similarity_topk).

The naive formulation — crossJoin + per-pair higher-order folds — is
correct but interpreted per array element; at n=2000 vectors it spends
~75 s materializing 4M pairs. This kernel keeps the same *numerical
semantics* while vectorizing over pairs:

- the (id, vector) index is collected and broadcast in **bounded tiles**
  (block-nested-loop): at most ``max_index_rows`` rows are ever resident
  on the driver or broadcast to an executor at once. A small index is
  one tile (the classic broadcast-kNN shape); a corpus-sized index
  becomes ceil(n / max_index_rows) sequential tiles whose per-tile
  partial top-k results are materialized (localCheckpoint) so each
  tile's broadcast can be released before the next is built — memory
  stays bounded while semantics stay EXACT. Beyond a few tiles the ANN
  tier (llm/ann.py) is the right tool; exact all-pairs at that scale is
  a deliberate O(n_q x n) spend, and the pass count makes that cost
  visible instead of OOMing the driver;
- each Arrow batch of query vectors computes similarities against the
  tile in numpy, **accumulating dimension-by-dimension in index order**
  (``acc += a[:, i] * b[:, i]``) — the exact IEEE operation sequence of
  ``F.aggregate(zip_with(a, b, *), 0.0, +)`` and DuckDB's
  ``list_reduce`` fold, so results are bit-identical to the declarative
  formulation and the SQL oracle (tile boundaries never change per-pair
  arithmetic, and the global re-rank uses the same deterministic
  (cosine desc, id asc) order as the single-tile lexsort);
- vectors are L2-normalized once (element / norm, norm from the same
  ordered fold), not per pair — removing 2/3 of the flops the naive plan
  re-did for every pair.

Scale shape: zero shuffle in the single-tile path; queries stream
through executors, index rides the broadcast. 100 TB of queries against
an M-vector index is embarrassingly parallel; an index beyond broadcast
size runs tile-sequentially with bounded memory (or moves to
ann.lsh_topk / ivf_topk when approximate recall is acceptable).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator
from functools import reduce

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# One tile of 64-dim float64 vectors at this bound is ~100 MB broadcast —
# comfortably inside executor/driver memory at local[32] and cluster alike.
MAX_INDEX_ROWS = 200_000

TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)


def _ordered_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot accumulated dimension-by-dimension (index order) —
    matches the sequential fold semantics bit-for-bit. a: (n, d) or
    (d,); b: (m, d) with broadcasting handled by the caller."""
    acc = np.zeros(np.broadcast_shapes(a.shape, b.shape)[:-1], dtype=np.float64)
    for i in range(a.shape[-1]):
        acc += a[..., i] * b[..., i]
    return acc


def _normalize(mat: np.ndarray) -> np.ndarray:
    m64 = mat.astype(np.float64)
    norms = np.sqrt(_ordered_dot(m64, m64))
    return m64 / norms[:, None]


def _spread(df: DataFrame) -> DataFrame:
    """Repartition the query stream up to the cluster's parallelism when
    the source arrives in fewer partitions (a 2-file parquet table would
    otherwise run the O(n_q x n_index) kernel on 2 cores). File count
    approximates scan parallelism without converting the plan to an RDD
    (``df.rdd`` would force analysis + a deprecated hop just to read a
    number); non-file sources report no files and take the repartition,
    which AQE coalesces if it was unnecessary. The shuffle moves only the
    small query rows; at real scale the input already has enough files
    and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df


def _tiles(
    vectors: DataFrame, id_col: str, vec_col: str, n_tiles: int
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield the index as (ids, normalized matrix) tiles. One tile is
    resident at a time — callers must consume lazily (never ``list()``
    this generator, or every tile is live on the driver at once); tiles
    partition the index by a deterministic key hash."""
    src = vectors.select(id_col, vec_col)
    if n_tiles == 1:
        pdf = src.toPandas()
        yield pdf[id_col].to_numpy(dtype=np.int64), _normalize(np.stack(pdf[vec_col].to_numpy()))
        return
    for t in range(n_tiles):
        pdf = src.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_tiles)) == t).toPandas()
        if len(pdf):
            yield (
                pdf[id_col].to_numpy(dtype=np.int64),
                _normalize(np.stack(pdf[vec_col].to_numpy())),
            )


def _tiled_scan(
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    max_index_rows: int,
    make_kernel: Callable,
    schema: StructType,
) -> tuple[list[DataFrame], bool]:
    """Run ``make_kernel(broadcast)`` over the query stream once per index
    tile. Multi-tile partials are eagerly materialized (localCheckpoint)
    so each tile's broadcast is released before the next loads — peak
    memory is one tile regardless of index size (the generator is
    consumed lazily; only the tile inside the loop body is live).
    Returns (partials, single_tile)."""
    spark = queries.sparkSession
    src = _spread(queries.select(id_col, vec_col))
    partials: list[DataFrame] = []
    n_tiles = max(1, math.ceil(vectors.count() / max_index_rows))
    single = n_tiles == 1
    for ids, mat in _tiles(vectors, id_col, vec_col, n_tiles):
        bc = spark.sparkContext.broadcast((ids, mat))
        part = src.mapInPandas(make_kernel(bc), schema=schema)
        if not single:
            part = part.localCheckpoint(eager=True)
            bc.unpersist()
        partials.append(part)
    return partials, single


PAIRS_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_index_rows: int = MAX_INDEX_ROWS,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with cosine >= threshold —
    embedding-space near-duplicate detection. Same bounded-tile /
    ordered-fold kernel as :func:`brute_force_topk`, so cosines are
    bit-identical to the declarative SQL formulation. Tiles partition the
    index, so each qualifying pair (a < b) is emitted exactly once: by
    the single tile containing ``b``, when the query stream supplies
    ``a``."""

    def make_kernel(bc):
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids, mat = bc.value
            for pdf in batches:
                q_ids = pdf[id_col].to_numpy(dtype=np.int64)
                q_mat = _normalize(np.stack(pdf[vec_col].to_numpy()))
                sims = _ordered_dot(q_mat[:, None, :], mat[None, :, :])
                # keep (a, b) once: only emit from the smaller id's row
                keep = (sims >= threshold) & (q_ids[:, None] < ids[None, :])
                rows, cols = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "id_a": q_ids[rows],
                        "id_b": ids[cols],
                        "cosine": sims[rows, cols],
                    }
                )

        return kernel

    partials, _ = _tiled_scan(
        vectors, vectors, id_col, vec_col, max_index_rows, make_kernel, PAIRS_SCHEMA
    )
    return reduce(DataFrame.unionByName, partials)


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_index_rows: int = MAX_INDEX_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self-join semantics,
    self excluded). Output: (query_id, neighbor_id, cosine, rank) with
    deterministic tie-break (cosine desc, neighbor_id asc).

    Single tile: one broadcast, zero shuffle, ranks straight from the
    kernel's lexsort. Multi-tile: each tile contributes its local top-k
    (a superset of that tile's global-top-k members), then one window
    re-rank merges them — the merge shuffles only n_q * k * n_tiles
    candidate rows, never the raw similarity matrix."""

    def make_kernel(bc):
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids, mat = bc.value
            for pdf in batches:
                q_ids = pdf[id_col].to_numpy(dtype=np.int64)
                q_mat = _normalize(np.stack(pdf[vec_col].to_numpy()))
                # (nq, d) x (m, d) -> (nq, m), dimension-ordered accumulation
                sims = _ordered_dot(q_mat[:, None, :], mat[None, :, :])
                # top-k by (cosine desc, neighbor_id asc) in ONE 2D lexsort
                # (stable, last key primary); each query's self-pair is set
                # to -inf so it sorts last, and any -inf that leaks into the
                # top-k of a short index is dropped after the gather. Ranks
                # stay contiguous because drops only happen at the tail.
                sims[q_ids[:, None] == ids[None, :]] = -np.inf
                kk = min(k, len(ids))
                order = np.lexsort(
                    (np.broadcast_to(ids, sims.shape), -sims), axis=-1
                )[:, :kk]
                got = np.take_along_axis(sims, order, axis=1).reshape(-1)
                keep = got > -np.inf
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_ids, kk)[keep],
                        "neighbor_id": ids[order].reshape(-1)[keep],
                        "cosine": got[keep],
                        "rank": np.tile(
                            np.arange(1, kk + 1, dtype=np.int32), len(q_ids)
                        )[keep],
                    }
                )

        return kernel

    partials, single = _tiled_scan(
        embeddings, embeddings, id_col, vec_col, max_index_rows, make_kernel, TOPK_SCHEMA
    )
    if single:
        return partials[0]
    merged = reduce(DataFrame.unionByName, partials)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
