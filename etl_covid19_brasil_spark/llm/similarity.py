"""Brute-force cosine top-k via broadcast index + Arrow-batched kernel
(SURVEY.md §2.10 similarity_topk).

The naive formulation — crossJoin + per-pair higher-order folds — is
correct but interpreted per array element; at n=2000 vectors it spends
~75 s materializing 4M pairs. This kernel keeps the same *numerical
semantics* while vectorizing over pairs:

- the (id, vector) index is collected and broadcast (the classic
  distributed brute-force kNN shape: small index, large query stream;
  beyond broadcast size you move to the ANN tier, llm/ann.py);
- each Arrow batch of query vectors computes similarities against the
  whole index in numpy, **accumulating dimension-by-dimension in index
  order** (``acc += a[:, i] * b[:, i]``) — the exact IEEE operation
  sequence of ``F.aggregate(zip_with(a, b, *), 0.0, +)`` and DuckDB's
  ``list_reduce`` fold, so results are bit-identical to the declarative
  formulation and the SQL oracle;
- vectors are L2-normalized once (element / norm, norm from the same
  ordered fold), not per pair — removing 2/3 of the flops the naive plan
  re-did for every pair.

Scale shape: zero shuffle; queries stream through executors, index rides
the broadcast. 100 TB of queries against an M-vector index is
embarrassingly parallel; the index side is bounded by executor memory
(use ann.lsh_topk beyond that).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

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
    otherwise run the O(n_q x n_index) kernel on 2 cores). The shuffle
    moves only the small query rows; at real scale the input already has
    enough partitions and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with cosine >= threshold —
    embedding-space near-duplicate detection. Same broadcast-index /
    ordered-fold kernel as :func:`brute_force_topk`, so cosines are
    bit-identical to the declarative SQL formulation.
    """
    spark = vectors.sparkSession
    index_pdf = vectors.select(id_col, vec_col).toPandas()
    index_ids = index_pdf[id_col].to_numpy(dtype=np.int64)
    index_mat = _normalize(np.stack(index_pdf[vec_col].to_numpy()))
    bc = spark.sparkContext.broadcast((index_ids, index_mat))

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

    return _spread(vectors.select(id_col, vec_col)).mapInPandas(kernel, schema=PAIRS_SCHEMA)


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self-join semantics,
    self excluded). Output: (query_id, neighbor_id, cosine, rank) with
    deterministic tie-break (cosine desc, neighbor_id asc).
    """
    spark = embeddings.sparkSession
    index_pdf = embeddings.select(id_col, vec_col).toPandas()
    index_ids = index_pdf[id_col].to_numpy(dtype=np.int64)
    index_mat = _normalize(np.stack(index_pdf[vec_col].to_numpy()))
    bc = spark.sparkContext.broadcast((index_ids, index_mat))

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

    return _spread(embeddings.select(id_col, vec_col)).mapInPandas(kernel, schema=TOPK_SCHEMA)
