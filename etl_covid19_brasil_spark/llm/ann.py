"""Approximate nearest neighbors via random-hyperplane LSH
(SURVEY.md §2.10 similarity-search scale path).

Brute-force cosine top-k (queries/llm.py:similarity_topk) is O(n^2) — fine
as the correctness baseline, hopeless at 100 TB. This module buckets
vectors by the sign pattern of ``n_planes`` random-hyperplane projections
(per table), restricts candidate pairs to same-bucket vectors, and ranks
candidates by exact cosine. ``n_tables`` independent tables trade compute
for recall (P(collide) = (1 - theta/pi)^n_planes per table).

Cost shape: signatures are map-side; candidates come from an equi-join on
(table, bucket); only ~n/2^n_planes vectors meet in a bucket. Hyperplanes
are seeded-RNG literals baked into the plan (deterministic across runs).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def _planes(n_tables: int, n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _dot_lit(emb: F.Column, plane: np.ndarray) -> F.Column:
    arr = F.array(*[F.lit(float(x)) for x in plane])
    prods = F.zip_with(emb, arr, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _dot(a: F.Column, b: F.Column) -> F.Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors per vector.

    Output: (query_id, neighbor_id, cosine, rank) — same shape as the
    brute-force similarity_topk so callers can swap tiers.
    """
    planes = _planes(n_tables, n_planes, dim)
    emb = F.col(vec_col)

    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sum(
                    (
                        F.when(_dot_lit(emb, planes[t, p]) > 0, F.lit(1 << p)).otherwise(F.lit(0))
                        for p in range(n_planes)
                    ),
                    start=F.lit(0),
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    banded = embeddings.select(
        F.col(id_col), F.col(vec_col), F.explode(buckets).alias("bb")
    ).select(id_col, vec_col, F.col("bb.tbl").alias("tbl"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cosine = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    sims = cand.select("query_id", "neighbor_id", cosine.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors.

    The second ANN scheme next to random-hyperplane LSH: partition the
    space into ``n_cells`` Voronoi cells around coarse centroids, assign
    each index vector to its nearest cell (one cell each), and have each
    query probe its ``n_probe`` nearest cells. Candidates meet in an
    equi-join on the cell id — shuffle volume is linear in n x n_probe,
    never quadratic.

    Centroids are the vectors with the ``n_cells`` smallest ids —
    deterministic and model-free (real deployments train k-means centroids
    offline and broadcast them; the plan shape is identical).
    """
    import pandas as pd
    from collections.abc import Iterator

    from etl_covid19_brasil_spark.llm.similarity import _normalize, _ordered_dot

    spark = embeddings.sparkSession
    cent_pdf = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_cells).toPandas()
    )
    cent_mat = _normalize(np.stack(cent_pdf[vec_col].to_numpy()))
    bc = spark.sparkContext.broadcast(cent_mat)

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    def assign(n_top: int):
        schema = StructType(
            [
                StructField("vid", LongType()),
                StructField("vec", ArrayType(DoubleType())),
                StructField("cell", IntegerType()),
            ]
        )

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents = bc.value
            for pdf in batches:
                ids = pdf[id_col].to_numpy(dtype=np.int64)
                mat = _normalize(np.stack(pdf[vec_col].to_numpy()))
                sims = _ordered_dot(mat[:, None, :], cents[None, :, :])
                # n_top nearest centroids per vector (argsort desc)
                cells = np.argsort(-sims, axis=1)[:, :n_top]
                n = len(ids)
                yield pd.DataFrame(
                    {
                        "vid": np.repeat(ids, n_top),
                        "vec": [list(v) for v in np.repeat(mat, n_top, axis=0)],
                        "cell": cells.reshape(-1).astype(np.int32),
                    }
                )

        return kernel, schema

    src = embeddings.select(id_col, vec_col)
    k_idx, s_idx = assign(1)
    k_qry, s_qry = assign(n_probe)
    index_side = src.mapInPandas(k_idx, schema=s_idx).toDF("neighbor_id", "nvec", "cell")
    query_side = src.mapInPandas(k_qry, schema=s_qry).toDF("query_id", "qvec", "cell")

    cand = (
        query_side.join(index_side, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # vectors are pre-normalized in the kernels: cosine = plain dot
    cosine = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("nvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = cand.select("query_id", "neighbor_id", cosine.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
