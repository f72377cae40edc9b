"""Distributed logistic-regression quality-classifier training — the
model-based curation step of a pretraining data pipeline (the GPT-3 /
CCNet-style filter: score every document with a cheap linear classifier,
keep/downsample by score) trained IN-ENGINE with full-batch gradient
descent.

Reference basis: the reference's lake is the substrate for downstream
modeling ("para consultas", dags/create-data-lake.py:23-25); this is the
training-data-pipeline extension mandated by the north star.

Scale contract
--------------
Every phase is one map-only pass or one bounded aggregation — nothing
corpus-sized ever reaches the driver:

1. featurize: hashing-trick token rates (``text_feature_hashing``'s
   md5-slot idiom, dim buckets) built in an Arrow-batched kernel —
   map-only, then pinned with a lazy localCheckpoint so the GD loop
   re-reads materialized features, not re-tokenized text (the r8
   barrier house style).
2. label: above-median stop-token rate (weak supervision — the
   stopword-density proxy real quality filters bootstrap from when no
   human labels exist; swap in real labels at will). The median is one
   exact percentile aggregate.
3. standardize: per-dimension mean/std via posexplode + (dim) hash agg
   — the kmeans_lloyd update shape; (dim, mu, sd) collects (tiny by
   construction) and rides back as a broadcast.
4. GD loop: fixed ``iters`` sweeps; each sweep broadcasts w, computes
   per-partition partial gradients/loss/accuracy in the kernel (one
   output row per partition: dim+1 doubles + 3 scalars), and the driver
   sums the ≤ n_partitions rows in sorted partition order. Update is
   O(dim) driver work.

At 100 TB: sweeps are corpus scans — production trains on a hash-sample
(sample_hash_split) and/or switches to minibatch/L-BFGS; the plumbing
(broadcast weights, partition-partial reduction, bounded driver
traffic) is identical, which is what this module demonstrates.

Determinism: fixed iteration count and learning rate, partition-sorted
driver reduction, float64 end-to-end. Bit-exactness across different
partition layouts is NOT claimed (float partial-sum order) — the
pinned tests assert the model's invariants (loss monotonically
decreasing, accuracy floor, the stop-token bucket carrying the largest
positive weight), the honest contract for iterative float training.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["logreg_train_quality", "score_documents_frozen"]


def _bucket(token: str, dim: int) -> int:
    """md5-slot hash — matches the SQL idiom
    CAST(('0x' || substr(md5(t),1,8)) AS BIGINT) % dim used by
    text_feature_hashing, so Python- and JVM-side featurization agree."""
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % dim


def logreg_train_quality(
    docs: DataFrame,
    dim: int = 256,
    iters: int = 30,
    lr: float = 1.0,
    stop_token: str = "a",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Train the filter; returns (metrics_df, weights ndarray).

    metrics_df: one row per iteration — (iter, loss_u6, accuracy_ppm,
    n_docs), loss x1e6 floored, accuracy in ppm. weights: float64
    (dim + 1,), bias last (useful to callers/tests; the registered query
    returns only the metrics frame).
    """
    spark = docs.sparkSession
    d = dim

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_vecs, out_rate, out_ids = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split()
                v = np.zeros(d)
                stop = 0
                for t in toks:
                    v[_bucket(t, d)] += 1.0
                    if t == stop_token:
                        stop += 1
                n = max(1, len(toks))
                out_vecs.append(v / n)
                out_rate.append(stop / n)
                out_ids.append(did)
            yield pd.DataFrame(
                {"doc_id": out_ids, "fx": out_vecs, "stop_rate": out_rate}
            )

    feats = (
        docs.select(id_col, text_col)
        .mapInPandas(featurize, schema="doc_id long, fx array<double>, stop_rate double")
        .localCheckpoint(eager=False)
    )

    # exact median of the weak-supervision signal (one aggregate)
    med = feats.agg(
        F.expr("percentile(stop_rate, 0.5)").alias("m")
    ).collect()[0]["m"]

    # per-dimension standardization stats: posexplode + dim-keyed agg
    stats = (
        feats.select(F.posexplode("fx").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd"))
        .toPandas()
        .sort_values("dim")
    )
    mu = stats["mu"].to_numpy()
    sd = stats["sd"].to_numpy()
    sd[sd == 0] = 1.0

    labeled = feats.select(
        "fx", (F.col("stop_rate") > F.lit(float(med))).cast("double").alias("y")
    ).withColumn("pid", F.spark_partition_id())

    bc_stats = spark.sparkContext.broadcast((mu, sd))
    w = np.zeros(d + 1)
    metrics = []
    for it in range(iters):
        bc_w = spark.sparkContext.broadcast(w)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            mu_, sd_ = bc_stats.value
            w_ = bc_w.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X0 = np.stack(pdf["fx"].to_numpy())
                X = np.hstack([(X0 - mu_) / sd_, np.ones((len(X0), 1))])
                y = pdf["y"].to_numpy(dtype=np.float64)
                p = 1.0 / (1.0 + np.exp(-(X @ w_)))
                grad = X.T @ (p - y)
                loss = -np.sum(
                    y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12)
                )
                yield pd.DataFrame(
                    {
                        "pid": [int(pdf["pid"].iloc[0])],
                        "grad": [grad],
                        "loss": [loss],
                        "n": [len(y)],
                        "correct": [int(np.sum((p > 0.5) == (y > 0.5)))],
                    }
                )

        rows = labeled.mapInPandas(
            partials, schema="pid int, grad array<double>, loss double, n long, correct long"
        ).collect()
        rows.sort(key=lambda r: r["pid"])  # fixed reduction order
        n_total = sum(r["n"] for r in rows)
        grad = np.sum([np.asarray(r["grad"]) for r in rows], axis=0) / n_total
        loss = sum(r["loss"] for r in rows) / n_total
        acc = sum(r["correct"] for r in rows) / n_total
        w = w - lr * grad
        metrics.append(
            (
                it,
                int(np.floor(loss * 1e6 + 0.5)),
                int(np.floor(acc * 1e6 + 0.5)),
                n_total,
            )
        )
    mdf = spark.createDataFrame(
        metrics, "iter int, loss_u6 long, accuracy_ppm long, n_docs long"
    )
    return mdf, w


# Frozen deployment model: logreg_train_quality run once at sf0.01
# (30 sweeps, the training-curve query's exact configuration), then the
# standardization folded back into RAW rate space
# (w_raw = w/sd, b_raw = b - sum(w*mu/sd)) and quantized to integer
# micro-units. Deployment is thereby EXACT-ARITHMETIC:
# score_u6(doc) = (sum_b w_u6[b] * count_b) DIV n_tokens + bias_u6 —
# integer end-to-end, bit-identical in any engine (the sigmoid is
# monotone, so keep = score_u6 > 0 is the same decision boundary).
# Sparse by construction: the corpus vocabulary maps to 29 live buckets.
FROZEN_QUALITY_WEIGHTS_U6: dict[int, int] = {
    27: -1246182, 49: -9177287, 55: -7741675, 56: -6070438,
    76: -3301729, 77: -4306399, 87: -1264736, 95: 188612,
    96: -5227070, 105: -5057417, 109: -4350868, 122: -7064668,
    125: 2661819, 129: 347292, 133: -1651033, 138: -3399952,
    141: -872812, 142: 742484, 147: -4084539, 153: -3747552,
    177: -3546525, 185: 119701802, 192: -7266505, 214: -4739483,
    222: -4538712, 228: 2730466, 231: -5300480, 240: -1286998,
    250: -6122084,
}
FROZEN_QUALITY_BIAS_U6 = -75962
FROZEN_QUALITY_DIM = 256


def score_documents_frozen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply the frozen quality model: (doc_id, score_u6, keep).

    Map-side only at any scale: explode tokens -> md5 bucket -> per-doc
    bucket counts (one doc-keyed partial agg), inner-join the 29-row
    broadcast weight table, one exact integer dot DIV token count. The
    train->freeze->deploy-as-integer-arithmetic path is how a curation
    classifier actually ships: training is float and iterative
    (logreg_train_quality), inference is a deterministic scan.
    """
    spark = docs.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            sorted(FROZEN_QUALITY_WEIGHTS_U6.items()), "bucket long, w_u6 long"
        )
    )
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        % FROZEN_QUALITY_DIM
    )
    counts = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .filter(F.col("token") != "")
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        counts.join(wdf, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("w_u6"), F.lit(0)) * F.col("n")).alias("dot"),
            F.sum("n").alias("n_tokens"),
        )
        .select(
            id_col,
            (
                F.expr("dot DIV n_tokens") + F.lit(FROZEN_QUALITY_BIAS_U6)
            ).alias("score_u6"),
        )
        .withColumn("keep", (F.col("score_u6") > 0).cast("boolean"))
    )
    return scored
