"""Scale-path LLM-data algorithms: MinHash/SimHash near-dup, LSH/IVF/IVF-PQ
ANN, k-means + product quantization, multimodal column plumbing."""

from etl_covid19_brasil_spark.llm.ann import (
    ivf_topk,
    ivfpq_topk,
    kmeans_lloyd,
    lsh_topk,
    pq_encode,
    pq_train,
)
from etl_covid19_brasil_spark.llm.minhash import minhash_near_dup_pairs
from etl_covid19_brasil_spark.llm.similarity import brute_force_topk
from etl_covid19_brasil_spark.llm.simhash import simhash_near_dup_pairs

__all__ = [
    "brute_force_topk",
    "ivf_topk",
    "ivfpq_topk",
    "kmeans_lloyd",
    "lsh_topk",
    "minhash_near_dup_pairs",
    "pq_encode",
    "pq_train",
    "simhash_near_dup_pairs",
]
