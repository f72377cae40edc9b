"""Custom operators the DataFrame API lacks as single built-ins.

Each is a *composition* of built-in ops chosen for its shuffle profile at
scale (SURVEY.md §2.3); none drops to Python row-at-a-time code.
"""

from etl_covid19_brasil_spark.operators.bloom import bloom_semi_join, build_bloom
from etl_covid19_brasil_spark.operators.bucketing import bucketed_join, write_bucketed
from etl_covid19_brasil_spark.operators.concomp import connected_components
from etl_covid19_brasil_spark.operators.joins import asof_join, range_join
from etl_covid19_brasil_spark.operators.skew import salted_join
from etl_covid19_brasil_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "asof_join",
    "bloom_semi_join",
    "bucketed_join",
    "build_bloom",
    "connected_components",
    "range_join",
    "salted_join",
    "top_k",
    "top_k_per_group",
    "write_bucketed",
]
