"""Skew-mitigated joins via key salting (SURVEY.md §4 scale posture).

A shuffle join hashes rows by key; at 100 TB a hot key (one customer with
10% of all orders) lands an entire partition's worth of rows on one task
and the stage runs at the speed of that straggler. AQE's skew-join split
(spark.sql.adaptive.skewJoin.enabled, on in get_spark) handles this at
runtime for sort-merge joins; salting is the *plan-level* tool that also
works where AQE cannot see the skew (e.g., aggregation-after-join shapes,
or non-AQE engines), and it is exact:

- fact side: append a deterministic pseudo-random salt in [0, factor)
  derived from the row (xxhash64 of ordering columns), splitting each hot
  key across ``factor`` shuffle partitions;
- dim side: replicate each row once per salt value (an explode over a
  literal range — map-side, no shuffle of its own);
- join on (key, salt): same result set as the unsalted join, but the
  hottest key's rows are now spread over ``factor`` tasks.

Cost: the dim side shuffles ``factor``x its size — chose ``factor`` ~ the
ratio of the hottest key to the average, and only salt when a key exceeds
the skew threshold (the helper salts unconditionally; callers gate it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    factor: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON on`` with the fact side's hot keys spread
    over ``factor`` salt buckets. Exact: produces the same rows as the
    plain join for inner/left joins (dim-side key multiplicity must be 1,
    the normal dim-table contract — otherwise replication would double
    matches within one salt bucket).

    ``salt_source`` defaults to a hash of the whole fact row; pass a cheap
    stable column (e.g. the fact's primary key) to avoid hashing wide rows.
    """
    if how not in ("inner", "left"):
        raise ValueError("salting preserves semantics for inner/left joins only")
    src = salt_source if salt_source is not None else F.xxhash64(*fact.columns)
    salted_fact = fact.withColumn("__salt", F.pmod(src, F.lit(factor)).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")
