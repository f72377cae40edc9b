"""Local differential-check harness mimicking the driver's correctness
gate (SURVEY.md §5 layer 1): run a registered Spark query and its DuckDB
oracle SQL over the same parquet tables, compare row count, column names,
and order-insensitive values.

Used by tests/test_oracle.py so every registered query is verified the
day it lands, at sf0.001 (fast) and sf0.01 (the driver's gate SF).
"""

from __future__ import annotations

from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from etl_covid19_brasil_spark.io import TPCH_TABLES
from etl_covid19_brasil_spark.registry import QuerySpec


@dataclass
class DiffResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif s.dtype == object:
            import datetime

            sample = s.dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date) and not isinstance(sample.iloc[0], datetime.datetime):
                out[c] = pd.to_datetime(s).astype("datetime64[us]")
            elif len(sample) and isinstance(sample.iloc[0], (list, tuple)) or (
                len(sample) and hasattr(sample.iloc[0], "__array__") and not isinstance(sample.iloc[0], str)
            ):
                out[c] = s.map(lambda v: None if v is None else str(list(v)))
            else:
                out[c] = s.where(s.notna(), None)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        # Dtype-strict: the driver hashes values dtype-sensitively, so an
        # int64 Spark column vs a float64 oracle column (DuckDB HUGEINT
        # SUM -> pandas float) is a driver hash-FAIL even when every value
        # is equal. r02-r04 shipped 10 such reds while this harness
        # coerced them equal — never compare int to float as a pass.
        if pd.api.types.is_integer_dtype(sa) != pd.api.types.is_integer_dtype(sb) or (
            pd.api.types.is_float_dtype(sa) != pd.api.types.is_float_dtype(sb)
        ):
            return False, (
                f"dtype mismatch in column {c!r}: spark={sa.dtype} "
                f"oracle={sb.dtype} (driver hash is dtype-strict; "
                f"CAST the oracle side)"
            )
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            eq = (sa.astype("float64").fillna(float("nan")).values == sb.astype("float64").fillna(float("nan")).values) | (
                sa.isna().values & sb.isna().values
            )
        else:
            eq = (sa.values == sb.values) | (sa.isna().values & sb.isna().values)
        if not eq.all():
            # eq can be a pandas nullable BooleanArray (no .nonzero);
            # densify via numpy first.
            import numpy as np

            idx = np.flatnonzero(~np.asarray(eq, dtype=bool))[:3]
            samples = [f"row {i}: spark={sa.iloc[i]!r} oracle={sb.iloc[i]!r}" for i in idx]
            n_bad = int((~eq).sum())
            return False, f"value mismatch in column {c!r} ({n_bad} rows), e.g. " + "; ".join(samples)
    return True, "ok"


def check_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    spec: QuerySpec,
    sf_dir: str,
) -> DiffResult:
    sdf = spec.spark(spark, sf_dir)
    # Scalar-only output contract (r04 lesson; enforced here since r17
    # so the oracle sweep pins it per query at zero extra cost — the
    # dedicated all-408-builds schema test paid ~4.5 min re-running
    # every eager construction just to read schemas): the driver's
    # result canonicalizer sorts every column with pandas sort_values,
    # and array/map cells are unhashable there — they crash even
    # rows-only checks.
    from pyspark.sql.types import ArrayType, MapType

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    if bad:
        return DiffResult(
            spec.name,
            False,
            f"array/map output columns {bad} break the driver canonicalizer",
            0,
            -1,
        )
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only contract: query must run and produce a stable schema.
        return DiffResult(spec.name, True, f"rows-only: {len(spark_pdf)} rows", len(spark_pdf), -1)
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    ok, detail = compare_frames(spark_pdf, oracle_pdf)
    return DiffResult(spec.name, ok, detail, len(spark_pdf), len(oracle_pdf))
