"""Query registry: single source of truth for the operator inventory.

Every operator from SURVEY.md §2 is declared exactly once as a
:class:`QuerySpec` — a named Spark query builder plus (where expressible)
the equivalent ANSI SQL that DuckDB runs as the correctness oracle. The
driver contract (``__spark_entry__.py``) and the local differential test
harness (``tests/test_oracle.py``) both read this registry, so an operator
"lands" the moment its spec is registered.

Determinism policy for doubles
------------------------------
The driver hash-compares values, so floating-point aggregates must be
*bit-identical* between Spark and DuckDB. Summation order differs between
engines (partition-parallel vs sequential), so plain ``SUM(double)`` is
not reproducible. House style: the test data's doubles are 2-decimal
money values, so aggregate them as *exact integer cents* —

    Spark : F.sum(F.round(col * 100).cast("long")) / 100.0
    DuckDB: SUM(CAST(ROUND(col * 100) AS BIGINT)) / 100.0

``round(x*100)`` lands on the same integer in both engines (the scaled
value is within 1e-9 of an integer, never at a rounding boundary), int64
addition is exact and order-insensitive, and the final division by the
double literal 100.0 is one identical IEEE op. Helpers ``msum``/``mavg``
(Spark) and ``o_msum``/``o_mavg`` (SQL fragments) implement this.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from etl_covid19_brasil_spark.io import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => rows-only check (approx/streaming/LSH ops)
    section: str  # SURVEY.md §2 subsection, e.g. "2.4 aggregations"
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    added: int = 0  # build round the query was registered in; within the
    # never-driver-sampled tier, later additions queue BEHIND earlier
    # ones so a new query never displaces long-waiting verification debt
    # from the driver's 50-per-round sample prefix (VERDICT r8 item 1)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    section: str,
    doc: str = "",
    tags: tuple[str, ...] = (),
    added: int = 0,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a Spark query builder with its oracle SQL."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, section=section, doc=doc or (fn.__doc__ or ""), tags=tags, added=added)
        return fn

    return wrap


def _driver_check_history(root=None) -> tuple[dict[str, int], set[str], dict[str, int]]:
    """Per-query driver-check count, currently-red set, and the round
    number of each query's LATEST driver row.

    The driver verifies an insertion-order *prefix* of the registry each
    round (round 1 covered only the first 50 of 114 entries). To get every
    operator a driver-green row across rounds, :func:`all_specs` orders
    queries so each round's prefix lands on the queries that need a row
    most. Reads ``CORRECTNESS_r*.json`` at the repo root; missing/corrupt
    files simply contribute nothing.

    A query is "red" when its *most recent* driver row has any of
    rows/schema/hash mismatched or an error — those must be re-verified
    before spending prefix slots on never-checked queries, otherwise a fix
    would wait several rounds for its green row (least-checked-first alone
    queues once-checked-red behind everything never checked).
    """
    import json
    from pathlib import Path

    counts: dict[str, int] = {}
    latest_ok: dict[str, bool] = {}
    last_round: dict[str, int] = {}
    root = Path(root) if root is not None else Path(__file__).resolve().parent.parent
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
            rnd = int(path.stem.split("_r")[-1])
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            counts[name] = counts.get(name, 0) + 1
            last_round[name] = max(last_round.get(name, 0), rnd)
            if isinstance(row, dict):
                err = row.get("err")
                # "no_oracle" with rows delivered is the rows-only
                # contract PASSING, not a failure — treating it as red
                # would pin the 8 rows-only queries to the top of every
                # round's prefix forever. "Delivered" means > 0 rows: a
                # rows-only query returning an empty frame verified
                # nothing (the r8 zero-row-audit lesson applied to this
                # gate), so it must count red and re-earn its slot.
                spark_rows = row.get("spark_rows")
                err_ok = err is None or (
                    err == "no_oracle"
                    and isinstance(spark_rows, int)
                    and spark_rows > 0
                )
                ok = (
                    err_ok
                    and row.get("rows_match", True) is not False
                    and row.get("schema_match", True) is not False
                    and row.get("hash_match", True) is not False
                )
                latest_ok[name] = ok  # later files overwrite: latest round wins
    red = {name for name, ok in latest_ok.items() if not ok}
    return counts, red, last_round


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    checked, red, last_round = _driver_check_history()
    order = {name: i for i, name in enumerate(_REGISTRY)}
    # Priority tiers: (0) red on the latest driver round — a fix needs its
    # green row next round; (1) STALEST-first: the round of each query's
    # latest driver row, ascending, so queries whose green predates recent
    # shared-code changes (e.g. the r5 load-path fix) re-earn a row before
    # freshly-checked ones; (2) least-checked-first; then oracled queries
    # before rows-only ones (a hash-green row is worth more than a
    # rows-only row), then stable registration order.
    return {
        name: _REGISTRY[name]
        for name in sorted(
            _REGISTRY,
            key=lambda n: (
                n not in red,
                last_round.get(n, 0),
                checked.get(n, 0),
                _REGISTRY[n].added,
                _REGISTRY[n].oracle is None,
                order[n],
            ),
        )
    }


def all_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_specs().items()}


def all_oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import the query modules (they self-register via @query)."""
    global _loaded
    if _loaded:
        return
    import etl_covid19_brasil_spark.queries.io_roundtrip  # noqa: F401
    import etl_covid19_brasil_spark.queries.relational  # noqa: F401
    import etl_covid19_brasil_spark.queries.windows  # noqa: F401
    import etl_covid19_brasil_spark.queries.functions  # noqa: F401
    import etl_covid19_brasil_spark.queries.llm  # noqa: F401
    import etl_covid19_brasil_spark.queries.etl_parity  # noqa: F401
    import etl_covid19_brasil_spark.queries.streaming  # noqa: F401
    import etl_covid19_brasil_spark.queries.quality  # noqa: F401
    import etl_covid19_brasil_spark.queries.analytics  # noqa: F401
    import etl_covid19_brasil_spark.queries.tpch_shapes  # noqa: F401

    _loaded = True


# ---------------------------------------------------------------------------
# Shared helpers for query modules
# ---------------------------------------------------------------------------


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand test-table loader."""
    return load_table(spark, sf_dir, name)


def cents(col: Column | str) -> Column:
    """Exact integer-cents representation of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def msum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact money sum (see module docstring)."""
    return (F.sum(cents(col)).cast("double") / F.lit(100.0)).alias(alias)


def mavg(col: Column | str, alias: str) -> Column:
    """Deterministic money average: exact cents sum, two identical IEEE
    double divisions (by 100.0, then by the count) in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(cents(c)).cast("double") / F.lit(100.0) / F.count(c)).alias(alias)


def o_cents(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


def o_msum(expr: str, alias: str) -> str:
    return f"CAST(SUM({o_cents(expr)}) AS DOUBLE) / 100.0 AS {alias}"


def o_mavg(expr: str, alias: str) -> str:
    return f"CAST(SUM({o_cents(expr)}) AS DOUBLE) / 100.0 / COUNT({expr}) AS {alias}"
