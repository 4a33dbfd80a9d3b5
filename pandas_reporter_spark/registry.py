"""Query registry: the driver-verified operator inventory (SURVEY §2).

Each operator from SURVEY.md §2 registers a `(spark, sf_dir) -> DataFrame`
callable and, when SQL-expressible, the equivalent DuckDB oracle SQL.
`__spark_entry__.py` re-exports QUERIES/ORACLES verbatim.

Naming discipline (driver hashes values under sorted column names):
alias every computed column identically in the Spark plan and the SQL.

Float discipline: the driver compares order-insensitive value hashes, so
double aggregates must be bit-identical between Spark and DuckDB. Sums
of doubles are accumulation-order dependent; both engines therefore sum
through exact DECIMAL casts (see tables.dsum) and cast back to double.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-verified query; `oracle=None` -> rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Operator modules whose import registers their queries. Every name
#: listed here MUST exist — a missing module is a hard error (round 1
#: died on phantom imports; never again).
_OPERATOR_MODULES = (
    "pandas_reporter_spark.operators.census_queries",
    "pandas_reporter_spark.operators.relational",
    "pandas_reporter_spark.operators.dedup",
    "pandas_reporter_spark.operators.text",
    "pandas_reporter_spark.operators.similarity",
    "pandas_reporter_spark.operators.events",
    "pandas_reporter_spark.operators.multimodal",
    "pandas_reporter_spark.operators.scale",
    "pandas_reporter_spark.sources.queries",
)


def load_all() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import importlib

    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
