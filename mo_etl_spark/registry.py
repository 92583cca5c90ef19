"""Query registry: the driver-facing contract surface.

Every implemented operator (SURVEY.md §2) registers one or more named
queries here; ``__spark_entry__.py`` exports them.  A query is a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle SQL string with IDENTICAL output column names — the
driver hash-compares the two at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a driver-contract query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effect: suite modules populate QUERIES on import
    import mo_etl_spark.suites  # noqa: F401

    return QUERIES
