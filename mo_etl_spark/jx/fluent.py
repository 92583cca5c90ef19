"""Fluent Python query surface (SURVEY.md §3.2 user surface 1):
``Q(df).where(...).groupby(...).select(...).sort(...).df()``.

A thin immutable builder over the jx query dict — the reference's
users compose jx dicts or mo-streams pipelines (u); this gives the
same ergonomics while compiling through the one jx_run path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from mo_etl_spark.jx.formats import format_result
from mo_etl_spark.jx.query import jx_run


class Q:
    def __init__(
        self,
        frm: DataFrame | str,
        spark: SparkSession | None = None,
        tables: dict[str, DataFrame] | None = None,
        _query: dict | None = None,
    ):
        self._frm = frm
        self._spark = spark
        self._tables = tables
        self._query: dict[str, Any] = dict(_query or {})

    def _with(self, **kv) -> "Q":
        q = dict(self._query)
        q.update(kv)
        return Q(self._frm, self._spark, self._tables, q)

    def where(self, expr: Any) -> "Q":
        old = self._query.get("where")
        new = {"and": [old, expr]} if old is not None else expr
        return self._with(where=new)

    def select(self, *selects: Any) -> "Q":
        return self._with(select=list(selects))

    def groupby(self, *cols: Any) -> "Q":
        return self._with(groupby=list(cols))

    def edges(self, *edges: Any) -> "Q":
        return self._with(edges=list(edges))

    def window(self, **spec: Any) -> "Q":
        wins = list(self._query.get("window", []))
        wins.append(spec)
        return self._with(window=wins)

    def sort(self, *sorts: Any) -> "Q":
        return self._with(sort=list(sorts))

    def limit(self, n: int) -> "Q":
        return self._with(limit=n)

    def format(self, fmt: str) -> "Q":
        return self._with(format=fmt)

    # --- terminals ---

    def query(self) -> dict:
        return {"from": self._frm, **self._query}

    def df(self) -> DataFrame:
        """Compile to the lazy DataFrame (no execution)."""
        return jx_run(self.query(), spark=self._spark, tables=self._tables)

    def run(self) -> Any:
        """Execute and format (list/table/cube; default list)."""
        return format_result(self.df(), self.query())
