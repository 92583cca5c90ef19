"""jx — JSON Query Expressions, Spark-native.

The reference ecosystem's query language (u, jx_base / jx_python —
SURVEY.md §0 provenance legend: the /root/reference snapshot is empty,
so citations name public module paths, not file:line).  This package
compiles jx expression dicts to ``pyspark.sql.Column`` and jx query
dicts to lazy DataFrame plans; Catalyst owns everything downstream.
"""

from mo_etl_spark.jx.expressions import jx_expr
from mo_etl_spark.jx.fluent import Q
from mo_etl_spark.jx.formats import format_result
from mo_etl_spark.jx.query import jx_run

__all__ = ["Q", "format_result", "jx_expr", "jx_run"]
