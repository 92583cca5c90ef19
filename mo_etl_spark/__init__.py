"""mo_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the klahnakoski/mo-etl (mo-*/jx-*)
ecosystem.

Architecture (SURVEY.md §3.2): jx JSON queries / fluent API / SQL are
normalized to a small IR and compiled to lazy PySpark DataFrame plans;
Catalyst owns optimization and physical execution. No RDDs, no custom
Catalyst rules — every operator is a ``DataFrame -> DataFrame`` pure
function designed for 100 TB scale (broadcast-able dims, no collect()
in operator paths, vectorized built-ins over Python UDFs).

Reference provenance: the reference snapshot at /root/reference is an
EMPTY tree (verified; SURVEY.md §0) — capability citations in
docstrings therefore name the public mo-*/jx-* module paths (tagged
(u) in SURVEY.md) instead of file:line into the snapshot.
"""

from mo_etl_spark.session import get_spark, prepare
from mo_etl_spark.tables import TABLES, load_table, load_tables, register_views

__version__ = "0.1.0"

__all__ = [
    "TABLES",
    "get_spark",
    "load_table",
    "load_tables",
    "prepare",
    "register_views",
    "__version__",
]
