"""Dynamic-schema JSON shredding (SURVEY.md §1.1: jx-sqlite's dynamic
"snowflake" schema (u, jx_sqlite) — a new key appearing in the data
becomes a new column).

Spark mapping: schemas are static per plan, so evolution is a two-step
pipeline — a bounded DISCOVERY pass over the corpus finds the key set
(a driver-side schema decision, exactly like spark.read.json's
inference pass; the collected result is the key list, never data),
then the SHRED projection extracts one typed column per key.  At
100 TB the discovery pass is a cheap distinct over exploded key names
(map-side combined), run once and cached with the table's metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_json_keys(df: DataFrame, col: str) -> list[str]:
    """Distinct JSON object keys across the corpus, sorted.  The one
    deliberate driver-side action in this module: its output is schema
    (a handful of key names), not data."""
    rows = (
        df.where(F.col(col).isNotNull())
        .select(F.explode(F.json_object_keys(F.col(col))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


import re as _re


def _json_path(key: str) -> str:
    """Bracket-quote the key so dots/brackets/dollars inside it address
    the LITERAL top-level key instead of being parsed as path syntax.
    Keys containing a single quote can't be addressed by Spark's
    get_json_object path grammar at all — reject loudly."""
    if "'" in key:
        raise ValueError(f"JSON key not addressable by get_json_object: {key!r}")
    return f"$['{key}']"


def _safe_alias(col: str, key: str) -> str:
    return f"{col}_" + _re.sub(r"\W", "_", key)


def shred_json(df: DataFrame, col: str, keys: list[str] | None = None) -> DataFrame:
    """Project one column per JSON key (``<col>_<key>`` with non-word
    characters underscored, string-typed — callers cast where the type
    is known).  ``keys=None`` runs discovery first: the new-key ->
    new-column evolution step."""
    if keys is None:
        keys = discover_json_keys(df, col)
    return df.select(
        "*",
        *[
            F.get_json_object(F.col(col), _json_path(k)).alias(_safe_alias(col, k))
            for k in keys
        ],
    )
