"""jx result formats (u, jx_python formatters / ActiveData query
docs): every query can return ``list`` (row dicts), ``table``
(header + rows), or ``cube`` (dense per-select matrices dimensioned by
edges).  The DataFrame stays the canonical lazy result — these
formatters materialize ONLY at the API edge (the one sanctioned
collect point, SURVEY.md §4.3)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def format_list(df: DataFrame) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.collect()]


def format_table(df: DataFrame) -> dict[str, Any]:
    rows = df.collect()
    return {"header": list(df.columns), "data": [list(r) for r in rows]}


def format_cube(
    df: DataFrame, edges: list[str], selects: list[str]
) -> dict[str, Any]:
    """Dense cube: one nested matrix per select, dimensioned by the
    edge domains in first-seen sorted order (u, jx cube semantics:
    complete domains incl. empty parts — produced upstream by the
    edges compiler, so every (edge-tuple) exists exactly once)."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    domains = []
    for e in edges:
        vals = sorted({r[e] for r in rows}, key=lambda v: (v is None, str(v)))
        domains.append(vals)
    index = {tuple(r[e] for e in edges): r for r in rows}

    def build(select: str, dims: list[list[Any]], prefix: tuple) -> Any:
        if not dims:
            r = index.get(prefix)
            return None if r is None else r[select]
        return [build(select, dims[1:], prefix + (v,)) for v in dims[0]]

    return {
        "edges": [
            {"name": e, "domain": {"type": "set", "partitions": domains[i]}}
            for i, e in enumerate(edges)
        ],
        "data": {s: build(s, domains, ()) for s in selects},
    }


def format_result(df: DataFrame, query: dict) -> Any:
    """Dispatch on the query's ``format`` clause (default: list)."""
    fmt = query.get("format", "list")
    if fmt == "list":
        return format_list(df)
    if fmt == "table":
        return format_table(df)
    if fmt == "cube":
        raw = query.get("edges") or query.get("groupby") or []
        if not isinstance(raw, list):
            raw = [raw]  # jx shorthand: scalar groupby/edges
        edges = [e if isinstance(e, str) else e["name"] for e in raw]
        selects = [c for c in df.columns if c not in edges]
        return format_cube(df, edges, selects)
    raise ValueError(f"unknown format: {fmt!r}")
