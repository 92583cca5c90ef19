"""jx query dict -> lazy DataFrame plan.

Capability parity with the reference's query runner (u,
jx_python/jx.py ``run()`` — normalize clauses, then interpret over doc
lists; and jx_sqlite Container.query — translate to SQL).  Here every
clause compiles to DataFrame operations so Catalyst plans the physical
execution: filter -> where, groupby -> hash agg, edges -> agg + domain
left-join (complete domains incl. empty parts), window -> Window spec,
sort/limit -> orderBy/limit.

Clauses (u, ActiveData jx query docs):
    {"from": tbl | tbl.nested_path, "where": expr,
     "select": v | [v...] | {"name","value","aggregate","percentile"},
     "groupby": [...], "edges": [... {"domain": {...}}],
     "window": [{"name","value","edges","sort","aggregate","range"}],
     "sort": [...], "limit": n, "format": "list"|"table"|"cube"}
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mo_etl_spark.jx.expressions import jx_expr

# --- aggregate registry (u, jx aggregates; SURVEY.md §2.4) ------------


def _agg_count(c: Column) -> Column:
    return F.count(c)


def _agg_cardinality(c: Column) -> Column:
    return F.countDistinct(c)


def _agg_union(c: Column) -> Column:
    return F.array_sort(F.collect_set(c))  # sorted for determinism (§4.3)


def _agg_list(c: Column) -> Column:
    return F.array_sort(F.collect_list(c))


def _agg_stats(c: Column) -> Column:
    # one-pass multi-agg struct (u, mo_math.stats.Stats z-moments)
    return F.struct(
        F.count(c).alias("count"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.var_samp(c).alias("var"),
        F.stddev_samp(c).alias("std"),
    )


AGGS = {
    "count": _agg_count,
    "sum": F.sum,
    "add": F.sum,
    "min": F.min,
    "minimum": F.min,
    "max": F.max,
    "maximum": F.max,
    "avg": F.avg,
    "average": F.avg,
    "mean": F.avg,
    "median": F.median,
    "cardinality": _agg_cardinality,
    "union": _agg_union,
    "list": _agg_list,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "one": lambda c: F.first(c, ignorenulls=True),
    "stats": _agg_stats,
    "var": F.var_samp,
    "variance": F.var_samp,
    "std": F.stddev_samp,
    "stddev": F.stddev_samp,
}


def _norm_selects(select: Any) -> list[dict]:
    if select is None:
        return []
    if not isinstance(select, list):
        select = [select]
    out = []
    for s in select:
        if isinstance(s, str):
            out.append({"name": s.replace(".", "_") if s != "." else "row", "value": s})
        else:
            d = dict(s)
            if "name" not in d:
                v = d.get("value", ".")
                d["name"] = v.replace(".", "_") if isinstance(v, str) else "value"
            out.append(d)
    return out


def _norm_edges(edges: Any) -> list[dict]:
    if edges is None:
        return []
    if not isinstance(edges, list):
        edges = [edges]
    out = []
    for e in edges:
        if isinstance(e, str):
            out.append({"name": e.replace(".", "_"), "value": e})
        else:
            d = dict(e)
            if "name" not in d:
                # only derivable from a string-path value; expression
                # edges must name themselves
                v = d.get("value", "edge")
                if not isinstance(v, str):
                    raise ValueError(f"edge with expression value needs a name: {e!r}")
                d["name"] = v.replace(".", "_")
            out.append(d)
    return out


def _norm_sorts(sort: Any) -> list[dict]:
    if sort is None:
        return []
    if not isinstance(sort, list):
        sort = [sort]
    out = []
    for s in sort:
        if isinstance(s, str):
            out.append({"value": s, "sort": 1})
        else:
            out.append({"value": s.get("value") or s.get("field"), "sort": s.get("sort", 1)})
    return out


def _sort_cols(sorts: list[dict], df: DataFrame | None) -> list[Column]:
    cols = []
    for s in sorts:
        c = jx_expr(s["value"], df)
        # jx: nulls are "least" — first ascending, last descending (u jx sort)
        cols.append(c.asc_nulls_first() if s["sort"] >= 0 else c.desc_nulls_last())
    return cols


def _agg_col(s: dict, df: DataFrame | None) -> Column:
    agg = s["aggregate"]
    value = s.get("value", ".")
    if agg == "count" and value == ".":
        col = F.count(F.lit(1))
    elif agg == "percentile":
        col = F.percentile(jx_expr(value, df), F.lit(float(s.get("percentile", 0.5))))
    elif agg in AGGS:
        col = AGGS[agg](jx_expr(value, df))
    else:
        raise ValueError(f"unknown aggregate: {agg!r}")
    if s.get("default") is not None:
        col = F.coalesce(col, F.lit(s["default"]))
    return col.alias(s["name"])


def _resolve_from(frm: Any, spark: SparkSession | None, tables: dict | None) -> DataFrame:
    """Resolve the ``from`` clause, unnesting deep paths.

    ``"tbl.nested.path"`` explodes array-of-struct columns along the
    path, keeping parent columns visible (u, jx nested-object-array
    queries; Spark: explode_outer keeps Catalyst visibility — no UDF).
    """
    if isinstance(frm, DataFrame):
        return frm
    if not isinstance(frm, str):
        raise ValueError(f"bad from: {frm!r}")
    parts = frm.split(".")
    df = None
    # longest table-name prefix wins (table names may not contain dots here)
    name, rest = parts[0], parts[1:]
    if tables and name in tables:
        df = tables[name]
    elif spark is not None:
        df = spark.table(name)
    else:
        raise ValueError(f"unknown table: {name!r}")
    for seg in rest:
        field_type = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))[seg]
        if isinstance(field_type, T.ArrayType):
            others = [c for c in df.columns if c != seg]
            df = df.select(*others, F.explode_outer(seg).alias(seg))
            if isinstance(field_type.elementType, T.StructType):
                inner = [f"{seg}.{f.name}" for f in field_type.elementType.fields]
                df = df.select(*others, *inner)
        elif isinstance(field_type, T.StructType):
            others = [c for c in df.columns if c != seg]
            df = df.select(*others, f"{seg}.*")
        else:
            raise ValueError(f"cannot unnest scalar path: {seg!r}")
    return df


# --- edges domains (u, jx_base/domains.py; SURVEY.md §2.4) ------------


def _edge_key_and_domain(
    e: dict, df: DataFrame, spark: SparkSession
) -> tuple[Column, DataFrame]:
    """Return (bucket key column over df, one-column domain DataFrame).

    Domain types: default (observed distinct values), set (explicit
    partitions), time / range / duration (generated buckets — the
    complete domain INCLUDING empty parts, which plain groupBy cannot
    produce; generated with F.sequence, joined back with a left join).
    """
    name = e["name"]
    dom = e.get("domain", {}) or {}
    dtype = dom.get("type", "default")
    allow_nulls = bool(e.get("allowNulls", dom.get("allowNulls", False)))
    value = jx_expr(e.get("value", name), df)

    if dtype == "default":
        key = value
        domain_df = df.select(key.alias(name)).distinct()
    elif dtype == "set":
        parts = dom["partitions"]
        # out-of-set values route to the null part (only surfaced when
        # allowNulls adds that part to the domain)
        key = F.when(value.isin(*parts), value)
        domain_df = spark.createDataFrame([(p,) for p in parts], [name])
    elif dtype == "boolean":
        # (u, jx_base/domains.py boolean domain): exactly two parts
        key = value.cast("boolean")
        domain_df = spark.sql(f"SELECT explode(array(true, false)) AS {name}")
    elif dtype in ("time", "range", "duration"):
        lo, hi = dom["min"], dom["max"]
        interval = dom["interval"]
        if dtype == "time":
            unit = interval if isinstance(interval, str) else "day"
            key = F.date_trunc(unit, value)  # calendar-aware incl. month/year (mo_times (u))
            key = F.when(
                (value >= F.lit(lo).cast("timestamp"))
                & (value < F.lit(hi).cast("timestamp")),
                key,
            )
            # Spark interval literals have no 'quarter' unit even though
            # date_trunc does — generate quarter domains with 3-month steps
            step = {"quarter": "3 month"}.get(unit, f"1 {unit}")
            domain_df = spark.sql(
                f"SELECT explode(sequence(timestamp'{lo}', timestamp'{hi}',"
                f" interval {step})) AS {name}"
            ).where(F.col(name) < F.lit(hi).cast("timestamp"))
        else:
            step = float(interval)
            key = F.when(
                (value >= lo) & (value < hi), F.floor((value - lo) / step) * step + lo
            )
            domain_df = spark.sql(
                f"SELECT explode(sequence(0, cast(ceil(({hi}-{lo})/{step}) as int)-1)) AS i"
            ).select((F.col("i") * step + lo).alias(name))
    else:
        raise ValueError(f"unknown domain type: {dtype!r}")
    if allow_nulls and dtype != "default":
        # jx cubes carry an explicit null part: missing / out-of-domain
        # values land on a NULL-keyed row (u, jx_base/domains.py)
        dt = dict(domain_df.dtypes)[name]
        null_row = spark.range(1).select(F.lit(None).cast(dt).alias(name))
        domain_df = domain_df.unionByName(null_row)
    return key.alias(name), domain_df, allow_nulls


def jx_run(
    query: dict,
    spark: SparkSession | None = None,
    tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run a jx query dict, returning a lazy DataFrame.

    Mirrors jx_python.jx.run's clause order (u): from -> where ->
    (groupby | edges | select) -> window -> sort -> limit.
    """
    df = _resolve_from(query["from"], spark, tables)
    if spark is None and isinstance(query["from"], DataFrame):
        spark = query["from"].sparkSession

    where = query.get("where")
    if where is not None:
        df = df.where(F.coalesce(jx_expr(where, df), F.lit(False)))

    selects = _norm_selects(query.get("select"))
    groupby = _norm_edges(query.get("groupby"))
    edges = _norm_edges(query.get("edges"))
    windows = query.get("window") or []
    if windows and not isinstance(windows, list):
        windows = [windows]

    has_aggs = any("aggregate" in s for s in selects)

    if groupby or (has_aggs and not edges):
        keys = [jx_expr(g.get("value", g["name"]), df).alias(g["name"]) for g in groupby]
        aggs = [_agg_col(s, df) for s in selects if "aggregate" in s]
        if not aggs:  # groupby with no aggregate select -> distinct groups
            df = df.select(*keys).distinct()
        else:
            df = df.groupBy(*keys).agg(*aggs)
    elif edges:
        assert spark is not None, "edges queries need a SparkSession"
        keys, domains, nullable_edges = [], [], []
        for e in edges:
            k, dom, allow_nulls = _edge_key_and_domain(e, df, spark)
            keys.append(k)
            domains.append(dom)
            nullable_edges.append(allow_nulls)
        aggs = [_agg_col(s, df) for s in selects if "aggregate" in s]
        agg_df = df.groupBy(*keys).agg(*aggs)
        # complete domain: cross product of edge domains (small), left join
        domain_df = domains[0]
        for d in domains[1:]:
            domain_df = domain_df.crossJoin(d)
        names = [e["name"] for e in edges]
        if any(nullable_edges):
            # the null part only matches under null-safe equality
            cond = reduce(
                lambda a, b: a & b,
                [domain_df[n].eqNullSafe(agg_df[n]) for n in names],
            )
            df = domain_df.join(agg_df, cond, "left")
            for n in names:
                df = df.drop(agg_df[n])
        else:
            df = domain_df.join(agg_df, on=names, how="left")
        # counts default to 0 on empty parts (u, jx cube semantics)
        fills = {
            s["name"]: 0
            for s in selects
            if s.get("aggregate") == "count" and s.get("default") is None
        }
        if fills:
            df = df.fillna(fills)
    elif selects:
        # windows compute over source rows BEFORE projection (u,
        # jx_python/windows.py: window exprs reference source fields)
        for w in windows:
            df = _apply_window(df, w)
        cols = []
        for s in selects:
            v = s.get("value", ".")
            if v == ".":
                cols.append(F.struct(*[F.col(c) for c in df.columns]).alias(s["name"]))
            elif isinstance(v, dict) and "leaves" in v:
                cols.extend(_leaf_columns(df))
            else:
                cols.append(jx_expr(v, df).alias(s["name"]))
        cols.extend(F.col(w["name"]) for w in windows)
        df = df.select(*cols)
        windows = []

    for w in windows:  # agg paths: windows over the aggregated rows
        df = _apply_window(df, w)

    sorts = _norm_sorts(query.get("sort"))
    if sorts:
        df = df.orderBy(*_sort_cols(sorts, df))

    if query.get("limit") is not None:
        df = df.limit(int(query["limit"]))
    return df


def _leaf_columns(df: DataFrame) -> list[Column]:
    """Flatten all nested leaves to dotted top-level names (u,
    mo_dots.leaves; SURVEY.md §2.2 select_leaves)."""
    out: list[Column] = []

    def walk(prefix: str, dtype: T.DataType):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}.{f.name}" if prefix else f.name, f.dataType)
        else:
            out.append(F.col(prefix).alias(prefix))

    for f in df.schema.fields:
        walk(f.name, f.dataType)
    return out


def _apply_window(df: DataFrame, w: dict) -> DataFrame:
    """jx window clause (u, jx_python/windows.py): named column =
    aggregate over partition (edges) + sort, with optional row range."""
    name = w["name"]
    edges = w.get("edges") or []
    if not isinstance(edges, list):
        edges = [edges]
    sorts = _norm_sorts(w.get("sort"))
    spec = Window.partitionBy(*[jx_expr(e, df) for e in edges])
    if sorts:
        spec = spec.orderBy(*_sort_cols(sorts, df))

    agg = w.get("aggregate")
    # rank/rownum/lag/lead are ROW functions: Spark rejects an explicit
    # frame for lag/lead, and a frame is meaningless for the rank
    # family — only aggregate-valued windows get the jx `range` frame
    framed = agg not in ("rownum", "rank", "dense_rank", "percentile_rank", "lag", "lead")
    rng = w.get("range")
    if framed and rng is not None:
        lo = rng.get("min")
        hi = rng.get("max")
        spec = spec.rowsBetween(
            Window.unboundedPreceding if lo is None else int(lo),
            Window.unboundedFollowing if hi is None else int(hi),
        )
    elif framed and sorts:
        spec = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    value = w.get("value", ".")
    if agg == "rownum" or (agg is None and value == "rownum"):
        col = F.row_number().over(spec) - 1  # jx rownum is 0-based (u)
    elif agg == "rank":
        col = F.rank().over(spec)
    elif agg == "dense_rank":
        col = F.dense_rank().over(spec)
    elif agg == "percentile_rank":
        col = F.percent_rank().over(spec)
    elif agg in ("lag", "lead"):
        n = int(w.get("offset", 1))
        fn = F.lag if agg == "lag" else F.lead
        col = fn(jx_expr(value, df), n).over(spec)
    elif agg in AGGS:
        col = AGGS[agg](jx_expr(value, df)).over(spec)
    elif agg is None:
        col = jx_expr(value, df).over(spec)  # e.g. plain value w/ frame
    else:
        raise ValueError(f"unknown window aggregate: {agg!r}")
    return df.withColumn(name, col)
