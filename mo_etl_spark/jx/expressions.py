"""jx expression dict -> pyspark Column compiler.

Capability parity with the reference's expression language (u,
jx_base/expressions/ — ~150 small Expression classes, one module per
operator; interpreted row-at-a-time in jx_python).  Here each jx
operator compiles to built-in Column expressions, so the whole tree
stays inside Catalyst/WholeStageCodegen — no Python in the hot path.

Semantics deltas encoded per SURVEY.md §1.4 ("decisive operators"):

- ``and``/``or`` ignore missing operands (``or([Null, false, true]) ->
  true``; ``and([Null, true]) -> true``) — compiled with coalesce
  wrapping, not SQL 3-valued logic.
- ``eq``/``ne`` are null-safe (both-missing -> equal) -> ``<=>``.
- n-ary ``add``/``mult`` skip nulls; all-null -> null (mo_math (u)).
- division by zero -> Null (requires ANSI off; session.prepare()).
- ``missing`` treats empty string as missing when the operand is a
  string column (schema-aware when a DataFrame is supplied).

Expression forms:
- plain numbers / bools / None -> literals
- strings -> variable dot-paths (``"a.b.c"``; nested struct access)
- ``{"literal": v}`` -> literal (incl. strings and lists)
- ``{"op": [args...]}`` list form: args are sub-expressions
- ``{"op": {"var": const}}`` map form: key is a variable, value a
  literal (the jx shorthand, e.g. ``{"eq": {"a": 1, "b": 2}}`` -> AND)
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_string_col(df: DataFrame | None, path: str) -> bool:
    if df is None:
        return False
    field: Any = T.StructType(df.schema.fields)
    for part in path.split("."):
        if not isinstance(field, T.StructType):
            return False
        try:
            field = field[part].dataType
        except KeyError:
            return False
    return isinstance(field, T.StringType)


def _var(path: str) -> Column:
    return F.col(path)


def _lit(v: Any) -> Column:
    if isinstance(v, (list, tuple)):
        return F.array(*[_lit(x) for x in v])
    return F.lit(v)


def _pairs(arg: Any, df: DataFrame | None) -> list[tuple[Column, Column]]:
    """Map-form ``{"var": const}`` -> [(var_col, lit)] pairs."""
    return [(jx_expr(k, df), _lit(v)) for k, v in arg.items()]


def _binary(arg: Any, df: DataFrame | None) -> list[Column]:
    """Normalize list-form or single-pair map-form to operand Columns."""
    if isinstance(arg, dict):
        (k, v), *rest = list(arg.items())
        if rest:
            raise ValueError(f"binary op expects one pair, got {arg!r}")
        return [jx_expr(k, df), _lit(v)]
    if isinstance(arg, (list, tuple)):
        return [jx_expr(a, df) for a in arg]
    return [jx_expr(arg, df)]


def _nary_decisive(args: list[Column], combine, zero) -> Column:
    """Null-skipping n-ary op; all-null -> null (mo_math semantics (u))."""
    if not args:
        return F.lit(None)
    filled = [F.coalesce(a, F.lit(zero)) for a in args]
    total = reduce(combine, filled)
    all_null = reduce(lambda a, b: a & b, [a.isNull() for a in args])
    return F.when(all_null, F.lit(None)).otherwise(total)


# --- relative date parsing (mo_times capability (u): "today-7day") ----

_DUR_RE = re.compile(r"([+-])(\d*)(second|minute|hour|day|week|month|year)s?")
_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}


def parse_date(spec: Any) -> datetime:
    """Parse an absolute or relative jx date spec to a UTC datetime.

    Supports the mo_times relative grammar subset: ``now``, ``today``,
    ``eod``, ``tomorrow``, optionally followed by ``±N unit`` terms
    (``"today-7day"``, ``"now-1month"``).  Month/year arithmetic is
    calendar-aware, like mo_times Duration (u).
    """
    if isinstance(spec, (int, float)):  # unix seconds (jx Date is a unix float)
        return datetime.fromtimestamp(float(spec), tz=timezone.utc).replace(tzinfo=None)
    s = str(spec).strip().lower()
    now = datetime.utcnow()
    today = now.replace(hour=0, minute=0, second=0, microsecond=0)
    bases = {
        "now": now,
        "today": today,
        "eod": today + timedelta(days=1),
        "tomorrow": today + timedelta(days=1),
    }
    for name, base in bases.items():
        if s.startswith(name):
            t = base
            for sign, num, unit in _DUR_RE.findall(s[len(name) :]):
                n = int(num or 1) * (1 if sign == "+" else -1)
                if unit in _UNIT_SECONDS:
                    t = t + timedelta(seconds=n * _UNIT_SECONDS[unit])
                else:  # calendar month/year
                    months = n * (12 if unit == "year" else 1)
                    total = t.year * 12 + (t.month - 1) + months
                    y, m = divmod(total, 12)
                    import calendar

                    d = min(t.day, calendar.monthrange(y, m + 1)[1])
                    t = t.replace(year=y, month=m + 1, day=d)
            return t
    # absolute
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d", "%Y%m%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date: {spec!r}")


# --- operator implementations ----------------------------------------


def _op_and(arg, df):
    args = [jx_expr(a, df) for a in (arg if isinstance(arg, list) else [arg])]
    if not args:
        return F.lit(True)
    return reduce(lambda a, b: a & b, [F.coalesce(a, F.lit(True)) for a in args])


def _op_or(arg, df):
    args = [jx_expr(a, df) for a in (arg if isinstance(arg, list) else [arg])]
    if not args:
        return F.lit(False)
    return reduce(lambda a, b: a | b, [F.coalesce(a, F.lit(False)) for a in args])


def _op_eq(arg, df):
    if isinstance(arg, dict):
        conds = [a.eqNullSafe(b) for a, b in _pairs(arg, df)]
        return reduce(lambda x, y: x & y, conds)
    a, b = _binary(arg, df)
    return a.eqNullSafe(b)


def _op_ne(arg, df):
    return ~_op_eq(arg, df)


def _cmp(fn):
    def op(arg, df):
        a, b = _binary(arg, df)
        return fn(a, b)

    return op


def _op_missing(arg, df):
    path = arg if isinstance(arg, str) else None
    c = jx_expr(arg, df)
    cond = c.isNull()
    if path is not None and _is_string_col(df, path):
        cond = cond | (c == F.lit(""))  # ""-is-missing (SURVEY.md §1.4)
    return cond


def _op_in(arg, df):
    if isinstance(arg, dict):
        [(k, vals)] = list(arg.items())
        c, values = jx_expr(k, df), vals
    else:
        e, vals = arg
        c = jx_expr(e, df)
        values = vals.get("literal") if isinstance(vals, dict) else vals
    return F.coalesce(c.isin(*values), F.lit(False))  # missing -> false (decisive)


def _op_between(arg, df):
    # numeric/temporal between: {"between": {"x": [lo, hi]}} or list form
    if isinstance(arg, dict) and not {"prefix", "suffix"} & set(arg):
        [(k, (lo, hi))] = list(arg.items())
        return jx_expr(k, df).between(_lit(lo), _lit(hi))
    c, lo, hi = (jx_expr(a, df) for a in arg)
    return c.between(lo, hi)


def _op_string_between(arg, df):
    # substring between markers (u, jx_base BetweenOp string form):
    # {"string_between": {"v": x, "prefix": p, "suffix": s}}
    v = jx_expr(arg["v"], df)
    p, s = arg.get("prefix", ""), arg.get("suffix", "")
    pat = re.escape(p) + "(.*?)" + (re.escape(s) if s else "$")
    got = F.regexp_extract(v, pat, 1)
    return F.when(got == "", F.lit(None)).otherwise(got)


def _op_find(arg, df):
    if isinstance(arg, dict) and "find" not in arg:
        [(k, sub)] = list(arg.items())
        c, s = jx_expr(k, df), _lit(sub)
    else:
        c, s = _binary(arg, df)
    idx = F.instr(c, s)
    return F.when(idx > 0, idx - 1)  # 0-based; not-found -> Null (u jx FindOp)


def _op_concat(arg, df, separator=""):
    args = [jx_expr(a, df) for a in (arg if isinstance(arg, list) else [arg])]
    return F.concat_ws(separator, *args)  # skips missing (u jx ConcatOp)


def _op_left(arg, df):
    c, n = _binary(arg, df)
    return c.substr(F.lit(1), F.greatest(n, F.lit(0)))


def _op_right(arg, df):
    c, n = _binary(arg, df)
    n = F.greatest(n, F.lit(0))
    return c.substr(F.greatest(F.length(c) - n + 1, F.lit(1)), n)


def _op_not_left(arg, df):
    c, n = _binary(arg, df)
    return c.substr(F.greatest(n, F.lit(0)) + 1, F.length(c))


def _op_not_right(arg, df):
    c, n = _binary(arg, df)
    return c.substr(F.lit(1), F.greatest(F.length(c) - F.greatest(n, F.lit(0)), F.lit(0)))


def _op_case(arg, df):
    # list of {"when": c, "then": v} with optional trailing default expr
    whens = [a for a in arg if isinstance(a, dict) and "when" in a]
    default = next((a for a in arg if not (isinstance(a, dict) and "when" in a)), None)
    col = None
    for w in whens:
        cond = F.coalesce(jx_expr(w["when"], df), F.lit(False))
        then = jx_expr(w.get("then"), df)
        col = F.when(cond, then) if col is None else col.when(cond, then)
    if col is None:
        return jx_expr(default, df)
    return col.otherwise(jx_expr(default, df)) if default is not None else col


def _op_when(arg, df, then=None, els=None, **_):
    cond = F.coalesce(jx_expr(arg, df), F.lit(False))
    return F.when(cond, jx_expr(then, df)).otherwise(jx_expr(els, df))


def _op_floor(arg, df):
    if isinstance(arg, dict) or (isinstance(arg, list) and len(arg) == 2):
        x, m = _binary(arg, df)
        return F.floor(x / m) * m  # floor to multiple-of (u mo_math.floor)
    return F.floor(_binary(arg, df)[0])


def _op_round(arg, df):
    # decimal-places form; scale must be a literal int (Spark round())
    if isinstance(arg, dict):
        [(k, d)] = list(arg.items())
        return F.round(jx_expr(k, df), int(d))
    if isinstance(arg, list) and len(arg) == 2:
        return F.round(jx_expr(arg[0], df), int(arg[1]))
    return F.round(jx_expr(arg[0] if isinstance(arg, list) else arg, df), 0)


def _op_div(arg, df):
    a, b = _binary(arg, df)
    return a / b  # /0 -> Null with ANSI off (session.prepare)


def _op_sub(arg, df):
    a, b = _binary(arg, df)
    return a - b


def _op_mod(arg, df):
    a, b = _binary(arg, df)
    return F.pmod(a, b)  # jx mod is non-negative (u mo_math.mod)


def _op_pow(arg, df):
    a, b = _binary(arg, df)
    return F.pow(a, b)


def _unary(fn):
    def op(arg, df):
        return fn(jx_expr(arg if not isinstance(arg, list) else arg[0], df))

    return op


def _op_regex(arg, df):
    [(k, pat)] = list(arg.items()) if isinstance(arg, dict) else [tuple(arg)]
    c = jx_expr(k, df)
    return c.rlike(f"^(?:{pat})$")  # jx regex is a FULL match (u RegExpOp)


def _op_prefix(arg, df):
    a, b = _binary(arg, df)
    return a.startswith(b)


def _op_suffix(arg, df):
    a, b = _binary(arg, df)
    return a.endswith(b)


def _op_date(arg, df):
    return F.lit(parse_date(arg))  # constant-folded engine-side


_TMPL_RE = re.compile(r"\{\{([\w.]+)\}\}")


def _op_template(arg, df):
    """mo-logs ``{{var}}`` template expansion (u, mo_logs
    expand_template): literal text with dot-path holes, compiled to a
    concat of literals and string-cast columns; missing values render
    empty (the concat stays non-null)."""
    pattern = arg["pattern"] if isinstance(arg, dict) else str(arg)
    parts: list[Column] = []
    last = 0
    for m in _TMPL_RE.finditer(pattern):
        if m.start() > last:
            parts.append(F.lit(pattern[last : m.start()]))
        parts.append(F.coalesce(F.col(m.group(1)).cast("string"), F.lit("")))
        last = m.end()
    if last < len(pattern):
        parts.append(F.lit(pattern[last:]))
    return F.concat(*parts) if parts else F.lit("")


def _op_get_json(arg, df):
    # {"get_json": [doc_expr, {"literal": "$.path"}]} or {"get_json": {"var": "$.path"}}
    if isinstance(arg, dict):
        [(k, path)] = list(arg.items())
        c = jx_expr(k, df)
    else:
        e, p = arg
        c = jx_expr(e, df)
        path = p.get("literal") if isinstance(p, dict) else p
    return F.get_json_object(c, str(path))  # path must be a plain string


def _op_leaves(arg, df):
    raise ValueError("leaves is a projection op; use jx_run select")


OPS = {
    # boolean (decisive)
    "and": _op_and,
    "or": _op_or,
    "not": _unary(lambda c: ~c),
    # comparison
    "eq": _op_eq,
    "ne": _op_ne,
    "neq": _op_ne,
    "gt": _cmp(lambda a, b: a > b),
    "gte": _cmp(lambda a, b: a >= b),
    "lt": _cmp(lambda a, b: a < b),
    "lte": _cmp(lambda a, b: a <= b),
    "in": _op_in,
    "between": _op_between,
    "string_between": _op_string_between,
    # null handling
    "missing": _op_missing,
    "exists": lambda a, df: ~_op_missing(a, df),
    "coalesce": lambda a, df: F.coalesce(*[jx_expr(x, df) for x in a]),
    "when": None,  # handled specially (needs then/else keys)
    "case": _op_case,
    # math (decisive n-ary add/mult; binary sub/div/mod/pow)
    "add": lambda a, df: _nary_decisive([jx_expr(x, df) for x in a], lambda p, q: p + q, 0),
    "sum": lambda a, df: _nary_decisive([jx_expr(x, df) for x in a], lambda p, q: p + q, 0),
    "mult": lambda a, df: _nary_decisive([jx_expr(x, df) for x in a], lambda p, q: p * q, 1),
    "multiply": lambda a, df: _nary_decisive([jx_expr(x, df) for x in a], lambda p, q: p * q, 1),
    "sub": _op_sub,
    "subtract": _op_sub,
    "minus": _op_sub,
    "div": _op_div,
    "divide": _op_div,
    "mod": _op_mod,
    "pow": _op_pow,
    "power": _op_pow,
    "floor": _op_floor,
    "ceiling": _unary(F.ceil),
    "round": _op_round,
    "abs": _unary(F.abs),
    "sign": _unary(F.signum),
    "sqrt": _unary(F.sqrt),
    "exp": _unary(F.exp),
    "log": _unary(F.log),
    "log10": _unary(F.log10),
    "negate": _unary(lambda c: -c),
    # string
    "length": _unary(F.length),
    "lower": _unary(F.lower),
    "upper": _unary(F.upper),
    "trim": _unary(F.trim),
    "left": _op_left,
    "right": _op_right,
    "not_left": _op_not_left,
    "not_right": _op_not_right,
    "concat": _op_concat,
    "prefix": _op_prefix,
    "suffix": _op_suffix,
    "find": _op_find,
    "split": lambda a, df: F.split(*_binary(a, df)) if isinstance(a, (list, dict)) else F.split(jx_expr(a, df), " "),
    "regex": _op_regex,
    "string": _unary(lambda c: c.cast("string")),
    "number": _unary(lambda c: c.cast("double")),  # jx numbers are doubles (§1.2)
    "integer": _unary(lambda c: c.cast("long")),
    "boolean": _unary(lambda c: c.cast("boolean")),
    # date/time (mo_times (u))
    "date": _op_date,
    "unix": _unary(lambda c: F.unix_timestamp(c).cast("double")),
    "from_unix": _unary(lambda c: F.timestamp_seconds(c)),
    # array (mo_dots implicit mapping (u))
    "count_array": _unary(F.size),
    "first_array": _unary(lambda c: F.element_at(c, 1)),
    "last_array": _unary(lambda c: F.element_at(c, -1)),
    # templating (mo_logs (u))
    "template": _op_template,
    # json (mo_json (u))
    "json": _unary(F.to_json),
    "get_json": lambda a, df: _op_get_json(a, df),
    "leaves": _op_leaves,
}


# scalar ops that implicitly map over a multi-valued operand (u,
# mo_dots FlatList: a path through an array applies per element;
# SURVEY.md §1.4 item 6).  Closed allow-list — ops whose per-element
# application is well-defined with the remaining operands scalar.
# KNOWN LIMIT: mapping triggers only when the array operand is a bare
# dot-path at THIS op's level; a composed array-valued sub-expression
# (e.g. mult over the result of an array-mapped abs) is not detected
# and fails analysis — nest the scalar ops inside one mapped op
# instead.
_MAPPABLE = {
    "abs", "sign", "sqrt", "exp", "log", "log10", "negate", "ceiling",
    "number", "integer", "double", "long", "string",
    "length", "lower", "upper", "trim",
    "add", "sum", "mult", "multiply", "sub", "subtract", "minus",
    "div", "divide", "mod", "pow", "power", "round", "floor",
    "left", "right", "not_left", "not_right", "prefix", "suffix", "find",
    "gt", "gte", "lt", "lte",
}


def _element_type(df: DataFrame | None, path: Any):
    """Element DataType if ``path`` is a dot-path to an ArrayType column."""
    if df is None or not isinstance(path, str):
        return None
    field: Any = T.StructType(df.schema.fields)
    for part in path.split("."):
        if not isinstance(field, T.StructType):
            return None
        try:
            field = field[part].dataType
        except KeyError:
            return None
    return field.elementType if isinstance(field, T.ArrayType) else None


def _implicit_map(op: str, arg: Any, df: DataFrame | None) -> Column | None:
    """Compile scalar-op-over-array-path as F.transform (per-element),
    when exactly one operand is an array path and the rest are scalars.
    Returns None when implicit mapping does not apply."""
    args = [arg] if isinstance(arg, str) else arg
    if not isinstance(args, list):
        return None
    arr_idxs = [i for i, a in enumerate(args) if _element_type(df, a) is not None]
    if len(arr_idxs) != 1:
        return None
    i = arr_idxs[0]
    arr = F.col(args[i])

    def per_element(x: Column) -> Column:
        new_args = list(args)
        new_args[i] = x  # jx_expr passes Columns through
        return OPS[op](new_args[0] if isinstance(arg, str) else new_args, df)

    return F.transform(arr, per_element)


def jx_expr(expr: Any, df: DataFrame | None = None) -> Column:
    """Compile a jx expression to a pyspark Column.

    ``df`` (optional) supplies the schema for string-aware ``missing``
    and for implicit array mapping.  Unknown operators raise — the jx
    op set is closed (SURVEY.md §2.10).
    """
    if isinstance(expr, Column):
        return expr
    if expr is None or expr is True or expr is False or isinstance(expr, (int, float)):
        return F.lit(expr)
    if isinstance(expr, str):
        return _var(expr)
    if isinstance(expr, dict):
        if "literal" in expr:
            return _lit(expr["literal"])
        if "when" in expr:
            return _op_when(
                expr["when"], df, then=expr.get("then"), els=expr.get("else")
            )
        if "date" in expr:
            return _op_date(expr["date"], df)
        if "concat" in expr:
            return _op_concat(expr["concat"], df, separator=expr.get("separator", ""))
        op_keys = [k for k in expr if k in OPS]
        if len(op_keys) == 1:
            op = op_keys[0]
            if op in _MAPPABLE:
                mapped = _implicit_map(op, expr[op], df)
                if mapped is not None:
                    return mapped
            return OPS[op](expr[op], df)
        raise ValueError(f"unknown jx expression: {expr!r}")
    raise ValueError(f"unknown jx expression: {expr!r}")
