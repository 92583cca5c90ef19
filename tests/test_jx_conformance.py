"""jx null-semantics conformance harness (SURVEY.md §1.4 / §5.3).

The reference family asserts query semantics with golden-output tests
over tiny inline fixtures (u, jx conformance corpus shape).  This is
that idea applied to the hard 10%: every decisive operator is evaluated
by the COMPILED Spark expression over an exhaustive small-domain grid
(every combination of null / "" / zero / negative operands) and
compared row-by-row against an independent pure-Python evaluator of the
documented jx semantics.  A disagreement pinpoints the operator and the
operand combination.

A hypothesis layer fuzzes the n-ary decisive math ops over random
float/None mixtures — the grid catches structural rules, the fuzz
catches accumulation mistakes (e.g. a wrong zero element).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# --- pure-Python reference semantics (SURVEY.md §1.4) -----------------


def ref_and(*xs):
    # vacuous truth: all-missing -> true (symmetric with ref_or's
    # all-missing -> false; decisive ops ignore missing operands)
    return all(x for x in xs if x is not None)


def ref_or(*xs):
    known = [x for x in xs if x is not None]
    return any(known) if known else False


def ref_eq(a, b):
    return a == b if (a is None) == (b is None) else False


def ref_cmp(a, b, fn):
    if a is None or b is None:
        return None  # SQL 3VL at select level; where() treats as false
    return fn(a, b)


def ref_add(*xs):
    known = [x for x in xs if x is not None]
    return sum(known) if known else None


def ref_mult(*xs):
    known = [x for x in xs if x is not None]
    return math.prod(known) if known else None


def ref_div(a, b):
    if a is None or b is None or b == 0:
        return None
    return a / b


def ref_missing(s):
    return s is None or s == ""


def ref_concat(sep, *xs):
    return sep.join(x for x in xs if x is not None)


def ref_find(s, sub):
    if s is None:
        return None
    i = s.find(sub)
    return None if i < 0 else i


def ref_left(s, n):
    return None if s is None else s[: max(n, 0)]


def ref_not_left(s, n):
    return None if s is None else s[max(n, 0):]


def ref_right(s, n):
    return None if s is None else (s[-max(n, 0):] if max(n, 0) else "")


def ref_not_right(s, n):
    return None if s is None else (s[: -max(n, 0)] if max(n, 0) else s)


# --- the exhaustive grid ----------------------------------------------

NUMS = [None, 0.0, 1.0, -2.5, 3.0]
STRS = [None, "", "x", "abc"]


@pytest.fixture(scope="module")
def grid(spark):
    rows = [
        (a, b, s, t)
        for a in NUMS
        for b in NUMS
        for s in STRS
        for t in STRS
    ]
    return spark.createDataFrame(rows, "a double, b double, s string, t string")


def _run(df, exprs: dict):
    """Evaluate compiled jx expressions in one job; returns row dicts."""
    from mo_etl_spark.jx.expressions import jx_expr

    cols = [jx_expr(e, df).alias(name) for name, e in exprs.items()]
    return [r.asDict() for r in df.select("a", "b", "s", "t", *cols).collect()]


def test_decisive_boolean_grid(spark, grid):
    rows = _run(
        grid,
        {
            "and_ab": {"and": [{"gt": ["a", 0]}, {"gt": ["b", 0]}]},
            "or_ab": {"or": [{"gt": ["a", 0]}, {"gt": ["b", 0]}]},
            "eq_ab": {"eq": ["a", "b"]},
            "ne_ab": {"ne": ["a", "b"]},
        },
    )
    for r in rows:
        ga = ref_cmp(r["a"], 0, lambda x, y: x > y)
        gb = ref_cmp(r["b"], 0, lambda x, y: x > y)
        assert r["and_ab"] == ref_and(ga, gb), r
        assert r["or_ab"] == ref_or(ga, gb), r
        assert r["eq_ab"] == ref_eq(r["a"], r["b"]), r
        assert r["ne_ab"] == (not ref_eq(r["a"], r["b"])), r


def test_decisive_math_grid(spark, grid):
    rows = _run(
        grid,
        {
            "add_ab": {"add": ["a", "b"]},
            "mult_ab": {"mult": ["a", "b"]},
            "div_ab": {"div": ["a", "b"]},
            "sub_ab": {"sub": ["a", "b"]},
        },
    )
    for r in rows:
        a, b = r["a"], r["b"]
        assert r["add_ab"] == ref_add(a, b), r
        assert r["mult_ab"] == ref_mult(a, b), r
        assert r["div_ab"] == ref_div(a, b), r
        want_sub = None if (a is None or b is None) else a - b
        assert r["sub_ab"] == want_sub, r


def test_missing_and_string_grid(spark, grid):
    rows = _run(
        grid,
        {
            "miss_s": {"missing": "s"},
            "exists_s": {"exists": "s"},
            "concat_st": {"concat": ["s", "t"]},
            "find_s": {"find": {"s": "b"}},
            "left2": {"left": ["s", 2]},
            "right2": {"right": ["s", 2]},
            "nleft2": {"not_left": ["s", 2]},
            "nright2": {"not_right": ["s", 2]},
        },
    )
    for r in rows:
        s, t = r["s"], r["t"]
        assert r["miss_s"] == ref_missing(s), r
        assert r["exists_s"] == (not ref_missing(s)), r
        assert r["concat_st"] == ref_concat("", s, t), r
        assert r["find_s"] == ref_find(s, "b"), r
        assert r["left2"] == ref_left(s, 2), r
        assert r["right2"] == ref_right(s, 2), r
        assert r["nleft2"] == ref_not_left(s, 2), r
        assert r["nright2"] == ref_not_right(s, 2), r


def test_when_case_coalesce_grid(spark, grid):
    rows = _run(
        grid,
        {
            "when_gt": {"when": {"gt": ["a", 0]}, "then": 1, "else": 2},
            "coal": {"coalesce": ["a", "b"]},
        },
    )
    for r in rows:
        ga = ref_cmp(r["a"], 0, lambda x, y: x > y)
        assert r["when_gt"] == (1 if ga else 2), r  # null cond -> false
        want = r["a"] if r["a"] is not None else r["b"]
        assert r["coal"] == want, r


# --- hypothesis fuzz over the n-ary decisive math ---------------------

maybe_float = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_subnormal=False),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(maybe_float, maybe_float, maybe_float), min_size=1, max_size=25))
def test_nary_decisive_fuzz(spark, triples):
    from mo_etl_spark.jx.expressions import jx_expr

    df = spark.createDataFrame(triples, "x double, y double, z double")
    got = df.select(
        jx_expr({"add": ["x", "y", "z"]}, df).alias("s"),
        jx_expr({"mult": ["x", "y", "z"]}, df).alias("p"),
    ).collect()
    for (x, y, z), r in zip(triples, got):
        want_s = ref_add(x, y, z)
        want_p = ref_mult(x, y, z)
        assert (r["s"] is None) == (want_s is None)
        if want_s is not None:
            assert r["s"] == pytest.approx(want_s, rel=1e-12, abs=1e-9)
        assert (r["p"] is None) == (want_p is None)
        if want_p is not None:
            assert r["p"] == pytest.approx(want_p, rel=1e-12, abs=1e-9)


# --- unicode string-op fuzz -------------------------------------------
# The reference is pure Python (code-point string semantics).  Spark's
# UTF8String also counts CODE POINTS (verified incl. astral-plane
# emoji / mathematical alphanumerics), so slicing ops must agree with
# Python slices for any non-surrogate text.

unicode_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(unicode_text, st.integers(0, 30)), min_size=1, max_size=20))
def test_string_slicing_unicode_fuzz(spark, rows):
    from mo_etl_spark.jx.expressions import jx_expr

    df = spark.createDataFrame(rows, "s string, n int")
    got = df.select(
        "s",
        "n",
        jx_expr({"length": "s"}, df).alias("len"),
        jx_expr({"left": ["s", "n"]}, df).alias("l"),
        jx_expr({"right": ["s", "n"]}, df).alias("r"),
        jx_expr({"not_left": ["s", "n"]}, df).alias("nl"),
        jx_expr({"not_right": ["s", "n"]}, df).alias("nr"),
        jx_expr({"find": {"s": "a"}}, df).alias("f"),
    ).collect()
    for row in got:
        s, n = row["s"], row["n"]
        assert row["len"] == len(s)
        assert row["l"] == s[:n]
        assert row["r"] == (s[-n:] if n else "")
        assert row["nl"] == s[n:]
        assert row["nr"] == (s[:-n] if n else s)
        i = s.find("a")
        assert row["f"] == (None if i < 0 else i)


def test_string_case_mapping_fixed_set(spark):
    """Case ops on a fixed verified set (full fuzz would be hostage to
    Unicode-table versions across JVM/Python)."""
    from mo_etl_spark.jx.expressions import jx_expr

    vals = ["Hello", "héllo", "ß", "ﬁre", "ΣΙΣΥΦΟΣ", "a😀B"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: (r["u"], r["lo"])
        for r in df.select(
            "s",
            jx_expr({"upper": "s"}, df).alias("u"),
            jx_expr({"lower": "s"}, df).alias("lo"),
        ).collect()
    }
    for v in vals:
        assert got[v] == (v.upper(), v.lower()), v
