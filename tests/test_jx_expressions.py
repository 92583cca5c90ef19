"""jx expression semantics — conformance-style cases (SURVEY.md §5.1:
tiny inline fixtures, golden outputs), with emphasis on the §1.4
null-semantics deltas where Spark defaults differ from jx."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mo_etl_spark.jx import jx_expr


def rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def vals(df, expr):
    out = df.select(jx_expr(expr, df).alias("v")).collect()
    return [r["v"] for r in out]


@pytest.fixture(scope="module")
def abx(spark):
    return rows(
        spark,
        [(1.0, 2.0, "hello"), (None, 3.0, ""), (4.0, None, None), (None, None, "xyz")],
        "a double, b double, x string",
    )


# --- decisive boolean (§1.4 #1) --------------------------------------


def test_decisive_or(spark, abx):
    # or ignores missing: or([Null, false, true]) = true; or([Null, false]) = false
    df = rows(spark, [(None, False, True), (None, False, False)], "p boolean, q boolean, r boolean")
    assert vals(df, {"or": ["p", "q", "r"]}) == [True, False]


def test_decisive_and(spark):
    # and ignores missing: and([Null, true]) = true; and([Null, false]) = false
    df = rows(spark, [(None, True), (None, False), (None, None)], "p boolean, q boolean")
    assert vals(df, {"and": ["p", "q"]}) == [True, False, True]


# --- null-safe eq/ne (§1.4 #3) ---------------------------------------


def test_eq_null_safe(spark, abx):
    assert vals(abx, {"eq": ["a", "b"]}) == [False, False, False, True]


def test_ne_null_safe(spark, abx):
    assert vals(abx, {"ne": ["a", "b"]}) == [True, True, True, False]


def test_eq_map_form_literal(spark, abx):
    assert vals(abx, {"eq": {"a": 4}}) == [False, False, True, False]


# --- div by zero / null math (§1.4 #4) -------------------------------


def test_div_by_zero_is_null(spark):
    df = rows(spark, [(1.0, 0.0), (6.0, 3.0), (None, 2.0)], "a double, b double")
    assert vals(df, {"div": ["a", "b"]}) == [None, 2.0, None]


def test_decisive_add(spark, abx):
    # nulls skipped; all-null -> null (mo_math)
    assert vals(abx, {"add": ["a", "b"]}) == [3.0, 3.0, 4.0, None]


def test_decisive_mult(spark, abx):
    assert vals(abx, {"mult": ["a", "b"]}) == [2.0, 3.0, 4.0, None]


# --- missing / empty-string (§1.4 #5) --------------------------------


def test_missing_empty_string(spark, abx):
    assert vals(abx, {"missing": "x"}) == [False, True, True, False]


def test_exists(spark, abx):
    assert vals(abx, {"exists": "a"}) == [True, False, True, False]


def test_missing_numeric(spark, abx):
    assert vals(abx, {"missing": "a"}) == [False, True, False, True]


# --- comparison / membership -----------------------------------------


def test_in_decisive(spark, abx):
    # missing value -> false, not null
    assert vals(abx, {"in": {"x": ["hello", "xyz"]}}) == [True, False, False, True]


def test_between(spark, abx):
    assert vals(abx, {"between": {"b": [2, 3]}}) == [True, True, None, None]


# --- strings ----------------------------------------------------------


def test_string_ops(spark, abx):
    assert vals(abx, {"left": {"x": 3}}) == ["hel", "", None, "xyz"]
    assert vals(abx, {"right": {"x": 3}}) == ["llo", "", None, "xyz"]
    assert vals(abx, {"not_left": {"x": 3}}) == ["lo", "", None, ""]
    assert vals(abx, {"not_right": {"x": 3}}) == ["he", "", None, ""]
    assert vals(abx, {"length": "x"}) == [5, 0, None, 3]


def test_find_returns_null_when_absent(spark, abx):
    assert vals(abx, {"find": {"x": "llo"}}) == [2, None, None, None]


def test_concat_skips_missing(spark, abx):
    df = rows(spark, [("a", None, "c")], "p string, q string, r string")
    assert vals(df, {"concat": ["p", "q", "r"], "separator": "-"}) == ["a-c"]


def test_regex_full_match(spark, abx):
    assert vals(abx, {"regex": {"x": "h.*o"}}) == [True, False, None, False]


def test_string_between_markers(spark):
    df = rows(spark, [("a[42]z",), ("nope",)], "s string")
    assert vals(df, {"string_between": {"v": "s", "prefix": "[", "suffix": "]"}}) == [
        "42",
        None,
    ]


# --- case/when --------------------------------------------------------


def test_when_null_cond_is_false(spark, abx):
    expr = {"when": {"gt": ["a", 2]}, "then": {"literal": "big"}, "else": {"literal": "small"}}
    # null condition -> else branch (decisive)
    assert vals(abx, expr) == ["small", "small", "big", "small"]


def test_case(spark, abx):
    expr = {
        "case": [
            {"when": {"missing": "a"}, "then": {"literal": "none"}},
            {"when": {"gt": ["a", 2]}, "then": {"literal": "big"}},
            {"literal": "small"},
        ]
    }
    assert vals(abx, expr) == ["small", "none", "big", "none"]


# --- math -------------------------------------------------------------


def test_floor_to_multiple(spark):
    df = rows(spark, [(7.0,), (-3.0,), (None,)], "a double")
    assert vals(df, {"floor": {"a": 5}}) == [5.0, -5.0, None]


def test_mod_positive(spark):
    df = rows(spark, [(-7.0,), (7.0,)], "a double")
    assert vals(df, {"mod": ["a", 5]}) == [3.0, 2.0]


def test_round_digits(spark):
    df = rows(spark, [(3.14159,)], "a double")
    assert vals(df, {"round": {"a": 2}}) == [3.14]


def test_coalesce(spark, abx):
    assert vals(abx, {"coalesce": ["a", "b"]}) == [1.0, 3.0, 4.0, None]


# --- date -------------------------------------------------------------


def test_date_literal_and_relative(spark):
    from mo_etl_spark.jx.expressions import parse_date

    assert parse_date("2020-01-15").isoformat() == "2020-01-15T00:00:00"
    d = parse_date("today-7day")
    today = parse_date("today")
    assert (today - d).days == 7
    jan31 = parse_date("2020-01-31")
    # calendar-aware month step (mo_times Duration)
    assert parse_date("2020-01-31") .month == 1
    assert parse_date("today-1month") <= today


def test_unknown_op_raises(spark, abx):
    with pytest.raises(ValueError):
        jx_expr({"frobnicate": ["a"]}, abx)


# --- implicit array mapping (mo_dots FlatList (u); SURVEY.md §1.4) ----


@pytest.fixture(scope="module")
def arr_df(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0, 4.0], ["a", "Bc"]), (2, [0.5, None], ["x", None])],
        "id long, nums array<double>, tags array<string>",
    )


def test_implicit_map_scalar_mult(spark, arr_df):
    from mo_etl_spark.jx.expressions import jx_expr

    out = arr_df.select(jx_expr({"mult": ["nums", 2]}, arr_df).alias("v")).collect()
    assert out[0]["v"] == [2.0, 4.0, 8.0]
    # decisive mult skips the missing element operand: mult([Null, 2]) -> 2
    assert out[1]["v"] == [1.0, 2.0]


def test_implicit_map_upper(spark, arr_df):
    from mo_etl_spark.jx.expressions import jx_expr

    out = arr_df.select(jx_expr({"upper": "tags"}, arr_df).alias("v")).collect()
    assert out[0]["v"] == ["A", "BC"]
    assert out[1]["v"] == ["X", None]


def test_implicit_map_div_by_zero(spark, arr_df):
    from mo_etl_spark.jx.expressions import jx_expr

    out = arr_df.select(jx_expr({"div": ["nums", 0]}, arr_df).alias("v")).collect()
    assert out[0]["v"] == [None, None, None]


def test_implicit_map_requires_single_array(spark, arr_df):
    from mo_etl_spark.jx.expressions import jx_expr

    # two array operands -> no implicit mapping; compiles as plain op
    # (array arithmetic is not defined) and Spark raises on analysis
    import pytest as _pytest

    with _pytest.raises(Exception):
        arr_df.select(jx_expr({"mult": ["nums", "nums"]}, arr_df)).collect()
