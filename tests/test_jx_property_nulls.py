"""Property test for the §1.4 decisive-null semantics: randomized
(a, b) pairs — including Nulls, zeros, negatives, and empty strings —
run through the jx expression compiler as ONE batched DataFrame and
compared row-by-row against a direct Python model of the jx rules
(u, mo_dots Null absorption + mo_math null-decisive operators).
Hundreds of cases, one Spark job."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def model_add(a, b):  # jx add: skip missing; all-missing -> Null
    vals = [v for v in (a, b) if v is not None]
    return sum(vals) if vals else None


def model_and(a, b):  # decisive and: missing operands ignored;
    # all-missing -> the AND identity True (u, jx AndOp partial_eval)
    return all(v for v in (a, b) if v is not None)


def model_or(a, b):  # all-missing -> the OR identity False
    return any(v for v in (a, b) if v is not None)


def model_eq(a, b):  # null-safe
    return a == b


def model_div(a, b):  # div by zero/null -> Null
    if a is None or b is None or b == 0:
        return None
    return a / b


def test_decisive_null_properties(spark):
    from mo_etl_spark.jx.expressions import jx_expr
    from mo_etl_spark.session import prepare

    prepare(spark)
    rng = random.Random(42)
    pool = [None, 0.0, 1.0, -2.5, 7.0, 1e9]
    bpool = [None, True, False]
    rows = [
        (i, rng.choice(pool), rng.choice(pool), rng.choice(bpool), rng.choice(bpool))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "i long, a double, b double, p boolean, q boolean"
    )
    out = df.select(
        "i",
        jx_expr({"add": ["a", "b"]}, df).alias("add"),
        jx_expr({"and": ["p", "q"]}, df).alias("and_"),
        jx_expr({"or": ["p", "q"]}, df).alias("or_"),
        jx_expr({"eq": ["a", "b"]}, df).alias("eq"),
        jx_expr({"div": ["a", "b"]}, df).alias("div"),
    ).collect()
    by_i = {r["i"]: r for r in out}
    for i, a, b, p, q in rows:
        r = by_i[i]
        assert r["add"] == model_add(a, b), (i, a, b, r["add"])
        assert r["and_"] == model_and(p, q), (i, p, q, r["and_"])
        assert r["or_"] == model_or(p, q), (i, p, q, r["or_"])
        assert bool(r["eq"]) == model_eq(a, b), (i, a, b, r["eq"])
        got, want = r["div"], model_div(a, b)
        assert (got is None) == (want is None) and (got is None or abs(got - want) < 1e-9), (
            i, a, b, got, want,
        )


def test_empty_string_is_missing_property(spark):
    """jx missing(x) for strings: NULL and '' are both missing; any
    other value (incl. whitespace) is present (SURVEY §1.4 rule 5)."""
    from mo_etl_spark.jx.expressions import jx_expr

    vals = [None, "", "x", " ", "0", "null"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    out = {r["i"]: r["m"] for r in df.select(
        "i", jx_expr({"missing": "s"}, df).alias("m")
    ).collect()}
    for i, v in enumerate(vals):
        assert bool(out[i]) == (v is None or v == ""), (v, out[i])


def model_left(s, n):
    return None if s is None else s[:n]


def model_right(s, n):
    return None if s is None else (s[-n:] if n else "")


def model_not_left(s, n):
    return None if s is None else s[n:]


def model_find(s, sub):
    if s is None:
        return None
    i = s.find(sub)
    return None if i < 0 else i


def test_string_ops_property_grid(spark):
    """Randomized string-op grid vs a direct Python model: left/right/
    not_left slice semantics, find-or-Null, and Null absorption —
    one batched job over 300 generated strings."""
    import random

    from mo_etl_spark.jx.expressions import jx_expr
    from mo_etl_spark.session import prepare

    prepare(spark)
    rng = random.Random(7)
    alpha = "ab x"
    vals = [None, ""] + [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12))) for _ in range(298)
    ]
    df = spark.createDataFrame(list(enumerate(vals)), "i long, s string")
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            jx_expr({"left": ["s", 3]}, df).alias("l"),
            jx_expr({"right": ["s", 3]}, df).alias("r"),
            jx_expr({"not_left": ["s", 3]}, df).alias("nl"),
            jx_expr({"find": ["s", {"literal": "ab"}]}, df).alias("f"),
        ).collect()
    }
    for i, s in enumerate(vals):
        r = out[i]
        assert r["l"] == model_left(s, 3), (s, r["l"])
        assert r["r"] == model_right(s, 3), (s, r["r"])
        assert r["nl"] == model_not_left(s, 3), (s, r["nl"])
        assert r["f"] == model_find(s, "ab"), (s, r["f"])
