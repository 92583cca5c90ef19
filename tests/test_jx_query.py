"""jx query runner conformance cases (reference test shape: inline
docs -> jx dict -> expected list output; SURVEY.md §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mo_etl_spark.jx import jx_run


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            ("alice", "eng", 30, 100.0),
            ("bob", "eng", 25, 80.0),
            ("carol", "ops", 35, None),
            ("dave", None, 28, 60.0),
        ],
        "name string, team string, age int, score double",
    )


def run(q, **kw):
    return [r.asDict() for r in jx_run(q, **kw).collect()]


def test_select_where_sort(people):
    out = run(
        {
            "from": people,
            "where": {"gte": ["age", 28]},
            "select": ["name", "age"],
            "sort": [{"value": "age", "sort": -1}],
        }
    )
    assert out == [
        {"name": "carol", "age": 35},
        {"name": "alice", "age": 30},
        {"name": "dave", "age": 28},
    ]


def test_select_computed(people):
    out = run(
        {
            "from": people,
            "select": [{"name": "shout", "value": {"upper": "name"}}],
            "sort": "shout",
            "limit": 2,
        }
    )
    assert out == [{"shout": "ALICE"}, {"shout": "BOB"}]


def test_groupby_aggregates(people):
    out = run(
        {
            "from": people,
            "groupby": ["team"],
            "select": [
                {"name": "n", "aggregate": "count"},
                {"name": "avg_age", "value": "age", "aggregate": "average"},
                {"name": "total", "value": "score", "aggregate": "sum"},
            ],
            "sort": "team",
        }
    )
    # jx sort: nulls first ascending
    assert out[0]["team"] is None and out[0]["n"] == 1
    assert out[1] == {"team": "eng", "n": 2, "avg_age": 27.5, "total": 180.0}
    assert out[2]["team"] == "ops" and out[2]["total"] is None


def test_global_agg(people):
    out = run(
        {
            "from": people,
            "select": [
                {"name": "n", "aggregate": "count"},
                {"name": "max_age", "value": "age", "aggregate": "maximum"},
                {"name": "teams", "value": "team", "aggregate": "union"},
            ],
        }
    )
    assert out == [{"n": 4, "max_age": 35, "teams": ["eng", "ops"]}]


def test_where_null_condition_drops_row(people):
    # carol has null score; gt(score, 50) is Null -> dropped (decisive filter)
    out = run({"from": people, "where": {"gt": ["score", 50]}, "select": "name", "sort": "name"})
    assert [r["name"] for r in out] == ["alice", "bob", "dave"]


def test_edges_complete_domain(spark, people):
    # edges include the empty part: no 40-year-olds, still a row for it
    out = run(
        {
            "from": people,
            "edges": [
                {
                    "name": "age_bucket",
                    "value": "age",
                    "domain": {"type": "range", "min": 20, "max": 50, "interval": 10},
                }
            ],
            "select": [{"name": "n", "aggregate": "count"}],
            "sort": "age_bucket",
        },
        spark=spark,
    )
    assert out == [
        {"age_bucket": 20.0, "n": 2},
        {"age_bucket": 30.0, "n": 2},
        {"age_bucket": 40.0, "n": 0},
    ]


def test_window_running_total(people):
    out = run(
        {
            "from": people,
            "select": ["name", "team", "score"],
            "window": [
                {
                    "name": "team_rank",
                    "value": "age",
                    "aggregate": "rownum",
                    "edges": ["team"],
                    "sort": [{"value": "age", "sort": -1}],
                }
            ],
            "sort": ["team", "team_rank"],
        }
    )
    by_name = {r["name"]: r["team_rank"] for r in out}
    assert by_name["alice"] == 0 and by_name["bob"] == 1  # 0-based jx rownum


def test_deep_from_unnest(spark):
    nested = spark.createDataFrame(
        [
            Row(order=1, items=[Row(sku="a", qty=2), Row(sku="b", qty=1)]),
            Row(order=2, items=[]),
        ]
    )
    out = run(
        {"from": "orders2.items", "select": ["order", "sku", "qty"], "sort": ["order", "sku"]},
        tables={"orders2": nested},
    )
    assert out == [
        {"order": 1, "sku": "a", "qty": 2},
        {"order": 1, "sku": "b", "qty": 1},
        {"order": 2, "sku": None, "qty": None},
    ]


def test_select_leaves(spark):
    df = spark.createDataFrame([Row(a=1, b=Row(c=2, d="x"))])
    out = run({"from": df, "select": {"value": {"leaves": "."}}})
    assert out == [{"a": 1, "b.c": 2, "b.d": "x"}]
