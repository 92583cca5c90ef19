"""jx golden-output conformance corpus — the reference's test shape
(u, §5.1: jx repos share hundreds of cases `{data, query,
expecting_list / expecting_table / expecting_cube}` over tiny inline
fixtures).  Each case here is exactly that: inline docs -> jx dict ->
expected output in the declared format.  Cases marked `sorted_by`
compare order-insensitively after sorting by that key (Spark row order
is nondeterministic without an explicit sort clause, as in jx)."""

from __future__ import annotations

import pytest

DOCS = [
    {"a": 1.0, "b": 10.0, "name": "alpha", "tag": "x", "arr": [1.0, 2.0]},
    {"a": 2.0, "b": None, "name": "beta", "tag": "y", "arr": [3.0]},
    {"a": None, "b": 30.0, "name": "", "tag": "x", "arr": None},
    {"a": 4.0, "b": 40.0, "name": "delta", "tag": "z", "arr": [4.0, 5.0]},
]

SCHEMA = "a double, b double, name string, tag string, arr array<double>"

CASES = [
    {
        "name": "filter_gt_select",
        "query": {"from": "docs", "where": {"gt": ["a", 1]}, "select": ["name", "a"],
                  "sort": "a"},
        "expecting_list": [{"name": "beta", "a": 2.0}, {"name": "delta", "a": 4.0}],
    },
    {
        "name": "where_null_cond_drops",
        "query": {"from": "docs", "where": {"gt": ["a", 0]}, "select": ["a"], "sort": "a"},
        # a=None row dropped (null condition is not-true)
        "expecting_list": [{"a": 1.0}, {"a": 2.0}, {"a": 4.0}],
    },
    {
        "name": "decisive_or_in_where",
        "query": {"from": "docs",
                  "where": {"or": [{"gt": ["a", 3]}, {"gt": ["b", 25]}]},
                  "select": ["tag"], "sort": "tag"},
        # row3: a missing, b=30 -> or(missing, true) = true
        "expecting_list": [{"tag": "x"}, {"tag": "z"}],
    },
    {
        "name": "missing_empty_string",
        "query": {"from": "docs", "where": {"missing": "name"}, "select": ["b"]},
        "expecting_list": [{"b": 30.0}],  # "" is missing
    },
    {
        "name": "eq_null_safe",
        "query": {"from": "docs", "where": {"eq": ["b", {"literal": None}]},
                  "select": ["name"]},
        "expecting_list": [{"name": "beta"}],  # missing == missing
    },
    {
        "name": "computed_select_decisive_add",
        "query": {"from": "docs",
                  "select": [{"name": "s", "value": {"add": ["a", "b"]}}],
                  "sort": [{"field": "s", "sort": 1}]},
        # add skips missing: (1+10)=11, (2+null)=2, (null+30)=30, 44
        "expecting_list": [{"s": 2.0}, {"s": 11.0}, {"s": 30.0}, {"s": 44.0}],
    },
    {
        "name": "groupby_agg",
        "query": {"from": "docs", "groupby": "tag",
                  "select": [{"name": "n", "aggregate": "count"},
                             {"name": "bsum", "value": "b", "aggregate": "sum"}]},
        "sorted_by": "tag",
        "expecting_list": [
            {"tag": "x", "n": 2, "bsum": 40.0},
            {"tag": "y", "n": 1, "bsum": None},  # all-null sum -> null
            {"tag": "z", "n": 1, "bsum": 40.0},
        ],
    },
    {
        "name": "edges_set_domain_empty_and_null_part",
        "query": {"from": "docs",
                  "edges": [{"name": "tag", "value": "tag", "allowNulls": True,
                             "domain": {"type": "set", "partitions": ["x", "y", "w"]}}],
                  "select": [{"name": "n", "aggregate": "count"}]},
        "sorted_by": "tag",
        # w = empty part (0); z routes to the null part
        "expecting_list": [
            {"tag": None, "n": 1},
            {"tag": "w", "n": 0},
            {"tag": "x", "n": 2},
            {"tag": "y", "n": 1},
        ],
    },
    {
        "name": "window_rownum",
        "query": {"from": "docs", "select": ["name", "tag"],
                  "window": [{"name": "seq", "aggregate": "rownum",
                              "edges": ["tag"], "sort": ["name"]}],
                  "sort": ["tag", "name"]},
        "expecting_list": [
            {"name": "", "tag": "x", "seq": 0},
            {"name": "alpha", "tag": "x", "seq": 1},
            {"name": "beta", "tag": "y", "seq": 0},
            {"name": "delta", "tag": "z", "seq": 0},
        ],
    },
    {
        "name": "sort_desc_limit",
        "query": {"from": "docs", "select": ["a"],
                  "sort": [{"field": "a", "sort": -1}], "limit": 2},
        "expecting_list": [{"a": 4.0}, {"a": 2.0}],
    },
    {
        "name": "implicit_array_map",
        "query": {"from": "docs", "where": {"eq": {"name": "alpha"}},
                  "select": [{"name": "doubled", "value": {"mult": ["arr", 2]}}]},
        "expecting_list": [{"doubled": [2.0, 4.0]}],
    },
    {
        "name": "when_else_template",
        "query": {"from": "docs", "where": {"exists": "a"},
                  "select": [
                      {"name": "kind",
                       "value": {"when": {"gte": ["a", 2]}, "then": {"literal": "big"},
                                 "else": {"literal": "small"}}},
                      {"name": "msg", "value": {"template": "{{name}}:{{tag}}"}},
                  ],
                  "sort": "msg"},
        "expecting_list": [
            {"kind": "small", "msg": "alpha:x"},
            {"kind": "big", "msg": "beta:y"},
            {"kind": "big", "msg": "delta:z"},
        ],
    },
    {
        "name": "in_list_membership",
        "query": {"from": "docs", "where": {"in": ["tag", {"literal": ["x", "z"]}]},
                  "select": ["name"], "sort": "name"},
        "expecting_list": [{"name": ""}, {"name": "alpha"}, {"name": "delta"}],
    },
    {
        "name": "div_by_zero_is_null",
        "query": {"from": "docs", "where": {"exists": "a"},
                  "select": [{"name": "d", "value": {"div": ["a", {"literal": 0}]}}]},
        # mo_math decisive division (u): x/0 -> Null, never an error
        "expecting_list": [{"d": None}, {"d": None}, {"d": None}],
    },
    {
        "name": "coalesce_first_present",
        "query": {"from": "docs",
                  "select": [{"name": "c", "value": {"coalesce": ["b", "a"]}}],
                  "sort": "c"},
        "expecting_list": [{"c": 2.0}, {"c": 10.0}, {"c": 30.0}, {"c": 40.0}],
    },
    {
        "name": "concat_skips_missing",
        "query": {"from": "docs",
                  "select": [{"name": "c", "value": {"concat": ["name", "tag"]}}],
                  "sort": "c"},
        # ""-is-missing: the empty name contributes nothing -> 'x'
        "expecting_list": [{"c": "alphax"}, {"c": "betay"}, {"c": "deltaz"}, {"c": "x"}],
    },
    {
        "name": "not_left_drops_prefix",
        "query": {"from": "docs", "where": {"eq": {"name": "delta"}},
                  "select": [{"name": "c", "value": {"not_left": ["name", 2]}}]},
        "expecting_list": [{"c": "lta"}],
    },
    {
        "name": "find_index_or_null",
        "query": {"from": "docs",
                  "select": [{"name": "f", "value": {"find": ["name", {"literal": "et"}]}},
                             "name"],
                  "sort": "name"},
        # 0-based index where found, Null where absent (u, jx find)
        "expecting_list": [
            {"f": None, "name": ""},
            {"f": None, "name": "alpha"},
            {"f": 1, "name": "beta"},
            {"f": None, "name": "delta"},
        ],
    },
    {
        "name": "floor_to_multiple",
        "query": {"from": "docs",
                  "select": [{"name": "f", "value": {"floor": ["b", 20]}}], "sort": "f"},
        # jx floor-to-multiple-of (u, mo_math); missing -> Null first
        "expecting_list": [{"f": None}, {"f": 0}, {"f": 20}, {"f": 40}],
    },
    {
        "name": "mod_is_positive",
        "query": {"from": "docs", "where": {"eq": {"tag": "y"}},
                  "select": [{"name": "m", "value": {"mod": [{"literal": -7}, 3]}}]},
        # jx mod is positive (u, mo_math): -7 mod 3 = 2, not -1
        "expecting_list": [{"m": 2}],
    },
    {
        "name": "deep_from_keeps_parent_null_row",
        "query": {"from": "docs.arr",
                  "select": ["tag", {"name": "v", "value": "arr"}],
                  "sort": ["tag", "v"]},
        # unnest keeps parent fields; the arr-less doc stays with v=Null
        # (explode_outer -- the allowNulls form of jx deep queries)
        "expecting_list": [
            {"tag": "x", "v": None},
            {"tag": "x", "v": 1.0},
            {"tag": "x", "v": 2.0},
            {"tag": "y", "v": 3.0},
            {"tag": "z", "v": 4.0},
            {"tag": "z", "v": 5.0},
        ],
    },
    {
        "name": "groupby_max_cardinality_union",
        "query": {"from": "docs", "groupby": "tag",
                  "select": [{"name": "mx", "value": "b", "aggregate": "maximum"},
                             {"name": "card", "value": "a", "aggregate": "cardinality"},
                             {"name": "u", "value": "a", "aggregate": "union"}]},
        "sorted_by": "tag",
        "expecting_list": [
            {"tag": "x", "mx": 30.0, "card": 1, "u": [1.0]},
            {"tag": "y", "mx": None, "card": 1, "u": [2.0]},
            {"tag": "z", "mx": 40.0, "card": 1, "u": [4.0]},
        ],
    },
    {
        "name": "format_table",
        "query": {"from": "docs", "where": {"eq": {"tag": "x"}},
                  "select": ["tag", "b"], "sort": "b", "format": "table"},
        "expecting_table": {"header": ["tag", "b"], "data": [["x", 10.0], ["x", 30.0]]},
    },
    {
        "name": "aggregate_default_fills_all_null_group",
        "query": {"from": "docs", "groupby": "tag",
                  "select": [{"name": "bsum", "value": "b",
                              "aggregate": "sum", "default": 0}]},
        # jx select `default`: the all-missing group reads 0, not Null
        "sorted_by": "tag",
        "expecting_list": [
            {"tag": "x", "bsum": 40.0},
            {"tag": "y", "bsum": 0.0},
            {"tag": "z", "bsum": 40.0},
        ],
    },
    {
        "name": "window_cumulative_sum",
        "query": {"from": "docs", "select": ["name", "tag"],
                  "window": [{"name": "cum_b", "value": "b", "aggregate": "sum",
                              "edges": ["tag"], "sort": ["name"],
                              "range": {"max": 0}}],
                  "sort": ["tag", "name"]},
        # jx cumulative: range {min: null, max: 0} (u)
        "expecting_list": [
            {"name": "", "tag": "x", "cum_b": 30.0},
            {"name": "alpha", "tag": "x", "cum_b": 40.0},
            {"name": "beta", "tag": "y", "cum_b": None},
            {"name": "delta", "tag": "z", "cum_b": 40.0},
        ],
    },
    {
        "name": "window_moving_average",
        "query": {"from": "docs", "select": ["name"],
                  "window": [{"name": "mv", "value": "a", "aggregate": "average",
                              "sort": ["name"], "range": {"min": -1, "max": 0}}],
                  "sort": ["name"]},
        # 2-row moving avg, null-skipping: ("",alpha)=1.0 (null skipped)
        "expecting_list": [
            {"name": "", "mv": None},
            {"name": "alpha", "mv": 1.0},
            {"name": "beta", "mv": 1.5},
            {"name": "delta", "mv": 3.0},
        ],
    },
    {
        "name": "window_lag_per_edge",
        "query": {"from": "docs", "select": ["name"],
                  "window": [{"name": "prev", "value": "name", "aggregate": "lag",
                              "sort": ["name"], "edges": ["tag"]}],
                  "sort": ["tag", "name"]},
        # jx rows[-1]: offset functions take NO frame (engine strips it)
        "expecting_list": [
            {"name": "", "prev": None},
            {"name": "alpha", "prev": ""},
            {"name": "beta", "prev": None},
            {"name": "delta", "prev": None},
        ],
    },
    {
        "name": "format_cube_two_edges_dense",
        "query": {"from": "docs",
                  "edges": [
                      {"name": "tag", "value": "tag",
                       "domain": {"type": "set", "partitions": ["x", "y", "z"]}},
                      {"name": "big", "value": {"gte": ["a", 2]}},
                  ],
                  "select": [{"name": "n", "aggregate": "count"},
                             {"name": "asum", "value": "a", "aggregate": "sum"}],
                  "format": "cube"},
        # 3x|big-domain| dense matrices, one per select, empty parts 0/None;
        # the a=None doc has big=None -> routed per boolean-edge domain
        "expecting_cube_shape": {"n_edges": 2, "selects": ["n", "asum"]},
    },
    {
        "name": "format_cube_set_edge",
        "query": {"from": "docs",
                  "edges": [{"name": "tag", "value": "tag",
                             "domain": {"type": "set", "partitions": ["x", "y", "z"]}}],
                  "select": [{"name": "n", "aggregate": "count"}],
                  "format": "cube"},
        "expecting_cube": {"data": {"n": [2, 1, 1]}},  # domains sorted x,y,z
    },
    # --- round-4 depth: window-clause grid (VERDICT r3 item #4) ------
    {
        "name": "window_as_single_dict",
        "query": {"from": "docs", "select": ["name"],
                  "window": {"name": "seq", "aggregate": "rownum",
                             "sort": ["name"]},
                  "sort": ["name"]},
        # the window clause may be one dict, not a list (jx shorthand)
        "expecting_list": [
            {"name": "", "seq": 0},
            {"name": "alpha", "seq": 1},
            {"name": "beta", "seq": 2},
            {"name": "delta", "seq": 3},
        ],
    },
    {
        "name": "window_rank_ties",
        "query": {"from": "docs", "select": ["name", "tag"],
                  "window": [{"name": "rk", "aggregate": "rank",
                              "sort": ["tag"]}],
                  "sort": ["tag", "name"]},
        # both x-rows tie at rank 1; y resumes at 3 (gap semantics)
        "expecting_list": [
            {"name": "", "tag": "x", "rk": 1},
            {"name": "alpha", "tag": "x", "rk": 1},
            {"name": "beta", "tag": "y", "rk": 3},
            {"name": "delta", "tag": "z", "rk": 4},
        ],
    },
    {
        "name": "window_dense_rank_no_gaps",
        "query": {"from": "docs", "select": ["name", "tag"],
                  "window": [{"name": "rk", "aggregate": "dense_rank",
                              "sort": ["tag"]}],
                  "sort": ["tag", "name"]},
        "expecting_list": [
            {"name": "", "tag": "x", "rk": 1},
            {"name": "alpha", "tag": "x", "rk": 1},
            {"name": "beta", "tag": "y", "rk": 2},
            {"name": "delta", "tag": "z", "rk": 3},
        ],
    },
    {
        "name": "window_percentile_rank_nulls_least",
        "query": {"from": "docs", "select": ["name"],
                  "window": [{"name": "pr", "aggregate": "percentile_rank",
                              "sort": ["a"]}],
                  "sort": ["name"]},
        # sort by a: null least -> "" first; pr = (rank-1)/(n-1)
        "expecting_list": [
            {"name": "", "pr": 0.0},
            {"name": "alpha", "pr": 1.0 / 3.0},
            {"name": "beta", "pr": 2.0 / 3.0},
            {"name": "delta", "pr": 1.0},
        ],
    },
    {
        "name": "window_lead_offset_2",
        "query": {"from": "docs", "select": ["name"],
                  "window": [{"name": "nxt2", "value": "name",
                              "aggregate": "lead", "offset": 2,
                              "sort": ["name"]}],
                  "sort": ["name"]},
        "expecting_list": [
            {"name": "", "nxt2": "beta"},
            {"name": "alpha", "nxt2": "delta"},
            {"name": "beta", "nxt2": None},
            {"name": "delta", "nxt2": None},
        ],
    },
    {
        "name": "window_whole_edge_no_sort_is_partition_agg",
        "query": {"from": "docs", "select": ["name", "tag"],
                  "window": [{"name": "mx", "value": "b", "aggregate": "maximum",
                              "edges": ["tag"]}],
                  "sort": ["tag", "name"]},
        # no sort + no range -> the aggregate spans the whole edge
        "expecting_list": [
            {"name": "", "tag": "x", "mx": 30.0},
            {"name": "alpha", "tag": "x", "mx": 30.0},
            {"name": "beta", "tag": "y", "mx": None},
            {"name": "delta", "tag": "z", "mx": 40.0},
        ],
    },
    {
        "name": "window_first_running_frame_skips_nulls",
        "query": {"from": "docs", "select": ["name", "tag"],
                  "window": [{"name": "f", "value": "b", "aggregate": "first",
                              "edges": ["tag"], "sort": ["name"]}],
                  "sort": ["tag", "name"]},
        # running frame: first NON-NULL b so far within the edge
        "expecting_list": [
            {"name": "", "tag": "x", "f": 30.0},
            {"name": "alpha", "tag": "x", "f": 30.0},
            {"name": "beta", "tag": "y", "f": None},
            {"name": "delta", "tag": "z", "f": 40.0},
        ],
    },
    {
        "name": "window_over_aggregated_rows",
        "query": {"from": "docs", "groupby": "tag",
                  "select": [{"name": "n", "aggregate": "count"}],
                  "window": [{"name": "cum_n", "value": "n", "aggregate": "sum",
                              "sort": ["tag"], "range": {"max": 0}}],
                  "sort": ["tag"]},
        # groupby first, THEN the window runs over the aggregate rows
        "expecting_list": [
            {"tag": "x", "n": 2, "cum_n": 2},
            {"tag": "y", "n": 1, "cum_n": 3},
            {"tag": "z", "n": 1, "cum_n": 4},
        ],
    },
    {
        "name": "window_trailing_range_min_only",
        "query": {"from": "docs", "select": ["name"],
                  "window": [{"name": "t2", "value": "a", "aggregate": "sum",
                              "sort": ["name"], "range": {"min": -1, "max": 0}}],
                  "sort": ["name"]},
        # 2-row trailing sum, decisive (null a skipped): ""=None-> null
        # sum alone is null; alpha=(null,1)->1; beta=(1,2)->3; delta=6
        "expecting_list": [
            {"name": "", "t2": None},
            {"name": "alpha", "t2": 1.0},
            {"name": "beta", "t2": 3.0},
            {"name": "delta", "t2": 6.0},
        ],
    },
    # --- round-4 depth: dense cube formatter (VERDICT r3 item #4) ----
    {
        "name": "format_cube_three_edges_null_parts",
        "query": {"from": "docs",
                  "edges": [
                      {"name": "tag", "value": "tag", "allowNulls": True,
                       "domain": {"type": "set", "partitions": ["x", "y"]}},
                      {"name": "big", "value": {"gte": ["a", 2]},
                       "allowNulls": True,
                       "domain": {"type": "boolean"}},
                      {"name": "hasb", "value": {"exists": "b"},
                       "domain": {"type": "boolean"}},
                  ],
                  "select": [{"name": "n", "aggregate": "count"},
                             {"name": "asum", "value": "a", "aggregate": "sum"}],
                  "format": "cube"},
        # dims (sorted): tag [x, y, None] (z routes to the null part),
        # big [False, True, None] (a=None -> null comparison),
        # hasb [False, True]; every empty tuple exists with n=0
        "expecting_cube": {"data": {
            "n": [
                [[0, 1], [0, 0], [0, 1]],   # x: r1(F,T), r3(None,T)
                [[0, 0], [1, 0], [0, 0]],   # y: r2(T,F)
                [[0, 0], [0, 1], [0, 0]],   # null part: r4=z(T,T)
            ],
            "asum": [
                [[None, 1.0], [None, None], [None, None]],
                [[None, None], [2.0, None], [None, None]],
                [[None, None], [None, 4.0], [None, None]],
            ],
        }},
    },
    {
        "name": "format_cube_range_edge_buckets",
        "query": {"from": "docs",
                  "edges": [{"name": "bb", "value": "b",
                             "domain": {"type": "range", "min": 0, "max": 60,
                                        "interval": 20}}],
                  "select": [{"name": "n", "aggregate": "count"}],
                  "format": "cube"},
        # generated buckets 0/20/40; the b=None row has no bucket and
        # no null part is declared, so it vanishes from the cube
        "expecting_cube": {"data": {"n": [1, 1, 1]}},
    },
    {
        "name": "edges_two_with_window_after",
        "query": {"from": "docs",
                  "edges": [{"name": "tag", "value": "tag",
                             "domain": {"type": "set",
                                        "partitions": ["x", "y", "z"]}}],
                  "select": [{"name": "bsum", "value": "b", "aggregate": "sum",
                              "default": 0}],
                  "window": [{"name": "rk", "aggregate": "rank",
                              "sort": [{"field": "bsum", "sort": -1}]}],
                  "sort": ["tag"]},
        # edges agg (with default fill) feeds a rank window: x,z tie 40
        "expecting_list": [
            {"tag": "x", "bsum": 40.0, "rk": 1},
            {"tag": "y", "bsum": 0.0, "rk": 3},
            {"tag": "z", "bsum": 40.0, "rk": 1},
        ],
    },
    # --- round-5 depth: formatter x window composition (VERDICT r4
    # item #8) — the corners the r4 grid didn't cross: window columns
    # flowing through cube/table formatting, and windows over
    # deep-from (exploded) rows ------------------------------------
    {
        "name": "cube_with_window_over_groupby",
        "query": {"from": "docs", "groupby": "tag",
                  "select": [{"name": "n", "aggregate": "count"}],
                  "window": [{"name": "cum_n", "value": "n", "aggregate": "sum",
                              "sort": ["tag"], "range": {"max": 0}}],
                  "format": "cube"},
        # the window column is one more cube measure, same domains
        "expecting_cube": {"data": {"n": [2, 1, 1], "cum_n": [2, 3, 4]}},
    },
    {
        "name": "cube_with_window_rank_over_edges_null_part",
        "query": {"from": "docs",
                  "edges": [{"name": "tag", "value": "tag", "allowNulls": True,
                             "domain": {"type": "set",
                                        "partitions": ["x", "y", "w"]}}],
                  "select": [{"name": "bsum", "value": "b", "aggregate": "sum",
                              "default": 0}],
                  "window": [{"name": "rk", "aggregate": "rank",
                              "sort": [{"field": "bsum", "sort": -1}]}],
                  "format": "cube"},
        # domains sorted [w, x, y, None] (z routes to the null part);
        # w is a COMPLETELY empty part: its bsum is null (the default
        # coalesce runs inside the aggregate, which never fires for a
        # partition with no agg row) and desc_nulls_last ranks it 4;
        # x and the null part tie at 40 -> rank 1; y (all-null b,
        # default-filled to 0) -> rank 3
        "expecting_cube": {"data": {
            "bsum": [None, 40.0, 0.0, 40.0],
            "rk": [4, 1, 3, 1],
        }},
    },
    {
        "name": "table_with_window_rownum",
        "query": {"from": "docs", "select": ["name"],
                  "window": [{"name": "seq", "aggregate": "rownum",
                              "sort": ["name"]}],
                  "sort": ["name"], "format": "table"},
        # table format: window column rides as one more header column
        "expecting_table": {"header": ["name", "seq"],
                            "data": [["", 0], ["alpha", 1],
                                     ["beta", 2], ["delta", 3]]},
    },
    {
        "name": "deep_from_window_rownum_per_parent",
        "query": {"from": "docs.arr", "select": ["name", "arr"],
                  "window": [{"name": "idx", "aggregate": "rownum",
                              "edges": ["name"], "sort": ["arr"]}],
                  "sort": ["name", "arr"]},
        # windows run over the EXPLODED rows, partitioned by a parent
        # column; explode_outer keeps the arr=None parent as one row
        "expecting_list": [
            {"name": "", "arr": None, "idx": 0},
            {"name": "alpha", "arr": 1.0, "idx": 0},
            {"name": "alpha", "arr": 2.0, "idx": 1},
            {"name": "beta", "arr": 3.0, "idx": 0},
            {"name": "delta", "arr": 4.0, "idx": 0},
            {"name": "delta", "arr": 5.0, "idx": 1},
        ],
    },
    {
        "name": "deep_from_window_trailing_sum_by_parent_tag",
        "query": {"from": "docs.arr", "select": ["name", "tag", "arr"],
                  "window": [{"name": "t", "value": "arr", "aggregate": "sum",
                              "edges": ["tag"], "sort": ["arr"],
                              "range": {"min": -1, "max": 0}}],
                  "sort": ["tag", "arr"]},
        # 2-row trailing sum per parent tag over exploded elements;
        # x's arr=None row sorts first (nulls least) and its lone-null
        # frame sums to null
        "expecting_list": [
            {"name": "", "tag": "x", "arr": None, "t": None},
            {"name": "alpha", "tag": "x", "arr": 1.0, "t": 1.0},
            {"name": "alpha", "tag": "x", "arr": 2.0, "t": 3.0},
            {"name": "beta", "tag": "y", "arr": 3.0, "t": 3.0},
            {"name": "delta", "tag": "z", "arr": 4.0, "t": 4.0},
            {"name": "delta", "tag": "z", "arr": 5.0, "t": 9.0},
        ],
    },
    {
        "name": "cube_two_edges_with_window_dense_rank",
        "query": {"from": "docs",
                  "edges": [
                      {"name": "tag", "value": "tag",
                       "domain": {"type": "set", "partitions": ["x", "y", "z"]}},
                      {"name": "hasb", "value": {"exists": "b"},
                       "domain": {"type": "boolean"}},
                  ],
                  "select": [{"name": "n", "aggregate": "count"}],
                  "window": [{"name": "rk", "aggregate": "dense_rank",
                              "sort": [{"field": "n", "sort": -1}]}],
                  "format": "cube"},
        # dense_rank over ALL 6 cube cells (incl. empty n=0 parts),
        # then cube formatting lays both measures over tag x hasb
        "expecting_cube": {"data": {
            "n": [[0, 2], [1, 0], [0, 1]],
            "rk": [[3, 1], [2, 3], [3, 2]],
        }},
    },
    {
        "name": "cube_with_window_lag_over_groupby",
        "query": {"from": "docs", "groupby": "tag",
                  "select": [{"name": "asum", "value": "a", "aggregate": "sum"}],
                  "window": [{"name": "prev", "value": "asum", "aggregate": "lag",
                              "sort": ["tag"]}],
                  "format": "cube"},
        # lag across the aggregate rows, then cube: first part has no
        # predecessor -> None
        "expecting_cube": {"data": {
            "asum": [1.0, 2.0, 4.0],
            "prev": [None, 1.0, 2.0],
        }},
    },
    {
        "name": "deep_from_groupby_window_cube",
        "query": {"from": "docs.arr", "groupby": "name",
                  "select": [{"name": "m", "value": "arr",
                              "aggregate": "maximum"}],
                  "window": [{"name": "cum", "value": "m", "aggregate": "sum",
                              "sort": ["name"], "range": {"max": 0}}],
                  "format": "cube"},
        # the full chain: explode -> groupby -> window over the groups
        # -> cube; ""'s all-null group keeps m=None and the running
        # sum skips it (decisive null handling end to end)
        "expecting_cube": {"data": {
            "m": [None, 2.0, 3.0, 5.0],
            "cum": [None, 2.0, 5.0, 10.0],
        }},
    },
]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [tuple(d.get(k) for k in ("a", "b", "name", "tag", "arr")) for d in DOCS]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_golden(case, spark, docs_df):
    from mo_etl_spark.jx.formats import format_result
    from mo_etl_spark.jx.query import jx_run

    df = jx_run(case["query"], spark=spark, tables={"docs": docs_df})
    if "expecting_list" in case:
        got = [r.asDict(recursive=True) for r in df.collect()]
        want = case["expecting_list"]
        if "sorted_by" in case:
            key = case["sorted_by"]
            sk = lambda r: (r[key] is None, str(r[key]))  # noqa: E731
            got, want = sorted(got, key=sk), sorted(want, key=sk)
        assert got == want
    elif "expecting_table" in case:
        assert format_result(df, case["query"]) == case["expecting_table"]
    elif "expecting_cube" in case:
        cube = format_result(df, case["query"])
        assert cube["data"] == case["expecting_cube"]["data"]
    elif "expecting_cube_shape" in case:
        cube = format_result(df, case["query"])
        want = case["expecting_cube_shape"]
        assert len(cube["edges"]) == want["n_edges"]
        assert sorted(cube["data"]) == sorted(want["selects"])
        d0 = cube["edges"][0]["domain"]["partitions"]
        d1 = cube["edges"][1]["domain"]["partitions"]
        for sel in want["selects"]:
            m = cube["data"][sel]
            assert len(m) == len(d0) and all(len(row) == len(d1) for row in m)
        # counts reconcile with the flat result
        flat = sum(r["n"] for r in df.collect())
        assert flat == sum(x for row in cube["data"]["n"] for x in row)
    else:
        raise AssertionError("case declares no expectation")


# --- null-safe navigation & sort-null golden cases --------------------


def test_sort_nulls_are_least(spark, docs_df):
    """jx sort: nulls are 'least' — first ascending, last descending
    (u, jx_python/jx.py sort)."""
    from mo_etl_spark.jx.query import jx_run

    asc = [r["a"] for r in jx_run(
        {"from": docs_df, "select": ["a"], "sort": "a"}).collect()]
    desc = [r["a"] for r in jx_run(
        {"from": docs_df, "select": ["a"], "sort": [{"field": "a", "sort": -1}]}
    ).collect()]
    assert asc == [None, 1.0, 2.0, 4.0]
    assert desc == [4.0, 2.0, 1.0, None]


def test_null_safe_navigation(spark):
    """mo-dots Null absorption (u, mo_dots/nones.py: Null.x.y[3] -> Null):
    dot-paths through missing structs and out-of-bounds element access
    yield Null, never an error."""
    from mo_etl_spark.jx.expressions import jx_expr

    df = spark.createDataFrame(
        [
            (1, {"b": {"c": 7.0}}, [1.0, 2.0]),
            (2, None, [3.0]),
            (3, {"b": None}, None),
        ],
        "id long, a struct<b: struct<c: double>>, arr array<double>",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            jx_expr("a.b.c", df).alias("deep"),
            jx_expr({"add": ["a.b.c", 1]}, df).alias("deep_plus"),
            jx_expr({"first_array": "arr"}, df).alias("head"),
            jx_expr({"last_array": "arr"}, df).alias("tail"),
        ).collect()
    }
    assert rows[1]["deep"] == 7.0 and rows[1]["deep_plus"] == 8.0
    assert rows[2]["deep"] is None
    # decisive add: missing operand skipped -> the known operand (1)
    assert rows[2]["deep_plus"] == 1.0
    assert rows[3]["deep"] is None
    assert rows[3]["head"] is None and rows[3]["tail"] is None


def test_element_at_out_of_bounds_is_null(spark):
    """Array index past the end -> Null (ANSI off), matching FlatList."""
    from pyspark.sql import functions as F
    from mo_etl_spark.session import prepare

    prepare(spark)
    df = spark.createDataFrame([([1.0, 2.0],)], "arr array<double>")
    r = df.select(
        F.element_at("arr", 5).alias("past"),
        F.element_at("arr", -5).alias("before"),
    ).collect()[0]
    assert r["past"] is None and r["before"] is None
