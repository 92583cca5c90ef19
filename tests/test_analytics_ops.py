"""Behavior tests for the analytics-batch operators: HLL rollup
accuracy, Z-order two-dimensional pruning, SCD2 merge invariants, and
funnel/trailing-distinct sanity."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_hll_rollup_estimate_close_to_exact(spark):
    from mo_etl_spark.suites.analytics import agg_hll_mergeable_rollup
    from mo_etl_spark.tables import load_table

    row = agg_hll_mergeable_rollup(spark, SF).first()
    exact = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert row["n_events"] == load_table(spark, SF, "events").count()
    assert row["exact_users"] == exact
    # DataSketches HLL at default lgK=12 is ~1.6% RSE; 150 distinct
    # values are far below sparse-mode capacity so it is exact-ish —
    # the query itself asserts |est - exact|/exact <= 5% as a boolean
    assert row["approx_ok"] is True


def test_funnel_stage_counts_monotone(spark):
    from mo_etl_spark.suites.analytics import win_funnel_signup_purchase
    from mo_etl_spark.tables import load_table

    rows = {r["stage"]: r["users"] for r in win_funnel_signup_purchase(spark, SF).collect()}
    assert rows["1_signup"] >= rows["2_click_after_signup"] >= rows["3_purchase_after_click"]
    exact_signup = (
        load_table(spark, SF, "events")
        .where(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows["1_signup"] == exact_signup


def test_trailing_distinct_bounded_by_daily_and_total(spark):
    from mo_etl_spark.suites.analytics import win_trailing_distinct_users
    from mo_etl_spark.tables import load_table

    e = load_table(spark, SF, "events")
    daily = {
        r["day_num"]: r["n"]
        for r in e.select(F.unix_date(F.to_date("ts")).cast("long").alias("day_num"), "user_id")
        .groupBy("day_num")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total = e.select("user_id").distinct().count()
    for r in win_trailing_distinct_users(spark, SF).collect():
        assert daily[r["day_num"]] <= r["users_7d"] <= total


def test_scd2_merge_invariants(spark):
    from mo_etl_spark.suites.analytics import etl_scd2_customer_merge
    from mo_etl_spark.tables import load_table

    out = etl_scd2_customer_merge(spark, SF).cache()
    n_dim = load_table(spark, SF, "customer").count()

    # exactly one current row per key, always
    bad = (
        out.where("is_current")
        .groupBy("c_custkey")
        .count()
        .where("count <> 1")
        .count()
    )
    assert bad == 0

    # closed rows exist exactly for the truly-changed keys (%10 in 3,7
    # within the original dim), never for the no-op echo keys (%10 == 9)
    closed = out.where("NOT is_current")
    assert closed.where("c_custkey % 10 NOT IN (3, 7)").count() == 0
    assert closed.where("valid_to <> '2024-06-01'").count() == 0
    n_changed = closed.count()

    # inserted keys (> 1000000) are current-only, opened at batch date
    ins = out.where("c_custkey > 1000000")
    assert ins.where("NOT is_current OR valid_from <> '2024-06-01'").count() == 0

    # row accounting: dim rows + one new version per change + inserts
    assert out.count() == n_dim + n_changed + ins.count()
    out.unpersist()


@pytest.mark.parametrize("probe", [("bx", 32, 63), ("by", 96, 127)])
def test_zorder_layout_prunes_either_dimension(spark, tmp_path, probe):
    """After repartitionByRange+sort on the Morton key, each parquet
    file covers a compact Z-curve segment, so its min/max box is tight
    in BOTH bucketed dimensions — a 1/8-wide predicate on either single
    dimension must skip at least half the files.  (A layout sorted on
    bx alone would give every file the full `by` range: no pruning for
    by-predicates.)"""
    from mo_etl_spark.suites.analytics import layout_zorder_orders

    col, lo, hi = probe
    path = str(tmp_path / "zorders")
    (
        layout_zorder_orders(spark, SF)
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 6
    touched = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if fmin <= hi and fmax >= lo:
            touched += 1
    assert touched <= len(files) // 2, f"{col} in [{lo},{hi}] touched {touched}/{len(files)}"


def test_interval_overlap_matches_theta_join(spark):
    """The bucketed overlap join must equal the naive theta join."""
    from pyspark.sql import functions as F

    from mo_etl_spark.suites.analytics import join_interval_overlap_sessions
    from mo_etl_spark.tables import load_table

    got = {
        (r["u1"], r["u2"], r["a_start_ms"], r["b_start_ms"], r["overlap_ms"])
        for r in join_interval_overlap_sessions(spark, SF).collect()
    }
    # independent theta-join reference built from the same intervals
    from pyspark.sql import Window

    e = load_table(spark, SF, "events").where("user_id < 20")
    ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    order = Window.partitionBy("user_id").orderBy("ms", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = e.select("user_id", "event_id", ms.alias("ms"))
    brk = F.when(F.col("ms") - F.lag("ms").over(order) > 1800000, 1).otherwise(0)
    iv = (
        pts.withColumn("sid", F.sum(brk).over(cum))
        .groupBy("user_id", "sid")
        .agg(F.min("ms").alias("s_ms"), (F.max("ms") + 3600000).alias("e_ms"))
    )
    a, b = iv.alias("a"), iv.alias("b")
    ref = {
        tuple(r)
        for r in a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_ms") <= F.col("b.e_ms"))
            & (F.col("b.s_ms") <= F.col("a.e_ms")),
        )
        .select(
            F.col("a.user_id"),
            F.col("b.user_id"),
            F.col("a.s_ms"),
            F.col("b.s_ms"),
            F.least(F.col("a.e_ms"), F.col("b.e_ms"))
            - F.greatest(F.col("a.s_ms"), F.col("b.s_ms")),
        )
        .collect()
    }
    assert got == ref and len(got) > 0


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    from pyspark.sql import functions as F

    from mo_etl_spark.suites.analytics import graph_pagerank_supply

    pr = graph_pagerank_supply(spark, SF).cache()
    n = pr.count()
    total = pr.agg(F.sum("rank_scaled")).first()[0]
    assert abs(total - n) / n < 1e-4  # no dangling loss
    # supplier nodes aggregate many parts' mass -> highest ranks are suppliers
    top = pr.orderBy(F.desc("rank_scaled")).limit(5).collect()
    assert all(r["node"] >= 1000000 for r in top)
    pr.unpersist()


def test_paragraph_dedup_keeps_first_doc_intact(spark):
    from pyspark.sql import functions as F

    from mo_etl_spark.suites.analytics import llm_dedup_paragraph_reassemble
    from mo_etl_spark.tables import load_table

    out = llm_dedup_paragraph_reassemble(spark, SF).cache()
    first = out.where("doc_id = 0").first()
    orig = load_table(spark, SF, "documents").where("doc_id = 0").first()["text"]
    # doc 0 is scanned first in dedup order, so every segment survives
    assert first["n_kept"] == first["n_segs"]
    assert first["text_dedup"] == orig
    # corpus-wide: kept segments == distinct segment texts
    n_kept = out.agg(F.sum("n_kept")).first()[0]
    toks = load_table(spark, SF, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    n_distinct = (
        toks.select(
            F.explode(
                F.sequence(F.lit(0), F.ceil(F.size("t") / 10.0).cast("int") - 1)
            ).alias("i"),
            "t",
        )
        .select(F.array_join(F.slice("t", F.col("i") * 10 + 1, 10), " ").alias("seg"))
        .distinct()
        .count()
    )
    assert n_kept == n_distinct
    out.unpersist()


def test_histogram_sketch_brackets_exact_quantiles(spark):
    from pyspark.sql import functions as F

    from mo_etl_spark.suites.analytics import agg_histogram_quantile_sketch
    from mo_etl_spark.tables import load_table

    est = {
        r["l_returnflag"]: r for r in agg_histogram_quantile_sketch(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(cents, 0.5)").alias("p50"),
            F.expr("percentile(cents, 0.95)").alias("p95"),
        )
        .collect()
    }
    for flag, e in est.items():
        # estimate is the lower bound of the bin holding the quantile
        assert abs(e["est_p50_cents"] - exact[flag]["p50"]) <= 10000
        assert abs(e["est_p95_cents"] - exact[flag]["p95"]) <= 10000


def test_compaction_groups_bounded(spark):
    from pyspark.sql import functions as F

    from mo_etl_spark.suites.analytics import etl_compaction_binpack

    out = etl_compaction_binpack(spark, SF).cache()
    TARGET = 100000000
    max_file = out.agg(F.max("size_bytes")).first()[0]
    grp = out.groupBy("month_ms", "compaction_group").agg(
        F.sum("size_bytes").alias("sz")
    )
    # a group overflows by at most one trailing file
    assert grp.where(F.col("sz") > TARGET + max_file).count() == 0
    # consecutive groups per month (no holes)
    holes = (
        out.groupBy("month_ms")
        .agg(F.max("compaction_group").alias("mx"), F.countDistinct("compaction_group").alias("n"))
        .where(F.col("n") != F.col("mx") + 1)
        .count()
    )
    assert holes == 0
    out.unpersist()


def test_capped_sessionize_respects_gap_and_cap(spark):
    from pyspark.sql import functions as F

    from mo_etl_spark.suites.analytics import win_sessionize_capped
    from mo_etl_spark.tables import load_table

    sess = win_sessionize_capped(spark, SF)
    e = load_table(spark, SF, "events").where("user_id < 40")
    ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    joined = sess.join(e.select("event_id", ms.alias("ms")), "event_id")
    spans = joined.groupBy("user_id", "session_idx").agg(
        F.min("ms").alias("lo"), F.max("ms").alias("hi"), F.count("*").alias("n")
    )
    # hard duration cap holds for every session
    assert spans.where(F.col("hi") - F.col("lo") > 14400000).count() == 0
    # sessions are at least as fragmented as gap-only sessionization
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("ms", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = e.select("user_id", "event_id", ms.alias("ms"))
    brk = F.when(F.col("ms") - F.lag("ms").over(order) > 1800000, 1).otherwise(0)
    gap_only = (
        pts.withColumn("sid", F.sum(brk).over(cum))
        .groupBy("user_id")
        .agg(F.countDistinct("sid").alias("n_gap"))
    )
    capped = sess.groupBy("user_id").agg(
        F.countDistinct("session_idx").alias("n_cap")
    )
    assert (
        gap_only.join(capped, "user_id").where(F.col("n_cap") < F.col("n_gap")).count()
        == 0
    )


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """direction='nearest' must agree with pandas merge_asof row for
    row (the operator's documented parity contract)."""
    import pandas as pd

    from mo_etl_spark.operators.joins import asof_join
    from mo_etl_spark.tables import load_table

    e = load_table(spark, SF, "events")
    purchases = e.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = e.where("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        r["event_id"]: r["m_click_id"]
        for r in asof_join(
            purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
            right_prefix="m_", direction="nearest",
        ).collect()
    }
    lp = purchases.toPandas().sort_values("ts")
    rp = clicks.toPandas().sort_values("ts")
    ref = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="nearest"
    )
    refmap = {
        int(r.event_id): (None if pd.isna(r.click_id) else int(r.click_id))
        for r in ref.itertuples()
    }
    assert got == refmap


def test_ewma_matches_python_recurrence(spark):
    from mo_etl_spark.operators.timeseries import ewma_halving
    from mo_etl_spark.tables import load_table

    e = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", (F.round(F.col("value") * 100)).cast("long").alias("vc")
    )
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma_halving(e, "user_id", "ts", "vc", "event_id").collect()
    }
    rows = e.collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[r["user_id"]].append((r["ts"], r["event_id"], r["vc"]))
    want = {}
    for u, evs in groups.items():
        s = None
        for ts, eid, x in sorted(evs):
            s = float(x) if s is None else (x + s) / 2.0
            want[(u, eid)] = s
    assert got == want  # bit-exact: same recurrence, same order


def test_triangles_matches_bruteforce(spark):
    """Degree-ordered triangle listing is orientation-invariant: on a
    seeded random graph plus a high-degree hub, the listing equals the
    brute-force a<b<c enumeration, with no duplicates."""
    import itertools
    import random

    from mo_etl_spark.operators.graph import triangles

    rng = random.Random(7)
    n = 40
    edges = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.12}
    edges |= {(0, b) for b in range(1, n, 2)}  # hub at vertex 0
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {
        (a, b, c)
        for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    }
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
    assert got == expected
    assert triangles(df).count() == len(expected)  # no dup rows


def test_gini_and_mad_known_values(spark):
    """Gini: all-equal -> 0; single holder owns everything ->
    (n-1)/n.  MAD: unaffected by one wild outlier (robustness), which
    the stddev-based z-score would absorb."""
    from pyspark.sql import Window

    # gini formula replicated on inline fixtures via the same ranked sums
    def gini_of(vals):
        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)], "g int, k int, x long"
        )
        ranked = df.withColumn(
            "i", F.row_number().over(Window.partitionBy("g").orderBy("x", "k"))
        )
        row = (
            ranked.groupBy("g")
            .agg(
                (
                    (2.0 * F.sum(F.col("i") * F.col("x")))
                    / (F.count("*") * F.sum("x"))
                    - (F.count("*") + 1.0) / F.count("*")
                ).alias("gini")
            )
            .collect()[0]
        )
        return row["gini"]

    assert abs(gini_of([5, 5, 5, 5])) < 1e-12
    assert abs(gini_of([0, 0, 0, 100]) - 3 / 4) < 1e-12

    vals = [10.0] * 99 + [10000.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    med = df.agg(F.median("value")).collect()[0][0]
    mad = df.select(F.abs(F.col("value") - F.lit(med)).alias("d")).agg(
        F.median("d")
    ).collect()[0][0]
    assert med == 10.0 and mad == 0.0  # outlier invisible to MAD
    std = df.agg(F.stddev_samp("value")).collect()[0][0]
    assert std > 900  # ...but it owns the stddev


def test_holt_tracks_linear_trend(spark):
    """Holt invariants: a constant series has zero trend and forecast
    == level == the constant; a linear ramp's forecast converges onto
    the next true value (EWMA, trendless, lags it forever)."""
    from mo_etl_spark.operators.timeseries import holt_halving

    rows = [(1, i, i, 100) for i in range(20)]          # constant 100
    rows += [(2, i, i, 10 * (i + 1)) for i in range(40)]  # ramp 10,20,...
    df = spark.createDataFrame(rows, "k long, t long, i long, x long")
    out = holt_halving(df, key="k", ts="t", value_col="x", id_col="i").collect()
    const = sorted((r for r in out if r["k"] == 1), key=lambda r: r["i"])
    assert all(r["trend"] == 0.0 and r["forecast"] == 100.0 for r in const)
    ramp = sorted((r for r in out if r["k"] == 2), key=lambda r: r["i"])
    last = ramp[-1]
    next_true = 10 * (len(ramp) + 1)
    assert abs(last["forecast"] - next_true) < 1.0, last


def test_kcore_peels_whiskers(spark):
    """2-core of a cycle with attached whiskers = exactly the cycle
    (every whisker node peels, cycle nodes keep degree 2); an acyclic
    tree's 2-core is empty."""
    from mo_etl_spark.operators.graph import kcore

    cycle = [(1, 2), (2, 3), (3, 4), (1, 4)]
    whiskers = [(4, 9), (9, 10), (2, 7)]
    df = spark.createDataFrame(cycle + whiskers, "a long, b long")
    got = {r["node"]: r["deg"] for r in kcore(df, k=2, iters=8).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}

    tree = spark.createDataFrame([(1, 2), (1, 3), (2, 4), (2, 5)], "a long, b long")
    assert kcore(tree, k=2, iters=8).count() == 0


def test_bfs_hops_matches_brute_force(spark):
    """Frontier BFS must equal a driver-side Dijkstra-free BFS on a
    small random graph: same reachable set, same minimum distances,
    nothing beyond the hop bound."""
    import random
    from collections import deque

    from mo_etl_spark.operators.graph import bfs_hops

    rng = random.Random(7)
    n = 60
    canon = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(120)})
    edges = spark.createDataFrame(
        [(a, b) for a, b in canon] + [(b, a) for a, b in canon], "src int, dst int"
    )
    srcs = [0, 1, 2]
    sources = spark.createDataFrame([(s,) for s in srcs], "node int")
    got = {r["node"]: r["dist"] for r in bfs_hops(edges, sources, max_hops=4).collect()}

    adj: dict[int, list[int]] = {}
    for a, b in canon:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    want = {s: 0 for s in srcs}
    q = deque(srcs)
    while q:
        u = q.popleft()
        if want[u] >= 4:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


def test_grid_radius_join_equals_brute_force(spark):
    """Grid bucketing with r <= g is exact: pair set and distances must
    equal the cross-join filter, including r strictly below g and
    points straddling cell borders."""
    import random

    from pyspark.sql import functions as F

    from mo_etl_spark.operators.spatial import grid_radius_join

    rng = random.Random(11)
    pts_rows = [(i, rng.randrange(0, 10**6), rng.randrange(0, 10**6)) for i in range(300)]
    ctr_rows = [(j, rng.randrange(0, 10**6), rng.randrange(0, 10**6)) for j in range(20)]
    pts = spark.createDataFrame(pts_rows, "pid int, x long, y long")
    ctr = spark.createDataFrame(ctr_rows, "cid int, cx long, cy long")
    for g, r in ((125000, 125000), (125000, 60000)):
        got = {
            (q["pid"], q["cid"]): q["d2"]
            for q in grid_radius_join(pts, ctr, g=g, r=r).collect()
        }
        want = {
            (i, j): (x - cx) ** 2 + (y - cy) ** 2
            for i, x, y in pts_rows
            for j, cx, cy in ctr_rows
            if (x - cx) ** 2 + (y - cy) ** 2 <= r * r
        }
        assert got == want, f"g={g} r={r}"

    import pytest

    with pytest.raises(ValueError):
        grid_radius_join(pts, ctr, g=1000, r=2000)


def test_label_propagation_two_cliques(spark):
    """Two 5-cliques joined by a single bridge edge must settle into
    two communities labeled by each clique's smallest node."""
    from mo_etl_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    c2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    canon = c1 + c2 + [(4, 10)]
    edges = spark.createDataFrame(
        canon + [(b, a) for a, b in canon], "src int, dst int"
    )
    got = {r["node"]: r["community"] for r in label_propagation(edges, iters=4).collect()}
    assert {got[n] for n in range(5)} == {0}
    assert {got[n] for n in range(10, 15)} == {10}


def test_skyline_matches_quadratic_definition(spark):
    """Window-based skyline == brute-force dominance scan, including
    duplicate points and same-price ties."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = [(i, rng.randrange(1, 40), rng.randrange(1, 40)) for i in range(200)]
    rows += [(1000, 5, 5), (1001, 5, 5)]  # exact duplicates both survive or both die
    pts = spark.createDataFrame(rows, "k int, price long, size int")
    w_cheaper = Window.orderBy("price").rangeBetween(Window.unboundedPreceding, -1)
    w_same = Window.partitionBy("price")
    got = {
        r["k"]
        for r in pts.select(
            "k",
            "price",
            "size",
            F.max("size").over(w_cheaper).alias("bc"),
            F.max("size").over(w_same).alias("bs"),
        )
        .where((F.col("bc").isNull() | (F.col("bc") < F.col("size"))) & (F.col("bs") == F.col("size")))
        .collect()
    }
    want = {
        k
        for k, p, s in rows
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for _, p2, s2 in rows
        )
    }
    assert got == want


def test_dbscan_composition_roles(spark):
    """Hand-built geometry: a tight 5-point blob (all core, one
    cluster), a satellite within eps of one blob member but with a
    thin neighborhood (border, inherits the blob's cluster), and a
    far-away point (noise).  Mirrors the query's composition:
    grid join -> core count -> CC -> min-cluster border adoption."""
    from pyspark.sql import functions as F

    from mo_etl_spark.operators.dedup import connected_components
    from mo_etl_spark.operators.spatial import grid_radius_join

    eps, min_pts = 10, 4
    rows = [(1, 0, 0), (2, 3, 0), (3, 0, 3), (4, 3, 3), (5, 2, 2),
            (6, 12, 0),   # within eps of (2) only -> 2 neighbors incl self -> border
            (7, 500, 500)]
    pts = spark.createDataFrame(rows, "pid int, x long, y long")
    ctr = pts.select(F.col("pid").alias("cid"), F.col("x").alias("cx"), F.col("y").alias("cy"))
    pairs = grid_radius_join(pts, ctr, g=eps, r=eps, broadcast_centers=False).select("pid", "cid")
    core = (
        pairs.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_pts).select("pid")
    )
    assert {r["pid"] for r in core.collect()} == {1, 2, 3, 4, 5}
    cedges = (
        pairs.where(F.col("pid") < F.col("cid"))
        .join(core.withColumnRenamed("pid", "pa"), F.col("pid") == F.col("pa"))
        .join(core.withColumnRenamed("pid", "pb"), F.col("cid") == F.col("pb"))
        .select(F.col("pid").alias("id_a"), F.col("cid").alias("id_b"))
    )
    comp = connected_components(cedges)
    assert {r["component"] for r in comp.collect()} == {1}
    border = (
        pairs.where(F.col("pid") != F.col("cid"))
        .join(core.withColumnRenamed("pid", "k"), F.col("cid") == F.col("k"))
        .join(core.withColumnRenamed("pid", "kk"), F.col("pid") == F.col("kk"), "left_anti")
        .groupBy("pid").agg(F.count(F.lit(1)).alias("nc"))
    )
    assert {r["pid"] for r in border.collect()} == {6}


def test_sssp_improves_over_lighter_longer_path(spark):
    """A 2-hop path of weight 3 must beat the direct edge of weight
    10 — the case visited-set BFS pruning would get wrong."""
    from mo_etl_spark.operators.graph import sssp_hops

    edges = spark.createDataFrame(
        [(0, 2, 10), (0, 1, 1), (1, 2, 2), (2, 3, 1)],
        "src int, dst int, w long",
    )
    sources = spark.createDataFrame([(0,)], "node int")
    got = {r["node"]: r["dist"] for r in sssp_hops(edges, sources, max_iters=4).collect()}
    assert got == {0: 0, 1: 1, 2: 3, 3: 4}
