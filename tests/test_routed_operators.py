"""Equivalence guards for the size/skew-ROUTED operator variants added
in round 2: a routed fast path must be observationally identical to
its reference form on adversarial inputs, or the routing is a bug, not
an optimization.

- sessionize_skew / sessionize_two_phase vs the single-window form:
  randomized event sets with planted boundary hazards (events exactly
  gap_ms apart, events straddling bucket boundaries, duplicate
  timestamps resolved by id, empty buckets between events).
- connected_components: the single-task union-find path vs the
  iterative min-label + pointer-jumping path (forced via
  local_cutoff=0) on random graphs incl. chains (worst diameter),
  stars, and disjoint cliques.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

GAP_MS = 1_800_000
BUCKET_MS = 3_600_000


def _window_sessionize(df):
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ems = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    gap = ems - F.lag(ems).over(order)
    return df.select(
        "event_id",
        "user_id",
        F.sum(F.when(gap > GAP_MS, 1).otherwise(0)).over(cum).alias("session_idx"),
    )


def _random_events(seed: int, n_users: int = 6, n_events: int = 400):
    rng = random.Random(seed)
    base = 1_700_000_000_000
    rows = []
    eid = 0
    for u in range(n_users):
        t = base
        for _ in range(n_events // n_users):
            choice = rng.random()
            if choice < 0.25:
                t += GAP_MS  # exactly the gap: must NOT split (> not >=)
            elif choice < 0.45:
                t += GAP_MS + 1  # just over: must split
            elif choice < 0.55:
                t += BUCKET_MS * rng.randint(2, 5)  # empty buckets between
            elif choice < 0.65:
                t += 0  # duplicate timestamp, id breaks the tie
            else:
                t += rng.randint(1, BUCKET_MS)
            rows.append((eid, u, t))
            eid += 1
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sessionize_routed_equals_window_form(spark, seed):
    from mo_etl_spark.operators.timeseries import sessionize_skew, sessionize_two_phase

    rows = _random_events(seed)
    df = spark.createDataFrame(rows, "event_id long, user_id long, ems long").select(
        "event_id", "user_id", F.timestamp_millis("ems").alias("ts")
    )
    want = {
        (r["event_id"]): (r["user_id"], r["session_idx"])
        for r in _window_sessionize(df).collect()
    }
    for fn, kwargs in [
        (sessionize_two_phase, {}),
        (sessionize_skew, {"hot_threshold": 1, "hot_frac": 0.0}),  # everything hot
        (sessionize_skew, {"hot_threshold": 10**9}),  # everything cold
        (sessionize_skew, {"hot_threshold": 50, "hot_frac": 0.1}),  # mixed legs
    ]:
        got = {
            (r["event_id"]): (r["user_id"], r["session_idx"])
            for r in fn(df, gap_ms=GAP_MS, bucket_ms=BUCKET_MS, **kwargs).collect()
        }
        assert got == want, (fn.__name__, kwargs)


def _graphs():
    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(40)]  # diameter 40 — worst for propagation
    star = [(0, i) for i in range(1, 30)]
    cliques = [
        (100 * c + a, 100 * c + b)
        for c in range(5)
        for a in range(6)
        for b in range(a + 1, 6)
    ]
    rand = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 60), rng.randint(0, 60)) for _ in range(120)
            )
            if a != b
        }
    )
    return {"chain": chain, "star": star, "cliques": cliques, "random": rand}


def test_connected_components_local_equals_iterative(spark):
    from mo_etl_spark.operators.dedup import connected_components

    for name, edges in _graphs().items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        local = {
            r["id"]: (r["component"], r["csize"])
            for r in connected_components(df).collect()
        }
        iterative = {
            r["id"]: (r["component"], r["csize"])
            for r in connected_components(df, local_cutoff=0).collect()
        }
        assert local == iterative, name
        # min-label invariant: every component is labeled by its min id
        for node, (comp, _) in local.items():
            assert comp <= node, name


def test_topk_routed_branches(spark):
    """Exact branch must equal brute force verbatim; the IVF branch
    (forced via exact_cutoff=0) must keep high recall vs exact on the
    real embeddings table."""
    from mo_etl_spark.operators.similarity import brute_force_topk, topk_routed
    from mo_etl_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    k = 5
    exact = {
        (r["q_id"], r["rnk"]): r["c_id"]
        for r in brute_force_topk(q, c, k).collect()
    }
    routed = {
        (r["q_id"], r["rnk"]): r["c_id"]
        for r in topk_routed(q, c, k).collect()
    }
    assert routed == exact  # small corpus -> exact branch, verbatim

    ivf = topk_routed(q, c, k, exact_cutoff=0, n_cells=8, nprobe=4).collect()
    got = {(r["q_id"], r["c_id"]) for r in ivf}
    want = {(qr, cid) for (qr, _), cid in exact.items()}
    recall = len(got & want) / len(want)
    assert recall >= 0.6, recall  # nprobe=4 of 8 cells


def test_embed_dups_routed_branches(spark):
    """Exact branch == embed_cosine_dups verbatim; cell branch (forced)
    must recover planted near-dups that share a cell and stay sound
    (every reported pair really is above threshold per exact check)."""
    from mo_etl_spark.operators.dedup import embed_cosine_dups, embed_dups_routed
    from mo_etl_spark.operators.similarity import as_double
    from mo_etl_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    planted = emb.where(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            as_double(F.col("embedding")),
            lambda x, i: F.when(i == 0, x + F.lit(0.01)).otherwise(x),
        ).alias("v"),
    )
    aug = base.unionByName(planted)
    exact = {
        r["dup_id"]: r["keep_id"] for r in embed_cosine_dups(aug, 0.99).collect()
    }
    routed = {
        r["dup_id"]: r["keep_id"] for r in embed_dups_routed(aug, 0.99).collect()
    }
    assert routed == exact  # small corpus -> exact branch

    cell = {
        r["dup_id"]: r["keep_id"]
        for r in embed_dups_routed(aug, 0.99, exact_cutoff=0, n_cells=8).collect()
    }
    # soundness: the cell path may only report pairs the exact path knows
    assert set(cell).issubset(set(exact))
    # recall on planted dups (source and copy nearly identical -> same cell)
    planted_ids = {i + 10000 for i in range(30)} & set(exact)
    found = {d for d in cell if d in planted_ids}
    assert len(found) >= 0.8 * len(planted_ids), (len(found), len(planted_ids))


def test_routed_hint_skips_materialization(spark, monkeypatch):
    """VERDICT r2 perf-weak #1 + ADVICE r3 #1: with a caller-supplied
    row/edge count the routed operators must never run a routing-gate
    count() job, and may localCheckpoint ONLY as the single
    materialization in front of a genuine fan-out (a branch that
    consumes the input more than once) — anything beyond that bound
    re-introduces either the gate job or the double evaluation.
    count() is made to explode for the duration of every routing
    call; localCheckpoint is counted and bounded per operator
    (collect() happens after restoring, so only routing is policed)."""
    from pyspark.sql import DataFrame

    from mo_etl_spark.operators.dedup import connected_components, embed_dups_routed
    from mo_etl_spark.operators.similarity import as_double, topk_routed
    from mo_etl_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    vecs = emb.where(F.col("vec_id") < 40).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )

    def boom(self, *a, **k):  # pragma: no cover - must not run
        raise AssertionError("routing-gate count() job despite size hint")

    # patch the CONCRETE class (pyspark 4 classic DataFrame overrides
    # these on a subclass of the pyspark.sql.DataFrame facade)
    cls = type(c)
    assert isinstance(c, DataFrame)
    calls = {"ckpt": 0}
    real_ckpt = cls.localCheckpoint

    def counting_ckpt(self, *a, **k):
        calls["ckpt"] += 1
        return real_ckpt(self, *a, **k)

    plans = []
    with monkeypatch.context() as m:
        m.setattr(cls, "count", boom)
        m.setattr(cls, "localCheckpoint", counting_ckpt)
        # exact top-k branch: single corpus consumer -> ZERO checkpoints
        plans.append(topk_routed(q, c, 3, n_rows=1000))
        assert calls["ckpt"] == 0
        # exact embed-dup branch self-joins the input -> exactly ONE
        # fan-out checkpoint, none for the gate
        plans.append(embed_dups_routed(vecs, 0.99, n_rows=40))
        assert calls["ckpt"] == 1
        # local CC: raw pairs feed the union-find once (no input
        # checkpoint); its OUTPUT is checkpointed once because it
        # feeds both the sizes agg and the labels-sizes join
        plans.append(connected_components(edges, n_edges=30))
        assert calls["ckpt"] == 2
    # the plans stay lazy through routing; they must still EXECUTE correctly
    assert plans[0].count() > 0
    plans[1].collect()  # may be empty (no dups planted) - just must run
    comps = {r["id"]: r["component"] for r in plans[2].collect()}
    assert set(comps.values()) == {0}  # one chain -> one component, min id 0

    # distributed route with a hint: still zero count() jobs; ckpts
    # bounded by raw-fan-out guard + edges + one per label iteration
    max_iter = 8
    calls["ckpt"] = 0
    with monkeypatch.context() as m:
        m.setattr(cls, "count", boom)
        m.setattr(cls, "localCheckpoint", counting_ckpt)
        dist = connected_components(edges, n_edges=30, local_cutoff=0, max_iter=max_iter)
        routing_ckpts = calls["ckpt"]
    assert 2 <= routing_ckpts <= 2 + max_iter, routing_ckpts
    got = {r["id"]: r["component"] for r in dist.collect()}
    assert got == comps


def test_union_find_numpy_handles_string_ids_and_empty(spark):
    """The array-based union-find (ADVICE r2: dict state was ~1 GB at
    the cutoff) must keep the dict version's type-generality: string
    ids and empty inputs."""
    from mo_etl_spark.operators.dedup import connected_components

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("c", "a")], "id_a string, id_b string"
    )
    got = {r["id"]: (r["component"], r["csize"]) for r in connected_components(df).collect()}
    assert got == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "x": ("x", 2), "y": ("x", 2),
    }
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_bpe_rounds_survive_fully_merged_corpus(spark):
    """ADVICE r2: once every word is a single symbol the per-round
    argmax is EMPTY; the merge rewrite must become the identity, not
    collapse seq to zero rows.  A 1-word corpus is fully merged after
    1 round; training for 4 rounds must still yield the merged vocab."""
    from mo_etl_spark.operators.text import bpe_merge_rounds, bpe_vocab

    words = spark.createDataFrame([("ab", 7)], "w string, freq long")
    vocab = {r["sym"]: r["n"] for r in bpe_vocab(words, rounds=4, top=10).collect()}
    assert vocab == {"ab": 7}  # NOT empty, NOT split symbols
    merges = bpe_merge_rounds(words, rounds=4).collect()
    assert [r["pair"] for r in merges] == ["a b"]  # round 1 only; 2-4 empty


def test_incremental_pruned_equals_plain_randomized(spark, tmp_path):
    """The DPP-pruned verify join must return exactly the plain form's
    pairs for ANY bucket count — including nb=1 (everything in one
    partition) and nb larger than the id range (one doc per bucket).
    Randomized corpus from a tiny vocabulary so near-dup pairs are
    plentiful; seeds fixed for reproducibility."""
    import random

    from mo_etl_spark.operators.dedup import (
        minhash_md5_band_index,
        minhash_md5_incremental_pairs,
    )

    rng = random.Random(11)
    vocab = ["red", "blue", "green", "ox", "owl", "fir", "elm", "ash"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 8)))) for i in range(60)
    ]
    base = spark.createDataFrame(docs[:40], "doc_id long, text string")
    new = spark.createDataFrame(
        [(i + 1000, t) for i, t in docs[40:]], "doc_id long, text string"
    )
    index = minhash_md5_band_index(base, k=8, bands=4)
    plain = sorted(
        tuple(r)
        for r in minhash_md5_incremental_pairs(
            index, new, base.unionByName(new), k=8, bands=4, verify_threshold=0.5
        ).collect()
    )
    assert plain, "fixture must produce pairs, else the test is vacuous"
    for nb in (1, 7, 4096):
        p = str(tmp_path / f"corp_nb{nb}")
        base.unionByName(new).withColumn(
            "db", F.pmod("doc_id", F.lit(nb))
        ).write.partitionBy("db").mode("overwrite").parquet(p)
        pruned = sorted(
            tuple(r)
            for r in minhash_md5_incremental_pairs(
                index,
                new,
                spark.read.parquet(p),
                k=8,
                bands=4,
                verify_threshold=0.5,
                corpus_bucket_col="db",
                n_buckets=nb,
            ).collect()
        )
        assert pruned == plain, (nb, len(pruned), len(plain))
