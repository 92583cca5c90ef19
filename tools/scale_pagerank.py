"""PageRank route counterfactual (VERDICT r8 item #7): measure the
per-iteration wall of the broadcast route (pagerank_bucketed) vs the
never-broadcast route (pagerank_cobucketed) as the NODE count grows at
a fixed edge count — the crossover that justifies the broadcast_cutoff
delegation in operators/graph.py.

The claim under test: pagerank_bucketed's per-iteration cost carries a
full rank-vector broadcast, so it grows with |nodes| and eventually
OOMs; pagerank_cobucketed moves only O(|nodes|) narrow rows through
exchanges and never replicates anything to every executor.  At a small
node count the broadcast is nearly free and wins; at 40x the nodes the
gap must close or invert — the measured shape behind the cutoff.

Graph: |edges| ~ fixed (random src/dst by xxhash) + an n-node ring so
every node appears as a src (the no-dangling contract).  The one-time
bucketed table builds are UNTIMED (per-snapshot cost, not iteration
cost).  Emits one JSON line per (route, regime) run:
  {"op": ..., "scale": ..., "sec": ..., "per_iter_sec": ..., "load": ...}

Usage: python tools/scale_pagerank.py [--edges 8000000] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def edge_set(spark, n_edges: int, n_nodes: int):
    rand = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_nodes)).alias(
            "dst"
        ),
    )
    ring = spark.range(n_nodes).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n_nodes).alias("dst"),
    )
    return rand.unionAll(ring)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--small-nodes", type=int, default=100_000)
    ap.add_argument("--large-nodes", type=int, default=4_000_000)
    args = ap.parse_args()

    from mo_etl_spark.operators.graph import (
        pagerank_bucketed,
        pagerank_cobucketed,
    )
    from mo_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_pagerank")
    spark.read  # noqa: B018 - touch

    for tag, n_nodes in (("small", args.small_nodes), ("large", args.large_nodes)):
        edges = edge_set(spark, args.edges, n_nodes)
        for route, fn, table in (
            ("pagerank_bucketed_bcast", pagerank_bucketed, f"sc_pr_dst_{tag}"),
            ("pagerank_cobucketed_merge", pagerank_cobucketed, f"sc_pr_src_{tag}"),
        ):
            # one-time bucketed build, untimed (per-snapshot cost)
            kw = dict(iters=0, table=table, reuse_existing=False)
            if route.startswith("pagerank_bucketed"):
                # keep the broadcast route ON its broadcast path at
                # every regime (the cutoff would delegate away the very
                # thing being measured)
                kw["broadcast_cutoff"] = 1 << 40
                kw["n_nodes"] = n_nodes
            fn(edges, **kw).count()
            # timed: the iteration loop only, table reused
            t0 = time.time()
            kw["iters"] = args.iters
            kw["reuse_existing"] = True
            fn(edges, **kw).count()
            sec = round(time.time() - t0, 2)
            print(
                json.dumps(
                    {
                        "op": route,
                        "scale": f"{tag}_nodes_{n_nodes}",
                        "edges": args.edges + n_nodes,
                        "iters": args.iters,
                        "sec": sec,
                        "per_iter_sec": round(sec / args.iters, 2),
                        "load": round(os.getloadavg()[0], 1),
                    }
                )
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
