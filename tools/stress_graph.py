"""Graph-family stress harness: per-iteration/per-hop cost on a
synthetic hub-skewed graph far above sf0.1 volume.

Reproduces the round-6 PageRank stress datapoint as a COMMITTED,
re-runnable measurement (it was ad-hoc then) and adds the k-hop BFS
and connected-components datapoints for the round-6 operators — the
graph family's "linear in incident edges, never a closure" claims
(SCALING.md Graph analytics) with numbers attached.

Usage:
    python tools/stress_graph.py [n_nodes] [n_edges] [hops] [n_seeds] [alpha]

Defaults: 200k nodes, 5M directed edges, 3 hops, 100 seeds, skew
alpha 1.5 (src = floor(n * rand^alpha): expected max degree
n_edges * (1/n)^(1/alpha) ~= 1.4k — the round-6 datapoint's shape;
alpha 3 makes a ~70k-degree mega-hub if you want the pathological
case). Prints one JSON line
per measurement, then a summary line. Run on an idle box; timings
are medians of nothing — single-shot, cache-warmed inputs — so read
them as scale datapoints, not benchmarks (the bench.py sentinels own
cross-round comparability).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.graph import (
    connected_components,
    k_hop_counts,
    pagerank,
)
from big_data_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    hops = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_seeds = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    alpha = float(sys.argv[5]) if len(sys.argv) > 5 else 1.5

    spark = get_spark("stress-graph")

    # Hub-skewed synthetic graph: src ~ floor(unif^alpha * n) piles
    # mass near node 0 (power-law-ish hubs), dst uniform. Edges are
    # generated from xxhash64(id) like the other stress harnesses —
    # F.rand(seed=) depends on partition layout, so it would produce
    # a DIFFERENT graph on a box with a different core count; the
    # hash generator is re-runnable at any parallelism (ADVICE r07).
    def unif(salt: int):
        # deterministic uniform in [0, 1) from the row id
        return (
            F.pmod(F.xxhash64(F.col("id") * 1_000_003 + salt), F.lit(1 << 20))
            .cast("double")
            / float(1 << 20)
        )

    edges = (
        spark.range(n_edges)
        .select(
            F.floor(F.pow(unif(1), F.lit(alpha)) * n_nodes)
            .cast("long")
            .alias("u"),
            F.floor(unif(2) * n_nodes).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = edges.count()
    max_deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    print(
        json.dumps(
            {"graph": {"nodes": n_nodes, "edges": m, "max_degree": max_deg}}
        ),
        flush=True,
    )

    # PageRank: fixed 6 iterations (the q146 shape)
    t0 = time.perf_counter()
    pagerank(edges, iters=6).count()
    pr_s = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {"op": "pagerank", "iters": 6, "wall_s": pr_s,
             "s_per_iter": round(pr_s / 6, 2)}
        ),
        flush=True,
    )

    # k-hop BFS: n_seeds multi-source frontiers, `hops` rounds
    seeds = (
        edges.select(F.col("u").alias("seed"))
        .distinct()
        .orderBy(F.md5(F.col("seed").cast("string")))
        .limit(n_seeds)
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    out = k_hop_counts(edges, seeds, hops=hops)
    n_rows = out.count()
    reach = out.agg(F.sum("n_new")).first()[0]
    kh_s = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {"op": "k_hop_counts", "seeds": n_seeds, "hops": hops,
             "wall_s": kh_s, "s_per_hop": round(kh_s / hops, 2),
             "rows": n_rows, "total_reached": int(reach)}
        ),
        flush=True,
    )

    # Connected components: pointer-jumped label propagation rounds
    t0 = time.perf_counter()
    cc = connected_components(edges, src="u", dst="v")
    n_comp = cc.select("component").distinct().count()
    cc_s = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {"op": "connected_components", "wall_s": cc_s,
             "n_components": n_comp}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
