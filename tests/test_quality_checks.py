"""Constraint suite: verdicts must DETECT violations, not just
rubber-stamp clean data (q130 covers the clean path vs the oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.operators.quality_checks import (
    Check,
    accepted_values,
    completeness,
    constraint_report,
    in_range,
    referential_integrity,
    uniqueness,
)


def _report_map(df):
    return {r["constraint"]: (r["observed"], r["passed"]) for r in df.collect()}


def test_constraint_report_detects_violations(spark):
    dirty = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, None, -5.0),  # null + negative
            (2, "b", 20.0),  # duplicate id
            (3, "zz", 30.0),  # value outside accepted set
        ],
        "id bigint, cat string, amount double",
    )
    rep = _report_map(
        constraint_report(
            dirty,
            [
                Check("complete(cat)", completeness("cat"), lambda v: v == 1.0),
                Check("unique(id)", uniqueness("id"), lambda v: v == 1.0),
                Check("min(amount)>0", F.min("amount"), lambda v: v > 0),
                Check(
                    "cat_in(a,b)",
                    accepted_values("cat", ["a", "b"]),
                    lambda v: v == 1.0,
                ),
                Check(
                    "amount_in_0_100",
                    in_range("amount", 0, 100),
                    lambda v: v == 1.0,
                ),
            ],
        )
    )
    assert rep["complete(cat)"] == (0.75, False)
    assert rep["unique(id)"] == (0.75, False)
    assert rep["min(amount)>0"] == (-5.0, False)
    assert rep["cat_in(a,b)"] == (0.5, False)  # NULL counts as out
    assert rep["amount_in_0_100"] == (0.75, False)


def test_constraint_report_single_agg_pass(spark):
    """All checks on a table ride ONE aggregation (single scan)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    rep = constraint_report(
        df,
        [
            Check("complete(k)", completeness("k"), lambda v: v == 1.0),
            Check("min(id)>=0", F.min("id"), lambda v: v >= 0),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one partial + one final aggregate, nothing else scans the input
    assert plan.count("Scan") <= 1, plan
    assert _report_map(rep) == {
        "complete(k)": (1.0, True),
        "min(id)>=0": (0.0, True),
    }


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (3,), (9,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    rep = _report_map(
        referential_integrity("ri(child->parent)", child, "fk", parent, "pk")
    )
    assert rep["ri(child->parent)"] == (0.75, False)


def test_referential_integrity_clean(spark):
    child = spark.createDataFrame([(1,), (2,), (1,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    rep = _report_map(
        referential_integrity("ri", child, "fk", parent, "pk")
    )
    assert rep["ri"] == (1.0, True)


def test_snapshot_diff_classifies_all_change_types(spark):
    from big_data_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "n")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d"), (None, "n")],
        "k bigint, v string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    # 1 deleted, 2 identical (absent), 3 updated, 4 inserted; the
    # NULL-keyed row is unchanged and must NOT surface as a phantom
    # insert+delete pair (null-safe join)
    assert got == {1: "delete", 3: "update", 4: "insert"}


def test_snapshot_diff_null_key_update(spark):
    from big_data_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(None, "a")], "k bigint, v string")
    new = spark.createDataFrame([(None, "b")], "k bigint, v string")
    rows = snapshot_diff(old, new, "k", ["v"]).collect()
    assert len(rows) == 1
    assert rows[0]["k"] is None and rows[0]["change_type"] == "update"


def test_triangle_count_known_graphs(spark):
    from big_data_spark.operators.relational import triangle_count

    # K4 has C(4,3)=4 triangles
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "u bigint, v bigint",
    )
    assert triangle_count(k4).first()["n_triangles"] == 4
    assert (
        triangle_count(k4, degree_ordered=True).first()["n_triangles"] == 4
    )
    # a 4-cycle has none
    c4 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "u bigint, v bigint"
    )
    assert triangle_count(c4).first()["n_triangles"] == 0
    assert (
        triangle_count(c4, degree_ordered=True).first()["n_triangles"] == 0
    )


def test_triangle_count_degree_ordered_equals_default(spark):
    """Degree-ordered orientation (the arboricity-bounded skew form)
    must count EXACTLY what the id-ordered default counts — on a
    hub-and-spokes graph with closures (the shape the orientation
    exists for: one high-degree vertex 0, triangles through it and
    one off-hub triangle) and on the real co-purchase edge graph."""
    from pyspark.sql import functions as F

    from big_data_spark.operators.relational import triangle_count

    # hub 0 connects to 1..8; closures (1,2), (3,4); off-hub triangle
    # (5,6),(6,7),(5,7) → triangles: {0,1,2}, {0,3,4}, {0,5,6},
    # {0,6,7}, {0,5,7}, {5,6,7} = 6
    hub = spark.createDataFrame(
        [(0, b) for b in range(1, 9)]
        + [(1, 2), (3, 4), (5, 6), (6, 7), (5, 7)],
        "u bigint, v bigint",
    )
    assert triangle_count(hub).first()["n_triangles"] == 6
    assert (
        triangle_count(hub, degree_ordered=True).first()["n_triangles"] == 6
    )

    # the q141 co-purchase graph at smoke scale: both paths agree, and
    # the degree-ordered plan stays keyed (no cartesian/nested-loop)
    from big_data_spark.queries import _copurchase_pairs, _t

    from .conftest import SF_SMOKE

    pairs = _copurchase_pairs(_t(spark, SF_SMOKE, "lineitem"))
    edges = (
        pairs.groupBy(F.col("part_a").alias("u"), F.col("part_b").alias("v"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
        .localCheckpoint()
    )
    base = triangle_count(edges).first()["n_triangles"]
    ordered_df = triangle_count(edges, degree_ordered=True)
    assert ordered_df.first()["n_triangles"] == base
    plan = ordered_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_constraint_report_fails_closed_on_empty_input(spark):
    """Empty input: ratio observations are NULL (0/0), and the verdict
    must be a CONCRETE False — never NULL — so `filter(~passed)`
    consumers and the streaming gate see the failure."""
    empty = spark.createDataFrame([], "id bigint, v double")
    rep = constraint_report(
        empty,
        [
            Check("complete(v)", completeness("v"), lambda x: x == 1.0),
            Check("min(v)>0", F.min("v"), lambda x: x > 0),
        ],
    ).collect()
    assert all(r["passed"] is False for r in rep), rep
    assert all(r["observed"] is None for r in rep), rep


def test_pagerank_known_graph_properties(spark):
    """operators.graph.pagerank (q146's engine) on a hand-checkable
    graph: on a star (hub 0 — spokes 1..6) the hub must rank first
    with all spokes tied, and the total mass stays ~1 (no dangling
    leakage in the symmetric graph)."""
    import pytest as _pytest

    from big_data_spark.operators.graph import pagerank

    und = spark.createDataFrame(
        [(0, b) for b in range(1, 7)], "u long, v long"
    )
    rows = {r["node"]: r["score"] for r in pagerank(und, iters=6).collect()}
    hub, spokes = rows[0], [rows[i] for i in range(1, 7)]
    assert hub > max(spokes)
    assert len(set(spokes)) == 1  # symmetry -> identical spoke ranks
    assert sum(rows.values()) == _pytest.approx(1.0, abs=1e-6)


def test_connected_components_generic_edges(spark):
    """operators.graph.connected_components on known graphs: two
    components plus an isolated pair resolve to min-id labels, and a
    64-node chain converges in ~log2(diameter) rounds (pointer
    jumping), far below the 63 rounds plain propagation would need."""
    from big_data_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        # component {0,1,2,3} (path), component {10,11,12} (triangle),
        # isolated edge {20,21}
        [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "u long, v long",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "u long, v long"
    )
    cc = connected_components(chain)
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert set(got.values()) == {0} and len(got) == 64
    # diameter 63; pointer jumping squares coverage per round — the
    # round count rides on the returned frame (per-call state; a
    # function attribute would be clobbered by concurrent callers)
    assert cc.last_rounds <= 10, cc.last_rounds


def test_connected_components_single_edge_and_converged_probe(spark):
    """r12/r13 internals pin: the convergence probe rides the round's
    checkpoint as a NAMED observed metric (CollectMetrics read off the
    dataset's own QueryExecution — checkpoint_and_count) instead of a
    separate count job. Two shapes that exercise the probe's boundary
    behavior: a single edge (first round changes one label, second
    round must observe changed=0 over an already-converged frame and
    break — not loop to max_rounds), and a self-contained pair whose
    node ids equal their labels from round one. ``last_rounds`` pins
    that the loop still terminates on the observed zero."""
    from big_data_spark.operators.graph import connected_components

    one = spark.createDataFrame([(7, 3)], "u long, v long")
    cc = connected_components(one)
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert got == {3: 3, 7: 3}
    assert 1 <= cc.last_rounds <= 3, cc.last_rounds


def test_checkpoint_probe_does_not_register_an_observation(spark):
    """REGRESSION pin for the r12 test_ml failure (root-caused r13):
    registering a pyspark ``Observation`` initializes the session's
    lazy ``observationManager`` — and
    ``o.a.s.sql.classic.ObservationManager`` is not java-serializable,
    so every later task closure capturing the SparkSession (e.g. an
    MLlib LogisticRegression model whose training summary holds the
    session) dies in the closure cleaner. checkpoint_and_count must
    therefore use the NAMED observe form, which never touches the
    manager. This test runs the probe and then asserts, by
    reflection, that the lazy field is STILL uninitialized — it goes
    red if anyone swaps the probe back to an Observation object."""
    from pyspark.sql import functions as F

    from big_data_spark.operators.graph import checkpoint_and_count

    df = spark.range(100).withColumn("x", F.col("id") % 5)
    ck, n = checkpoint_and_count(df, F.col("x") > 2)
    assert n == 40
    ck2, total = checkpoint_and_count(spark.range(7))
    assert total == 7
    js = spark._jsparkSession
    cls = js.getClass()
    field = None
    while cls is not None and field is None:
        try:
            field = cls.getDeclaredField("observationManager")
        except Exception:
            cls = cls.getSuperclass()
    if field is None:
        return  # engine drift: no such field — nothing to poison
    field.setAccessible(True)
    assert field.get(js) is None, (
        "the convergence probe initialized SparkSession."
        "observationManager — a pyspark Observation snuck back in; "
        "that object is not java-serializable and poisons every later "
        "closure that captures the session (the r12 test_ml failure)"
    )


def test_connected_components_fuzz_vs_bfs(spark):
    """Randomized cross-check: pointer-jumped distributed components
    equal a plain-Python BFS on Erdos-Renyi-ish graphs (deterministic
    seeds; sparse enough that multiple components exist)."""
    import random

    from big_data_spark.operators.graph import connected_components

    for seed in (7, 13, 99):
        rng = random.Random(seed)
        n = 60
        es = sorted(
            {
                (a, b)
                for _ in range(45)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        # BFS ground truth (nodes appearing in edges only, like the op)
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for start in sorted(adj):
            if start in want:
                continue
            comp, todo = [], [start]
            seen = {start}
            while todo:
                x = todo.pop()
                comp.append(x)
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        todo.append(y)
            rep = min(comp)
            for x in comp:
                want[x] = rep
        edges = spark.createDataFrame(es, "u long, v long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert got == want, f"seed={seed}"


def test_k_hop_counts_hand_graphs(spark):
    """k_hop_counts on hand-checkable shapes: a path counts exactly
    one new node per hop from an endpoint seed; a star reaches every
    leaf at hop 1 and nothing later (dry frontier emits no row); a
    cycle seed must never re-count itself or already-visited nodes
    (the per-seed anti-join), and multi-seed state stays per-seed."""
    from big_data_spark.operators.graph import k_hop_counts

    def run(es, seeds, hops=3):
        edges = spark.createDataFrame(es, "u long, v long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "seed long")
        return {
            (r["seed"], r["hop"]): r["n_new"]
            for r in k_hop_counts(edges, sdf, hops=hops).collect()
        }

    # path 0-1-2-3-4-5: from 0, one new node per hop
    path = [(i, i + 1) for i in range(5)]
    assert run(path, [0]) == {(0, 1): 1, (0, 2): 1, (0, 3): 1}
    # star 0-{1..4}: all leaves at hop 1, then dry (no rows at 2/3)
    star = [(0, i) for i in range(1, 5)]
    assert run(star, [0]) == {(0, 1): 4}
    # leaf seed on the star: hub at hop 1, the 3 other leaves at hop 2
    assert run(star, [1]) == {(1, 1): 1, (1, 2): 3}
    # 4-cycle: two neighbors at hop 1, the opposite node at hop 2,
    # nothing at hop 3 (the seed itself never re-counts)
    cyc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert run(cyc, [0]) == {(0, 1): 2, (0, 2): 1}
    # two seeds on the path keep independent frontiers
    got = run(path, [0, 5])
    assert got == {
        (0, 1): 1, (0, 2): 1, (0, 3): 1,
        (5, 1): 1, (5, 2): 1, (5, 3): 1,
    }
    # hops < 1 is a caller error, not a confusing None crash
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hops"):
        run(path, [0], hops=0)


def test_k_hop_counts_fuzz_vs_bfs(spark):
    """Randomized cross-check: per-(seed, hop) first-reach counts
    from the distributed frontier traversal equal a plain-Python BFS
    on sparse random graphs (multiple components, dry frontiers, and
    seeds that reach nothing all occur at these densities)."""
    import random
    from collections import deque

    from big_data_spark.operators.graph import k_hop_counts

    for seed in (11, 29):
        rng = random.Random(seed)
        n = 40
        es = sorted(
            {
                (a, b)
                for _ in range(50)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seeds = sorted(rng.sample(sorted(adj), 4))
        want = {}
        for s in seeds:
            dist = {s: 0}
            dq = deque([s])
            while dq:
                x = dq.popleft()
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        dq.append(y)
            for node, d in dist.items():
                if 1 <= d <= 3:
                    want[(s, d)] = want.get((s, d), 0) + 1
        edges = spark.createDataFrame(es, "u long, v long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "seed long")
        got = {
            (r["seed"], r["hop"]): r["n_new"]
            for r in k_hop_counts(edges, sdf, hops=3).collect()
        }
        assert got == want, f"seed={seed}"


def test_largest_remainder_quota_rule_fuzz(spark):
    """Property check for the shared Hamilton allocator: for random
    weight histograms and several budgets, Σ alloc == budget exactly
    and every group's allocation satisfies the QUOTA RULE —
    floor(exact quota) <= alloc <= ceil(exact quota) — the defining
    property of largest-remainder apportionment."""
    import math
    import random

    from big_data_spark.queries import _largest_remainder_alloc

    rng = random.Random(42)
    for trial in range(3):
        groups = [(i, rng.randint(1, 500)) for i in range(rng.randint(3, 12))]
        total = sum(w for _, w in groups)
        w = spark.createDataFrame(groups, "g long, n long")
        for budget in (10, 137, 1000):
            got = {
                r["g"]: r["alloc"]
                for r in _largest_remainder_alloc(w, "g", "n", budget).collect()
            }
            assert sum(got.values()) == budget, (trial, budget, got)
            for g, weight in groups:
                quota = budget * weight / total
                assert math.floor(quota) <= got[g] <= math.ceil(quota), (
                    trial, budget, g, quota, got[g],
                )


def test_pagerank_fuzz_vs_numpy(spark):
    """Randomized cross-check: the distributed fixed-point iteration
    equals a dense NumPy power iteration (same damping, iterations,
    and per-step rounding) on random symmetric graphs."""
    import random

    import numpy as np
    import pytest as _pytest

    from big_data_spark.operators.graph import pagerank

    for seed in (3, 21):
        rng = random.Random(seed)
        n = 25
        es = sorted(
            {
                (a, b)
                for _ in range(60)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        nodes = sorted({x for e in es for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        m = len(nodes)
        A = np.zeros((m, m))
        for a, b in es:
            A[idx[b], idx[a]] = 1.0
            A[idx[a], idx[b]] = 1.0
        outdeg = A.sum(axis=0)
        s = np.round(np.full(m, 1.0 / m), 12)
        for _ in range(6):
            contrib = np.round(s / outdeg, 12)
            s = np.round(0.15 / m + 0.85 * (A @ contrib), 10)
        want = {x: s[idx[x]] for x in nodes}

        edges = spark.createDataFrame(es, "u long, v long")
        got = {r["node"]: r["score"] for r in pagerank(edges, iters=6).collect()}
        assert set(got) == set(want)
        for x in nodes:
            assert got[x] == _pytest.approx(want[x], abs=2e-10), (seed, x)


def test_pagerank_directed_keeps_zero_indegree_nodes(spark):
    """symmetrize=False with a zero-IN-degree node (out-degree >= 1,
    the documented precondition): the node must stay in the score
    vector with its teleport share, keep contributing its outgoing
    mass every iteration, and total mass must stay ~1 — dropping it
    after iteration 1 leaked its mass entirely."""
    import pytest as _pytest

    from big_data_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0)], "u long, v long"
    )
    rows = {
        r["node"]: r["score"]
        for r in pagerank(edges, iters=6, symmetrize=False).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert sum(rows.values()) == _pytest.approx(1.0, abs=1e-6)
    # node 2 receives nothing: fixed point is pure teleport 0.15/3
    assert rows[2] == _pytest.approx(0.05, abs=1e-9)
    # (0<->1 oscillates toward its fixed point, so no ordering claim
    # between them at a finite even iteration count)
    assert min(rows[0], rows[1]) > rows[2]


def test_cuped_matches_numpy_reference(spark):
    """q150 against a third independent implementation: NumPy OLS on
    the same parquet — theta, adjusted means, and adjusted variances
    must agree (DuckDB parity already pins Spark==DuckDB; this pins
    the STATISTICS against the textbook definition: per-user adjusted
    column materialized and np.var'd, no sufficient-statistic
    algebra)."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from big_data_spark.queries import QUERIES

    from .conftest import SF_ORACLE

    got = {
        r["variant"]: r
        for r in QUERIES["q150_cuped_adjustment"].fn(spark, SF_ORACLE).collect()
    }

    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    ev = ev[ev.event_type == "purchase"]
    cut = pd.Timestamp("2024-01-15")
    pre = ev[ev.ts < cut].groupby("user_id")["value"].sum()
    post = ev[ev.ts >= cut].groupby("user_id")["value"].sum()
    users = sorted(set(ev.user_id))
    x = np.array([pre.get(u, 0.0) for u in users])
    y = np.array([post.get(u, 0.0) for u in users])
    arm = np.array([u % 2 for u in users])

    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    yadj = y - theta * (x - x.mean())
    for v in (0, 1):
        m = arm == v
        r = got[v]
        assert r["n"] == int(m.sum())
        assert r["theta"] == _pytest.approx(theta, abs=2e-6)
        assert r["mean_raw"] == _pytest.approx(y[m].mean(), abs=2e-6)
        assert r["mean_cuped"] == _pytest.approx(yadj[m].mean(), abs=2e-6)
        assert r["var_raw"] == _pytest.approx(np.var(y[m], ddof=1), abs=2e-4)
        assert r["var_cuped"] == _pytest.approx(
            np.var(yadj[m], ddof=1), abs=2e-4
        )
        # the point of CUPED: adjusted variance is (substantially
        # or at least not) above raw — algebraically var_adj <= var_raw
        # only holds pooled, so allow per-arm slack but require the
        # adjustment to be sane
        assert r["var_cuped"] <= r["var_raw"] * 1.05


def test_srm_matches_scipy_style_chi2(spark):
    """q151's collapsed statistic (n_a−n_b)²/n equals the full
    Pearson chi-square over the 2-cell table with equal expectations,
    computed independently in NumPy from the same parquet."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from big_data_spark.queries import QUERIES

    from .conftest import SF_ORACLE

    got = {
        r["day"]: r
        for r in QUERIES["q151_srm_check"].fn(spark, SF_ORACLE).collect()
    }
    ev = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    enroll = ev.assign(day=ev.ts.dt.floor("D"))[
        ["day", "user_id"]
    ].drop_duplicates()
    for day, g in enroll.groupby("day"):
        arms = (g.user_id % 2).value_counts()
        n_a, n_b = int(arms.get(0, 0)), int(arms.get(1, 0))
        exp = (n_a + n_b) / 2.0
        chi2 = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
        r = got[day.to_pydatetime()]
        assert (r["n_a"], r["n_b"]) == (n_a, n_b), day
        assert r["chi2"] == _pytest.approx(chi2, abs=1e-6), day
        assert r["srm"] == (chi2 > 3.841), day
    assert len(got) == enroll.day.nunique()


def test_personalized_pagerank_fuzz_vs_numpy(spark):
    """Randomized cross-check for seeded (personalized) PageRank: the
    distributed iteration equals a dense NumPy power iteration whose
    teleport vector concentrates on the seed set (same damping,
    iterations, per-step rounding); mass stays ~1 and seeds outrank
    far-away nodes. A seed outside the graph must raise."""
    import random

    import numpy as np
    import pytest as _pytest

    from big_data_spark.operators.graph import pagerank

    for seed in (5, 17):
        rng = random.Random(seed)
        n = 25
        es = sorted(
            {
                (a, b)
                for _ in range(60)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        nodes = sorted({x for e in es for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        m = len(nodes)
        A = np.zeros((m, m))
        for a, b in es:
            A[idx[b], idx[a]] = 1.0
            A[idx[a], idx[b]] = 1.0
        outdeg = A.sum(axis=0)
        seeds = sorted(rng.sample(nodes, 3))
        t = np.zeros(m)
        for x in seeds:
            t[idx[x]] = round(0.15 / len(seeds), 12)
        s = np.zeros(m)
        for x in seeds:
            s[idx[x]] = round(1.0 / len(seeds), 12)
        for _ in range(6):
            contrib = np.round(s / outdeg, 12)
            s = np.round(t + 0.85 * (A @ contrib), 10)
        want = {x: s[idx[x]] for x in nodes}

        edges = spark.createDataFrame(es, "u long, v long")
        got = {
            r["node"]: r["score"]
            for r in pagerank(edges, iters=6, seeds=seeds).collect()
        }
        assert set(got) == set(want)
        for x in nodes:
            assert got[x] == _pytest.approx(want[x], abs=2e-10), (seed, x)
        assert sum(got.values()) == _pytest.approx(1.0, abs=1e-6)

        with _pytest.raises(ValueError, match="not nodes of"):
            pagerank(edges, iters=2, seeds=[max(nodes) + 1000]).collect()
