"""Generic distributed graph algorithms over plain edge DataFrames.

The registry's graph queries are table-specific anchors (q66: LSH
doc↔band components with a recursive-CTE oracle; q141: co-purchase
triangles; q146: co-purchase PageRank with an unrolled-CTE oracle);
this module is the engine surface a user points at THEIR edge table.
Both algorithms follow the same distributed discipline the anchors
pin: keyed equi-joins and aggregations only (a Pregel superstep per
round), eager localCheckpoints so iteration i never re-evaluates
rounds 0..i-1, and log-round convergence where the algorithm allows
(pointer jumping for components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Named observed-metric key for checkpoint_and_count. Reusing one name
# across calls is fine: the metric is read back per-Dataset, off that
# dataset's own QueryExecution.
_COUNT_METRIC = "bds_ckpt_count"


def checkpoint_and_count(
    df: DataFrame, cond: Column | None = None
) -> tuple[DataFrame, int]:
    """Eagerly localCheckpoint ``df`` and return ``(checkpointed_df,
    n)`` where ``n`` counts the rows satisfying ``cond`` (all rows when
    ``cond`` is None), counted DURING the checkpoint's own
    materialization as a NAMED observed metric — the convergence /
    cardinality probe must not cost its own job (guide §1.2; measured
    r12: q66 41→33 jobs, q158 52→44 with the probe riding the
    checkpoint). Shared by connected_components, the q66 inline loop,
    and pagerank's |V| fetch, so the probe mechanics cannot drift
    between the twins (ADVICE r12).

    Implementation note — why a NAMED ``observe`` and a direct
    ``queryExecution().observedMetrics()`` read instead of a pyspark
    ``Observation`` object: registering an Observation initializes the
    SparkSession's lazy ``observationManager``, and
    ``o.a.s.sql.classic.ObservationManager`` is NOT java-serializable,
    so every later task closure that captures the SparkSession (e.g.
    an MLlib LogisticRegression model whose training summary holds the
    session, shipped by ``model.transform``'s UDF) then dies in the
    closure cleaner with ``NotSerializableException`` — the r12
    ``test_ml.py::test_attractiveness_rule_and_lr`` failure, root-
    caused and reproduced in round 13 (OPTIMIZATION_r13.md). The named
    form only plants a CollectMetrics node and never touches the
    manager. The read is synchronous, not listener-based:
    ``localCheckpoint(eager=True)`` is a ``withAction`` over THIS
    dataset's QueryExecution, so the CollectMetrics accumulator is
    final when the call returns — which also removes the unbounded
    ``Observation.get`` wait flagged in ADVICE r12. Classic-mode
    pinned: under Spark Connect ``_jdf`` does not exist and this
    raises loudly instead of hanging; if the metric is ever absent
    (future Spark drift) the probe falls back to one bounded count
    job rather than returning a wrong count.
    """
    agg = F.count(F.when(cond, 1)) if cond is not None else F.count(F.lit(1))
    observed = df.observe(_COUNT_METRIC, agg.alias("n"))
    ck = observed.localCheckpoint(eager=True)
    jmap = observed._jdf.queryExecution().observedMetrics()
    if jmap.contains(_COUNT_METRIC):
        n = jmap.apply(_COUNT_METRIC).getLong(0)
    else:  # pragma: no cover — defensive against engine drift
        n = (ck.filter(cond) if cond is not None else ck).count()
    return ck, int(n)


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph given one row per
    edge (either orientation; both are symmetrized internally).
    Returns (node, component) with component = the component's
    minimum node id.

    Min-label propagation with POINTER JUMPING (label <- label's
    label each round, squaring the distance covered), so rounds ~
    log2(component diameter) instead of diameter — the q66
    discipline generalized to arbitrary edge tables. Each round is
    two hash-shuffles linear in edges; lineage is cut per round by
    eager localCheckpoint. The round count rides on the RETURNED
    DataFrame as ``result.last_rounds`` (observability for bench /
    regression use) — per-call state, not an attribute on this
    function, which two concurrent callers on one driver would
    clobber."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _round in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nl"))
        )
        prop = labels.join(nbr_min, "node", "left").select(
            "node",
            "label",
            F.least(
                F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
            ).alias("new_label"),
        )
        # pointer jump: follow new_label to ITS new_label
        x = prop.alias("x")
        y = prop.select(
            F.col("node").alias("p_node"), F.col("new_label").alias("p_label")
        ).alias("y")
        # the convergence probe rides the checkpoint's own
        # materialization as a named observed metric (guide §1.2:
        # don't spend a job on something a running action can count
        # for free) — see checkpoint_and_count for why the NAMED form,
        # not an Observation object
        merged, changed = checkpoint_and_count(
            x.join(y, F.col("x.new_label") == F.col("y.p_node"), "left")
            .select(
                F.col("x.node").alias("node"),
                F.col("x.label").alias("label"),
                F.least(
                    F.col("x.new_label"),
                    F.coalesce(F.col("y.p_label"), F.col("x.new_label")),
                ).alias("new_label"),
            ),
            F.col("new_label") != F.col("label"),
        )
        labels = merged.select("node", F.col("new_label").alias("label"))
        rounds = _round + 1
        if changed == 0:
            break
    result = labels.select("node", F.col("label").alias("component"))
    result.last_rounds = rounds
    return result


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iters: int = 6,
    damping: float = 0.85,
    symmetrize: bool = True,
    seeds: list | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge DataFrame; returns
    (node, score). ``symmetrize=True`` (undirected input, one row per
    edge) mirrors every edge so no node dangles; with
    ``symmetrize=False`` the caller provides directed edges and must
    guarantee every node has out-degree ≥ 1 (this implementation has
    no dangling-mass redistribution — scores of sink-only nodes would
    silently leak mass otherwise).

    ``seeds`` switches to PERSONALIZED PageRank (Haveliwala,
    "Topic-Sensitive PageRank", WWW '02): the teleport mass lands
    only on the seed nodes ((1−d)/|seeds| each) and the walk starts
    uniform over the seeds, so scores rank nodes by proximity to the
    seed set — the standard graph-recommendation primitive ("users
    who bought these parts also reach..."). Seeds must be nodes of
    the graph; they ride a broadcast literal list, so the iteration
    shape (and the 100-TB story) is unchanged.

    Each iteration: one equi-join of the static (edges ⋈ outdeg)
    table with the current score vector, one keyed agg on the
    destination — a Pregel superstep. Lineage is cut every THIRD
    iteration (plus once at the end), not every iteration: the score
    chain is linear (each iteration consumed exactly once), so
    per-iteration materialization buys nothing but costs an action
    each (measured 5.1s -> 3.4s for 6 iterations at sf0.1); the
    periodic cut still bounds plan depth for large ``iters``.
    Components (above) checkpoints EVERY round because its
    convergence probe forces a materialization anyway. Per-edge
    contributions round to 12 then sum as DECIMAL(38,12) and the
    damped update rounds to 10, so the iteration is deterministic
    across partitionings and engines (the q146 oracle discipline)."""
    # e is NOT checkpointed: symmetrize is a map-side union over the
    # caller's edge table (itself typically checkpointed, e.g.
    # _copurchase_edges) and e is consumed exactly twice — once by the
    # outdeg aggregation and once by the g join below, both of which
    # ARE materialized. A third materialization job bought nothing
    # (guide §1.2: don't compute things you throw away).
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if symmetrize:
        e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # |V| as a DRIVER literal, counted DURING the outdeg checkpoint's
    # own materialization (checkpoint_and_count — r13: the separate
    # outdeg.count() job the r12 version paid is free as an observed
    # metric on the same action): the pre-r12 crossJoin(broadcast(1-row
    # agg)) re-planned a broadcast exchange + aggregate subtree into
    # EVERY iteration's score update for a single constant (guide §2.4
    # — remove exchanges the data does not require). Values are
    # unchanged: the same integer n feeds the same rounded expressions.
    outdeg, n_nodes = checkpoint_and_count(
        e.groupBy("u").agg(F.count("*").alias("outdeg"))
    )
    g = e.join(outdeg, "u").select("u", "v", "outdeg").localCheckpoint(eager=True)
    nodes = outdeg.select("u")
    # round the teleport constant: Python 1.0-0.85 is 1 ulp above 0.15,
    # and a SQL oracle writes the short literal — both engines must
    # iterate on the identical constant or boundary rounds can flip
    if seeds is None:
        teleport = F.lit(round(1.0 - damping, 12)) / F.lit(n_nodes)
        # init scores are a literal projection over the checkpointed
        # outdeg — consumed once by iteration 1, so materializing them
        # was a pure extra job (the seeded path below keeps its
        # checkpoint: its init embeds a validated seed list and feeds
        # the same single consumer, but costs a filter over nodes)
        scores = outdeg.select(
            "u", F.round(F.lit(1.0) / F.lit(n_nodes), 12).alias("score")
        )
    else:
        seed_list = sorted(set(seeds))
        if not seed_list:
            raise ValueError("seeds must be a non-empty list (or None)")
        # a seed outside the graph would silently absorb (lose) its
        # teleport share — fail loudly instead
        present = nodes.filter(F.col("u").isin(seed_list)).count()
        if present != len(seed_list):
            raise ValueError(
                f"{len(seed_list) - present} seed(s) are not nodes of "
                "the graph (seeds must have out-degree >= 1)"
            )
        # personalized: teleport and init both concentrate on seeds
        teleport = F.when(
            F.col("u").isin(seed_list),
            F.lit(round((1.0 - damping) / len(seed_list), 12)),
        ).otherwise(F.lit(0.0))
        scores = (
            nodes.select(
                "u",
                F.when(
                    F.col("u").isin(seed_list),
                    F.round(F.lit(1.0 / len(seed_list)), 12),
                )
                .otherwise(F.lit(0.0))
                .alias("score"),
            )
        ).localCheckpoint(eager=True)
    for _k in range(iters):
        contrib = g.join(scores, "u").select(
            "v", F.round(F.col("score") / F.col("outdeg"), 12).alias("w")
        )
        agg = contrib.groupBy(F.col("v").alias("u")).agg(
            F.sum(F.col("w").cast("decimal(38,12)")).alias("acc")
        )
        # LEFT join back onto the full node set: a node with zero
        # in-degree (possible ONLY with symmetrize=False) receives no
        # contributions but must keep its teleport share — dropping it
        # would leak its mass and lose its outgoing contributions in
        # every later iteration. A symmetrized graph mirrors every
        # edge, so in-neighbors == out-neighbors and every node of g
        # already appears in agg — skip the join in that path.
        base = agg if symmetrize else nodes.join(agg, "u", "left")
        scores = base.select(
            "u",
            F.round(
                teleport
                + F.lit(damping)
                * F.coalesce(F.col("acc").cast("double"), F.lit(0.0)),
                10,
            ).alias("score"),
        )
        if (_k + 1) % 3 == 0 or _k == iters - 1:
            scores = scores.localCheckpoint(eager=True)
    return scores.select(F.col("u").alias("node"), "score")


def k_hop_counts(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 3,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Multi-source BFS over an undirected graph (canonical one-row-
    per-edge input, either orientation): per (seed, hop) count of
    nodes first reached at exactly that hop — the friends-of-friends /
    neighborhood-growth primitive behind graph features ("audience
    within 3 hops") and blast-radius queries.

    Distributed discipline: the frontier is a (seed, node) table;
    each hop is ONE equi-join frontier⋈edges plus a distinct and a
    LEFT ANTI against the visited set (so a node reached at hop h is
    never recounted at h+1 — per SEED, which is what makes this
    multi-source: state is per (seed, node), bounded by the reachable
    set, never global). Lineage cut per hop with eager
    localCheckpoints (the q66 discipline); work per hop is linear in
    frontier-incident edges, and the whole traversal is ``hops``
    rounds — never an all-pairs closure. A seed that discovers no new
    node at hop h simply has no row there (its frontier went dry).

    ``seeds`` is a 1-column DataFrame of seed node ids.

    The symmetrized edge table IS materialized even when the caller's
    edges already are (r13 timed A/B, pagerank's-`e` hypothesis
    tried): skipping it saves one action but every hop's join then
    re-pays the doubled map-side block scan — measured best-of-3
    interleaved 6.43 s (materialized) vs 6.87 s (not) on the q154
    inputs, so the checkpoint stays."""
    if int(hops) < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    seed_col = seeds.columns[0]
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    frontier = seeds.select(
        F.col(seed_col).alias("seed"), F.col(seed_col).alias("node")
    ).distinct()
    visited = frontier.localCheckpoint(eager=True)
    frontier = visited
    out = None
    for hop in range(1, int(hops) + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select("seed", F.col("b").alias("node"))
            .distinct()
        )
        new = nxt.join(visited, ["seed", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        counts = new.groupBy("seed").agg(
            F.count("*").cast("long").alias("n_new")
        ).select("seed", F.lit(hop).cast("int").alias("hop"), "n_new")
        out = counts if out is None else out.unionByName(counts)
        # visited stays a LAZY union of already-materialized hop
        # frontiers — unioning checkpointed pieces recomputes nothing,
        # so checkpointing the union again would only buy an extra
        # action per hop (one materialization per hop, not two)
        visited = visited.unionByName(new)
        frontier = new
    return out.orderBy("seed", "hop")
