"""Skew-aware relational helpers.

The generic groupBy/join forms live directly in queries.py; this
module holds the explicitly skew-hardened variants you reach for when
one key carries a disproportionate share of a 100-TB table and AQE's
runtime skew-split isn't available (e.g. streaming state, or a
pre-AQE cluster).

Salting = two-phase aggregation: phase 1 groups on (key, salt) so a
hot key's rows spread over ``salt`` reducers; phase 2 merges the
per-salt partials. Results are exactly those of the unsalted groupBy
(tests + oracle check in q51).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key: str,
    sum_col: str,
    salt: int = 16,
    sum_scale: int = 4,
) -> DataFrame:
    """Skew-proof groupBy(key).agg(count, decimal-exact sum).

    The salt column derives from a deterministic hash of arbitrary
    other columns' bytes via monotonically varying row content —
    here spark_partition_id + a cheap per-row counter is enough
    because the salt only needs to spread rows, not be stable.
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"),
        F.sum(F.col(sum_col).cast(f"decimal(27,{sum_scale})")).alias("_sum"),
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("cnt"),
        F.sum("_sum").cast("double").alias("total"),
    )


def broadcast_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Skewed-key equi-join: replicate the small side ``salt`` times
    with an explicit salt column, salt the big side's rows, join on
    (key, salt). Each hot-key bucket lands on a different reducer.

    Only needed when the small side is too big to broadcast outright
    AND the key is skewed; otherwise use F.broadcast(small) or let
    AQE's skewJoin handle it (both are on in session.py).
    """
    salts = small.sparkSession.range(salt).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_rep = small.crossJoin(F.broadcast(salts))
    big_salted = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def clip_outliers(
    df: DataFrame,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    relative_error: float = 0.25,
) -> DataFrame:
    """approxQuantile-based outlier clipping — A9 parity
    (ml_train_from_cassandra_pyspark.pyc:177 preprocess_data uses
    exactly (0.01, 0.99, 0.25)).

    approxQuantile (Greenwald-Khanna) runs in one pass with bounded
    memory — the only viable form at 100 TB; q37 is the exact-
    percentile twin used for oracle checking. Tighten
    ``relative_error`` to trade memory for accuracy.
    """
    lo_v, hi_v = df.approxQuantile(col, [lo, hi], relative_error)
    c = F.col(col)
    return df.withColumn(
        col, F.when(c < lo_v, lo_v).when(c > hi_v, hi_v).otherwise(c)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    right_ts_alias: str = "right_ts",
) -> DataFrame:
    """As-of join: each left row picks the most recent right row of
    the same key with ``right.ts <= left.ts`` (inner semantics — left
    rows with no prior right row drop).

    Implementation is the scalable union-window form: tag both sides,
    union, and take ``last(right_struct, ignorenulls)`` over a
    (key, ts, side)-ordered running window. ONE hash shuffle on the
    key and a within-partition sort — never a per-pair join, so a hot
    key costs O(its rows log its rows), not O(rows^2). Ties at equal
    ts order the right side first, matching the `<=` bound. Callers
    should pre-dedup right rows per (key, ts) for determinism.
    """
    left_payload = [c for c in left.columns if c not in (key, ts)]
    r_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(ts).alias(right_ts_alias)
    )
    r_u = right.select(
        F.col(key),
        F.col(ts),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        r_struct.alias("_rs"),
        F.lit(0).alias("_side"),
    )
    l_u = left.select(
        F.col(key),
        F.col(ts),
        *left_payload,
        F.lit(None).cast(r_u.schema["_rs"].dataType).alias("_rs"),
        F.lit(1).alias("_side"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l_u.unionByName(r_u)
        .withColumn("_m", F.last("_rs", ignorenulls=True).over(w))
        .filter((F.col("_side") == 1) & F.col("_m").isNotNull())
        .select(key, ts, *left_payload, F.col("_m.*"))
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bin_seconds: int,
) -> DataFrame:
    """Point-in-interval range join via time binning.

    A naive range join is a nested-loop (every point x every
    interval). Binning makes it an equi-join: each interval explodes
    to the time buckets it overlaps, each point maps to its single
    bucket, the join runs on the bucket key, and the exact range
    predicate filters the survivors. With ``bin_seconds`` >= the max
    interval length each interval lands in <= 2 buckets, so the
    blow-up factor is bounded by 2 and the shuffle is an ordinary
    hash partition on the bucket — the standard distributed interval
    join. Each matched point appears once per containing interval
    (its bucket matches each interval at most once).
    """
    b = F.lit(bin_seconds)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / b),
                F.floor(F.unix_timestamp(F.col(end)) / b),
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts)) / b)
    )
    return (
        pt.join(iv, "_bucket")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bucket")
    )


def equi_frequency_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    out_col: str = "bucket",
) -> DataFrame:
    """EXACT equal-frequency binning without a global sort.

    The scale-correct alternative to ``ntile()`` over a global window
    (which serializes the dataset through one partition): reduce to a
    value histogram (bounded by DISTINCT values, not rows), run the
    cumulative window over that tiny histogram, and broadcast the
    value->bucket map back onto the rows. Equal values always share a
    bucket — deterministic where ntile's row-level tie-breaking is
    not. Intended for bounded-cardinality numeric columns (lengths,
    counts, grades); for unbounded continuous values use
    approxQuantile boundaries instead (see clip_outliers).

    NULL policy: every row is bucketed, including NULL values — NULL
    forms its own histogram group and sorts first (Spark's ascending
    default), so null rows land in the lowest bucket. The map join is
    null-safe (``eqNullSafe``); a plain equi-join would silently drop
    null rows from the output.
    """
    from pyspark.sql.window import Window

    hist = df.groupBy(value_col).agg(F.count("*").alias("_cnt"))
    w_cum = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        value_col,
        F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)).alias("_before"),
        F.sum("_cnt").over(Window.partitionBy()).alias("_total"),
    )
    bmap = cum.select(
        F.col(value_col).alias("_v"),
        F.expr(f"CAST(({n_buckets} * _before) DIV _total AS INT)").alias(out_col),
    )
    return (
        df.join(F.broadcast(bmap), F.col(value_col).eqNullSafe(F.col("_v")))
        .drop("_v")
    )


def cusum_scan(
    daily: DataFrame, day_col: str = "day", rev_col: str = "rev"
) -> DataFrame:
    """Offline CUSUM change-point scan over a day-grain series:
    cumulative deviation from the global mean, |peak| flagged as the
    most likely level-shift day. The scoring half of q163, shared by
    the one-shot batch query and streaming.sinks.read_cusum (the
    incremental twin) so both paths compute PROVABLY the same
    estimator — the twin merges exact-decimal per-day partials and
    feeds the identical windows. ``daily`` must be one row per day
    with ``rev_col`` an exact decimal sum; the ordered cumulative is
    calendar-bounded (one row per day), so the single-partition
    window is bounded by time, not data. Determinism: the running
    total stays an exact decimal; the only IEEE terms are rn*mean and
    the final subtraction, rounded to 6; +0.0 collapses the signed
    zero the final day's total - n*mean produces."""
    from pyspark.sql.window import Window

    wday = Window.orderBy(day_col)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seq = daily.select(
        F.col(day_col).alias("day"),
        F.col(rev_col).alias("rev"),
        F.row_number().over(wday).alias("rn"),
        F.sum(rev_col).over(wday).alias("cum_rev"),
        (
            F.sum(rev_col).over(wall).cast("double")
            / F.count("*").over(wall)
        ).alias("mean_rev"),
    )
    c = seq.select(
        "day",
        F.col("rev").cast("double").alias("daily_revenue"),
        (
            F.round(
                F.col("cum_rev").cast("double")
                - F.col("rn") * F.col("mean_rev"),
                6,
            )
            + F.lit(0.0)
        ).alias("cusum"),
    )
    return c.select(
        "day",
        "daily_revenue",
        "cusum",
        (F.abs("cusum") == F.max(F.abs("cusum")).over(wall)).alias(
            "is_peak"
        ),
    ).orderBy("day")


def rfm_scores(cust: DataFrame) -> DataFrame:
    """Quintile scoring + lifecycle segmentation over a per-customer
    metrics table (o_custkey, recency_days, frequency, monetary,
    mon_band) — the scoring half of RFM, shared by q142 (one-shot
    batch) and streaming.sinks.read_rfm (the incremental twin) so
    both paths bucket and label IDENTICALLY: each quintile uses
    equi_frequency_buckets (histogram-exact, deterministic on ties —
    never ntile over a corpus-wide window), and the lifecycle label
    is the standard R/F threshold matrix. The caller materializes
    ``cust`` once (localCheckpoint) — it feeds three histogram builds
    plus three broadcast map join-backs."""
    b = equi_frequency_buckets(cust, "recency_days", 5, "r_bucket")
    b = equi_frequency_buckets(b, "frequency", 5, "f_bucket")
    b = equi_frequency_buckets(b, "mon_band", 5, "m_bucket")
    r, f_, m = (
        (5 - F.col("r_bucket")).cast("int"),
        (F.col("f_bucket") + 1).cast("int"),
        (F.col("m_bucket") + 1).cast("int"),
    )
    segment = (
        F.when((r >= 4) & (f_ >= 4) & (m >= 4), "champion")
        .when((r >= 4) & (f_ <= 2), "new")
        .when((r <= 2) & (f_ >= 4), "at_risk")
        .when((r <= 2) & (f_ <= 2), "hibernating")
        .otherwise("regular")
    )
    return b.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r_score"),
        f_.alias("f_score"),
        m.alias("m_score"),
        segment.alias("segment"),
    ).orderBy("o_custkey")


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
    sorted_by_key: bool = True,
) -> DataFrame:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``
    at an explicit path, returning the re-read table.

    Two tables written this way with the same key and bucket count
    join with NO exchange on either side (the shuffle was paid once at
    write time — see tests/test_bucketing.py and q65). This is the
    layout the incremental-dedup index docstring assumes: a bucketed
    index side means only each new batch moves at probe time.
    """
    writer = (
        df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, key)
    )
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)
    return df.sparkSession.table(name)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two table snapshots — the
    reconciliation / change-data-feed primitive (what a table format's
    CDF emits, computed from plain snapshots).

    PRECONDITION: ``key`` must be unique within each snapshot — a
    duplicated key multiplies full-outer join rows and emits
    contradictory change rows. NULL keys are handled (the join is
    null-safe, so a NULL-keyed row diffs against the other side's
    NULL-keyed row instead of reporting a phantom insert+delete
    pair), but only one NULL-keyed row per snapshot satisfies the
    uniqueness precondition.

    Returns (key, change_type) with change_type in
    {'insert','delete','update'}: keys only in ``new`` are inserts,
    only in ``old`` are deletes, present in both with differing
    content are updates; identical rows are dropped. Content is
    compared via an md5 row digest over ``compare_cols`` (cast to
    string; cast doubles to DECIMAL first at the call site — double→
    string formatting is not engine-portable). The plan is one keyed
    full-outer hash join carrying only (key, 16-byte digest) per side
    — at 100 TB the shuffle moves digests, never rows, and the diff
    output is change-sized. NULL content columns: concat_ws skips
    NULLs identically in Spark and DuckDB, so a NULL→value change in
    a middle column can collide with a value shift; include an
    explicit null marker per column at the call site if columns are
    nullable.
    """
    def digested(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key).alias(f"{side}_key"),
            F.md5(
                F.concat_ws("|", *[F.col(c).cast("string") for c in compare_cols])
            ).alias(f"{side}_digest"),
        )

    o = digested(old, "o")
    n = digested(new, "n")
    joined = o.join(n, o.o_key.eqNullSafe(n.n_key), "full_outer")
    change = (
        F.when(F.col("o_digest").isNull(), "insert")
        .when(F.col("n_digest").isNull(), "delete")
        .when(F.col("o_digest") != F.col("n_digest"), "update")
    )
    return (
        joined.select(
            F.coalesce("o_key", "n_key").alias(key),
            change.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def triangle_count(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    degree_ordered: bool = False,
) -> DataFrame:
    """Count triangles in an undirected graph given canonically
    oriented edges (each undirected edge stored exactly once with
    u < v).

    Default path: a triangle {a<b<c} is found exactly once — wedge
    join (a,b)⋈(b,c) on the shared middle vertex, then a hash probe
    for the closing edge (a,c). Keyed equi-joins only — work is
    Σ deg² wedges under the id ordering, never |V|³.

    ``degree_ordered=True`` re-orients every edge from its lower- to
    its higher-(degree, id) endpoint before wedging, so each triangle
    is found at its MINIMUM-rank vertex and per-vertex wedge fan-out
    is bounded by the vertex's OUT-degree under the orientation —
    O(m^1.5) total work (arboricity bound; Chiba–Nishizeki / the
    standard distributed formulation in Suri & Vassilvitskii, WWW'11)
    instead of Σ deg² concentrated on hubs. Costs one degree
    aggregation plus two id-keyed dimension joins; worth it exactly
    when the graph has power-law hubs, which is why it's a flag and
    not the default for support-floored co-purchase graphs. Both
    paths return the identical 1-row (n_triangles) frame (equality
    pinned on K4/C4/hub graphs in tests/test_quality_checks.py).
    """
    if not degree_ordered:
        e1 = edges.select(F.col(u).alias("x"), F.col(v).alias("y"))
        e2 = edges.select(F.col(u).alias("y"), F.col(v).alias("z"))
        e3 = edges.select(F.col(u).alias("x"), F.col(v).alias("z"))
        return (
            e1.join(e2, "y")
            .join(e3, ["x", "z"])
            .agg(F.count("*").alias("n_triangles"))
        )
    e = edges.select(F.col(u).alias("a"), F.col(v).alias("b"))
    deg = (
        e.select(F.col("a").alias("w"))
        .unionAll(e.select(F.col("b").alias("w")))
        .groupBy("w")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("w").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("w").alias("b"), F.col("deg").alias("db")), "b")
    )
    ra = F.struct(F.col("da"), F.col("a"))
    rb = F.struct(F.col("db"), F.col("b"))
    # orient s -> t with rank(s) < rank(t); ranks are distinct because
    # the id tiebreak is total. Carry t's rank for the wedge ordering.
    o = ed.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(ra < rb, F.col("db")).otherwise(F.col("da")).alias("tdeg"),
    )
    o1 = o.select("s", F.col("t").alias("y"), F.col("tdeg").alias("ydeg"))
    o2 = o.select("s", F.col("t").alias("z"), F.col("tdeg").alias("zdeg"))
    wedges = o1.join(o2, "s").filter(
        F.struct(F.col("ydeg"), F.col("y")) < F.struct(F.col("zdeg"), F.col("z"))
    )
    # closing edge is oriented y -> z (rank(y) < rank(z) by the filter)
    closing = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    return (
        wedges.join(closing, ["y", "z"])
        .agg(F.count("*").alias("n_triangles"))
    )
