"""Similarity search over embedding columns (north-star; SURVEY §7).

Four tiers, increasing scale:
  1. brute-force cosine top-k        -> queries.q60 (exact baseline)
  2. sign-LSH bucketing              -> queries.q63 (deterministic,
     oracle-checkable; probe = same-bucket candidates)
  3. IVF (this module): KMeans coarse quantizer + nprobe cell search
     — the standard billion-vector layout. Vectors are partitioned by
     cell id on disk, so a probe touches nprobe/nlist of the corpus;
     at 100 TB that's the difference between scanning everything and
     scanning ~1-5%.
  4. IVF-PQ / residual quantization (IVFPQIndex, round 8): PQ codes
     on the residual vs the assigned cell's centroid — pruned probes
     AND m-bytes/vector compression, with codebook resolution spent
     on within-cell structure (flat PQ's measured 1M-scale failure;
     oracle twins queries.q184/q185).

All distance math is native column expressions (functions.dot /
cosine_similarity) — no Python in the scan path; only the tiny
centroid table crosses to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cosine_similarity
from ..sources.local import local_df

SEED = 42


@dataclass
class IVFIndex:
    """Coarse-quantized vector table: rows carry their cell id;
    centroids is a tiny (nlist x dim) table kept broadcast-able.
    ``id_col``/``vec_col`` record the column contract so every
    consumer (ivf_search's latest-wins window and output schema)
    resolves names from the index instead of assuming defaults —
    an index built over a custom id column would otherwise silently
    skip dedup-by-id."""

    assigned: DataFrame  # <id_col>, <vec_col>, [metadata...], cell
    centroids: DataFrame  # cell, centroid (array<double>)
    nlist: int
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    # per-(cell, metadata-values) row counts recorded at save /
    # refresh time ({"columns": [...], "rows": [[cell, v..., n]]}) —
    # the selectivity estimate behind ivf_search(auto_nprobe=True)
    cell_stats: dict | None = None


def build_ivf_index(
    emb: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> IVFIndex:
    """Fit the coarse quantizer and assign every vector to a cell.

    On a real deployment ``assigned`` is then written
    ``partitionBy("cell")`` so each probe reads only its cells'
    files (partition pruning does the candidate selection).
    ``keep_cols`` carries metadata columns into ``assigned`` so
    ``ivf_search(where=...)`` can serve filtered queries against the
    persisted layout (predicate + cell filter both reach the scan).
    """
    keep = list(keep_cols)
    feat = emb.select(
        id_col, vec_col, *keep, array_to_vector(vec_col).alias("_v")
    )
    km = KMeans(k=nlist, seed=SEED, featuresCol="_v", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, *keep, "cell")
    centroids = local_df(
        feat.sparkSession,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell bigint, centroid array<double>",
    )
    return IVFIndex(
        assigned=assigned,
        centroids=centroids,
        nlist=nlist,
        id_col=id_col,
        vec_col=vec_col,
    )


def ivf_search(
    index: IVFIndex,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    where=None,
    auto_nprobe: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors probing the nprobe nearest cells.

    The centroid ranking happens on the broadcast centroid table (a
    few KB); the candidate scan is a partition-pruned filter, then
    exact cosine + TakeOrderedAndProject. An index carrying a
    ``_bid`` version column (the streaming-ingest merged layout,
    streaming.sinks.read_streaming_ivf) resolves duplicate vec_ids
    latest-wins AFTER the cell filter — candidates stay
    partition-pruned, and a re-ingested vector cannot occupy two
    top-k slots.

    ``where`` (a Column or SQL string over the index's metadata
    columns) makes this FILTERED vector search — the q152 discipline
    as a reusable surface. Two rules it enforces/expects:

    - The predicate applies AFTER latest-wins resolution: filtering
      first would let a SUPERSEDED version whose metadata still
      matches resurrect into the results. (On the plain batch layout
      there is no version column and Catalyst pushes the predicate
      into the pruned scan.)
    - Selective predicates thin every probed cell — the search must
      OVER-PROBE (nprobe ≈ unfiltered-nprobe / selectivity, capped at
      nlist) or top-k starves; see q152/SCALING.md.

    ``auto_nprobe=True`` applies the over-probe rule automatically:
    ``nprobe`` is read as the UNFILTERED base and scaled by the
    predicate's estimated selectivity —
    ``min(nlist, ceil(base / max(sel, base/nlist)))`` — so callers
    stop hand-tuning per filter. Selectivity comes from the index's
    recorded per-cell metadata histogram (meta.json ``cell_stats``, a
    driver-side estimate costing one tiny local job); an index
    without stats (unsaved, high-cardinality metadata, or a predicate
    over unrecorded columns) falls back to one counting aggregate
    over the corpus. Streamed-but-uncompacted rows are not in the
    stats — the estimate tracks the last save/compaction, which is
    what a persisted serving index is. The chosen cell count rides on
    the returned frame as ``result.effective_nprobe``.
    """
    if auto_nprobe and where is not None:
        sel = _estimate_selectivity(
            index.assigned, index.id_col, index.cell_stats, where
        )
        if sel is not None:
            import math

            nprobe = min(
                index.nlist,
                int(math.ceil(nprobe / max(sel, nprobe / index.nlist))),
            )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_cells = [
        r["cell"]
        for r in index.centroids.select(
            "cell",
            cosine_similarity(F.col("centroid"), q).alias("sim"),
        )
        .orderBy(F.desc("sim"))
        .limit(nprobe)
        .collect()
    ]
    # latest-wins AFTER the cell filter: candidates stay partition-
    # pruned (a pre-filter window would force a full-index scan); the
    # documented caveat — a cross-cell update's superseded row in an
    # unprobed old cell — is removed by compaction, not here
    cand = _latest_wins(
        index.assigned.filter(F.col("cell").isin(probe_cells)),
        index.id_col,
    )
    if where is not None:
        cand = cand.filter(F.expr(where) if isinstance(where, str) else where)
    out = (
        cand.select(
            index.id_col,
            "cell",
            F.round(
                cosine_similarity(F.col(index.vec_col), q), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(index.id_col))
        .limit(k)
    )
    out.effective_nprobe = len(probe_cells)
    return out


def _latest_wins(df: DataFrame, id_col: str) -> DataFrame:
    """Resolve a versioned vector table (``_bid`` column — the
    streaming-merged layout) to each id's newest row and drop the
    version column; a frame without ``_bid`` passes through
    untouched. Dedup keys on the INDEX'S id column, never a
    hardcoded default."""
    if "_bid" not in df.columns:
        return df
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("_bid"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_bid")
    )


def _estimate_selectivity(
    rows_df: DataFrame, id_col: str, stats: dict | None, where
) -> float | None:
    """Fraction of index rows matching ``where``, estimated from the
    recorded per-cell metadata histogram (a tiny driver-local frame —
    the predicate is evaluated by Spark against it, so ANY expression
    over the recorded columns works), falling back to one counting
    aggregate over the corpus when no usable stats exist. Returns
    None when even the fallback cannot evaluate the predicate. The
    fallback resolves latest-wins FIRST on versioned layouts —
    superseded rows of re-ingested ids carry stale metadata that
    would bias the estimate toward the old distribution. Shared by
    the raw-vector (IVF) and residual-code (IVFPQ) layouts —
    ``rows_df`` is whichever table carries the metadata columns."""
    pred = F.expr(where) if isinstance(where, str) else where
    spark = rows_df.sparkSession
    if stats and stats.get("rows"):
        total = sum(r[-1] for r in stats["rows"])
        if total > 0:
            try:
                sdf = local_df(
                    spark,
                    [tuple(r) for r in stats["rows"]],
                    ["cell", *stats["columns"], "n"],
                )
                matched = (
                    sdf.filter(pred).agg(F.sum("n").alias("m")).first()["m"]
                    or 0
                )
                return matched / total
            except Exception:
                pass  # predicate over unrecorded columns — fall back
    try:
        row = _latest_wins(rows_df, id_col).agg(
            F.count("*").alias("t"),
            F.count_if(pred).alias("m"),
        ).first()
    except Exception:
        return None
    return (row["m"] / row["t"]) if row["t"] else None


@dataclass
class PQIndex:
    """Product-quantized vector table: each row carries m small code
    ids (one per subspace); codebooks is a tiny (m x ksub) table.

    Production layout: ``codes`` persists at m bytes/vector (vs
    4*dim bytes raw) — the classic memory-compression path for
    billion-vector corpora (Jegou et al., PQ for nearest neighbor).
    The oracle-checked q75 uses a deterministic codebook so DuckDB
    can replay it; this is the trained (per-subspace KMeans) variant
    noted there as the production form.

    KNOWN LIMIT (measured, SCALING.md): on CLUSTERED corpora flat
    codes quantize absolute position, so same-cluster vectors tie
    and refined recall@10 collapsed to 0.54 at 1M even at rf=100.
    Prefer IVFPQIndex (residual codes) for clustered production
    embeddings — same budget measured 1.00 there."""

    codes: DataFrame  # id_col, code_0..code_{m-1}
    codebooks: list[list[list[float]]]  # [s][cid] -> centroid (dsub floats)
    m: int
    ksub: int
    dsub: int


def build_pq_index(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PQIndex:
    """Train per-subspace KMeans(k=ksub, seed=42) codebooks and
    encode every vector as m code ids.

    The driver-side loop is over the m MODELS (m is 4-16), never the
    data; each fit/transform is a distributed MLlib job over the
    corpus. Encoding is a single chained transform — one pass, no
    joins, no shuffle beyond what KMeans itself does."""
    dim = len(emb.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    df = emb.select(id_col, vec_col)
    codebooks: list[list[list[float]]] = []
    for s in range(m):
        sub = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        df = df.withColumn(
            f"_v{s}", array_to_vector(F.transform(sub, lambda x: x.cast("double")))
        )
        km = KMeans(
            k=ksub, seed=SEED, featuresCol=f"_v{s}", predictionCol=f"code_{s}"
        )
        model = km.fit(df)
        df = model.transform(df)
        codebooks.append(
            [[float(x) for x in c] for c in model.clusterCenters()]
        )
    codes = df.select(id_col, *[f"code_{s}" for s in range(m)])
    return PQIndex(codes=codes, codebooks=codebooks, m=m, ksub=ksub, dsub=dsub)


def pq_adc_search(
    index: PQIndex,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by asymmetric distance: precompute the query-to-centroid
    LUT driver-side (m x ksub floats — a few hundred bytes), then
    score every row with m ``element_at`` lookups summed.

    This is a MAP-ONLY plan: no join, no shuffle — the scan reads m
    small-int columns per row and the top-k is TakeOrderedAndProject.
    At 100 TB the encoded table is ~m bytes/vector and the whole
    search is one pruned columnar scan."""
    lut = [
        [
            sum(
                (query_vec[s * index.dsub + j] - c[j]) ** 2
                for j in range(index.dsub)
            )
            for c in index.codebooks[s]
        ]
        for s in range(index.m)
    ]
    score = None
    for s in range(index.m):
        term = F.element_at(
            F.array(*[F.lit(float(d)) for d in lut[s]]),
            F.col(f"code_{s}") + F.lit(1),
        )
        score = term if score is None else score + term
    return (
        index.codes.select(id_col, F.round(score, 5).alias("approx_d2"))
        .orderBy("approx_d2", id_col)
        .limit(k)
    )


def default_refine_factor(dim: int) -> int:
    """Dim-scaled refine shortlist (VERDICT r09 order #5 — the knob
    the round-9 sweep proved free should not be a knob users must
    know about): per-subspace quantization noise sums over m
    subspaces, so the ADC-tie population — and with it the shortlist
    a given recall needs — grows with dimension. Every tier is
    MEASURED at 1M vectors: 32-d scores recall@10 = 1.00 at rf=100;
    128-d needs rf>=300 for 0.98; full embedding width (1536-d,
    m=96) scores 0.92 at rf=300 and recovers 1.00 at rf=500 —
    rf=1000 adds nothing (1.00 at +1.3% latency), so 500 is the
    >=512-d tier (VERDICT r10 order #1; the round-11 sweep closed
    the one extrapolated cell). All tiers cost ~zero marginal
    latency, because the exact re-rank of a KB-scale shortlist is
    noise next to the ADC scan (SCALING.md, round-9 high-dimension
    and round-11 full-recovery sections). Explicit refine_factor
    always wins; None picks this rule."""
    if dim >= 512:
        return 500
    return 300 if dim >= 128 else 100


def pq_search_refined(
    index: PQIndex,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    refine_factor: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC prune + exact re-rank — the production IVF-PQ pipeline's
    refine stage (Jegou et al. §V): over-fetch k*refine_factor
    candidates with the map-only ADC scan, then exact-score ONLY
    those rows against the raw vectors.

    The candidate set is k*refine_factor rows — broadcast it, so the
    refine is a broadcast semi-join against the raw table (no shuffle
    of the corpus) followed by TakeOrderedAndProject. At 100 TB the
    expensive exact math touches ~100 rows instead of 10^9.

    The shortlist must scale with the ADC-TIE population (measured:
    rf=100 scores recall 1.0 at 50k vectors but 0.54 at 1M on a
    clustered corpus; rf=500 restores 0.94) — or better, switch to
    ivfpq_search_refined, whose residual codes remove the tie
    population at the source (recall 1.0 at rf=100 at 1M).
    refine_factor=None derives the dim-scaled default
    (``default_refine_factor``); an explicit value always wins."""
    from ..functions import l2_sq

    if refine_factor is None:
        refine_factor = default_refine_factor(len(query_vec))
    cand = pq_adc_search(index, query_vec, k=k * refine_factor, id_col=id_col)
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        emb.join(F.broadcast(cand.select(id_col)), id_col, "semi")
        .select(id_col, F.round(l2_sq(F.col(vec_col), qlit), 5).alias("d2"))
        .orderBy("d2", id_col)
        .limit(k)
    )


def brute_force_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact baseline for recall measurement."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


CELL_STATS_MAX_ROWS = 4096


def compute_cell_stats(
    assigned: DataFrame, id_col: str, vec_col: str, exclude: tuple = ()
) -> dict | None:
    """Per-(cell, metadata-values) row counts over an assigned-vector
    table — the tiny histogram ivf_search(auto_nprobe=True) estimates
    predicate selectivity from without scanning the corpus. A
    versioned input (``_bid``, the streaming-merged layout) resolves
    latest-wins first — superseded rows would both skew the counts
    and fragment the histogram per batch. Only recorded when the
    combination count stays driver-bounded (CELL_STATS_MAX_ROWS) and
    the values are JSON-serializable; a high-cardinality metadata
    surface simply gets no stats (callers fall back to a counting
    aggregate)."""
    import json

    assigned = _latest_wins(assigned, id_col)
    meta_cols = [
        c
        for c in assigned.columns
        if c not in (id_col, vec_col, "cell", *exclude)
    ]
    if not meta_cols:
        return None
    rows = (
        assigned.groupBy("cell", *meta_cols)
        .agg(F.count("*").alias("n"))
        .limit(CELL_STATS_MAX_ROWS + 1)
        .collect()
    )
    if len(rows) > CELL_STATS_MAX_ROWS:
        return None
    stats = {
        "columns": meta_cols,
        "rows": [
            [r["cell"], *[r[c] for c in meta_cols], r["n"]] for r in rows
        ],
    }
    try:
        json.dumps(stats)
    except TypeError:
        return None
    return stats


def save_ivf_index(index: IVFIndex, path: str) -> None:
    """Persist the index in its production layout: vectors partitioned
    by cell (each probe's read is directory-pruned to its cells — the
    module-docstring promise made physical), centroids + metadata as
    tiny side tables. Metadata-carrying indexes also record the
    per-cell metadata histogram (selectivity stats for auto
    over-probing in filtered search) — recomputed from the CURRENT
    assigned table on every save, never copied from the in-memory
    index, so re-saving a merged/streamed index can't persist a stale
    distribution. A versioned input (``_bid`` — saving a streaming-
    merged index IS its compaction) resolves latest-wins before
    anything lands, so the written base carries one row per id and no
    version column leaks into the data or the column contract."""
    import json
    import os

    assigned = _latest_wins(index.assigned, index.id_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "assigned")
    )
    index.centroids.write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    stats = compute_cell_stats(assigned, index.id_col, index.vec_col)
    # tmp + atomic replace (the streaming.sinks manifest discipline):
    # a crash mid-write must not brick the index behind a truncated
    # meta.json
    meta_tmp = os.path.join(path, "meta.json.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(
            {
                "nlist": index.nlist,
                # the index's data-column contract (order matters):
                # streaming ingest projects every batch to exactly
                # these columns so base and stream leaves can never
                # drift apart schema-wise
                "columns": [c for c in assigned.columns if c != "cell"],
                "cell_stats": stats,
            },
            f,
        )
    os.replace(meta_tmp, os.path.join(path, "meta.json"))


def load_ivf_index(spark: SparkSession, path: str) -> IVFIndex:
    """Reload a saved BATCH index; searches against it are
    partition-pruned by the cell directories written at save time.
    An index that has received streaming ingest (or been compacted)
    must load through streaming.sinks.read_streaming_ivf — this
    loader's plain ``assigned`` dir would be a silently stale subset
    there, so that pairing fails loudly instead."""
    import json
    import os

    # layout names imported from the sink module that owns them — a
    # rename there must not silently disarm this guard
    from ..streaming.sinks import IVF_BASE_MANIFEST, IVF_STREAM_DIR

    if os.path.isdir(os.path.join(path, IVF_STREAM_DIR)) or os.path.exists(
        os.path.join(path, IVF_BASE_MANIFEST)
    ):
        raise ValueError(
            f"{path} has streaming ingest/compaction state; "
            "load it via streaming.sinks.read_streaming_ivf — "
            "load_ivf_index would return a stale batch-only subset"
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    # the recorded column contract names the id and vector columns
    # (columns[0]/columns[1] by build_ivf_index's projection order);
    # a pre-upgrade meta without it keeps the defaults
    cols = meta.get("columns") or ["vec_id", "embedding"]
    return IVFIndex(
        assigned=spark.read.parquet(os.path.join(path, "assigned")),
        centroids=spark.read.parquet(os.path.join(path, "centroids")),
        nlist=int(meta["nlist"]),
        id_col=cols[0],
        vec_col=cols[1],
        cell_stats=meta.get("cell_stats"),
    )


def pq_encode_columns(codebooks: list, vec_col: str = "embedding") -> list:
    """The m code columns assigning each subvector to its nearest
    codebook centroid — exact squared-L2 argmin with lowest-code
    tiebreak, as PURE column expressions over the literal codebooks
    (a few KB). This is how streamed vectors encode with the SAME
    trained codebooks and no MLlib dependency at ingest. Agreement
    with build_pq_index's KMeans.transform encoding is verified
    vector-for-vector on the test corpus (tests/test_similarity.py);
    note MLlib computes distances via the norm identity
    ‖a‖²+‖b‖²−2a·b while this folds Σ(aᵢ−bᵢ)², so a subvector
    EXACTLY ULP-equidistant between two centroids could in principle
    flip codes between the two paths — harmless for ADC (either code
    is an equally good quantization) but worth knowing if diffing
    batch vs streamed codes at much larger scales."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    cols = []
    for s in range(m):
        sub = F.transform(
            F.slice(F.col(vec_col), s * dsub + 1, dsub),
            lambda x: x.cast("double"),
        )
        cands = []
        for c in range(ksub):
            carr = F.array(*[F.lit(float(x)) for x in codebooks[s][c]])
            d = F.aggregate(
                F.zip_with(sub, carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cands.append(F.struct(d.alias("d"), F.lit(c).alias("c")))
        cols.append(F.array_min(F.array(*cands))["c"].alias(f"code_{s}"))
    return cols


def save_pq_index(index: PQIndex, path: str) -> None:
    """Persist PQ codes (m bytes/vector) as parquet and the codebooks
    (m x ksub x dsub floats — KBs) as JSON metadata."""
    import json
    import os

    index.codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    # tmp + atomic replace — same crash-safety as save_ivf_index
    meta_tmp = os.path.join(path, "meta.json.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(
            {
                "m": index.m,
                "ksub": index.ksub,
                "dsub": index.dsub,
                "codebooks": index.codebooks,
                # the id-column contract (codes' first column by
                # build_pq_index's projection): streaming ingest,
                # read, and compaction resolve it from here so a
                # custom-id index works without re-passing id_col at
                # every call site (the IVF columns-contract pattern)
                "id_col": index.codes.columns[0],
            },
            f,
        )
    os.replace(meta_tmp, os.path.join(path, "meta.json"))


def load_pq_index(spark: SparkSession, path: str) -> PQIndex:
    """Reload a saved BATCH PQ index. An index that has received
    streaming ingest (or been compacted) must load through
    streaming.sinks.read_streaming_pq — this loader's plain ``codes``
    dir would be a silently stale subset there, so that pairing
    fails loudly instead (the load_ivf_index contract)."""
    import json
    import os

    from ..streaming.sinks import PQ_BASE_MANIFEST, PQ_STREAM_DIR

    if os.path.isdir(os.path.join(path, PQ_STREAM_DIR)) or os.path.exists(
        os.path.join(path, PQ_BASE_MANIFEST)
    ):
        raise ValueError(
            f"{path} has streaming ingest/compaction state; "
            "load it via streaming.sinks.read_streaming_pq — "
            "load_pq_index would return a stale batch-only subset"
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return PQIndex(
        codes=spark.read.parquet(os.path.join(path, "codes")),
        codebooks=meta["codebooks"],
        m=int(meta["m"]),
        ksub=int(meta["ksub"]),
        dsub=int(meta["dsub"]),
    )


@dataclass
class IVFPQIndex:
    """Residual-quantized (IVFADC, Jegou et al. §IV) vector table:
    each row carries its coarse cell id plus m code ids encoding the
    RESIDUAL vector (raw − cell centroid) — the round-8 fix for the
    measured flat-PQ failure (SCALING.md: on a clustered 1M corpus
    all same-cluster vectors collapse onto near-identical flat codes
    and ADC ranks become tie-breaks; recall@10 = 0.54 at
    refine_factor=100). Quantizing the residual spends the whole
    codebook resolution on WITHIN-cell structure, which is exactly
    the signal flat codes lose. Coarse centroids live driver-side
    (nlist × dim floats — KBs) so cell ranking and per-cell LUTs
    never touch the cluster."""

    codes: DataFrame  # id_col, cell, code_0..code_{m-1}, [metadata...]
    centroids: list[list[float]]  # [cell] -> dim floats (coarse)
    codebooks: list[list[list[float]]]  # [s][cid] -> dsub floats (residual)
    nlist: int
    m: int
    ksub: int
    dsub: int
    id_col: str = "vec_id"
    # per-(cell, metadata-values) row counts recorded at save time —
    # the selectivity estimate behind ivfpq_adc_search(auto_nprobe)
    cell_stats: dict | None = None


def build_ivfpq_index(
    emb: DataFrame,
    nlist: int = 16,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> IVFPQIndex:
    """Fit the coarse quantizer, then train per-subspace KMeans
    codebooks on the RESIDUALS and encode every vector as
    (cell, m residual codes).

    Three distributed passes: coarse fit/assign, residual
    materialization (one broadcast join against the tiny centroid
    table), and the m subspace fits — the driver loops over MODELS
    (m is 4-16), never data. Codebooks are shared across cells
    (standard IVFADC): per-cell codebooks would need nlist × m
    KMeans fits and nlist × the codebook memory for marginal gain.

    ``keep_cols`` carries metadata columns into ``codes`` so
    ivfpq_adc_search(where=...) serves FILTERED compressed-index
    queries — the ivf_search discipline on the m-bytes/vector
    layout."""
    keep = list(keep_cols)
    coarse = build_ivf_index(
        emb, nlist=nlist, id_col=id_col, vec_col=vec_col,
        keep_cols=tuple(keep),
    )
    centroids = [
        [float(x) for x in r["centroid"]]
        for r in coarse.centroids.orderBy("cell").collect()
    ]
    dim = len(centroids[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    df = (
        coarse.assigned.join(F.broadcast(coarse.centroids), "cell")
        .select(
            id_col,
            "cell",
            *keep,
            F.zip_with(
                F.col(vec_col),
                F.col("centroid"),
                lambda a, b: a.cast("double") - b,
            ).alias("_resid"),
        )
    )
    codebooks: list[list[list[float]]] = []
    for s in range(m):
        df = df.withColumn(
            f"_v{s}", array_to_vector(F.slice(F.col("_resid"), s * dsub + 1, dsub))
        )
        km = KMeans(
            k=ksub, seed=SEED, featuresCol=f"_v{s}", predictionCol=f"code_{s}"
        )
        model = km.fit(df)
        df = model.transform(df)
        codebooks.append(
            [[float(x) for x in c] for c in model.clusterCenters()]
        )
    codes = df.select(
        id_col, "cell", *[f"code_{s}" for s in range(m)], *keep
    )
    return IVFPQIndex(
        codes=codes,
        centroids=centroids,
        codebooks=codebooks,
        nlist=nlist,
        m=m,
        ksub=ksub,
        dsub=dsub,
        id_col=id_col,
    )


def ivfpq_adc_search(
    index: IVFPQIndex,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    where=None,
    auto_nprobe: bool = False,
) -> DataFrame:
    """Top-k by asymmetric distance over the nprobe nearest cells.

    Cell ranking and the per-cell LUTs are pure driver math over the
    KB-sized centroid/codebook lists; the cluster sees ONE plan: a
    partition-pruned scan of the probed cells' code rows, a broadcast
    hash join against the nprobe-row LUT table (each row carries m
    ksub-float arrays — the whole table is a few KB), m element_at
    lookups summed, TakeOrderedAndProject. No shuffle of the corpus.

    Against flat pq_adc_search this buys resolution, not just
    pruning: the LUT for cell c scores distances to (query −
    centroid_c), so two vectors in the same cell separate by their
    residual codes instead of tying on cluster-level codes. A
    versioned layout (``_bid`` — streamed ingest) resolves duplicate
    ids latest-wins AFTER the cell filter, the ivf_search contract.

    ``where`` / ``auto_nprobe`` are ivf_search's filtered-search
    discipline on the compressed layout: the predicate (over
    keep_cols metadata carried in ``codes``) applies AFTER
    latest-wins resolution, and auto_nprobe over-probes by the
    predicate's estimated selectivity (recorded cell_stats, else one
    counting aggregate) so selective filters don't starve top-k."""
    if auto_nprobe and where is not None:
        sel = _estimate_selectivity(
            index.codes, index.id_col, index.cell_stats, where
        )
        if sel is not None:
            import math

            nprobe = min(
                index.nlist,
                int(math.ceil(nprobe / max(sel, nprobe / index.nlist))),
            )
    q = [float(x) for x in query_vec]
    cell_d2 = sorted(
        (sum((qi - ci) ** 2 for qi, ci in zip(q, c)), cell)
        for cell, c in enumerate(index.centroids)
    )
    probe_cells = [cell for _, cell in cell_d2[:nprobe]]
    lut_rows = []
    for cell in probe_cells:
        r = [qi - ci for qi, ci in zip(q, index.centroids[cell])]
        luts = tuple(
            [
                sum(
                    (r[s * index.dsub + j] - c[j]) ** 2
                    for j in range(index.dsub)
                )
                for c in index.codebooks[s]
            ]
            for s in range(index.m)
        )
        lut_rows.append((cell, *luts))
    spark = index.codes.sparkSession
    lut_df = local_df(
        spark,
        lut_rows,
        "cell bigint, "
        + ", ".join(f"_lut{s} array<double>" for s in range(index.m)),
    )
    cand = _latest_wins(
        index.codes.filter(F.col("cell").isin(probe_cells)), index.id_col
    )
    if where is not None:
        cand = cand.filter(F.expr(where) if isinstance(where, str) else where)
    score = None
    for s in range(index.m):
        term = F.element_at(F.col(f"_lut{s}"), F.col(f"code_{s}") + F.lit(1))
        score = term if score is None else score + term
    out = (
        cand.join(F.broadcast(lut_df), "cell")
        .select(
            index.id_col, "cell", F.round(score, 5).alias("approx_d2")
        )
        .orderBy("approx_d2", index.id_col)
        .limit(k)
    )
    out.effective_nprobe = len(probe_cells)
    return out


def ivfpq_search_refined(
    index: IVFPQIndex,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine_factor: int | None = None,
    vec_col: str = "embedding",
    where=None,
    auto_nprobe: bool = False,
) -> DataFrame:
    """ADC prune + exact re-rank — pq_search_refined's discipline on
    the residual index: over-fetch k*refine_factor by cell-pruned
    ADC, broadcast the id shortlist, exact-L2 only those rows.
    ``where``/``auto_nprobe`` filter at the ADC stage (metadata lives
    in the codes table), so the shortlist is already predicate-true
    and the re-rank needs no second filter.

    Sizing refine_factor: the shortlist must cover the ADC-TIE
    population, which grows with BOTH corpus size and dimension
    (per-subspace quantization noise sums over m subspaces).
    Measured at 1M vectors: 32-d/m=4 scores recall@10 = 1.00 at
    rf=100; 128-d/m=16 needs rf≈300-500 for 0.96-0.98; 1536-d/m=96
    scores 0.92 at rf=300 and recovers 1.00 at rf=500 — all at FLAT
    latency, because the exact re-rank of the shortlist is noise
    next to the ADC scan. Raising nprobe instead buys no recall at
    +35% latency (the misses are ADC-ranking losses inside already-
    probed cells, not coarse-stage misses). Rule: rf ≥ 300 at
    ≥128-d, ≥ 500 at ≥512-d (SCALING.md's round-9 high-dimension and
    round-11 full-recovery sections) — which is exactly what
    refine_factor=None derives from the query's dimension
    (``default_refine_factor``); an explicit value always wins."""
    from ..functions import l2_sq

    if refine_factor is None:
        refine_factor = default_refine_factor(len(query_vec))
    cand = ivfpq_adc_search(
        index, query_vec, k=k * refine_factor, nprobe=nprobe,
        where=where, auto_nprobe=auto_nprobe,
    )
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    out = (
        emb.join(
            F.broadcast(cand.select(index.id_col)), index.id_col, "semi"
        )
        .select(
            index.id_col,
            F.round(l2_sq(F.col(vec_col), qlit), 5).alias("d2"),
        )
        .orderBy("d2", index.id_col)
        .limit(k)
    )
    out.effective_nprobe = cand.effective_nprobe
    return out


def ivfpq_encode_columns(
    centroids: list, codebooks: list, vec_col: str = "embedding"
) -> list:
    """(cell, code_0..code_{m-1}) as PURE column expressions — the
    REFERENCE encoder (pq_encode_columns's contract, plus the coarse
    assignment): cell = exact squared-L2 argmin over the literal
    centroid table, residual = vector − that centroid, codes =
    per-subspace argmin over the literal codebooks. Lowest-id
    tiebreaks throughout; the KMeans.transform ULP caveat documented
    at pq_encode_columns applies to both argmin stages.

    Hot paths (the streaming sink) use ivfpq_encode_frame instead:
    this expression tree's Catalyst analysis and interpreted
    higher-order folds grow with nlist×dim + m×ksub×dsub and stop
    being viable at production codebook sizes (measured; see
    ivfpq_encode_frame). Fine for small codebooks and as the
    parity reference both encoders are tested against."""
    nlist = len(centroids)
    dim = len(centroids[0])
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    assert dim == m * dsub, f"centroid dim {dim} != m*dsub {m * dsub}"
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cands = []
    for c in range(nlist):
        carr = F.array(*[F.lit(float(x)) for x in centroids[c]])
        d = F.aggregate(
            F.zip_with(vec, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cands.append(F.struct(d.alias("d"), F.lit(c).alias("c")))
    cell = F.array_min(F.array(*cands))["c"]
    cent_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in centroids
        ]
    )
    resid = F.zip_with(
        vec, F.element_at(cent_lit, cell + F.lit(1)), lambda a, b: a - b
    )
    cols = [cell.alias("cell")]
    for s in range(m):
        sub = F.slice(resid, s * dsub + 1, dsub)
        ccands = []
        for c in range(ksub):
            carr = F.array(*[F.lit(float(x)) for x in codebooks[s][c]])
            d = F.aggregate(
                F.zip_with(sub, carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            ccands.append(F.struct(d.alias("d"), F.lit(c).alias("c")))
        cols.append(F.array_min(F.array(*ccands))["c"].alias(f"code_{s}"))
    return cols


def _dim_checked(vec_col: str, dim: int, id_col: str):
    """The vector column, or a LOUD executor-side failure when its
    length differs from the index dimension. The frame encoders pivot
    codes out of exploded components — a short vector would silently
    fall out of the max(when(..)) pivot as NULL code_s, and the NULL
    approx_d2 it produces downstream sorts NULLS FIRST, placing the
    malformed row at the TOP of ADC results (ADVICE r08). The batch
    build fails loudly in KMeans for the same input; this keeps the
    streaming/encode path equally loud, at zero cost on good rows
    (one size() comparison inside the existing projection)."""
    return F.when(F.size(F.col(vec_col)) == dim, F.col(vec_col)).otherwise(
        F.raise_error(
            F.format_string(
                "vector length %s != index dim %s for id %s",
                F.size(F.col(vec_col)).cast("string"),
                F.lit(str(dim)),
                F.col(id_col).cast("string"),
            )
        )
    )


def ivfpq_encode_frame(
    df: DataFrame,
    centroids: list,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, [extras...], cell, code_0..code_{m-1}) as a FRAME
    transform — the hot-path encoder the streaming sink uses.

    ivfpq_encode_columns is the same math as one giant column
    expression; at production codebook sizes that tree stops being
    viable (measured at nlist=64, dim=32, m=4, ksub=256: Catalyst
    ANALYSIS alone took 308 s and execution fell to interpreted
    CodegenFallback at ~21 ms/row — the higher-order-fold lesson
    from q129/q164, at expression scale). This encoder is the
    repo's winning shape instead: explode the vector to components,
    broadcast the centroid/codebook tables as ROWS, compute every
    candidate distance as plain codegen'd arithmetic, and argmin
    via min(struct) in map-side-combinable aggregates. Work per
    vector is dim×nlist + dim×ksub candidate rows through
    whole-stage codegen — no lambda interpretation, millisecond-free
    analysis, and the same lowest-id tiebreaks (the
    KMeans.transform ULP caveat documented at pq_encode_columns
    applies to the aggregate's sum order the same way; parity with
    build_ivfpq_index's codes is pinned in tests)."""
    spark = df.sparkSession
    nlist = len(centroids)
    dim = len(centroids[0])
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    assert dim == m * dsub, f"centroid dim {dim} != m*dsub {m * dsub}"

    comp = df.select(
        id_col,
        F.posexplode(
            F.transform(
                _dim_checked(vec_col, dim, id_col), lambda x: x.cast("double")
            )
        ).alias("_pos", "_v"),
    )
    cent_rows = [
        (c, p, float(v))
        for c, row in enumerate(centroids)
        for p, v in enumerate(row)
    ]
    # explicit INT schema: cell/code columns must match the batch
    # build's KMeans-prediction dtype exactly, or stream leaves drift
    # to bigint vs the base's int and ADC's element_at(..., code+1)
    # stops resolving (caught by the streaming parity tests)
    cent = local_df(spark, cent_rows, "_cell int, _pos int, _cv double")
    assign = (
        comp.join(F.broadcast(cent), "_pos")
        .groupBy(id_col, "_cell")
        .agg(
            F.sum(
                (F.col("_v") - F.col("_cv")) * (F.col("_v") - F.col("_cv"))
            ).alias("_d")
        )
        .groupBy(id_col)
        .agg(
            F.min(F.struct(F.col("_d"), F.col("_cell").alias("_c")))[
                "_c"
            ].alias("cell")
        )
    )
    # residual components: subtract the assigned centroid's component
    resid = (
        comp.join(assign, id_col)
        .join(
            F.broadcast(cent),
            (F.col("cell") == F.col("_cell")) & (comp["_pos"] == cent["_pos"]),
        )
        .select(
            id_col,
            "cell",
            comp["_pos"].alias("_pos"),
            (F.col("_v") - F.col("_cv")).alias("_rv"),
        )
    )
    cb_rows = [
        (s, c, j, float(v))
        for s, book in enumerate(codebooks)
        for c, entry in enumerate(book)
        for j, v in enumerate(entry)
    ]
    cb = local_df(spark, cb_rows, "_s int, _cid int, _j int, _cbv double")
    codes_long = (
        resid.withColumn("_s", (F.col("_pos") / dsub).cast("int"))
        .withColumn("_j", F.col("_pos") % dsub)
        .join(F.broadcast(cb), ["_s", "_j"])
        .groupBy(id_col, "cell", "_s", "_cid")
        .agg(
            F.sum(
                (F.col("_rv") - F.col("_cbv")) * (F.col("_rv") - F.col("_cbv"))
            ).alias("_d")
        )
        .groupBy(id_col, "cell", "_s")
        .agg(
            F.min(F.struct(F.col("_d"), F.col("_cid").alias("_c")))[
                "_c"
            ].alias("_code")
        )
    )
    wide = codes_long.groupBy(id_col, "cell").agg(
        *[
            F.max(F.when(F.col("_s") == s, F.col("_code"))).alias(f"code_{s}")
            for s in range(m)
        ]
    )
    if extra_cols:
        wide = df.select(id_col, *extra_cols).join(wide, id_col)
    return wide.select(
        id_col, "cell", *[f"code_{s}" for s in range(m)], *extra_cols
    )


def pq_encode_frame(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, [extras...], code_0..code_{m-1}) — ivfpq_encode_frame's
    flat sibling (no coarse stage): the hot-path encoder for flat-PQ
    streaming ingest at production codebook sizes, replacing the
    pq_encode_columns mega-expression in the sink (same measured
    rationale — see ivfpq_encode_frame)."""
    spark = df.sparkSession
    m = len(codebooks)
    ksub = len(codebooks[0])  # noqa: F841 — documents the fan-out
    dsub = len(codebooks[0][0])

    comp = df.select(
        id_col,
        F.posexplode(
            F.transform(
                _dim_checked(vec_col, m * dsub, id_col),
                lambda x: x.cast("double"),
            )
        ).alias("_pos", "_v"),
    )
    cb_rows = [
        (s, c, j, float(v))
        for s, book in enumerate(codebooks)
        for c, entry in enumerate(book)
        for j, v in enumerate(entry)
    ]
    # explicit INT schema — code-column dtype parity with the batch
    # build (see ivfpq_encode_frame)
    cb = local_df(spark, cb_rows, "_s int, _cid int, _j int, _cbv double")
    codes_long = (
        comp.withColumn("_s", (F.col("_pos") / dsub).cast("int"))
        .withColumn("_j", F.col("_pos") % dsub)
        .join(F.broadcast(cb), ["_s", "_j"])
        .groupBy(id_col, "_s", "_cid")
        .agg(
            F.sum(
                (F.col("_v") - F.col("_cbv")) * (F.col("_v") - F.col("_cbv"))
            ).alias("_d")
        )
        .groupBy(id_col, "_s")
        .agg(
            F.min(F.struct(F.col("_d"), F.col("_cid").alias("_c")))[
                "_c"
            ].alias("_code")
        )
    )
    wide = codes_long.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_s") == s, F.col("_code"))).alias(f"code_{s}")
            for s in range(m)
        ]
    )
    if extra_cols:
        wide = df.select(id_col, *extra_cols).join(wide, id_col)
    return wide.select(
        id_col, *[f"code_{s}" for s in range(m)], *extra_cols
    )


def save_ivfpq_index(index: IVFPQIndex, path: str) -> None:
    """Persist codes partitionBy(cell) — a probe's ADC scan is
    directory-pruned to its cells, the save_ivf_index layout — plus
    centroids/codebooks as JSON metadata (tmp + atomic replace). A
    versioned input (``_bid``) resolves latest-wins first, the
    save_ivf_index compaction contract."""
    import json
    import os

    codes = _latest_wins(index.codes, index.id_col)
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "codes")
    )
    code_cols = tuple(f"code_{s}" for s in range(index.m))
    # metadata-carrying indexes record the per-cell histogram
    # (selectivity stats for auto over-probing in filtered search) —
    # recomputed from the CURRENT codes on every save, the
    # save_ivf_index contract
    stats = compute_cell_stats(
        codes, index.id_col, vec_col="", exclude=code_cols
    )
    meta_tmp = os.path.join(path, "meta.json.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(
            {
                "nlist": index.nlist,
                "m": index.m,
                "ksub": index.ksub,
                "dsub": index.dsub,
                "centroids": index.centroids,
                "codebooks": index.codebooks,
                "id_col": index.id_col,
                # the data-column contract (id + metadata; cell and
                # the code columns are implied by the layout):
                # streaming ingest projects every batch to exactly
                # these source columns so base and stream leaves
                # can't drift apart schema-wise
                "columns": [
                    c
                    for c in codes.columns
                    if c != "cell" and c not in code_cols
                ],
                "cell_stats": stats,
            },
            f,
        )
    os.replace(meta_tmp, os.path.join(path, "meta.json"))


def load_ivfpq_index(spark: SparkSession, path: str) -> IVFPQIndex:
    """Reload a saved BATCH residual index; streamed/compacted state
    must load through streaming.sinks.read_streaming_pq (which
    returns the IVFPQIndex for a residual layout) — the
    load_ivf_index fail-loud pairing."""
    import json
    import os

    from ..streaming.sinks import PQ_BASE_MANIFEST, PQ_STREAM_DIR

    if os.path.isdir(os.path.join(path, PQ_STREAM_DIR)) or os.path.exists(
        os.path.join(path, PQ_BASE_MANIFEST)
    ):
        raise ValueError(
            f"{path} has streaming ingest/compaction state; "
            "load it via streaming.sinks.read_streaming_pq — "
            "load_ivfpq_index would return a stale batch-only subset"
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return IVFPQIndex(
        codes=spark.read.parquet(os.path.join(path, "codes")),
        centroids=meta["centroids"],
        codebooks=meta["codebooks"],
        nlist=int(meta["nlist"]),
        m=int(meta["m"]),
        ksub=int(meta["ksub"]),
        dsub=int(meta["dsub"]),
        id_col=meta.get("id_col", "vec_id"),
        cell_stats=meta.get("cell_stats"),
    )


def _sign_bucket(vec, n_bits: int):
    """q63's deterministic axis-sign bucket as an n_bits-char string."""
    return F.concat(
        *[
            F.when(F.element_at(vec, i + 1) >= 0, "1").otherwise("0")
            for i in range(n_bits)
        ]
    )


def knn_join(
    emb: DataFrame,
    k: int = 3,
    n_bits: int = 8,
    multiprobe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Self k-NN join via sign-LSH buckets — the operator form of
    q112 (table-to-table ANN: both sides corpus-sized, nothing to
    broadcast). Returns (id, neighbor_id, cosine, rank<=k).

    ``multiprobe=True`` additionally probes each vector's ``n_bits``
    1-bit-flip neighbor buckets on the QUERY side only (the index
    side keeps exactly one bucket per vector, so a candidate pair is
    generated at most once — no dedup pass needed). Recall rises
    toward exact at (n_bits+1)x candidate cost, still a keyed hash
    join; measured in tests/test_similarity.py against
    brute_force_topk.

    At 100 TB: per-bucket work is (corpus/2^n_bits)^2; raise n_bits
    to keep buckets bounded, multiprobe to buy recall back.
    """
    from pyspark.sql.window import Window

    vec = F.col(vec_col)
    home = _sign_bucket(vec, n_bits)
    index_side = emb.select(
        F.col(id_col).alias("_nbr_id"),
        vec.alias("_nbr_vec"),
        home.alias("_bucket"),
    )
    if multiprobe:
        flips = [home]
        for j in range(n_bits):
            flipped = F.concat(
                *[
                    F.when(
                        F.element_at(vec, i + 1) >= 0,
                        "0" if i == j else "1",
                    ).otherwise("1" if i == j else "0")
                    for i in range(n_bits)
                ]
            )
            flips.append(flipped)
        probes = F.array(*flips)
    else:
        probes = F.array(home)
    query_side = emb.select(
        F.col(id_col).alias("_qid"),
        vec.alias("_qvec"),
        F.explode(probes).alias("_probe"),
    )
    sims = query_side.join(
        index_side,
        (F.col("_probe") == F.col("_bucket"))
        & (F.col("_qid") != F.col("_nbr_id")),
    ).select(
        F.col("_qid").alias(id_col),
        F.col("_nbr_id").alias("neighbor_id"),
        F.round(cosine_similarity(F.col("_qvec"), F.col("_nbr_vec")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
