"""ANN similarity search: IVF index recall vs brute force."""

from __future__ import annotations

import pytest

from big_data_spark.catalog import load_table
from big_data_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    build_pq_index,
    ivf_search,
    pq_adc_search,
)

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_ORACLE, "embeddings").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    return [float(x) for x in emb.filter(emb.vec_id == 0).first()["embedding"]]


def test_ivf_index_shapes(emb):
    idx = build_ivf_index(emb, nlist=8)
    assert idx.centroids.count() == 8
    assert idx.assigned.count() == emb.count()
    cells = {r["cell"] for r in idx.assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivf_recall_vs_brute_force(emb, query_vec):
    exact = [r["vec_id"] for r in brute_force_topk(emb, query_vec, k=10).collect()]
    idx = build_ivf_index(emb, nlist=8)
    approx = [
        r["vec_id"] for r in ivf_search(idx, query_vec, k=10, nprobe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.6, (recall, exact, approx)
    # probing all cells must reproduce the exact result
    full = [
        r["vec_id"] for r in ivf_search(idx, query_vec, k=10, nprobe=8).collect()
    ]
    assert full == exact


def test_ivf_candidate_fraction(emb, query_vec):
    # the point of IVF: the probe scans a fraction of the corpus
    idx = build_ivf_index(emb, nlist=8)
    probed = ivf_search(idx, query_vec, k=10, nprobe=2)
    probe_cells = {r["cell"] for r in probed.select("cell").distinct().collect()}
    cand = idx.assigned.filter(idx.assigned.cell.isin(list(probe_cells))).count()
    assert cand < emb.count() * 0.75, (cand, emb.count())


def test_mllib_brp_lsh_recall(spark, emb, query_vec):
    """MLlib BucketedRandomProjectionLSH (SURVEY §7 step 7): the
    stock estimator's approxNearestNeighbors must agree with exact
    brute force on most of the top-k — validates the bucketed ANN
    path we also hand-roll in q63/q64."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors
    from pyspark.sql import functions as F

    df = emb.select(
        "vec_id",
        array_to_vector(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "features"
        ),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(df)
    key = Vectors.dense(query_vec)
    approx = [
        r["vec_id"] for r in model.approxNearestNeighbors(df, key, 10).collect()
    ]
    exact = [r["vec_id"] for r in brute_force_topk(emb, query_vec, k=10).collect()]
    # BRP-LSH ranks by euclidean, brute force by cosine; on this
    # fixture the neighborhoods overlap heavily
    assert len(set(approx) & set(exact)) >= 5, (approx, exact)


def test_mllib_minhash_lsh_similarity_join(spark):
    """MLlib MinHashLSH approxSimilarityJoin over token sets — the
    stock counterpart of the hand-rolled md5 MinHash banding
    (q44/q46): every pair it returns at distance < 0.4 must truly
    have Jaccard >= 0.6, checked exactly."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    )
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True).fit(docs)
    feat = cv.transform(docs).filter(F.expr("size(toks) > 0"))
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feat)
    pairs = (
        model.approxSimilarityJoin(feat, feat, 0.4, distCol="jdist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
            "jdist",
        )
        .collect()
    )
    assert pairs, "expected near-dup pairs in the fixture corpus"
    toks = {r["doc_id"]: set(r["toks"]) for r in docs.collect()}
    for r in pairs:
        ja = len(toks[r["a"]] & toks[r["b"]]) / len(toks[r["a"]] | toks[r["b"]])
        assert ja >= 0.55, (r["a"], r["b"], ja, r["jdist"])


def test_pq_adc_recall_vs_exact(spark, emb, query_vec):
    """PQ/ADC (q75) is lossy by design — but its top-10 must overlap
    the exact L2 top-10 well (compression shouldn't scramble the
    neighborhood)."""
    from pyspark.sql import functions as F

    from big_data_spark.functions import l2_sq
    from big_data_spark.queries import QUERIES

    approx = [
        r["vec_id"]
        for r in QUERIES["q75_pq_adc_topk"].fn(spark, SF_ORACLE).collect()
    ]
    qlit = F.array(*[F.lit(v) for v in query_vec])
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") >= 8)
        .select("vec_id", l2_sq(F.col("embedding"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    overlap = len(set(approx) & set(exact))
    # the q75 codebook is deliberately tiny (8 codes x 4 subspaces =
    # 12 bits/vector, vs 256 codes/subspace in production PQ), so
    # recall is coarse — but deterministic, and the exact top-1 must
    # survive the compression
    assert overlap >= 3, (overlap, approx, exact)
    assert exact[0] == approx[0]


def test_trained_pq_recall_vs_exact(spark, emb, query_vec):
    """Trained-codebook PQ (per-subspace KMeans, the production form
    q75's docstring points at): raw ADC recall@10 vs exact L2 must be
    non-trivial, and the exact re-rank stage must recover (nearly)
    the full exact top-10."""
    from pyspark.sql import functions as F

    from big_data_spark.functions import l2_sq
    from big_data_spark.operators.similarity import pq_search_refined

    idx = build_pq_index(emb, m=8, ksub=16)
    assert len(idx.codebooks) == 8
    assert all(len(cb) == 16 and len(cb[0]) == 8 for cb in idx.codebooks)

    approx = [r["vec_id"] for r in pq_adc_search(idx, query_vec, k=10).collect()]
    qlit = F.array(*[F.lit(v) for v in query_vec])
    exact = [
        r["vec_id"]
        for r in emb.select("vec_id", l2_sq(F.col("embedding"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    overlap = len(set(approx) & set(exact))
    assert overlap >= 3, (overlap, approx, exact)
    # vec_id 0 IS the query vector (distance 0); trained codebooks
    # must keep it on top even at 32-bit codes
    assert approx[0] == exact[0] == 0

    refined = [
        r["vec_id"]
        for r in pq_search_refined(idx, emb, query_vec, k=10).collect()
    ]
    assert len(set(refined) & set(exact)) >= 9, (refined, exact)
    assert refined[0] == 0


def test_pq_adc_search_is_map_only(spark, emb, query_vec):
    """The ADC scan must be shuffle-free: LUT lookups are literal
    arrays, top-k is TakeOrderedAndProject — one columnar pass."""
    from big_data_spark.plans import count_shuffles

    idx = build_pq_index(emb, m=8, ksub=16)
    scored = pq_adc_search(idx, query_vec, k=10)
    assert count_shuffles(scored) == 0, scored.explain(True)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_ivf_index_save_load_roundtrip(spark, emb, query_vec, tmp_path):
    """A reloaded IVF index returns the exact same search results, and
    the probe scan over the saved layout is pruned to the probed cell
    DIRECTORIES (PartitionFilters on cell), not a full-corpus read."""
    from big_data_spark.operators.similarity import load_ivf_index, save_ivf_index

    idx = build_ivf_index(emb, nlist=8)
    want = [tuple(r) for r in ivf_search(idx, query_vec, k=10, nprobe=4).collect()]

    path = str(tmp_path / "ivf")
    save_ivf_index(idx, path)
    idx2 = load_ivf_index(spark, path)
    got = [tuple(r) for r in ivf_search(idx2, query_vec, k=10, nprobe=4).collect()]
    assert got == want

    from pyspark.sql import functions as F

    pruned = idx2.assigned.filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:80], plan


def test_ivf_custom_id_column_contract(spark, emb, query_vec, tmp_path):
    """An index built over a NON-default id column works end-to-end:
    meta.json's column contract records it, load_ivf_index /
    read_streaming_ivf resolve it back, ivf_search's latest-wins
    window dedups on IT (a hardcoded vec_id would miss the dedup or
    fail outright), the output schema names it, and
    compact_streaming_ivf folds with it by default (id_col=None →
    meta columns[0])."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        load_ivf_index,
        save_ivf_index,
    )
    from big_data_spark.streaming.sinks import (
        compact_streaming_ivf,
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    docs = emb.withColumnRenamed("vec_id", "doc_id")
    index = build_ivf_index(docs, nlist=8, id_col="doc_id")
    idx_dir = str(tmp_path / "ivf_doc")
    save_ivf_index(index, idx_dir)
    loaded = load_ivf_index(spark, idx_dir)
    assert (loaded.id_col, loaded.vec_col) == ("doc_id", "embedding")
    batch_hits = [
        tuple(r) for r in ivf_search(index, query_vec, k=10).collect()
    ]
    assert ivf_search(loaded, query_vec, k=10).columns[0] == "doc_id"
    assert [
        tuple(r) for r in ivf_search(loaded, query_vec, k=10).collect()
    ] == batch_hits

    # streaming-only twin over the custom id; second batch RE-INGESTS
    # 50 existing ids, so the latest-wins window must dedup on doc_id
    idx2 = str(tmp_path / "ivf_doc_stream")
    os.makedirs(idx2)
    shutil.copytree(
        os.path.join(idx_dir, "centroids"), os.path.join(idx2, "centroids")
    )
    shutil.copy(
        os.path.join(idx_dir, "meta.json"), os.path.join(idx2, "meta.json")
    )
    src = tmp_path / "docvecs"
    src.mkdir()
    docs.coalesce(1).write.parquet(str(src / "a"))
    docs.filter(F.col("doc_id") % 10 == 0).coalesce(1).write.parquet(
        str(src / "b")
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_vector_ingest_stream(
            stream, idx2, ckpt, id_col="doc_id"
        )
        q.awaitTermination(180)

    run(str(tmp_path / "ck_doc"))
    live = read_streaming_ivf(spark, idx2)
    assert (live.id_col, live.vec_col) == ("doc_id", "embedding")
    hits = ivf_search(live, query_vec, k=10).collect()
    ids = [r["doc_id"] for r in hits]
    assert len(ids) == len(set(ids)) == 10, ids
    assert [tuple(r) for r in hits] == batch_hits

    # default-id compaction resolves doc_id from the column contract
    assert compact_streaming_ivf(spark, idx2) == 1
    live2 = read_streaming_ivf(spark, idx2)
    assert [
        tuple(r) for r in ivf_search(live2, query_vec, k=10).collect()
    ] == batch_hits

    # the PQ layout records the same contract: a custom-id PQ index
    # streams, reads, and compacts with NO id_col re-passed anywhere
    import json

    from big_data_spark.operators.similarity import (
        build_pq_index,
        save_pq_index,
    )
    from big_data_spark.streaming.sinks import (
        compact_streaming_pq,
        read_streaming_pq,
        start_pq_ingest_stream,
    )

    pq_dir = str(tmp_path / "pq_doc")
    save_pq_index(build_pq_index(docs, m=4, ksub=8, id_col="doc_id"), pq_dir)
    with open(os.path.join(pq_dir, "meta.json")) as f:
        assert json.load(f)["id_col"] == "doc_id"
    stream_pq = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    qpq = start_pq_ingest_stream(stream_pq, pq_dir, str(tmp_path / "ck_pq"))
    qpq.awaitTermination(180)
    live_pq = read_streaming_pq(spark, pq_dir)
    n_ids = live_pq.codes.select("doc_id").distinct().count()
    assert live_pq.codes.count() == n_ids == docs.count()  # deduped
    assert compact_streaming_pq(spark, pq_dir) == 1
    after_pq = read_streaming_pq(spark, pq_dir)
    assert after_pq.codes.count() == docs.count()
    assert "doc_id" in after_pq.codes.columns


def test_pq_compaction_preserves_view_and_crash_windows(
    spark, emb, query_vec, tmp_path
):
    """compact_streaming_pq folds finalized batches into a versioned
    base without changing the live view (latest-wins is associative),
    never folds the newest batch, is idempotent, survives the crash
    windows (orphan base dir, resurrected folded partitions), and the
    plain load_pq_index refuses streaming/compacted state."""
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        build_pq_index,
        load_pq_index,
        pq_adc_search,
        save_pq_index,
    )
    from big_data_spark.streaming.sinks import (
        compact_streaming_pq,
        read_streaming_pq,
        start_pq_ingest_stream,
    )

    d = str(tmp_path / "pq")
    save_pq_index(build_pq_index(emb, m=4, ksub=8), d)

    # three micro-batches: full corpus, then two overlapping update
    # waves (ids adopt donor embeddings -> latest batch must win)
    src = tmp_path / "vecs"
    src.mkdir()
    emb.coalesce(1).write.parquet(str(src / "a"))
    donors = {r["vec_id"]: r for r in emb.filter("vec_id < 40").collect()}
    ids = sorted(donors)

    def wave(name, pairs):
        rows = [
            (int(v), list(donors[d_]["embedding"]), donors[d_]["label"])
            for v, d_ in pairs
        ]
        spark.createDataFrame(rows, emb.schema).coalesce(1).write.parquet(
            str(src / name)
        )

    wave("b", [(ids[0], ids[1]), (ids[2], ids[3])])
    wave("c", [(ids[0], ids[4]), (ids[5], ids[6])])  # overlaps b on ids[0]

    ckpt = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_pq_ingest_stream(stream, d, ckpt)
    q.awaitTermination(180)

    def view():
        live = read_streaming_pq(spark, d)
        return {
            r["vec_id"]: tuple(r[f"code_{s}"] for s in range(4))
            for r in live.codes.collect()
        }

    before = view()
    hits_before = [
        tuple(r)
        for r in pq_adc_search(
            read_streaming_pq(spark, d), query_vec, k=10
        ).collect()
    ]

    # stash a partial that will fold, to resurrect later
    shutil.copytree(os.path.join(d, "codes_stream", "batch_id=0"),
                    str(tmp_path / "stash0"))
    # crash window A: an orphan base never flipped into the manifest
    os.makedirs(os.path.join(d, "codes-v7"), exist_ok=True)

    assert compact_streaming_pq(spark, d) == 2  # 3 live -> newest kept
    names = sorted(os.listdir(d))
    assert "_PQ_BASE" in names and "codes-v0" in names, names
    assert "codes-v7" not in names, names  # orphan swept
    assert "codes" not in names, names  # superseded plain base swept
    assert view() == before
    assert [
        tuple(r)
        for r in pq_adc_search(
            read_streaming_pq(spark, d), query_vec, k=10
        ).collect()
    ] == hits_before

    assert compact_streaming_pq(spark, d) == 0  # idempotent

    # crash window B: a folded partition resurrects after the flip —
    # readers must exclude it; the next compaction run sweeps it
    shutil.copytree(str(tmp_path / "stash0"),
                    os.path.join(d, "codes_stream", "batch_id=0"))
    assert view() == before
    compact_streaming_pq(spark, d)
    assert not os.path.isdir(os.path.join(d, "codes_stream", "batch_id=0"))

    # the plain batch loader refuses streaming/compacted state
    with _pytest.raises(ValueError, match="read_streaming_pq"):
        load_pq_index(spark, d)

    # a fresh checkpoint remains a foreign generation after folds
    stream2 = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q2 = start_pq_ingest_stream(stream2, d, str(tmp_path / "ck2"))
    with _pytest.raises(Exception, match="different[\\s\\S]*generation"):
        q2.awaitTermination(180)
    assert view() == before

    # the hard case: operator clears the stream dir — the NEWEST
    # (never-folded) batch's updates are gone with it and the _RUN
    # sidecar too, but the manifest's folded ids STILL prove a
    # foreign generation, whose restarted batches the reader would
    # silently exclude forever (pre-fix, the empty stream glob
    # disarmed the guard and the sidecar silently rebound)
    shutil.rmtree(os.path.join(d, "codes_stream"))
    folded_view = view()  # base-only: folded batches 0+1, sans batch 2
    stream3 = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q3 = start_pq_ingest_stream(stream3, d, str(tmp_path / "ck3"))
    with _pytest.raises(Exception, match="different[\\s\\S]*generation"):
        q3.awaitTermination(180)
    assert view() == folded_view  # nothing landed, nothing rebound


def test_save_merged_index_resolves_versions_and_refreshes_stats(
    spark, emb, query_vec, tmp_path
):
    """Re-saving a streaming-merged index via save_ivf_index IS its
    compaction: latest-wins resolves before anything lands (no _bid
    in the written data or the column contract, one row per id), and
    the selectivity histogram is recomputed from the CURRENT rows —
    never copied from the in-memory index — so an update stream that
    shifts the metadata distribution can't leave auto-nprobe
    estimating against the stale one. The stats-less fallback must
    apply the same latest-wins (superseded rows carry old labels)."""
    import json
    import os

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        IVFIndex,
        _estimate_selectivity,
        load_ivf_index,
        save_ivf_index,
    )
    from big_data_spark.streaming.sinks import (
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    idx_dir = str(tmp_path / "ivf")
    save_ivf_index(build_ivf_index(emb, nlist=8, keep_cols=("label",)), idx_dir)

    # update stream: every label-0 vector re-ingests as label 99
    src = tmp_path / "src"
    src.mkdir()
    flipped = emb.filter(F.col("label") == 0).select(
        "vec_id", "embedding", F.lit(99).cast(emb.schema["label"].dataType).alias("label")
    )
    n_flipped = flipped.count()
    flipped.coalesce(1).write.parquet(str(src / "u"))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_vector_ingest_stream(stream, idx_dir, str(tmp_path / "ck"))
    q.awaitTermination(180)

    live = read_streaming_ivf(spark, idx_dir)
    assert "_bid" in live.assigned.columns  # versioned layout in play

    out_dir = str(tmp_path / "ivf_resaved")
    save_ivf_index(live, out_dir)
    re = load_ivf_index(spark, out_dir)
    assert "_bid" not in re.assigned.columns
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    assert "_bid" not in meta["columns"]
    assert re.assigned.count() == emb.count()  # one row per id
    # stats reflect the POST-update distribution
    hist = {}
    for row in meta["cell_stats"]["rows"]:
        hist[row[1]] = hist.get(row[1], 0) + row[-1]
    assert hist.get(0, 0) == 0 and hist[99] == n_flipped, hist
    # and the stats-less fallback resolves latest-wins the same way
    live2 = read_streaming_ivf(spark, idx_dir)
    bare = IVFIndex(
        assigned=live2.assigned,
        centroids=live2.centroids,
        nlist=live2.nlist,
        cell_stats=None,
    )
    sel0 = _estimate_selectivity(
        bare.assigned, bare.id_col, bare.cell_stats, "label = 0"
    )
    sel99 = _estimate_selectivity(
        bare.assigned, bare.id_col, bare.cell_stats, "label = 99"
    )
    assert sel0 == 0.0
    assert abs(sel99 - n_flipped / emb.count()) < 1e-12


def test_pq_index_save_load_roundtrip(spark, emb, query_vec, tmp_path):
    """A reloaded PQ index reproduces ADC search results exactly —
    codes + codebooks survive the parquet/JSON roundtrip."""
    from big_data_spark.operators.similarity import load_pq_index, save_pq_index

    idx = build_pq_index(emb, m=4, ksub=8)
    want = [tuple(r) for r in pq_adc_search(idx, query_vec, k=10).collect()]

    path = str(tmp_path / "pq")
    save_pq_index(idx, path)
    idx2 = load_pq_index(spark, path)
    got = [tuple(r) for r in pq_adc_search(idx2, query_vec, k=10).collect()]
    assert got == want


def test_knn_join_multiprobe_recall(spark):
    """knn_join: exact within-bucket results match q112's contract;
    multiprobe strictly expands the candidate set (recall vs the
    brute-force true top-k is >= the single-probe recall, and both
    clear a floor on the sf0.001 corpus)."""
    from big_data_spark.catalog import load_table
    from big_data_spark.functions import cosine_similarity
    from big_data_spark.operators.similarity import knn_join

    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    k = 3
    # brute-force true top-k per vector (500x500 — test-scale only)
    a, b = emb.alias("a"), emb.alias("b")
    from pyspark.sql.window import Window

    truth = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("cosine"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("cosine"), "neighbor_id"
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    true_pairs = {(r["vec_id"], r["neighbor_id"]) for r in truth.collect()}

    def pairs(multiprobe):
        # n_bits=4 (16 buckets over 500 near-random vectors) keeps
        # bucket recall meaningful at smoke scale; sign-LSH on the
        # first bits of a random embedding correlates only weakly
        # with full-dim cosine, so the ASSERTED contract is the
        # relative one — multiprobe expands recall — plus a floor.
        got = knn_join(emb, k=k, n_bits=4, multiprobe=multiprobe).collect()
        # contract: at most k per vector, rank dense from 1
        by_vec = {}
        for r in got:
            by_vec.setdefault(r["vec_id"], []).append(r["rank"])
        for ranks in by_vec.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        return {(r["vec_id"], r["neighbor_id"]) for r in got}

    single = pairs(False)
    multi = pairs(True)
    r_single = len(single & true_pairs) / len(true_pairs)
    r_multi = len(multi & true_pairs) / len(true_pairs)
    assert r_multi >= r_single
    assert r_multi > 0.4, (r_single, r_multi)  # measured 0.495


def test_streaming_vector_ingest_matches_batch_index(spark, emb, query_vec, tmp_path):
    """start_vector_ingest_stream: vectors streamed into a trained
    index get the SAME cell assignments KMeans.transform gave them
    batch-side (same metric, same tiebreak), searches over the
    streamed index equal searches over the batch index, probe reads
    stay partition-pruned, and a fresh-checkpoint replay changes
    nothing."""
    import os

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
        save_ivf_index,
    )
    from big_data_spark.streaming.sinks import (
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    index = build_ivf_index(emb, nlist=8)
    idx_dir = str(tmp_path / "ivf")
    save_ivf_index(index, idx_dir)
    batch_hits = [tuple(r) for r in ivf_search(index, query_vec, k=10).collect()]

    # a streaming-only twin of the same index: centroids + meta copied,
    # vectors arrive ONLY via the stream (two micro-batches)
    import shutil

    idx2 = str(tmp_path / "ivf_stream")
    os.makedirs(idx2)
    shutil.copytree(os.path.join(idx_dir, "centroids"), os.path.join(idx2, "centroids"))
    shutil.copy(os.path.join(idx_dir, "meta.json"), os.path.join(idx2, "meta.json"))

    src = tmp_path / "vecs"
    src.mkdir()
    # deterministic key-parity split: an unordered limit() evaluated
    # twice (write + subtract) can pick different rows across jobs
    from pyspark.sql import functions as _F

    a = emb.filter(_F.col("vec_id") % 2 == 0)
    b = emb.filter(_F.col("vec_id") % 2 != 0)
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_vector_ingest_stream(stream, idx2, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    live = read_streaming_ivf(spark, idx2)

    # assignment parity: every vector in the same cell as batch-side
    want = {r["vec_id"]: r["cell"] for r in index.assigned.collect()}
    got = {r["vec_id"]: r["cell"] for r in live.assigned.collect()}
    assert got == want

    # search parity + partition pruning on the streamed layout
    sdf = ivf_search(live, query_vec, k=10)
    assert [tuple(r) for r in sdf.collect()] == batch_hits
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:80], plan

    # fresh-checkpoint replay overwrites its own leaves -> unchanged
    run(str(tmp_path / "c2"))
    live2 = read_streaming_ivf(spark, idx2)
    assert {r["vec_id"]: r["cell"] for r in live2.assigned.collect()} == want

    # re-ingest of EXISTING vec_ids (an update stream): the merged
    # index must not hand a vec_id two top-k slots — search resolves
    # duplicates latest-wins after the cell filter
    emb.limit(50).coalesce(1).write.parquet(str(src / "c"))
    run(str(tmp_path / "c3"))
    live3 = read_streaming_ivf(spark, idx2)
    hits = ivf_search(live3, query_vec, k=10).collect()
    ids = [r["vec_id"] for r in hits]
    assert len(ids) == len(set(ids)) == 10, ids
    assert [tuple(r) for r in hits] == batch_hits


def test_ivf_compaction_removes_stale_cross_cell_rows(spark, emb, tmp_path):
    """compact_streaming_ivf: a cross-cell embedding update leaves a
    superseded row in its OLD cell that a narrow (nprobe=1) probe of
    that cell surfaces — the documented read-path caveat. Compaction
    folds finalized stream batches into a rewritten cell-partitioned
    base with GLOBAL latest-wins, so the stale row is gone; the
    newest batch never folds; the flip is crash-safe (orphan base
    dirs invisible, post-compaction source replays of folded ids
    excluded); and load_ivf_index refuses the stale batch layout."""
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
        load_ivf_index,
        save_ivf_index,
    )
    from big_data_spark.streaming.sinks import (
        compact_streaming_ivf,
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    index = build_ivf_index(emb, nlist=8, keep_cols=("label",))
    idx = str(tmp_path / "ivf")
    save_ivf_index(index, idx)

    # pick an update that MOVES cell: x adopts y's embedding (y sits
    # in a different cell), so x's new row lands in y's cell
    rows = index.assigned.select("vec_id", "cell").collect()
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    cells = sorted(c for c, v in by_cell.items() if v)[:2]
    assert len(cells) == 2
    x_id, y_id = by_cell[cells[0]][0], by_cell[cells[1]][0]
    x_orig = [
        float(v)
        for v in emb.filter(F.col("vec_id") == x_id).first()["embedding"]
    ]
    y_vec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == y_id).first()["embedding"]
    ]

    src = tmp_path / "vecs"
    src.mkdir()

    def run(ckpt):
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_vector_ingest_stream(stream, idx, ckpt)
        q.awaitTermination(180)

    # batch 0: the cross-cell update; batch 1 (separate run so ids
    # are deterministic): an unrelated same-content re-ingest
    emb.filter(F.col("vec_id") == y_id).select(
        F.lit(x_id).cast("long").alias("vec_id"), "embedding", "label"
    ).coalesce(1).write.parquet(str(src / "a"))
    run(str(tmp_path / "ck"))
    emb.limit(5).coalesce(1).write.parquet(str(src / "b"))
    run(str(tmp_path / "ck"))

    # pre-compaction: the caveat is real — a narrow probe of x's OLD
    # cell still surfaces x (its new row lives in y's cell)
    live = read_streaming_ivf(spark, idx)
    stale = [
        r["vec_id"]
        for r in ivf_search(live, x_orig, k=5, nprobe=1).collect()
    ]
    assert x_id in stale

    # crash window A: an orphan base dir never flipped into the
    # manifest must be invisible
    os.makedirs(os.path.join(idx, "assigned-v7"), exist_ok=True)
    assert compact_streaming_ivf(spark, idx) == 1  # folds batch 0 only
    assert os.path.exists(os.path.join(idx, "_IVF_BASE"))
    assert os.path.isdir(os.path.join(idx, "assigned-v0"))

    live2 = read_streaming_ivf(spark, idx)
    # stale row gone: the narrow old-cell probe no longer returns x
    fresh = [
        r["vec_id"]
        for r in ivf_search(live2, x_orig, k=5, nprobe=1).collect()
    ]
    assert x_id not in fresh
    # x serves from its NEW cell
    near_y = [
        r["vec_id"]
        for r in ivf_search(live2, y_vec, k=5, nprobe=1).collect()
    ]
    assert x_id in near_y and y_id in near_y
    # resolved view: every vector exactly once, x in y's cell
    resolved = {r["vec_id"]: r["cell"] for r in live2.assigned.collect()}
    want = {r["vec_id"]: r["cell"] for r in index.assigned.collect()}
    want[x_id] = want[y_id]
    # latest-wins across base+newest-batch still applies at read; the
    # assigned frame may carry the newest batch's duplicates pre-window
    assert {
        r["vec_id"]: r["cell"]
        for r in live2.assigned.sort(F.desc("_bid"))
        .dropDuplicates(["vec_id"])
        .collect()
    } == want

    # idempotent: only the newest batch remains -> nothing to fold
    assert compact_streaming_ivf(spark, idx) == 0

    # a FRESH checkpoint restarts batch ids at 0, colliding with the
    # folded id — the ingest path must REJECT that generation loudly
    # (silently excluding its batches would lose genuinely new data)
    with _pytest.raises(Exception, match="different[\\s\\S]*generation"):
        run(str(tmp_path / "ck2"))
    live3 = read_streaming_ivf(spark, idx)
    again = [
        r["vec_id"]
        for r in ivf_search(live3, x_orig, k=5, nprobe=1).collect()
    ]
    assert x_id not in again  # nothing landed from the dead run

    # the plain batch layout was swept at compaction; the batch
    # loader refuses the streaming layout regardless
    import os as _os

    assert not _os.path.isdir(_os.path.join(idx, "assigned"))
    with _pytest.raises(ValueError, match="read_streaming_ivf"):
        load_ivf_index(spark, idx)


def test_ivf_update_stream_fuzz_with_random_compaction(spark, emb, tmp_path):
    """Randomized update-stream invariant: any sequence of micro-batch
    embedding updates, with compaction fired at random points between
    batches and a final fresh-checkpoint full replay, must resolve to
    exactly the clean final state — every vec_id once, carrying its
    LATEST embedding, in that embedding's cell. Updates copy existing
    vectors' embeddings, so expected cells come from the batch
    assignment (no independent float recompute; ingest==KMeans
    assignment is pinned by the parity test above)."""
    import os
    import random

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import build_ivf_index, save_ivf_index
    from big_data_spark.streaming.sinks import (
        compact_streaming_ivf,
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    index = build_ivf_index(emb, nlist=8, keep_cols=("label",))
    batch_cell = {r["vec_id"]: r["cell"] for r in index.assigned.collect()}
    pool = sorted(batch_cell)[:80]
    pool_emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in emb.filter(F.col("vec_id").isin(pool)).collect()
    }

    for seed in (7, 23):
        rng = random.Random(seed)
        idx = str(tmp_path / f"idx{seed}")
        save_ivf_index(index, idx)  # batch base: the full corpus
        src = tmp_path / f"src{seed}"
        src.mkdir()
        ck = str(tmp_path / f"ck{seed}")

        def run(ckpt):
            stream = (
                spark.readStream.schema(emb.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src / "*"))
            )
            q = start_vector_ingest_stream(stream, idx, ckpt)
            q.awaitTermination(180)

        latest_donor: dict[int, int] = {}  # vec_id -> donor whose embedding it carries
        for rnd in range(4):
            ids = rng.sample(pool, k=rng.randint(1, 6))
            donors = [rng.choice(pool) for _ in ids]
            rows = [
                (int(v), pool_emb[d][0], pool_emb[d][1])
                for v, d in zip(ids, donors)
            ]
            spark.createDataFrame(rows, emb.schema).coalesce(1).write.parquet(
                str(src / f"f{rnd}")
            )
            run(ck)
            for v, d in zip(ids, donors):
                latest_donor[v] = d
            if rng.random() < 0.5:
                compact_streaming_ivf(spark, idx)

        def resolved():
            live = read_streaming_ivf(spark, idx)
            return {
                r["vec_id"]: (r["cell"], list(r["embedding"]))
                for r in live.assigned.sort(F.desc("_bid"))
                .dropDuplicates(["vec_id"])
                .collect()
            }

        want = {
            v: (
                batch_cell[latest_donor[v]] if v in latest_donor else c,
                pool_emb[latest_donor[v]][0]
                if v in latest_donor
                else None,  # embedding only checked for updated ids
            )
            for v, c in batch_cell.items()
        }
        got = resolved()
        assert set(got) == set(want), seed
        for v, (cell, embv) in got.items():
            assert cell == want[v][0], (seed, v)
            if want[v][1] is not None:
                assert embv == want[v][1], (seed, v)

        before = got
        # after the final compaction a fold manifest ALWAYS exists
        # (either an in-loop compaction folded, or 4 live batches
        # remained and this one folds 3): the subsequent
        # fresh-checkpoint replay attempt must be rejected loudly —
        # its restarted ids would collide with the folded ones — and
        # nothing may land
        import pytest as _pytest

        compact_streaming_ivf(spark, idx)
        assert os.path.exists(os.path.join(idx, "_IVF_BASE")), seed
        with _pytest.raises(Exception, match="different[\\s\\S]*generation"):
            run(str(tmp_path / f"ck{seed}b"))
        assert resolved() == before, seed


def test_ivf_filtered_search(spark, emb, query_vec, tmp_path):
    """ivf_search(where=...): filtered top-k equals brute force over
    the filtered corpus when probing all cells (string and Column
    predicate forms agree), and on the versioned streaming layout the
    predicate applies AFTER latest-wins — an update that flips a
    vector's metadata OUT of the filter must remove it from filtered
    results (the superseded matching version cannot resurrect)."""
    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_search,
        save_ivf_index,
    )
    from big_data_spark.streaming.sinks import (
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    idx = build_ivf_index(emb, nlist=8, keep_cols=("label",))
    want = [
        r["vec_id"]
        for r in brute_force_topk(
            emb.filter(F.col("label").isin(1, 3)), query_vec, k=10
        ).collect()
    ]
    got = [
        r["vec_id"]
        for r in ivf_search(
            idx, query_vec, k=10, nprobe=8, where="label IN (1, 3)"
        ).collect()
    ]
    assert got == want  # probe-all == exact on the filtered corpus
    got_col = [
        r["vec_id"]
        for r in ivf_search(
            idx, query_vec, k=10, nprobe=8, where=F.col("label").isin(1, 3)
        ).collect()
    ]
    assert got_col == got

    # streamed update flips the top filtered hit's label OUT of the
    # filter (same embedding): filtered search must drop it, plain
    # search must still return it exactly once
    x_id = got[0]
    x_row = emb.filter(F.col("vec_id") == x_id).first()
    dir_ = str(tmp_path / "fivf")
    save_ivf_index(idx, dir_)
    src = tmp_path / "fsrc"
    src.mkdir()
    spark.createDataFrame(
        [(int(x_id), list(x_row["embedding"]), 99)], emb.schema
    ).coalesce(1).write.parquet(str(src / "u"))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_vector_ingest_stream(stream, dir_, str(tmp_path / "fck"))
    q.awaitTermination(180)

    live = read_streaming_ivf(spark, dir_)
    filtered = [
        r["vec_id"]
        for r in ivf_search(
            live, query_vec, k=10, nprobe=8, where="label IN (1, 3)"
        ).collect()
    ]
    assert x_id not in filtered
    assert filtered == [v for v in want if v != x_id] + [
        w
        for w in [
            r["vec_id"]
            for r in brute_force_topk(
                emb.filter(F.col("label").isin(1, 3) & (F.col("vec_id") != x_id)),
                query_vec,
                k=10,
            ).collect()
        ]
        if w not in want
    ], filtered
    plain = [
        r["vec_id"]
        for r in ivf_search(
            live, [float(v) for v in x_row["embedding"]], k=5, nprobe=8
        ).collect()
    ]
    assert plain.count(x_id) == 1  # still served unfiltered, one slot


def test_ivf_auto_nprobe_scales_with_selectivity(
    spark, emb, query_vec, tmp_path
):
    """auto_nprobe=True reads nprobe as the UNFILTERED base and
    over-probes by the predicate's estimated selectivity from the
    per-cell metadata histogram recorded at save time — no hand
    tuning per filter. At ~9% selectivity (one label of ten) the base
    of 2 must widen to all 8 cells, making filtered recall EXACT; at
    ~50% (five labels) it must widen to ~4 cells and beat (or match)
    the unscaled base's recall; a non-selective predicate must NOT
    over-probe. An index without stats falls back to one counting
    aggregate and lands the same effective nprobe."""
    import json
    import math
    import os

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        load_ivf_index,
        save_ivf_index,
    )

    path = str(tmp_path / "auto_ivf")
    save_ivf_index(build_ivf_index(emb, nlist=8, keep_cols=("label",)), path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    # histogram recorded: (cell, label) rows summing to the corpus
    assert meta["cell_stats"]["columns"] == ["label"]
    n_total = emb.count()
    assert sum(r[-1] for r in meta["cell_stats"]["rows"]) == n_total
    idx = load_ivf_index(spark, path)

    def recall(pred, got_ids, k=10):
        want = [
            r["vec_id"]
            for r in brute_force_topk(
                emb.filter(pred), query_vec, k=k
            ).collect()
        ]
        return len(set(got_ids) & set(want)) / len(want)

    # selective predicate (~9%): base 2 -> ceil(2/sel) capped at 8
    narrow = ivf_search(
        idx, query_vec, k=10, nprobe=2, where="label = 3", auto_nprobe=True
    )
    narrow_ids = [r["vec_id"] for r in narrow.collect()]
    sel_narrow = emb.filter("label = 3").count() / n_total
    assert narrow.effective_nprobe == min(
        8, math.ceil(2 / max(sel_narrow, 2 / 8))
    )
    assert narrow.effective_nprobe == 8  # ~9% blows past the cap
    assert recall(F.col("label") == 3, narrow_ids) == 1.0  # probe-all

    # broad predicate (~50%): widens to ~4 cells, recall >= unscaled
    broad = ivf_search(
        idx, query_vec, k=10, nprobe=2,
        where="label IN (0,1,2,3,4)", auto_nprobe=True,
    )
    sel_broad = emb.filter("label IN (0,1,2,3,4)").count() / n_total
    assert broad.effective_nprobe == min(
        8, math.ceil(2 / max(sel_broad, 2 / 8))
    )
    assert 2 < broad.effective_nprobe < 8
    base = ivf_search(
        idx, query_vec, k=10, nprobe=2, where="label IN (0,1,2,3,4)"
    )
    assert base.effective_nprobe == 2
    # recall averaged over several query vectors (single-query recall
    # on this small corpus is noisy): auto's widened probe must beat
    # the unscaled base and stay usable in absolute terms
    pred_broad = F.col("label").isin(0, 1, 2, 3, 4)
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(0, 5, 11, 17, 23))
        .orderBy("vec_id")
        .collect()
    ]
    r_auto, r_base = [], []
    for qv in qvecs:

        def ids(auto):
            return [
                r["vec_id"]
                for r in ivf_search(
                    idx, qv, k=10, nprobe=2,
                    where="label IN (0,1,2,3,4)", auto_nprobe=auto,
                ).collect()
            ]

        want = [
            r["vec_id"]
            for r in brute_force_topk(
                emb.filter(pred_broad), qv, k=10
            ).collect()
        ]
        r_auto.append(len(set(ids(True)) & set(want)) / len(want))
        r_base.append(len(set(ids(False)) & set(want)) / len(want))
    mean_auto = sum(r_auto) / len(r_auto)
    mean_base = sum(r_base) / len(r_base)
    assert mean_auto > mean_base, (r_auto, r_base)
    # absolute floor is modest by design: a 500-vector corpus split 8
    # ways gives a weak coarse quantizer; the property under test is
    # the WIDENING, with exactness already pinned at the probe-all cap
    assert mean_auto >= 0.6, (r_auto, r_base)

    # non-selective predicate: selectivity ~1 -> no over-probe
    full = ivf_search(
        idx, query_vec, k=10, nprobe=2, where="label >= 0",
        auto_nprobe=True,
    )
    assert full.effective_nprobe == 2

    # no stats recorded -> counting-aggregate fallback, same widening
    meta2 = dict(meta, cell_stats=None)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta2, f)
    idx2 = load_ivf_index(spark, path)
    assert idx2.cell_stats is None
    narrow2 = ivf_search(
        idx2, query_vec, k=10, nprobe=2, where="label = 3",
        auto_nprobe=True,
    )
    assert narrow2.effective_nprobe == 8


def test_vector_ingest_rejects_schema_drift(spark, emb, tmp_path):
    """A stream batch missing one of the index's contract columns
    (meta.json 'columns') must fail loudly — landing it would give
    stream leaves a different schema than the base and break (or
    silently null) the merged read."""
    import pytest as _pytest

    from big_data_spark.operators.similarity import (
        build_ivf_index,
        save_ivf_index,
    )
    from big_data_spark.streaming.sinks import start_vector_ingest_stream

    idx = build_ivf_index(emb, nlist=8, keep_cols=("label",))
    d = str(tmp_path / "ivf")
    save_ivf_index(idx, d)
    src = tmp_path / "s"
    src.mkdir()
    bad = emb.select("vec_id", "embedding").limit(5)
    bad.coalesce(1).write.parquet(str(src / "a"))
    stream = (
        spark.readStream.schema(bad.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_vector_ingest_stream(stream, d, str(tmp_path / "ck"))
    with _pytest.raises(Exception, match="lacks index columns"):
        q.awaitTermination(120)


def test_streaming_pq_ingest_matches_batch(spark, emb, query_vec, tmp_path):
    """start_pq_ingest_stream: vectors streamed into a trained PQ
    index get the SAME codes KMeans.transform gave them batch-side
    (pq_encode_columns parity), ADC search over the streamed index
    equals the batch index, a FRESH checkpoint over existing
    cross-batch state is rejected loudly (generation binding — the
    SCD2/IVF contract; restarted batch ids would corrupt the
    latest-wins order), a same-generation restart replays cleanly,
    and a re-ingested update resolves latest-wins (the vector adopts
    its donor's codes, no duplicate vec_id)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        build_pq_index,
        pq_adc_search,
        save_pq_index,
    )
    from big_data_spark.streaming.sinks import (
        read_streaming_pq,
        start_pq_ingest_stream,
    )

    idx = build_pq_index(emb, m=8, ksub=16)
    d = str(tmp_path / "pq")
    save_pq_index(idx, d)
    batch_codes = {
        r["vec_id"]: tuple(r[f"code_{s}"] for s in range(8))
        for r in idx.codes.collect()
    }
    batch_hits = [
        tuple(r) for r in pq_adc_search(idx, query_vec, k=10).collect()
    ]

    # stream-only twin: meta (codebooks) only; codes arrive via stream
    d2 = str(tmp_path / "pq_stream")
    os.makedirs(d2)
    shutil.copy(os.path.join(d, "meta.json"), os.path.join(d2, "meta.json"))
    src = tmp_path / "vecs"
    src.mkdir()
    # deterministic key-parity split: an unordered limit() evaluated
    # twice (write + subtract) can pick different rows across jobs
    from pyspark.sql import functions as _F

    a = emb.filter(_F.col("vec_id") % 2 == 0)
    b = emb.filter(_F.col("vec_id") % 2 != 0)
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_pq_ingest_stream(stream, d2, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    live = read_streaming_pq(spark, d2)
    got = {
        r["vec_id"]: tuple(r[f"code_{s}"] for s in range(8))
        for r in live.codes.collect()
    }
    assert got == batch_codes
    assert [
        tuple(r) for r in pq_adc_search(live, query_vec, k=10).collect()
    ] == batch_hits

    # a FRESH checkpoint over the existing codes_stream is a foreign
    # generation — its restarted batch ids could let a stale copy of
    # an updated vector win, so the write path rejects it loudly
    import pytest as _pytest

    with _pytest.raises(Exception, match="different[\\s\\S]*generation"):
        run(str(tmp_path / "c2"))
    live2 = read_streaming_pq(spark, d2)  # state untouched by the
    got2 = {  # rejected generation
        r["vec_id"]: tuple(r[f"code_{s}"] for s in range(8))
        for r in live2.codes.collect()
    }
    assert got2 == batch_codes

    # same-generation restart (the ORIGINAL checkpoint) replays clean
    run(str(tmp_path / "c1"))
    assert {
        r["vec_id"]: tuple(r[f"code_{s}"] for s in range(8))
        for r in read_streaming_pq(spark, d2).codes.collect()
    } == batch_codes

    # update stream: vec x adopts vec y's embedding -> latest-wins
    # gives x exactly y's codes, exactly once
    x_id, y_id = sorted(batch_codes)[0], sorted(batch_codes)[-1]
    emb.filter(F.col("vec_id") == y_id).select(
        F.lit(int(x_id)).cast("long").alias("vec_id"), "embedding", "label"
    ).coalesce(1).write.parquet(str(src / "u"))
    run(str(tmp_path / "c1"))  # same generation continues (batch 2)
    live3 = read_streaming_pq(spark, d2)
    got3 = {
        r["vec_id"]: tuple(r[f"code_{s}"] for s in range(8))
        for r in live3.codes.collect()
    }
    assert len(got3) == len(batch_codes)
    assert got3[x_id] == batch_codes[y_id]
    assert {k: v for k, v in got3.items() if k != x_id} == {
        k: v for k, v in batch_codes.items() if k != x_id
    }


def test_ivfpq_residual_recall_vs_exact(spark, emb, query_vec):
    """Residual (IVFADC) quantization: codes encode vector − cell
    centroid, so codebook resolution is spent on within-cell
    structure — the round-8 fix for the measured flat-PQ recall
    collapse on clustered corpora (SCALING.md). Raw ADC must rank
    non-trivially; the refine stage must recover (nearly) the exact
    L2 top-10; and on the same corpus/params the residual ADC
    shortlist must be at least as good as flat PQ's."""
    from pyspark.sql import functions as F

    from big_data_spark.functions import l2_sq
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_adc_search,
        ivfpq_search_refined,
    )

    idx = build_ivfpq_index(emb, nlist=8, m=8, ksub=16)
    assert idx.codes.columns[:2] == ["vec_id", "cell"]
    assert len(idx.centroids) == 8 and len(idx.centroids[0]) == 64
    assert len(idx.codebooks) == 8
    assert all(len(cb) == 16 and len(cb[0]) == 8 for cb in idx.codebooks)

    qlit = F.array(*[F.lit(v) for v in query_vec])
    exact = [
        r["vec_id"]
        for r in emb.select("vec_id", l2_sq(F.col("embedding"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    # all cells probed: measures pure quantization quality, no
    # pruning loss mixed in
    approx = [
        r["vec_id"]
        for r in ivfpq_adc_search(idx, query_vec, k=10, nprobe=8).collect()
    ]
    overlap = len(set(approx) & set(exact))
    assert overlap >= 3, (overlap, approx, exact)
    # vec_id 0 IS the query vector — residual codes must keep it on top
    assert approx[0] == exact[0] == 0

    refined = [
        r["vec_id"]
        for r in ivfpq_search_refined(
            idx, emb, query_vec, k=10, nprobe=8, refine_factor=10
        ).collect()
    ]
    assert len(set(refined) & set(exact)) >= 9, (refined, exact)
    assert refined[0] == 0


def test_refine_factor_dim_scaled_default(spark, emb, query_vec):
    """refine_factor=None derives the measured operating rule
    (VERDICT r09 order #5, r10 order #1): rf=100 below 128-d, rf=300
    at >=128-d, rf=500 at >=512-d — every tier backed by a 1M-vector
    sweep cell (the round-11 run measured rf=500 -> recall 1.00 at
    1536-d, rf=1000 buys nothing; SCALING.md). An explicit value
    always wins; the derived default must produce exactly the
    explicit call's results."""
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        default_refine_factor,
        ivfpq_search_refined,
    )

    assert default_refine_factor(32) == 100
    assert default_refine_factor(127) == 100
    assert default_refine_factor(128) == 300
    assert default_refine_factor(511) == 300
    assert default_refine_factor(512) == 500
    assert default_refine_factor(1536) == 500

    idx = build_ivfpq_index(emb, nlist=8, m=4, ksub=8)
    derived = [
        tuple(r)
        for r in ivfpq_search_refined(
            idx, emb, query_vec, k=5, nprobe=8
        ).collect()
    ]
    explicit = [
        tuple(r)
        for r in ivfpq_search_refined(
            idx,
            emb,
            query_vec,
            k=5,
            nprobe=8,
            refine_factor=default_refine_factor(len(query_vec)),
        ).collect()
    ]
    assert derived == explicit and len(derived) == 5


def test_ivfpq_encode_columns_parity(spark, emb):
    """Pure-column residual encoding (the streaming-ingest path) must
    agree with the build's KMeans.transform assignment vector-for-
    vector — cell AND all m codes (the pq_encode_columns contract
    extended to the coarse stage)."""
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_encode_columns,
    )

    idx = build_ivfpq_index(emb, nlist=8, m=4, ksub=8)
    cols = idx.codes.columns[1:]  # cell, code_0..3
    built = {
        r["vec_id"]: tuple(r[c] for c in cols) for r in idx.codes.collect()
    }
    pure = {
        r["vec_id"]: tuple(r[c] for c in cols)
        for r in emb.select(
            "vec_id", *ivfpq_encode_columns(idx.centroids, idx.codebooks)
        ).collect()
    }
    assert pure == built


def test_ivfpq_save_load_pruned_probe(spark, emb, query_vec, tmp_path):
    """A reloaded residual index returns identical ADC results, the
    probed scan is directory-pruned to the probed CELLS
    (PartitionFilters), the LUT join is a broadcast (no shuffle of
    the codes), and a streamed/compacted dir refuses this loader."""
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_adc_search,
        load_ivfpq_index,
        save_ivfpq_index,
    )
    from big_data_spark.plans import count_shuffles

    idx = build_ivfpq_index(emb, nlist=8, m=4, ksub=8)
    want = [
        tuple(r)
        for r in ivfpq_adc_search(idx, query_vec, k=10, nprobe=3).collect()
    ]
    path = str(tmp_path / "ivfpq")
    save_ivfpq_index(idx, path)
    idx2 = load_ivfpq_index(spark, path)
    scored = ivfpq_adc_search(idx2, query_vec, k=10, nprobe=3)
    assert [tuple(r) for r in scored.collect()] == want
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters:"
    )[1][:120], plan
    assert "BroadcastHashJoin" in plan, plan
    assert count_shuffles(scored) == 0, plan

    # the fail-loud pairing: streaming state refuses the batch loader
    import os

    import pytest as _pytest

    os.makedirs(os.path.join(path, "codes_stream"))
    with _pytest.raises(ValueError, match="read_streaming_pq"):
        load_ivfpq_index(spark, path)


def test_streaming_ivfpq_ingest_matches_batch(spark, emb, query_vec, tmp_path):
    """The residual index maintains itself through the SAME streaming
    sink as flat PQ (start_pq_ingest_stream branches on the recorded
    coarse centroids): streamed vectors get the batch build's exact
    (cell, codes); the merged read defers latest-wins so the probe
    scan stays cell-pruned; compaction folds into a cell-PARTITIONED
    versioned base with search results unchanged."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_adc_search,
        save_ivfpq_index,
    )
    from big_data_spark.streaming.sinks import (
        compact_streaming_pq,
        read_streaming_pq,
        start_pq_ingest_stream,
    )

    idx = build_ivfpq_index(emb, nlist=8, m=4, ksub=8)
    d = str(tmp_path / "ivfpq")
    save_ivfpq_index(idx, d)
    cols = idx.codes.columns[1:]
    batch_codes = {
        r["vec_id"]: tuple(r[c] for c in cols) for r in idx.codes.collect()
    }
    batch_hits = [
        tuple(r)
        for r in ivfpq_adc_search(idx, query_vec, k=10, nprobe=8).collect()
    ]

    # stream-only twin: meta (centroids + codebooks) only
    d2 = str(tmp_path / "ivfpq_stream")
    os.makedirs(d2)
    shutil.copy(os.path.join(d, "meta.json"), os.path.join(d2, "meta.json"))
    src = tmp_path / "vecs"
    src.mkdir()
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    c = emb.filter(F.col("vec_id") % 3 == 2)
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))
    c.coalesce(1).write.parquet(str(src / "c"))

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_pq_ingest_stream(stream, d2, str(tmp_path / "ck"))
    q.awaitTermination(180)

    live = read_streaming_pq(spark, d2)
    assert type(live).__name__ == "IVFPQIndex"
    assert "_bid" in live.codes.columns  # deferred resolution
    got = {
        r["vec_id"]: tuple(r[c] for c in cols)
        for r in live.codes.drop("_bid").collect()
    }
    assert got == batch_codes
    assert [
        tuple(r)
        for r in ivfpq_adc_search(live, query_vec, k=10, nprobe=8).collect()
    ] == batch_hits

    # compaction: folds all but the newest batch into codes-v0,
    # partitioned by cell; merged view unchanged
    folded = compact_streaming_pq(spark, d2)
    assert folded == 2
    assert os.path.isdir(os.path.join(d2, "codes-v0"))
    assert any(
        e.startswith("cell=") for e in os.listdir(os.path.join(d2, "codes-v0"))
    )
    live2 = read_streaming_pq(spark, d2)
    assert {
        r["vec_id"]: tuple(r[c] for c in cols)
        for r in live2.codes.drop("_bid").collect()
    } == batch_codes
    assert [
        tuple(r)
        for r in ivfpq_adc_search(live2, query_vec, k=10, nprobe=8).collect()
    ] == batch_hits


def test_ivfpq_filtered_search_auto_overprobe(spark, emb, query_vec, tmp_path):
    """Filtered search on the COMPRESSED layout (the q152/ivf_search
    discipline ported to residual codes): keep_cols metadata rides in
    the codes table, the predicate applies after latest-wins at the
    ADC stage, save records the per-cell metadata histogram, and
    auto_nprobe over-probes by the estimated selectivity (~10% label
    filter ⇒ probes widen toward nlist) so selective filters don't
    starve top-k. The refined result must equal the exact filtered
    L2 top-k."""
    import json
    import os

    from pyspark.sql import functions as F

    from big_data_spark.functions import l2_sq
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_search_refined,
        load_ivfpq_index,
        save_ivfpq_index,
    )

    idx = build_ivfpq_index(
        emb, nlist=8, m=4, ksub=16, keep_cols=("label",)
    )
    assert "label" in idx.codes.columns
    path = str(tmp_path / "ivfpq_meta")
    save_ivfpq_index(idx, path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    assert meta["columns"] == ["vec_id", "label"]
    stats = meta["cell_stats"]
    assert stats and stats["columns"] == ["label"]
    assert sum(r[-1] for r in stats["rows"]) == emb.count()

    idx2 = load_ivfpq_index(spark, path)
    assert idx2.cell_stats == stats

    qlit = F.array(*[F.lit(v) for v in query_vec])
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("label") == 3)
        .select("vec_id", l2_sq(F.col("embedding"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    got_df = ivfpq_search_refined(
        idx2,
        emb,
        query_vec,
        k=5,
        nprobe=1,
        refine_factor=40,
        where="label = 3",
        auto_nprobe=True,
    )
    got = [r["vec_id"] for r in got_df.collect()]
    # ~10% selectivity from a 1-cell base must over-probe hard
    # (min(nlist, ceil(1/0.1)) = 8 cells on this index)
    assert got_df.effective_nprobe == 8
    assert got == exact, (got, exact)

    # results all satisfy the predicate (paranoia: the filter ran at
    # the ADC stage, so re-check against the raw table)
    labels = {
        r["label"]
        for r in emb.join(
            spark.createDataFrame([(v,) for v in got], ["vec_id"]), "vec_id"
        ).collect()
    }
    assert labels == {3}


def test_streaming_ivfpq_carries_metadata(spark, emb, query_vec, tmp_path):
    """A residual index built with keep_cols keeps serving FILTERED
    search after streaming ingest: the sink projects each batch to
    the recorded column contract (metadata included), a batch missing
    a contract column is rejected loudly, and the merged index
    filters streamed rows too."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_adc_search,
        ivfpq_search_refined,
        save_ivfpq_index,
    )
    from big_data_spark.streaming.sinks import (
        read_streaming_pq,
        start_pq_ingest_stream,
    )

    base = emb.filter(F.col("vec_id") % 2 == 0)
    tail = emb.filter(F.col("vec_id") % 2 != 0)
    idx = build_ivfpq_index(base, nlist=4, m=4, ksub=8, keep_cols=("label",))
    d = str(tmp_path / "ivfpq_meta_stream")
    save_ivfpq_index(idx, d)

    src = tmp_path / "vecs"
    src.mkdir()
    tail.coalesce(1).write.parquet(str(src / "a"))

    def run(ckpt, schema):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_pq_ingest_stream(stream, d, ckpt)
        q.awaitTermination(180)
        for err in (q.exception(),):
            if err:
                raise err

    # a stream lacking the contract's metadata column fails loudly
    with _pytest.raises(Exception, match="lacks index columns"):
        run(str(tmp_path / "c_bad"), "vec_id long, embedding array<float>")

    run(
        str(tmp_path / "c1"),
        "vec_id long, embedding array<float>, label int",
    )
    live = read_streaming_pq(spark, d)
    assert "label" in live.codes.columns
    hits = ivfpq_adc_search(
        live, query_vec, k=5, nprobe=4, where="label = 3"
    )
    rows = hits.collect()
    assert rows, "filtered search over merged index returned nothing"
    got_ids = [r["vec_id"] for r in rows]
    odd_streamed = [v for v in got_ids if v % 2 == 1]
    # the merged view must be able to surface streamed (odd) rows;
    # at minimum every hit satisfies the predicate
    labels = {
        r["label"]
        for r in emb.join(
            spark.createDataFrame([(v,) for v in got_ids], ["vec_id"]),
            "vec_id",
        ).collect()
    }
    assert labels == {3}
    # and the exact filtered truth over probed-everything matches
    from big_data_spark.functions import l2_sq

    qlit = F.array(*[F.lit(v) for v in query_vec])
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("label") == 3)
        .select("vec_id", l2_sq(F.col("embedding"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    refined = [
        r["vec_id"]
        for r in ivfpq_search_refined(
            live, emb, query_vec, k=5, nprobe=4, refine_factor=40,
            where="label = 3",
        ).collect()
    ]
    assert refined == exact, (refined, exact, odd_streamed)


def test_encode_frames_match_column_encoders_and_build(spark, emb):
    """The frame-based hot-path encoders (exploded + broadcast
    codebook rows, whole-stage codegen — what the streaming sink
    runs) must agree vector-for-vector with BOTH the column-
    expression reference encoders and the MLlib build's codes. The
    frame form exists because the expression form stops being viable
    at production codebook sizes (measured at nlist=64/ksub=256:
    308 s ANALYSIS + ~21 ms/row interpreted vs 1.3 s + ~42 µs/row
    for the frame form)."""
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        build_pq_index,
        ivfpq_encode_columns,
        ivfpq_encode_frame,
        pq_encode_columns,
        pq_encode_frame,
    )

    ipq = build_ivfpq_index(emb, nlist=8, m=4, ksub=8, keep_cols=("label",))
    cols = ["cell", *[f"code_{s}" for s in range(4)], "label"]
    built = {r["vec_id"]: tuple(r[c] for c in cols) for r in ipq.codes.collect()}
    frame = {
        r["vec_id"]: tuple(r[c] for c in cols)
        for r in ivfpq_encode_frame(
            emb, ipq.centroids, ipq.codebooks, extra_cols=("label",)
        ).collect()
    }
    exprs = {
        r["vec_id"]: tuple(r[c] for c in cols)
        for r in emb.select(
            "vec_id",
            *ivfpq_encode_columns(ipq.centroids, ipq.codebooks),
            "label",
        ).collect()
    }
    assert frame == built == exprs

    pq = build_pq_index(emb, m=8, ksub=16)
    cols2 = [f"code_{s}" for s in range(8)]
    built2 = {
        r["vec_id"]: tuple(r[c] for c in cols2) for r in pq.codes.collect()
    }
    frame2 = {
        r["vec_id"]: tuple(r[c] for c in cols2)
        for r in pq_encode_frame(emb, pq.codebooks).collect()
    }
    exprs2 = {
        r["vec_id"]: tuple(r[c] for c in cols2)
        for r in emb.select(
            "vec_id", *pq_encode_columns(pq.codebooks)
        ).collect()
    }
    assert frame2 == built2 == exprs2


def test_encode_frames_reject_wrong_dim(spark, emb):
    """A vector whose length differs from the index dim must fail
    LOUDLY in the frame encoders (ADVICE r08): a short vector would
    otherwise fall out of the max(when) pivot as NULL code_s, and its
    NULL approx_d2 sorts NULLS FIRST — a malformed row silently at the
    TOP of ADC results. The batch build fails loudly in KMeans for the
    same input; the streaming/encode path must match."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        build_pq_index,
        ivfpq_encode_frame,
        pq_encode_frame,
    )
    from pyspark.sql import functions as F

    ipq = build_ivfpq_index(emb, nlist=8, m=4, ksub=8)
    pq = build_pq_index(emb, m=8, ksub=16)
    bad = emb.limit(5).select(
        "vec_id", F.slice("embedding", 1, 7).alias("embedding")
    )
    with pytest.raises(SparkRuntimeException, match="!= index dim"):
        ivfpq_encode_frame(bad, ipq.centroids, ipq.codebooks).collect()
    with pytest.raises(SparkRuntimeException, match="!= index dim"):
        pq_encode_frame(bad, pq.codebooks).collect()
