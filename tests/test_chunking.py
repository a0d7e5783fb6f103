"""Edge-case invariants for operators.chunking (q106/q107 back ends).

The oracle-parity tests prove value equality with DuckDB on the real
corpus; these pin the *semantic contracts* on crafted inputs where the
formulas have corners (doc length exactly at / one past the window,
all-duplicate docs, single-segment docs).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_spark.operators.chunking import segment_dedup, stride_chunks

W, S = 30, 20


def _docs(spark, lengths):
    rows = [
        (i, [f"d{i}w{j}" for j in range(n)]) for i, n in enumerate(lengths)
    ]
    return spark.createDataFrame(rows, "doc_id long, t array<string>")


@pytest.mark.parametrize(
    "length", [1, 10, 29, 30, 31, 49, 50, 51, 70, 71, 100]
)
def test_stride_chunks_coverage_and_overlap(spark, length):
    out = (
        stride_chunks(_docs(spark, [length]), "doc_id", "t", W, S)
        .orderBy("chunk_idx")
        .collect()
    )
    # chunk count formula: 1 for short docs, else ceil((n-W)/S)+1
    expected_n = 1 if length <= W else -((length - W) // -S) + 1
    assert len(out) == expected_n
    # every chunk starts at stride boundaries; all but the last are
    # full-window; the last ends exactly at the document end
    for r in out:
        start = r["chunk_idx"] * S
        assert r["chunk"] == [f"d0w{j}" for j in range(start, min(start + W, length))]
    last = out[-1]
    assert last["chunk_idx"] * S + len(last["chunk"]) == length
    # full coverage: the union of chunk spans is [0, length)
    covered = set()
    for r in out:
        covered.update(range(r["chunk_idx"] * S, r["chunk_idx"] * S + len(r["chunk"])))
    assert covered == set(range(length))
    # neighbors overlap by exactly W - S tokens (when a neighbor exists
    # and the doc is long enough for the window)
    if expected_n > 1:
        for a, b in zip(out, out[1:]):
            overlap = a["chunk_idx"] * S + len(a["chunk"]) - b["chunk_idx"] * S
            assert overlap >= W - S or b is out[-1]


def test_segment_dedup_first_occurrence_wins(spark):
    # A: s1 s2 | B: s1 s3 | C: s1 s2  (segments of 2 tokens each)
    s1, s2, s3 = ["a", "b"], ["c", "d"], ["e", "f"]
    rows = [(0, s1 + s2), (1, s1 + s3), (2, s1 + s2)]
    df = spark.createDataFrame(rows, "doc_id long, t array<string>")
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, "doc_id", "t", seg_len=2).collect()
    }
    # doc 0 is first everywhere: keeps both segments
    assert out[0]["n_segs_kept"] == 2 and out[0]["clean_text"] == "a b c d"
    # doc 1 loses s1 (seen in doc 0), keeps s3
    assert out[1]["n_segs_kept"] == 1 and out[1]["clean_text"] == "e f"
    # doc 2 is a full duplicate: dropped entirely
    assert 2 not in out


def test_segment_dedup_output_segments_are_globally_unique(spark):
    df = _docs(spark, [20, 20, 35])
    # make doc 1 a copy of doc 0 and doc 2 share doc 0's first segment
    df = df.withColumn(
        "t",
        F.when(F.col("doc_id") == 1, F.array([F.lit(f"d0w{j}") for j in range(20)]))
        .when(
            F.col("doc_id") == 2,
            F.concat(
                F.array([F.lit(f"d0w{j}") for j in range(10)]),
                F.array([F.lit(f"d2w{j}") for j in range(25)]),
            ),
        )
        .otherwise(F.col("t")),
    )
    out = segment_dedup(df, "doc_id", "t", seg_len=10)
    segs = (
        out.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(
                            F.size(F.split("clean_text", " ")) / F.lit(10.0)
                        ).cast("int")
                        - 1,
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.slice(
                            F.split("clean_text", " "),
                            (i * 10 + 1).cast("int"),
                            10,
                        ),
                    ),
                )
            ).alias("seg")
        )
        .collect()
    )
    texts = [r["seg"] for r in segs]
    assert len(texts) == len(set(texts)), "duplicate segment survived dedup"
    # duplicate doc vanished
    assert out.filter("doc_id = 1").count() == 0


def _py_segments(tokens, seg_len):
    return [
        " ".join(tokens[i : i + seg_len])
        for i in range(0, len(tokens), seg_len)
    ]


@pytest.mark.parametrize("seed", range(4))
def test_segment_dedup_fuzz_matches_python_reference(spark, seed):
    """Randomized corpora (duplicate-heavy, ragged lengths) against a
    pure-Python simulation of corpus-wide first-occurrence election —
    guards the slice/ceil/min-struct plumbing beyond the crafted
    cases."""
    import random

    rnd = random.Random(seed)
    vocab = [f"w{j}" for j in range(6)]  # tiny vocab -> heavy dup rate
    corpus = {
        i: [rnd.choice(vocab) for _ in range(rnd.randint(1, 27))]
        for i in range(rnd.randint(3, 12))
    }
    seg_len = rnd.choice([2, 3, 5])

    # python reference: first (doc_id, seg_idx) wins per segment text
    seen = {}
    for did in sorted(corpus):
        for si, seg in enumerate(_py_segments(corpus[did], seg_len)):
            seen.setdefault(seg, (did, si))
    expect = {}
    for did in sorted(corpus):
        kept = [
            seg
            for si, seg in enumerate(_py_segments(corpus[did], seg_len))
            if seen[seg] == (did, si)
        ]
        if kept:
            expect[did] = (len(kept), " ".join(kept))

    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, t array<string>"
    )
    got = {
        r["doc_id"]: (r["n_segs_kept"], r["clean_text"])
        for r in segment_dedup(df, "doc_id", "t", seg_len=seg_len).collect()
    }
    assert got == expect


def test_empty_token_arrays_produce_nothing(spark):
    """F.sequence(0, -1) is DESCENDING in Spark and size(NULL) is -1
    with ANSI off — empty AND NULL token arrays must yield zero
    chunks/segments, never bogus empties or phantom docs."""
    df = spark.createDataFrame(
        [(0, []), (1, ["a", "b", "c"]), (2, None)],
        "doc_id long, t array<string>",
    )
    chunks = stride_chunks(df, "doc_id", "t", W, S).collect()
    assert {r["doc_id"] for r in chunks} == {1}
    segs = segment_dedup(df, "doc_id", "t", seg_len=2).collect()
    assert {r["doc_id"] for r in segs} == {1}


def test_pack_sequences_exact_contents(spark):
    """pack_sequences: per-source concat-and-chunk must reproduce the
    obvious Python packing exactly — boundary-straddling docs split
    across packs, ragged tails carry the leftovers, empty/NULL token
    arrays contribute nothing, sources pack independently."""
    from big_data_spark.operators.chunking import pack_sequences

    rows = [
        ("a", 1, ["t0", "t1", "t2"]),
        ("a", 2, ["t3", "t4", "t5", "t6"]),  # straddles the L=4 boundary
        ("a", 3, []),
        ("a", 4, ["t7"]),  # ragged tail
        ("b", 1, None),
        ("b", 2, ["u0", "u1", "u2", "u3", "u4"]),
    ]
    L = 4
    expect = {}
    for src in ("a", "b"):
        stream = []
        for _, _, toks in sorted(
            (r for r in rows if r[0] == src), key=lambda r: r[1]
        ):
            stream.extend(toks or [])
        for p in range(0, len(stream), L):
            expect[(src, p // L)] = stream[p : p + L]

    df = spark.createDataFrame(
        rows, "source string, doc_id long, doc_tokens array<string>"
    )
    got = {
        (r["source"], r["pack_id"]): list(r["tokens"])
        for r in pack_sequences(df, L).collect()
    }
    assert got == expect
    # stream a = 8 tokens -> two FULL packs (doc 2 straddles them);
    # stream b = 5 tokens -> one full pack + a 1-token ragged tail
    assert [len(got[k]) for k in sorted(got)] == [4, 4, 4, 1]


def test_pack_sequences_doc_separator(spark):
    """doc_separator: one EOS after every non-empty doc, counted like
    any token; empty/NULL docs contribute none."""
    from big_data_spark.operators.chunking import pack_sequences

    rows = [
        ("a", 1, ["t0", "t1"]),
        ("a", 2, []),
        ("a", 3, None),
        ("a", 4, ["t2"]),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, doc_tokens array<string>"
    )
    got = {
        (r["source"], r["pack_id"]): list(r["tokens"])
        for r in pack_sequences(df, 3, doc_separator="<eos>").collect()
    }
    # stream = t0 t1 <eos> | t2 <eos>  -> packs of 3: [t0,t1,<eos>], [t2,<eos>]
    assert got == {
        ("a", 0): ["t0", "t1", "<eos>"],
        ("a", 1): ["t2", "<eos>"],
    }


def test_pack_sequences_pad_token(spark):
    """pad_token: ragged tails right-pad to seq_len; n_tokens stays
    the REAL count (the loss-mask denominator); full packs untouched."""
    from big_data_spark.operators.chunking import pack_sequences

    df = spark.createDataFrame(
        [("a", 1, ["t0", "t1", "t2", "t3", "t4"])],
        "source string, doc_id long, doc_tokens array<string>",
    )
    got = {
        (r["source"], r["pack_id"]): (list(r["tokens"]), r["n_tokens"])
        for r in pack_sequences(df, 4, pad_token="<pad>").collect()
    }
    assert got == {
        ("a", 0): (["t0", "t1", "t2", "t3"], 4),
        ("a", 1): (["t4", "<pad>", "<pad>", "<pad>"], 1),
    }


def test_pack_sequences_doc_ids_alignment(spark):
    """with_doc_ids: the doc_ids array is position-aligned with
    tokens (the block-diagonal attention-mask input), separators
    carry their document's id, straddling docs keep their id across
    packs, and padding does NOT extend doc_ids (its length stays the
    real n_tokens)."""
    from big_data_spark.operators.chunking import pack_sequences

    df = spark.createDataFrame(
        [("a", 1, ["t0", "t1"]), ("a", 2, ["t2", "t3"])],
        "source string, doc_id long, doc_tokens array<string>",
    )
    got = {
        (r["source"], r["pack_id"]): (
            list(r["tokens"]),
            list(r["doc_ids"]),
            r["n_tokens"],
        )
        for r in pack_sequences(
            df, 4, doc_separator="<eos>", pad_token="<pad>",
            with_doc_ids=True,
        ).collect()
    }
    # stream: t0 t1 <eos>(doc1) t2 t3 <eos>(doc2) -> packs of 4
    assert got == {
        ("a", 0): (["t0", "t1", "<eos>", "t2"], [1, 1, 1, 2], 4),
        ("a", 1): (["t3", "<eos>", "<pad>", "<pad>"], [2, 2], 2),
    }


def test_pack_sequences_int_token_ids(spark):
    """pack_sequences is token-type agnostic: array<int> ids (the
    emit_ids output) pack identically, with integer separator and pad
    ids."""
    from big_data_spark.operators.chunking import pack_sequences

    df = spark.createDataFrame(
        [("a", 1, [7, 8, 9]), ("a", 2, [10, 11]), ("a", 3, None)],
        "source string, doc_id long, doc_tokens array<int>",
    )
    got = {
        r["pack_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in pack_sequences(
            df, 4, doc_separator=0, pad_token=-1
        ).collect()
    }
    # stream: 7 8 9 0 | 10 11 0  -> pack0 full, pack1 padded tail
    assert got[0] == ([7, 8, 9, 0], 4)
    assert got[1] == ([10, 11, 0, -1], 3)  # n_tokens stays the real count


def _packed_fixture(spark):
    from big_data_spark.operators.chunking import pack_sequences

    rows = [
        ("a", i, [i * 10 + j for j in range(3)]) for i in range(1, 40)
    ] + [("007", i, [1000 + i]) for i in range(1, 10)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, doc_tokens array<int>"
    )
    return pack_sequences(df, 8)


def test_packed_shards_roundtrip_and_manifest(spark, tmp_path):
    """write_packed_shards: the persisted tree + manifest must read
    back row-for-row identical under every verify level, the manifest
    counts must match the data, and the layout must be one file per
    (source, shard) directory."""
    import glob
    import os

    from big_data_spark.operators.chunking import (
        read_packed_shards,
        write_packed_shards,
    )

    packed = _packed_fixture(spark)
    want = {
        (r["source"], r["pack_id"]): (list(r["tokens"]), r["n_tokens"])
        for r in packed.collect()
    }
    path = str(tmp_path / "packs")
    manifest = write_packed_shards(packed, path, packs_per_shard=4)

    assert manifest["format"] == "packed_shards_v1"
    assert manifest["n_packs_total"] == len(want)
    assert manifest["n_tokens_total"] == sum(n for _, n in want.values())
    # every (source, shard) dir holds exactly one parquet file
    for d in glob.glob(os.path.join(path, "shards", "source=*", "shard=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d

    for verify in (None, "counts", "content"):
        back = read_packed_shards(spark, path, verify=verify)
        got = {
            (r["source"], r["pack_id"]): (list(r["tokens"]), r["n_tokens"])
            for r in back.collect()
        }
        assert got == want
    # partition-dir type inference is pinned: source '007' survives
    # as the string it went in as (manifest schema wins)
    assert ("007", 0) in got
    assert dict(read_packed_shards(spark, path).dtypes)["tokens"] == "array<int>"


def test_packed_shards_determinism_and_tamper_detection(spark, tmp_path):
    """Replay-stability: writing the same input twice produces the
    same manifest (incl. content fingerprints). Tampering with a
    shard file is caught by verify='content'; format drift, missing
    manifests, and accidental overwrite are loud."""
    import glob
    import json
    import os

    from big_data_spark.operators.chunking import (
        read_packed_shards,
        write_packed_shards,
    )

    packed = _packed_fixture(spark)
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = write_packed_shards(packed, p1, packs_per_shard=4)
    m2 = write_packed_shards(packed, p2, packs_per_shard=4)
    assert m1 == m2  # deterministic artifact, fingerprints included

    with pytest.raises(ValueError, match="already exist"):
        write_packed_shards(packed, p1, packs_per_shard=4)
    # mode='overwrite' replaces and re-fingerprints identically
    assert write_packed_shards(
        packed, p1, packs_per_shard=4, mode="overwrite"
    ) == m1

    # tamper: drop one shard file -> counts verify catches it
    victim = glob.glob(
        os.path.join(p2, "shards", "source=a", "shard=*", "*.parquet")
    )[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="packs on disk"):
        read_packed_shards(spark, p2, verify="counts")

    # manifest discipline: missing + format drift + bad verify level
    with pytest.raises(ValueError, match="no packed-shard manifest"):
        read_packed_shards(spark, str(tmp_path / "nope"))
    mpath = os.path.join(p1, "manifest.json")
    with open(mpath) as f:
        meta = json.load(f)
    meta["format"] = "packed_shards_v9"
    with open(mpath, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="unrecognized packed-shard"):
        read_packed_shards(spark, p1)
    meta["format"] = "packed_shards_v1"
    del meta["sources"]
    with open(mpath, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="missing required keys"):
        read_packed_shards(spark, p1)


def test_epoch_shuffle_is_deterministic_permutation_and_map_only(spark):
    """epoch_shuffle: same seed -> identical order on any
    partitioning; different seeds -> different permutations of the
    SAME pack set; the op adds zero exchanges (map-only plan)."""
    from big_data_spark.operators.chunking import epoch_shuffle

    packed = _packed_fixture(spark)
    base = {(r["source"], r["pack_id"]) for r in packed.collect()}

    def order(df):
        rows = df.orderBy(
            "epoch_bucket", "epoch_key", "source", "pack_id"
        ).collect()
        return [(r["source"], r["pack_id"]) for r in rows]

    o1 = order(epoch_shuffle(packed, seed=7, n_buckets=16))
    o2 = order(epoch_shuffle(packed.repartition(5), seed=7, n_buckets=16))
    o3 = order(epoch_shuffle(packed, seed=8, n_buckets=16))
    assert o1 == o2                      # partitioning-independent
    assert set(o1) == base == set(o3)    # a permutation, nothing lost
    assert o1 != o3                      # seeds differ -> order differs
    # natural order is actually shuffled
    assert o1 != sorted(o1)

    plan = (
        epoch_shuffle(packed, seed=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # only pack_sequences' own exchanges appear; epoch_shuffle adds
    # none (<= because AQE may render the two plan strings at
    # different stages of exchange reuse)
    n_base = (
        packed._jdf.queryExecution().executedPlan().toString()
    ).count("Exchange")
    assert plan.count("Exchange") <= n_base

    with pytest.raises(ValueError, match="n_buckets"):
        epoch_shuffle(packed, seed=1, n_buckets=0)


def test_packed_shards_source_reads_are_partition_pruned(spark, tmp_path):
    """The shard tree is hive-partitioned on (source, shard), so a
    per-source read — a trainer pulling one stream, an auditor
    re-checking one source — must prune to that source's directories
    at plan time (PartitionFilters on the scan), never scan the whole
    corpus."""
    from big_data_spark.operators.chunking import (
        read_packed_shards,
        write_packed_shards,
    )

    packed = _packed_fixture(spark)
    path = str(tmp_path / "pp")
    write_packed_shards(packed, path, packs_per_shard=4)

    df = read_packed_shards(spark, path, verify=None).filter(
        F.col("source") == "a"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "source" in plan.split(
        "PartitionFilters"
    )[1][:120], plan
    got = {r["source"] for r in df.collect()}
    assert got == {"a"}


def test_diff_packed_snapshots(spark, tmp_path):
    """Manifest-level snapshot diff: fingerprints alone distinguish
    identical, changed, added, and removed sources — no file scan,
    no Spark job; bad manifests are loud."""
    from pyspark.sql import functions as F2

    from big_data_spark.operators.chunking import (
        diff_packed_snapshots,
        pack_sequences,
        write_packed_shards,
    )

    rows_v1 = [("a", i, [i, i + 1]) for i in range(1, 9)] + [
        ("b", i, [100 + i]) for i in range(1, 5)
    ]
    rows_v2 = (
        [("a", i, [i, i + 1]) for i in range(1, 9)]       # unchanged
        + [("b", i, [200 + i]) for i in range(1, 5)]      # changed data
        + [("c", i, [300 + i]) for i in range(1, 4)]      # added source
    )

    def snap(rows, path):
        df = spark.createDataFrame(
            rows, "source string, doc_id long, doc_tokens array<int>"
        )
        write_packed_shards(pack_sequences(df, 4), str(path))

    snap(rows_v1, tmp_path / "v1")
    snap(rows_v2, tmp_path / "v2")
    d = diff_packed_snapshots(str(tmp_path / "v1"), str(tmp_path / "v2"))
    assert d["added"] == ["c"]
    assert d["removed"] == []
    assert d["changed"] == ["b"]
    assert d["unchanged"] == ["a"]
    assert d["delta_tokens"] == 3  # source c's three tokens
    # reflexive: a snapshot diffs clean against itself
    d0 = diff_packed_snapshots(str(tmp_path / "v1"), str(tmp_path / "v1"))
    assert d0["changed"] == [] and d0["added"] == [] and d0["delta_packs"] == 0

    with pytest.raises(ValueError, match="no packed-shard manifest"):
        diff_packed_snapshots(str(tmp_path / "v1"), str(tmp_path / "nope"))


def test_full_training_artifact_loop(spark, tmp_path):
    """The complete round-12 artifact loop, end to end: corpus ->
    bundle id encode -> pack_sequences -> write_packed_shards ->
    read_packed_shards -> decode_token_ids on the pack contents. The
    decoded pack stream must equal the separator-free concatenation
    of each source's documents in doc_id order — i.e. a trainer
    reading the persisted shards sees exactly the corpus the
    tokenizer saw, byte for byte, including byte-fallback text."""
    from big_data_spark.operators.chunking import (
        pack_sequences,
        read_packed_shards,
        write_packed_shards,
    )
    from big_data_spark.operators.tokenizer import (
        TokenizerBundle,
        bpe_vocab_pieces,
        bpe_word_table,
        decode_token_ids,
        encode_corpus_with_bundle,
        train_bpe,
        with_byte_fallback_pieces,
    )

    # doc_ids are corpus-unique (the encode_corpus id_col contract —
    # real tables and the q197 jobs fixture guarantee it)
    rows = [
        ("a", 1, "abab abab cd"),
        ("a", 2, "năm 42 cd"),        # byte fallback through the loop
        ("a", 3, ""),
        ("b", 4, "cd abab (3-5)"),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")
    words = bpe_word_table(docs, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=2)
    bundle = TokenizerBundle(
        merges=list(merges),
        pieces=with_byte_fallback_pieces(bpe_vocab_pieces(words, merges)),
        pre_tokenize=None,
        oov_fallback="bytes",
    )
    enc = encode_corpus_with_bundle(docs, bundle, emit_ids=True)
    packed = pack_sequences(enc.select("source", "doc_id", "doc_tokens"), 6)
    path = str(tmp_path / "loop")
    write_packed_shards(packed, path, packs_per_shard=2)
    back = read_packed_shards(spark, path, verify="content")
    # decode the re-concatenated per-source STREAM, not single packs:
    # seq_len=6 deliberately splits 'ă''s two UTF-8 bytes across a
    # pack boundary, and per-pack strict decode is loudly undecodable
    # there (the decode_token_ids contract) — stitching packs back in
    # pack_id order restores the byte stream exactly
    stream = back.groupBy("source").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pack_id", "tokens"))
                ),
                lambda s: s["tokens"],
            )
        ).alias("ids")
    )
    decoded = decode_token_ids(stream, bundle.pieces, ids_col="ids")
    got = {
        r["source"]: r["decoded_text"] for r in decoded.collect()
    }
    want = {}
    for src, _, text in sorted(rows, key=lambda x: (x[0], x[1])):
        want[src] = want.get(src, "") + text.replace(" ", "")
    # (a trailing empty doc contributes nothing on either side)
    assert got == want
