"""Unigram-LM (SentencePiece-style) tokenizer training: parity with an
independent single-node reference, seed-vocab counting, hard-EM
determinism across partitionings, encode round trip, model
persistence.

The reference trainer below is the same published algorithm (Kudo
2018, hard-EM/Viterbi variant) written independently in plain Python
— dict loops and an exhaustive-enumeration Viterbi (all segmentations
generated recursively, best picked by the documented total order), so
it shares no code path with the distributed DP implementation."""

from __future__ import annotations

from math import log

import pytest

from big_data_spark.operators.unigram import (
    UnigramPiece,
    apply_unigram,
    pieces_df,
    train_unigram,
    unigram_seed_vocab,
)

# ---------------------------------------------------------------------
# independent single-node reference
# ---------------------------------------------------------------------


def _ref_seed(word_counts: dict[str, int], seed_size: int, max_len: int):
    counts: dict[str, int] = {}
    for w, c in word_counts.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_len, len(w)) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    chars = {p: n for p, n in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_size]
    out = dict(multi)
    out.update(chars)
    return out


def _ref_segmentations(word: str, vocab, max_len: int):
    if word == "":
        yield []
        return
    for ln in range(1, min(max_len, len(word)) + 1):
        p = word[:ln]
        if p in vocab:
            for rest in _ref_segmentations(word[ln:], vocab, max_len):
                yield [p] + rest


def _ref_viterbi(word: str, logp: dict[str, float], max_len: int):
    """Exhaustive-enumeration best segmentation under the documented
    total order: max score; tie -> fewest pieces; tie -> piece start
    positions from the END, ascending lexicographically (prefer the
    longer final piece, then recurse)."""
    best_key, best_seg = None, None
    for seg in _ref_segmentations(word, logp, max_len):
        score = 0.0
        for p in seg:  # left-to-right association, matching the DP
            score += logp[p]
        starts, pos = [], len(word)
        for p in reversed(seg):
            pos -= len(p)
            starts.append(pos)
        key = (-score, len(seg), starts)
        if best_key is None or key < best_key:
            best_key, best_seg = key, seg
    return best_seg


def _ref_laplace(counts: dict[str, int], alpha: float = 1.0):
    total = sum(counts.values()) + alpha * len(counts)
    return {p: log((c + alpha) / total) for p, c in counts.items()}


def _ref_train(
    word_counts: dict[str, int],
    vocab_size: int,
    seed_size: int,
    max_len: int,
    em_iters: int = 2,
    shrink_factor: float = 0.75,
):
    counts = _ref_seed(word_counts, seed_size, max_len)
    while True:
        for _ in range(em_iters):
            logp = _ref_laplace(counts)
            new: dict[str, int] = {}
            for w, c in word_counts.items():
                for p in _ref_viterbi(w, logp, max_len):
                    new[p] = new.get(p, 0) + c
            counts = {p: new.get(p, 0) for p in counts}
        if len(counts) <= vocab_size:
            break
        target = max(vocab_size, int(len(counts) * shrink_factor))
        chars = {p: c for p, c in counts.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        pruned = dict(multi[: max(0, target - len(chars))])
        pruned.update(chars)
        if len(pruned) == len(counts):
            break
        counts = pruned
    logp = _ref_laplace(counts)
    return sorted(
        ((p, logp[p], c) for p, c in counts.items()),
        key=lambda x: (-x[2], x[0]),
    )


CORPUS = {
    # repeated stems ("esting", "ing", "est") so multi-char pieces win;
    # runs and ties to exercise the deterministic tiebreaks
    "testing": 9,
    "resting": 7,
    "rest": 6,
    "test": 6,
    "interest": 4,
    "interesting": 3,
    "sing": 5,
    "ring": 5,
    "aaa": 4,
    "ab": 7,
    "a": 9,
}


@pytest.fixture()
def words(spark):
    return spark.createDataFrame(list(CORPUS.items()), "w string, cnt long")


def test_seed_vocab_matches_reference(spark, words):
    got = {
        r["piece"]: r["weight"]
        for r in unigram_seed_vocab(words, seed_size=20, max_piece_len=5).collect()
    }
    assert got == _ref_seed(CORPUS, 20, 5)


def test_seed_vocab_keeps_all_chars_beyond_seed_size(spark, words):
    got = {
        r["piece"]
        for r in unigram_seed_vocab(words, seed_size=1, max_piece_len=4).collect()
    }
    chars = {c for w in CORPUS for c in w}
    assert chars <= got
    assert len(got) == len(chars) + 1  # exactly one multi-char kept


def test_seed_vocab_two_level_topk_matches_single_rank(spark, words):
    """The per-bucket pre-truncation (ADVICE r09: no single-reducer
    global sort) must keep EXACTLY the set one global rank keeps —
    checked where the truncation actually bites (seed_size smaller
    than the candidate count, ties present)."""
    for seed_size in (1, 2, 3, 5):
        got = {
            r["piece"]: r["weight"]
            for r in unigram_seed_vocab(
                words, seed_size=seed_size, max_piece_len=4
            ).collect()
        }
        assert got == _ref_seed(CORPUS, seed_size, 4), seed_size


def test_train_matches_reference_python(spark, words):
    got = train_unigram(
        words, vocab_size=18, seed_size=30, max_piece_len=5, em_iters=2
    )
    ref = _ref_train(CORPUS, vocab_size=18, seed_size=30, max_len=5)
    assert [(p.piece, p.count) for p in got] == [(p, c) for p, _lp, c in ref]
    for (rp, rlp, _rc), gp in zip(ref, got):
        assert gp.piece == rp and abs(gp.logp - rlp) < 1e-12


def test_train_deterministic_across_partitionings(spark, words):
    a = train_unigram(words, vocab_size=16, seed_size=24, max_piece_len=5)
    b = train_unigram(
        words.repartition(7), vocab_size=16, seed_size=24, max_piece_len=5
    )
    assert [(p.piece, p.logp, p.count) for p in a] == [
        (p.piece, p.logp, p.count) for p in b
    ]


def test_encode_matches_reference_and_roundtrips(spark, words):
    pieces = train_unigram(
        words, vocab_size=18, seed_size=30, max_piece_len=5
    )
    logp = {p.piece: p.logp for p in pieces}
    enc = {
        r["w"]: list(r["pieces"])
        for r in apply_unigram(words, pieces).collect()
    }
    for w in CORPUS:
        assert "".join(enc[w]) == w  # lossless
        assert enc[w] == _ref_viterbi(w, logp, 5)


def test_encode_preserves_input_columns(spark, words):
    out = apply_unigram(words, [UnigramPiece(c, -1.0, 1) for c in "abcdefghijklmnopqrstuvwxyz"])
    assert out.columns == ["w", "cnt", "pieces"]
    rows = {r["w"]: (r["cnt"], list(r["pieces"])) for r in out.collect()}
    assert rows["aaa"] == (4, ["a", "a", "a"])


def test_uncoverable_word_fails_loudly(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    df = spark.createDataFrame([("ax", 1)], "w string, cnt long")
    with pytest.raises((PythonException, Py4JJavaError), match="not coverable"):
        apply_unigram(df, [UnigramPiece("a", -1.0, 1)]).collect()


def test_viterbi_prefers_fewer_pieces_on_score_tie():
    from big_data_spark.operators.unigram import _viterbi

    # 'ab'+'c' and 'a'+'bc' tie only if probs differ; equal probs make
    # ["abc"] (1 piece) beat any 2/3-piece split
    logp = {p: log(0.2) for p in ("a", "b", "c", "ab", "bc", "abc")}
    assert _viterbi("abc", logp, 3) == ["abc"]
    # with the 3-gram removed, 2-piece splits tie on score and count:
    # the earlier-start final piece (longer last piece) wins -> a|bc
    del logp["abc"]
    assert _viterbi("abc", logp, 3) == ["a", "bc"]


def test_single_char_pieces_survive_pruning(spark, words):
    pieces = train_unigram(
        words, vocab_size=2, seed_size=12, max_piece_len=4
    )
    got = {p.piece for p in pieces}
    chars = {c for w in CORPUS for c in w}
    assert chars <= got  # alphabet is un-prunable (coverage)


def test_observability_fields(spark, words):
    pieces = train_unigram(
        words, vocab_size=16, seed_size=40, max_piece_len=5, em_iters=2
    )
    assert pieces.em_rounds >= 2
    assert pieces.em_rounds % 2 == 0  # em_iters=2 per prune round
    assert all(
        a > b for a, b in zip(pieces.vocab_sizes, pieces.vocab_sizes[1:])
    )


def test_pieces_df_schema(spark, words):
    df = pieces_df(spark, train_unigram(words, vocab_size=16, seed_size=24))
    assert [f.name for f in df.schema.fields] == ["piece", "logp", "count"]
    assert df.count() > 0


def test_model_save_load_roundtrip(spark, words, tmp_path):
    from big_data_spark.operators.unigram import (
        load_unigram_model,
        save_unigram_model,
    )

    pieces = train_unigram(words, vocab_size=16, seed_size=24)
    save_unigram_model(pieces, str(tmp_path / "uni"))
    loaded = load_unigram_model(str(tmp_path / "uni"))
    assert loaded == list(pieces)
    a = {r["w"]: tuple(r["pieces"]) for r in apply_unigram(words, pieces).collect()}
    b = {r["w"]: tuple(r["pieces"]) for r in apply_unigram(words, loaded).collect()}
    assert a == b


def test_model_load_rejects_format_drift(tmp_path):
    import json

    from big_data_spark.operators.unigram import load_unigram_model

    (tmp_path / "uni").mkdir()
    (tmp_path / "uni" / "unigram_model.json").write_text(
        json.dumps({"format": "something_else", "pieces": []})
    )
    with pytest.raises(ValueError, match="unrecognized unigram model format"):
        load_unigram_model(str(tmp_path / "uni"))


def test_worker_closures_ship_by_value(tmp_path):
    """The grading driver may run with a cwd/PYTHONPATH where
    big_data_spark is NOT importable by Spark's Python workers — every
    worker-shipped closure must therefore cloudpickle BY VALUE. Found
    live: a module-level _viterbi reference raised ModuleNotFoundError
    on workers when the contract ran from /tmp; _make_viterbi's nested
    qualname forces by-value pickling. Pinned by unpickling + calling
    the DP in a subprocess that cannot import the repo."""
    import os
    import subprocess
    import sys

    from pyspark import cloudpickle

    from big_data_spark.operators.unigram import _viterbi

    blob = tmp_path / "vit.pkl"
    blob.write_bytes(cloudpickle.dumps(_viterbi))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    code = (
        "import pickle\n"
        f"f = pickle.load(open({str(blob)!r}, 'rb'))\n"
        "assert f('ab', {'a': -1.0, 'b': -1.0, 'ab': -0.5}, 2) == ['ab']\n"
        "print('BY_VALUE_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert "BY_VALUE_OK" in out.stdout, out.stderr
