"""BPE tokenizer training: parity with a reference single-node BPE,
greedy-merge semantics, batched-round determinism, encode round trip.

The distributed trainer (operators/tokenizer.py) must reproduce the
classic Sennrich algorithm exactly at merges_per_round=1 — the
reference implementation below is the standard textbook loop (pair
counts over a symbolized vocab, argmax with (count desc, pair lex)
tiebreak, greedy left-to-right merge) written independently in plain
Python as the test oracle."""

from __future__ import annotations

import pytest

from big_data_spark.operators.tokenizer import (
    BPEMerge,
    apply_bpe,
    bpe_word_table,
    merges_df,
    train_bpe,
)


def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Reference classic BPE (single-node, pure Python)."""
    vocab: dict[tuple, int] = {}
    for w, c in word_counts.items():
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + c
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, a + b, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + c
        vocab = new_vocab
    return merges, vocab


CORPUS = {
    # deliberately includes the overlap case (runs of one char),
    # ties, single-char words, and words that merge fully
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "aaa": 4,
    "aaaa": 2,
    "ab": 7,
    "a": 9,
    "banana": 3,
}


@pytest.fixture()
def words(spark):
    return spark.createDataFrame(
        list(CORPUS.items()), "w string, cnt long"
    )


def test_train_matches_reference_python(spark, words):
    got = train_bpe(words, num_merges=12)
    ref, _ = _ref_bpe(CORPUS, 12)
    assert [(m.left, m.right, m.merged, m.n) for m in got] == ref


def test_overlapping_runs_merge_greedily(spark):
    # 'aaa' -> [aa, a]; 'aaaa' -> [aa, aa] under merge (a,a) — the
    # left-to-right resume-after-replacement semantics both engines'
    # replace() provides through the delimiter-wrapped representation
    df = spark.createDataFrame([("aaa", 1), ("aaaa", 1)], "w string, cnt long")
    m = [BPEMerge(rank=1, left="a", right="a", merged="aa", n=0)]
    toks = {
        r["w"]: list(r["bpe_tokens"])
        for r in apply_bpe(df, m).collect()
    }
    assert toks == {"aaa": ["aa", "a"], "aaaa": ["aa", "aa"]}


def test_encode_reproduces_training_end_state(spark, words):
    merges = train_bpe(words, num_merges=12)
    _, ref_vocab = _ref_bpe(CORPUS, 12)
    enc = {
        r["w"]: tuple(r["bpe_tokens"])
        for r in apply_bpe(words, merges, word_col="w").collect()
    }
    assert set(enc.values()) == set(ref_vocab)
    for w in CORPUS:
        assert "".join(enc[w]) == w  # lossless


def test_batched_rounds_deterministic_across_partitionings(spark, words):
    a = train_bpe(words, num_merges=10, merges_per_round=4)
    b = train_bpe(
        words.repartition(7), num_merges=10, merges_per_round=4
    )
    assert [(m.left, m.right, m.n) for m in a] == [
        (m.left, m.right, m.n) for m in b
    ]


def test_select_nonoverlapping_defers_stale_pairs():
    from big_data_spark.operators.tokenizer import _select_nonoverlapping

    ranked = [
        ("a", "a", 14),  # taken; uses {a, aa}
        ("a", "b", 9),  # deferred: 'a' already merged this round
        ("e", "s", 8),  # taken
        ("s", "t", 7),  # deferred: 's' used
        ("aa", "c", 6),  # deferred: equals rank-1's merged result
        ("x", "y", 5),  # taken
    ]
    assert _select_nonoverlapping(ranked, 5) == [
        ("a", "a", 14),
        ("e", "s", 8),
        ("x", "y", 5),
    ]
    # k truncates; the first candidate is always taken
    assert _select_nonoverlapping(ranked, 1) == [("a", "a", 14)]


def test_vocab_saturation_stops_early(spark):
    df = spark.createDataFrame([("ab", 3)], "w string, cnt long")
    merges = train_bpe(df, num_merges=50)
    assert [(m.left, m.right) for m in merges] == [("a", "b")]


def test_delimiter_word_fails_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([("a|b", 1)], "w string, cnt long")
    with pytest.raises(SparkRuntimeException, match="delimiter"):
        train_bpe(df, num_merges=1)


def test_word_table_filters_and_weights(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab XX a|b"), (2, "ab  cd")], "doc_id int, text string"
    )
    rows = {
        r["w"]: r["cnt"]
        for r in bpe_word_table(docs, token_pattern="^[a-z]+$").collect()
    }
    # empty tokens (double space), non-matching tokens, and
    # delimiter-containing tokens are excluded; counts are corpus-wide
    assert rows == {"ab": 3, "cd": 1}


def test_merges_df_schema(spark, words):
    df = merges_df(spark, train_bpe(words, num_merges=3))
    assert [f.name for f in df.schema.fields] == [
        "merge_rank",
        "left_sym",
        "right_sym",
        "merged",
        "n",
    ]
    assert df.count() == 3


def test_model_save_load_roundtrip(spark, words, tmp_path):
    from big_data_spark.operators.tokenizer import (
        load_bpe_model,
        save_bpe_model,
    )

    merges = train_bpe(words, num_merges=6)
    save_bpe_model(merges, str(tmp_path / "tok"))
    loaded = load_bpe_model(str(tmp_path / "tok"))
    assert loaded == merges
    # the reloaded model encodes identically
    a = {r["w"]: tuple(r["bpe_tokens"]) for r in apply_bpe(words, merges).collect()}
    b = {r["w"]: tuple(r["bpe_tokens"]) for r in apply_bpe(words, loaded).collect()}
    assert a == b


def test_model_load_rejects_format_drift(tmp_path):
    import json

    from big_data_spark.operators.tokenizer import load_bpe_model

    (tmp_path / "tok").mkdir()
    (tmp_path / "tok" / "bpe_model.json").write_text(
        json.dumps({"format": "something_else", "merges": []})
    )
    with pytest.raises(ValueError, match="unrecognized BPE model format"):
        load_bpe_model(str(tmp_path / "tok"))


def test_deep_merge_chain_does_not_overflow_driver(spark, words):
    """Spark 4's column->expression conversion recurses per nested
    replace and overflows the driver stack near ~1000 (measured —
    REPLACE_DEPTH_CAP's rationale). A production-size merge table
    must therefore encode through depth-capped segments; 300 merges
    exercises the segmented path (3 segments) and must neither crash
    nor change results (the extra 'merges' are no-ops on this
    corpus)."""
    from big_data_spark.operators.tokenizer import REPLACE_DEPTH_CAP

    real = train_bpe(words, num_merges=8)
    noop = [
        BPEMerge(rank=i + 9, left=f"q{i}", right=f"z{i}", merged=f"q{i}z{i}", n=0)
        for i in range(300 - len(real))
    ]
    assert len(real) + len(noop) > 2 * REPLACE_DEPTH_CAP  # ≥3 segments
    enc_deep = {
        r["w"]: tuple(r["bpe_tokens"])
        for r in apply_bpe(words, real + noop).collect()
    }
    enc_base = {
        r["w"]: tuple(r["bpe_tokens"])
        for r in apply_bpe(words, real).collect()
    }
    assert enc_deep == enc_base
    # the word column survives the segmented path, the helper column
    # does not
    cols = apply_bpe(words, real + noop).columns
    assert "w" in cols and "_bpe_s" not in cols


def test_checkpoint_cadence_does_not_change_merges(spark, words, monkeypatch):
    import big_data_spark.operators.tokenizer as tok

    base = train_bpe(words, num_merges=10, merges_per_round=4)
    monkeypatch.setattr(tok, "REPLACE_DEPTH_CAP", 3)
    capped = tok.train_bpe(
        words, num_merges=10, merges_per_round=4, checkpoint_every=1
    )
    assert [(m.left, m.right, m.n) for m in capped] == [
        (m.left, m.right, m.n) for m in base
    ]


def test_train_exposes_round_observability(spark, words):
    m1 = train_bpe(words, num_merges=6)
    assert m1.last_rounds == 6  # k=1: one merge per round
    assert list(m1.round_picks) == [1] * 6
    mk = train_bpe(words, num_merges=6, merges_per_round=6)
    assert mk.last_rounds == len(mk.round_picks)
    assert sum(mk.round_picks) == len(mk) == 6
    assert mk.last_rounds < 6  # batching actually batched


def test_encode_corpus_joins_lut_in_token_order(spark):
    """encode_corpus: the corpus-scale LUT-join encode path — pieces
    come back in token order, zero-kept-token docs keep an (empty)
    row, non-matching tokens are filtered like the word table's
    filter, and the same operator serves both tokenizer families."""
    from big_data_spark.operators.tokenizer import encode_corpus

    docs = spark.createDataFrame(
        [(1, "ab low ab"), (2, "low lower"), (3, ""), (4, "XX 42")],
        "doc_id int, text string",
    )
    words = bpe_word_table(docs, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=3)
    lut = apply_bpe(words, merges)
    out = encode_corpus(docs, lut, token_pattern="^[a-z]+$")
    rows = {r["doc_id"]: list(r["doc_tokens"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3] == [] and rows[4] == []
    assert "".join(rows[1]) == "ablowab"
    assert "".join(rows[2]) == "lowlower"
    # token order survives re-assembly: doc 1's pieces are exactly
    # (pieces of 'ab') + (pieces of 'low') + (pieces of 'ab')
    per_word = {
        r["w"]: list(r["bpe_tokens"]) for r in lut.collect()
    }
    assert rows[1] == per_word["ab"] + per_word["low"] + per_word["ab"]

    # the unigram family drives the SAME operator
    from big_data_spark.operators.unigram import apply_unigram, train_unigram

    pieces = train_unigram(words, vocab_size=12, seed_size=16, max_piece_len=4)
    ulut = apply_unigram(words, pieces, word_col="w", out_col="pieces")
    uout = encode_corpus(
        docs, ulut, pieces_col="pieces", token_pattern="^[a-z]+$"
    )
    urows = {r["doc_id"]: list(r["doc_tokens"]) for r in uout.collect()}
    assert "".join(urows[2]) == "lowlower" and urows[3] == []


def test_encode_corpus_missing_lut_word_fails_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from big_data_spark.operators.tokenizer import encode_corpus

    docs = spark.createDataFrame([(1, "ab zz")], "doc_id int, text string")
    lut = spark.createDataFrame(
        [("ab", ["ab"])], "w string, bpe_tokens array<string>"
    )
    with pytest.raises(SparkRuntimeException, match="missing from the tokenizer LUT"):
        encode_corpus(docs, lut).collect()


def test_encode_corpus_map_strategy_matches_join(spark):
    """The zero-shuffle broadcast-dict strategy must emit exactly the
    join strategy's results — including empty docs, filtered tokens,
    and NULL texts (zero tokens in both paths — ADVICE r09) — and
    fail loudly on LUT misses the same way."""
    from pyspark.errors.exceptions.captured import PythonException

    from big_data_spark.operators.tokenizer import encode_corpus

    docs = spark.createDataFrame(
        [(1, "ab low ab"), (2, "low lower"), (3, ""), (4, "XX 42"),
         (5, None)],
        "doc_id int, text string",
    )
    words = bpe_word_table(docs, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=3)
    lut = apply_bpe(words, merges)
    a = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, token_pattern="^[a-z]+$"
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, token_pattern="^[a-z]+$", strategy="map"
        ).collect()
    }
    assert a == b
    assert b[3] == [] and b[4] == [] and b[5] == []

    missing = spark.createDataFrame([(9, "ab zz")], "doc_id int, text string")
    with pytest.raises(PythonException, match="missing from the tokenizer LUT"):
        encode_corpus(missing, lut, strategy="map").collect()
    with pytest.raises(ValueError, match="unknown encode_corpus strategy"):
        encode_corpus(docs, lut, strategy="nope")
    with pytest.raises(ValueError, match="unknown encode_corpus oov_fallback"):
        encode_corpus(docs, lut, oov_fallback="skip")


def test_pre_tokenize_word_table(spark):
    """bpe_word_table(pre_tokenize=True): real text splits into
    letter/digit/punct runs (Unicode-aware) instead of opaque
    space-separated blobs; None keeps the certified space-split."""
    docs = spark.createDataFrame(
        [(1, "C++ .NET (3-5 năm)"), (2, "từ 25,000,000 VND/tháng")],
        "doc_id int, text string",
    )
    got = {
        r["w"]: r["cnt"]
        for r in bpe_word_table(docs, pre_tokenize=True).collect()
    }
    assert got == {
        "C": 1, "++": 1, ".": 1, "NET": 1, "(": 1, "3": 1, "-": 1,
        "5": 1, "năm": 1, ")": 1, "từ": 1, "25": 1, ",": 2, "000": 2,
        "VND": 1, "/": 1, "tháng": 1,
    }
    legacy = {r["w"] for r in bpe_word_table(docs).collect()}
    assert "(3-5" in legacy  # space-split keeps the blob


def test_encode_corpus_pre_tokenize_strategies_match(spark):
    """encode_corpus(pre_tokenize=True): the join strategy's
    regexp_extract_all and the map strategy's unicodedata category
    splitter must tokenize identically (incl. diacritics, digit runs,
    punct runs); custom regexes are join-only (Python re lacks \\p)."""
    from big_data_spark.operators.tokenizer import byte_pieces, encode_corpus

    docs = spark.createDataFrame(
        [(1, "C++ .NET (3-5 năm)"), (2, "từ 25,000,000 VND/tháng"),
         (3, ""), (4, None)],
        "doc_id int, text string",
    )
    lut = spark.createDataFrame(
        [("năm", ["nă", "m"])], "w string, bpe_tokens array<string>"
    )
    a = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, oov_fallback="bytes", pre_tokenize=True
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, oov_fallback="bytes", pre_tokenize=True,
            strategy="map",
        ).collect()
    }
    assert a == b
    # 'năm' is the one LUT hit; everything else byte-falls-back
    assert a[1][-3:] == ["nă", "m"] + byte_pieces(")")
    assert a[3] == [] and a[4] == []
    with pytest.raises(ValueError, match="only the canonical"):
        encode_corpus(
            docs, lut, strategy="map", pre_tokenize="[a-z]+",
            oov_fallback="bytes",
        )


def _greedy_ref(word: str, vocab: set[str]) -> list[str]:
    """Independent greedy longest-match (test oracle)."""
    out, i = [], 0
    ml = max(len(p) for p in vocab)
    while i < len(word):
        for ln in range(min(ml, len(word) - i), 0, -1):
            if word[i : i + ln] in vocab:
                out.append(word[i : i + ln])
                i += ln
                break
        else:
            raise AssertionError((word, i))
    return out


def test_encode_longest_match_matches_reference(spark, words):
    """encode_longest_match vs an independent greedy longest-match on
    the trained vocabulary — and lossless round-trip for every word."""
    from big_data_spark.operators.tokenizer import (
        bpe_vocab_pieces,
        encode_longest_match,
    )

    merges = train_bpe(words, num_merges=8)
    vocab = bpe_vocab_pieces(words, merges)
    assert set(vocab) >= {m.merged for m in merges}
    got = {
        r["w"]: list(r["lm_tokens"])
        for r in encode_longest_match(words, vocab).collect()
    }
    vset = set(vocab)
    for w in CORPUS:
        assert got[w] == _greedy_ref(w, vset), w
        assert "".join(got[w]) == w, w


def test_encode_longest_match_agrees_with_replay_on_chain_merges(spark):
    """Where greedy-longest boundaries coincide with replay boundaries
    (chain merges growing one suffix — the common trained shape), the
    trie encoder and apply_bpe emit IDENTICAL segmentations."""
    from big_data_spark.operators.tokenizer import (
        bpe_vocab_pieces,
        encode_longest_match,
    )

    df = spark.createDataFrame(
        [("lowest", 5), ("low", 3), ("est", 2), ("lowlow", 1)],
        "w string, cnt long",
    )
    merges = [
        BPEMerge(1, "l", "o", "lo", 0),
        BPEMerge(2, "lo", "w", "low", 0),
        BPEMerge(3, "e", "s", "es", 0),
        BPEMerge(4, "es", "t", "est", 0),
    ]
    vocab = bpe_vocab_pieces(df, merges)
    replay = {
        r["w"]: list(r["bpe_tokens"]) for r in apply_bpe(df, merges).collect()
    }
    lm = {
        r["w"]: list(r["lm_tokens"])
        for r in encode_longest_match(df, vocab).collect()
    }
    assert lm == replay
    assert lm["lowlow"] == ["low", "low"]


def test_encode_longest_match_divergence_from_replay_documented(spark):
    """The documented divergence (operators/tokenizer.py docstring):
    replay applies merges in PRIORITY order, longest-match takes the
    longest piece — vocab {ab, bc} from merges [(b,c), (a,b)] splits
    'abc' as [a, bc] under replay but [ab, c] under longest-match.
    Both are valid vocab segmentations; they are different operators."""
    from big_data_spark.operators.tokenizer import (
        bpe_vocab_pieces,
        encode_longest_match,
    )

    df = spark.createDataFrame([("abc", 1)], "w string, cnt long")
    merges = [
        BPEMerge(1, "b", "c", "bc", 0),
        BPEMerge(2, "a", "b", "ab", 0),
    ]
    replay = apply_bpe(df, merges).collect()[0]["bpe_tokens"]
    lm = encode_longest_match(df, bpe_vocab_pieces(df, merges)).collect()[0][
        "lm_tokens"
    ]
    assert list(replay) == ["a", "bc"]
    assert list(lm) == ["ab", "c"]


def test_encode_longest_match_byte_fallback_and_loud_failure(spark):
    """A position no vocab piece matches fails loudly by default; with
    byte_fallback=True it emits <0xNN> UTF-8 byte symbols (uppercase
    hex, multi-byte for non-ASCII) and every input round-trips."""
    from pyspark.errors.exceptions.captured import PythonException

    from big_data_spark.operators.tokenizer import (
        byte_pieces,
        encode_longest_match,
    )

    df = spark.createDataFrame([("cafeé", 1)], "w string, cnt long")
    vocab = ["c", "a", "f", "e", "ca", "fe"]
    with pytest.raises(PythonException, match="no vocab piece at position"):
        encode_longest_match(df, vocab).collect()
    got = encode_longest_match(df, vocab, byte_fallback=True).collect()[0][
        "lm_tokens"
    ]
    assert list(got) == ["ca", "fe", "<0xC3>", "<0xA9>"]
    assert byte_pieces("é") == ["<0xC3>", "<0xA9>"]
    with pytest.raises(ValueError, match="non-empty vocabulary"):
        encode_longest_match(df, [])


def test_trie_lut_feeds_encode_corpus(spark, words):
    """The production composition: the expensive per-word encode runs
    ONCE per distinct word via the trie encoder (not merge replay),
    and the resulting LUT drives the corpus encode — per-doc pieces
    are exactly the concatenation of each kept token's trie
    segmentation, in order."""
    from big_data_spark.operators.tokenizer import (
        bpe_vocab_pieces,
        encode_corpus,
        encode_longest_match,
    )

    merges = train_bpe(words, num_merges=6)
    vocab = bpe_vocab_pieces(words, merges)
    lut = encode_longest_match(words, vocab, out_col="lm_tokens")
    docs = spark.createDataFrame(
        [(1, "low lower ab"), (2, "banana"), (3, "")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, pieces_col="lm_tokens", token_pattern="^[a-z]+$"
        ).collect()
    }
    per_word = {
        r["w"]: list(r["lm_tokens"])
        for r in encode_longest_match(words, vocab).collect()
    }
    assert out[1] == per_word["low"] + per_word["lower"] + per_word["ab"]
    assert out[2] == per_word["banana"]
    assert out[3] == []


def test_encode_corpus_oov_fallback_bytes_both_strategies(spark):
    """oov_fallback='bytes': a word missing from the LUT encodes as
    its UTF-8 <0xNN> symbols — identically in the JVM join path
    (hex(encode(tok))) and the Arrow map path (byte_pieces), including
    multi-byte characters — while LUT words keep their pieces."""
    from big_data_spark.operators.tokenizer import byte_pieces, encode_corpus

    docs = spark.createDataFrame(
        [(1, "ab zz ab"), (2, "héllo"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    lut = spark.createDataFrame(
        [("ab", ["ab"])], "w string, bpe_tokens array<string>"
    )
    a = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(docs, lut, oov_fallback="bytes").collect()
    }
    b = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, strategy="map", oov_fallback="bytes"
        ).collect()
    }
    assert a == b
    assert a[1] == ["ab"] + byte_pieces("zz") + ["ab"]
    assert a[2] == byte_pieces("héllo")
    assert a[3] == [] and a[4] == []


def test_normalize_text_word_table_equality(spark):
    """normalize_text (VERDICT r10 order #4): one Arrow pass of
    unicodedata.normalize ahead of the word table. The word table of
    the NORMALIZED denormalized corpus must equal the word table of
    the corpus written with the canonical code points directly —
    ligatures, fullwidth forms, compatibility digits, and decomposed
    diacritics all fold onto the pieces the tokenizer trained on."""
    from big_data_spark.operators.tokenizer import normalize_text

    denorm = spark.createDataFrame(
        [
            (1, "ﬁre ﬁre"),              # LATIN SMALL LIGATURE FI
            (2, "Ｆｕｌｌｗｉｄｔｈ ４２"),      # fullwidth letters/digits
            (3, "cafe\u0301 noe\u0308l"),  # decomposed diacritics (NFD)
            (4, "① Ⅸ"),              # CIRCLED ONE, ROMAN NINE
            (5, None),
        ],
        "doc_id int, text string",
    )
    canon = spark.createDataFrame(
        [
            (1, "fire fire"),
            (2, "Fullwidth 42"),
            (3, "café noël"),
            (4, "1 IX"),
            (5, None),
        ],
        "doc_id int, text string",
    )
    got = {
        (r["w"], r["cnt"])
        for r in bpe_word_table(
            normalize_text(denorm), pre_tokenize=True
        ).collect()
    }
    want = {
        (r["w"], r["cnt"])
        for r in bpe_word_table(canon, pre_tokenize=True).collect()
    }
    assert got == want and ("fire", 2) in got

    # NULL stays NULL; other columns pass through; out_col appends
    rows = {
        r["doc_id"]: r["norm"]
        for r in normalize_text(denorm, out_col="norm").collect()
    }
    assert rows[5] is None and rows[1] == "fire fire"
    import unicodedata

    for r in normalize_text(denorm, form="NFC").collect():
        if r["text"] is not None:
            src = dict((d[0], d[1]) for d in denorm.collect())[r["doc_id"]]
            assert r["text"] == unicodedata.normalize("NFC", src)

    with pytest.raises(ValueError):
        normalize_text(denorm, form="NFKX")


def test_tokenizer_bundle_roundtrip_and_encode(spark, tmp_path):
    """TokenizerBundle: the complete shipping artifact (merges +
    pieces + pre-tokenize rule + OOV policy). Save/load must round-
    trip exactly; encode_corpus_with_bundle must reproduce the manual
    capstone chain token-for-token; format drift and unknown policies
    are rejected loudly."""
    from big_data_spark.operators.tokenizer import (
        TokenizerBundle,
        bpe_vocab_pieces,
        encode_corpus,
        encode_corpus_with_bundle,
        encode_longest_match,
        load_tokenizer_bundle,
        save_tokenizer_bundle,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [
            (1, "abab abab cd (3-5 năm)"),
            (2, "abab cd cd 42"),
            (3, ""),
            (4, None),
        ],
        "doc_id int, text string",
    )
    words = bpe_word_table(docs, pre_tokenize=True, token_pattern="^[a-z]{2,}$")
    merges = train_bpe(words, num_merges=3)
    pieces = bpe_vocab_pieces(words, merges)
    bundle = TokenizerBundle(
        merges=list(merges),
        pieces=pieces,
        pre_tokenize=True,
        oov_fallback="bytes",
    )
    path = str(tmp_path / "bundle")
    save_tokenizer_bundle(bundle, path)
    loaded = load_tokenizer_bundle(path)
    assert loaded == TokenizerBundle(
        merges=list(merges), pieces=pieces, pre_tokenize=True,
        oov_fallback="bytes",
    )

    got = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus_with_bundle(docs, loaded).collect()
    }
    # manual chain: same word table, trie LUT, corpus map
    lut = encode_longest_match(
        bpe_word_table(docs, pre_tokenize=True),
        pieces,
        out_col="_p",
        byte_fallback=True,
    )
    want = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, pieces_col="_p", oov_fallback="bytes",
            pre_tokenize=True,
        ).collect()
    }
    assert got == want
    assert got[3] == [] and got[4] == []
    # the trained words encode via vocab pieces, OOV runs via bytes
    assert all(not t.startswith("<0x") for t in got[1][:2])
    assert any(t.startswith("<0x") for t in got[1])  # 'năm', digits, punct

    # format drift and bad policy are loud
    import json
    import os

    with open(os.path.join(path, "tokenizer_bundle.json")) as f:
        meta = json.load(f)
    meta["format"] = "tokenizer_bundle_v9"
    with open(os.path.join(path, "tokenizer_bundle.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="unrecognized tokenizer bundle"):
        load_tokenizer_bundle(path)
    meta["format"] = "tokenizer_bundle_v1"
    meta["oov_fallback"] = "skip"
    with open(os.path.join(path, "tokenizer_bundle.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="unknown oov_fallback"):
        load_tokenizer_bundle(path)


def test_tokenizer_bundle_serves_unigram_pieces(spark, tmp_path):
    """The bundle is family-agnostic: a unigram-LM piece table ships
    through the SAME artifact (merges empty — replay is a BPE notion;
    the trie encoder consumes the final pieces either way), and
    encode_corpus_with_bundle reproduces the longest-match encode of
    the unigram vocabulary."""
    from big_data_spark.operators.tokenizer import (
        TokenizerBundle,
        encode_corpus,
        encode_corpus_with_bundle,
        encode_longest_match,
        load_tokenizer_bundle,
        save_tokenizer_bundle,
    )
    from big_data_spark.operators.unigram import train_unigram

    docs = spark.createDataFrame(
        [(1, "abab baba abc"), (2, "cab abc abab"), (3, "zz 42")],
        "doc_id int, text string",
    )
    words = bpe_word_table(docs, token_pattern="^[a-c]+$")
    pieces = train_unigram(
        words, vocab_size=8, seed_size=12, max_piece_len=3, em_iters=1
    )
    bundle = TokenizerBundle(
        merges=[],
        pieces=[p.piece for p in pieces],
        pre_tokenize=None,
        oov_fallback="bytes",
    )
    path = str(tmp_path / "uni_bundle")
    save_tokenizer_bundle(bundle, path)
    loaded = load_tokenizer_bundle(path)
    assert loaded.merges == [] and loaded.pieces == bundle.pieces

    got = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus_with_bundle(docs, loaded).collect()
    }
    lut = encode_longest_match(
        bpe_word_table(docs), loaded.pieces, out_col="_p",
        byte_fallback=True,
    )
    want = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            docs, lut, pieces_col="_p", oov_fallback="bytes"
        ).collect()
    }
    assert got == want
    # in-vocab words segment via unigram pieces; 'zz'/'42' byte-cover
    assert all(not t.startswith("<0x") for t in got[1])
    assert any(t.startswith("<0x") for t in got[3])


def test_bundle_v2_records_normalization_and_applies_it(spark, tmp_path):
    """VERDICT r11 order #2 — the drift test: train on NFKC-normalized
    text, ship the bundle with normalize='NFKC', then bundle-encode
    the DENORMALIZED text (ligatures, fullwidth digits): the recorded
    form must be applied inside encode_corpus_with_bundle, so the
    token sequences match an encode of the pre-normalized corpus
    exactly. Without the field the same artifact would silently mint
    different ids for the same logical text."""
    from big_data_spark.operators.tokenizer import (
        TokenizerBundle,
        bpe_vocab_pieces,
        encode_corpus_with_bundle,
        load_tokenizer_bundle,
        normalize_text,
        save_tokenizer_bundle,
        train_bpe,
        with_byte_fallback_pieces,
    )

    denorm = spark.createDataFrame(
        [
            (1, "ﬁre ﬁre ﬂow"),      # ligatures: NFKC -> fire fire flow
            (2, "fire ﬂow ５ ﬁre"),  # mixed pre-normalized + fullwidth 5
            (3, None),
        ],
        "doc_id int, text string",
    )
    norm = normalize_text(denorm, form="NFKC")
    words = bpe_word_table(norm, pre_tokenize=True, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=2)
    pieces = with_byte_fallback_pieces(bpe_vocab_pieces(words, merges))
    bundle = TokenizerBundle(
        merges=list(merges),
        pieces=pieces,
        pre_tokenize=True,
        oov_fallback="bytes",
        normalize="NFKC",
    )
    path = str(tmp_path / "b2")
    save_tokenizer_bundle(bundle, path)
    loaded = load_tokenizer_bundle(path)
    assert loaded.normalize == "NFKC"

    import json
    import os

    with open(os.path.join(path, "tokenizer_bundle.json")) as f:
        assert json.load(f)["format"] == "tokenizer_bundle_v2"

    got_denorm = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus_with_bundle(denorm, loaded).collect()
    }
    got_norm = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus_with_bundle(norm, loaded).collect()
    }
    assert got_denorm == got_norm  # idempotent: NFKC(NFKC(x)) == NFKC(x)
    assert got_denorm[1] == got_denorm[1] and len(got_denorm[1]) > 0
    # doc 1 and the 'fire' occurrences of doc 2 now share pieces
    assert got_denorm[1][0] == got_denorm[2][0]
    # ids drift-check too: the bundle id space gives identical ids
    ids_denorm = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus_with_bundle(
            denorm, loaded, emit_ids=True
        ).collect()
    }
    pid = loaded.piece_ids()
    assert ids_denorm[1] == [pid[p] for p in got_denorm[1]]


def test_bundle_v1_artifact_loads_with_null_normalize(tmp_path):
    """Old v1 artifacts (written before the normalize field existed)
    must keep loading, with normalize structurally None — pinned so a
    format bump never strands shipped tokenizers."""
    import json
    import os

    from big_data_spark.operators.tokenizer import load_tokenizer_bundle

    path = str(tmp_path / "v1")
    os.makedirs(path)
    with open(os.path.join(path, "tokenizer_bundle.json"), "w") as f:
        json.dump(
            {
                "format": "tokenizer_bundle_v1",
                "merges": [[1, "a", "b", "ab", 3]],
                "pieces": ["a", "ab", "b"],
                "pre_tokenize": None,
                "oov_fallback": "error",
            },
            f,
        )
    loaded = load_tokenizer_bundle(path)
    assert loaded.normalize is None
    assert loaded.pieces == ["a", "ab", "b"]


def test_bundle_load_validates_required_keys(tmp_path):
    """ADVICE r11: a bundle with the right format tag but missing
    keys (hand-edited, truncated) must raise ValueError naming the
    path, not a bare KeyError."""
    import json
    import os

    import pytest as _pytest

    from big_data_spark.operators.tokenizer import load_tokenizer_bundle

    path = str(tmp_path / "broken")
    os.makedirs(path)
    with open(os.path.join(path, "tokenizer_bundle.json"), "w") as f:
        json.dump({"format": "tokenizer_bundle_v2", "merges": []}, f)
    with _pytest.raises(ValueError, match="missing required keys"):
        load_tokenizer_bundle(path)
    # unknown normalize form is rejected at load, not at first encode
    with open(os.path.join(path, "tokenizer_bundle.json"), "w") as f:
        json.dump(
            {
                "format": "tokenizer_bundle_v2",
                "merges": [],
                "pieces": ["a"],
                "pre_tokenize": None,
                "oov_fallback": "error",
                "normalize": "NFKX",
            },
            f,
        )
    with _pytest.raises(ValueError, match="unknown normalize form"):
        load_tokenizer_bundle(path)


def test_emit_ids_matches_string_encode_both_strategies(spark):
    """emit_ids (VERDICT r11 order #1): the int32 id encode must be
    exactly the string encode mapped through the piece index — same
    join/map plans, ids minted at the vocab-sized LUT, byte-fallback
    ids built JVM-side (join) / driver-side (map). Both strategies
    agree with each other and with the manual piece->id mapping."""
    from big_data_spark.operators.tokenizer import (
        apply_bpe,
        bpe_vocab_pieces,
        encode_corpus,
        train_bpe,
        with_byte_fallback_pieces,
    )

    docs = spark.createDataFrame(
        [
            (1, "abab abab cd năm"),
            (2, "cd cd 42"),
            (3, ""),
            (4, None),
        ],
        "doc_id int, text string",
    )
    vocab = bpe_word_table(docs, token_pattern="^[a-z]+$")
    merges = train_bpe(vocab, num_merges=2)
    lut = apply_bpe(vocab, merges)
    pieces = with_byte_fallback_pieces(bpe_vocab_pieces(vocab, merges))
    pid = {p: i for i, p in enumerate(pieces)}

    strings = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(docs, lut, oov_fallback="bytes").collect()
    }
    for strategy in ("join", "map"):
        enc = encode_corpus(
            docs,
            lut,
            oov_fallback="bytes",
            strategy=strategy,
            emit_ids=True,
            id_pieces=pieces,
        )
        assert dict(enc.dtypes)["doc_tokens"] == "array<int>"
        ids = {
            r["doc_id"]: list(r["doc_tokens"]) for r in enc.collect()
        }
        assert ids == {
            d: [pid[p] for p in toks] for d, toks in strings.items()
        }, strategy
        assert ids[3] == [] and ids[4] == []


def test_emit_ids_validation_is_loud(spark):
    """emit_ids failure modes are driver-side ValueErrors: missing
    id_pieces, byte fallback without the 256 byte pieces in the id
    space, and a LUT piece absent from the piece list (stale vocab —
    executor-side but still loud, never a silently wrong id)."""
    from big_data_spark.operators.tokenizer import (
        apply_bpe,
        encode_corpus,
        train_bpe,
    )

    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id int, text string")
    vocab = bpe_word_table(docs)
    merges = train_bpe(vocab, num_merges=1)
    lut = apply_bpe(vocab, merges)

    with pytest.raises(ValueError, match="needs id_pieces"):
        encode_corpus(docs, lut, emit_ids=True)
    with pytest.raises(ValueError, match="256 byte pieces"):
        encode_corpus(
            docs, lut, oov_fallback="bytes", emit_ids=True,
            id_pieces=["a", "b"],
        )
    with pytest.raises(ValueError, match="duplicates"):
        encode_corpus(docs, lut, emit_ids=True, id_pieces=["a", "a"])
    # stale piece list: LUT emits a piece the id space doesn't cover
    with pytest.raises(Exception, match="missing from id_pieces"):
        encode_corpus(
            docs, lut, emit_ids=True, id_pieces=["a"]
        ).collect()
    with pytest.raises(ValueError, match="missing from id_pieces"):
        encode_corpus(
            docs, lut, emit_ids=True, id_pieces=["a"], strategy="map"
        ).collect()


def test_decode_token_ids_roundtrip(spark):
    """Detokenization: decode(encode(text)) reproduces the text with
    the tokenizer's separators removed (the documented lossiness
    contract) — including multi-byte byte-fallback runs; NULL arrays
    decode to NULL; out-of-range ids are loud."""
    from big_data_spark.operators.tokenizer import (
        TokenizerBundle,
        bpe_vocab_pieces,
        decode_token_ids,
        encode_corpus_with_bundle,
        train_bpe,
        with_byte_fallback_pieces,
    )

    docs = spark.createDataFrame(
        [
            (1, "abab abab cd năm"),      # diacritics -> byte fallback
            (2, "cd 42 (3-5)"),           # digits/punct -> byte fallback
            (3, ""),
            (4, None),
        ],
        "doc_id int, text string",
    )
    words = bpe_word_table(docs, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=2)
    pieces = with_byte_fallback_pieces(bpe_vocab_pieces(words, merges))
    bundle = TokenizerBundle(
        merges=list(merges), pieces=pieces, pre_tokenize=None,
        oov_fallback="bytes",
    )
    enc = encode_corpus_with_bundle(docs, bundle, emit_ids=True)
    got = {
        r["doc_id"]: r["decoded_text"]
        for r in decode_token_ids(enc, pieces).collect()
    }
    src = {1: "abab abab cd năm", 2: "cd 42 (3-5)", 3: "", 4: None}
    for d, text in src.items():
        want = text.replace(" ", "") if text is not None else ""
        if d == 4:
            want = ""  # NULL text encodes to [] which decodes to ""
        assert got[d] == want, (d, got[d], want)

    ids = spark.createDataFrame([(1, [0, 99999])], "doc_id int, t array<int>")
    with pytest.raises(Exception, match="outside the piece vocabulary"):
        decode_token_ids(ids, pieces, ids_col="t").collect()
    null_ids = spark.createDataFrame(
        [(1, None)], "doc_id int, t array<int>"
    )
    assert (
        decode_token_ids(null_ids, pieces, ids_col="t").collect()[0][
            "decoded_text"
        ]
        is None
    )
