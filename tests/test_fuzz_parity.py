"""Fuzzed cross-engine parity for the parsing chains.

The golden corpus covers every intended branch; this test feeds a
seeded random corpus (digit/unit/keyword fragments + unicode noise)
through BOTH the Spark chain and the DuckDB oracle and requires
identical results — catching semantic drift on inputs nobody
hand-picked (SURVEY §7 risk (a) at fuzz scale).
"""

from __future__ import annotations

import random

import duckdb

from big_data_spark.fixtures import values_clause
from big_data_spark.operators.job_etl import (
    EXPERIENCE_ORACLE_SQL,
    SALARY_ORACLE_SQL,
    parse_experience,
    parse_salary,
)

FRAGMENTS = [
    "10", "15", "120", "999", "1000", "25000000", "7,5", "12.5", "0",
    "triệu", "tr", "m", "trieu", "usd", "USD", "$", "vnd", "VND",
    "-", " - ", "+", "năm", "year", "years", "yoe", "kn",
    "từ", "from", "at least", "tối thiểu", "min", "trên", "lên đến",
    "không yêu cầu", "chưa có", "mới tốt nghiệp", "intern",
    "thoả thuận", "cạnh tranh", "lương", "/tháng", "kinh nghiệm",
    "", " ", "  ", "abc", "xyz", "%", "#", "(", ")", "😀", "đ", "ê",
]


def _fuzz_corpus(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        s = " ".join(rng.choice(FRAGMENTS) for _ in range(k))
        if rng.random() < 0.3:
            s = s.upper() if rng.random() < 0.5 else s.title()
        out.append(s)
    return out


def _compare(spark, corpus, colname, spark_fn, oracle_template, out_cols):
    df = spark.createDataFrame([(s,) for s in corpus], [colname])
    srows = {
        r[colname]: tuple(r[c] for c in out_cols)
        for r in spark_fn(df).select(colname, *out_cols).collect()
    }
    con = duckdb.connect()
    try:
        sql = oracle_template.format(src=values_clause(corpus, colname))
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        drows = {}
        for row in res.fetchall():
            m = dict(zip(cols, row))
            drows[m[colname]] = tuple(m[c] for c in out_cols)
    finally:
        con.close()
    mismatches = [
        (s, srows[s], drows[s]) for s in srows if srows[s] != drows[s]
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"


def test_fuzz_salary_parity(spark):
    corpus = list(dict.fromkeys(_fuzz_corpus(seed=1337, n=400)))
    _compare(
        spark,
        corpus,
        "salary",
        parse_salary,
        SALARY_ORACLE_SQL,
        ["salary_min", "salary_max", "salary_avg"],
    )


def test_fuzz_experience_parity(spark):
    corpus = list(dict.fromkeys(_fuzz_corpus(seed=4242, n=400)))
    _compare(
        spark,
        corpus,
        "experience",
        parse_experience,
        EXPERIENCE_ORACLE_SQL,
        ["exp_min_year", "exp_max_year", "exp_avg_year", "exp_type"],
    )


def test_fuzz_snapshot_diff_classification(spark):
    """snapshot_diff vs a brute-force dict diff on seeded random
    snapshots: every (insert, delete, update, unchanged-absent)
    verdict must match for any overlap/churn pattern."""
    from big_data_spark.operators.relational import snapshot_diff

    rng = random.Random(1234)
    for trial in range(3):
        old = {k: rng.choice("abcde") for k in rng.sample(range(60), 35)}
        new = {}
        for k in rng.sample(range(60), 35):
            # some keys keep old value, some change, some are fresh
            if k in old and rng.random() < 0.5:
                new[k] = old[k]
            else:
                new[k] = rng.choice("abcde")
        expected = {}
        for k in set(old) | set(new):
            if k not in old:
                expected[k] = "insert"
            elif k not in new:
                expected[k] = "delete"
            elif old[k] != new[k]:
                expected[k] = "update"
        odf = spark.createDataFrame(list(old.items()), "k bigint, v string")
        ndf = spark.createDataFrame(list(new.items()), "k bigint, v string")
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff(odf, ndf, "k", ["v"]).collect()
        }
        assert got == expected, (trial, got, expected)


def test_fuzz_sliding_distinct_construction(spark):
    """q133's window-membership explode vs a brute-force Python
    sliding window over seeded random (day, user) activity."""
    import datetime

    from pyspark.sql import functions as F

    rng = random.Random(99)
    d0 = datetime.datetime(2024, 3, 1)
    rows = [
        (d0 + datetime.timedelta(days=rng.randint(0, 13),
                                 seconds=rng.randint(0, 86399)),
         rng.randint(0, 9))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    du = df.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    bounds = du.agg(F.max("day").alias("dmax"))
    contrib = (
        du.select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day") + F.expr("INTERVAL 6 DAY"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("wend"),
            "user_id",
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("wend") <= F.col("dmax"))
        .select("wend", "user_id")
        .distinct()
    )
    got = {
        r["wend"]: r["wau"]
        for r in contrib.groupBy("wend")
        .agg(F.count("*").alias("wau"))
        .collect()
    }
    # brute force: for each day with activity <= max day, union users
    # active in [day-6, day]
    active: dict = {}
    for ts, u in rows:
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        active.setdefault(day, set()).add(u)
    dmax = max(active)
    for wend in got:
        users = set()
        for off in range(7):
            users |= active.get(wend - datetime.timedelta(days=off), set())
        assert got[wend] == len(users), wend
    # every window-end from first activity to dmax that has any
    # trailing activity is reported
    expected_ends = {
        d
        for d in (min(active) + datetime.timedelta(days=i)
                  for i in range(0, (dmax - min(active)).days + 1))
    }
    assert set(got) >= {d for d in expected_ends if any(
        active.get(d - datetime.timedelta(days=o)) for o in range(7)
    )}


def test_fuzz_bpe_trainer_parity(spark):
    """train_bpe vs the independent reference BPE on seeded random
    word tables over a TINY alphabet — maximal tie pressure on the
    (count DESC, left, right) tiebreak and on greedy overlapping-run
    merges, across inputs nobody hand-picked."""
    from .test_tokenizer import _ref_bpe
    from big_data_spark.operators.tokenizer import train_bpe

    rng = random.Random(2025)
    for trial in range(3):
        words = {}
        for _ in range(rng.randint(12, 22)):
            w = "".join(
                rng.choice("abc") for _ in range(rng.randint(1, 7))
            )
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        df = spark.createDataFrame(list(words.items()), "w string, cnt long")
        got = train_bpe(df, num_merges=10)
        ref, _ = _ref_bpe(words, 10)
        assert [(m.left, m.right, m.merged, m.n) for m in got] == ref, (
            trial,
            words,
        )


def test_fuzz_unigram_trainer_parity(spark):
    """train_unigram vs the independent exhaustive-enumeration
    reference on seeded random word tables — ties in substring
    weights, Viterbi scores, and prune ranks must resolve identically
    in the distributed and single-node paths."""
    from .test_unigram import _ref_train
    from big_data_spark.operators.unigram import train_unigram

    rng = random.Random(777)
    for trial in range(2):
        words = {}
        for _ in range(rng.randint(10, 16)):
            w = "".join(
                rng.choice("abcd") for _ in range(rng.randint(1, 6))
            )
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        df = spark.createDataFrame(list(words.items()), "w string, cnt long")
        got = train_unigram(
            df, vocab_size=10, seed_size=14, max_piece_len=4, em_iters=2
        )
        ref = _ref_train(
            words, vocab_size=10, seed_size=14, max_len=4, em_iters=2
        )
        assert [(p.piece, p.count) for p in got] == [
            (p, c) for p, _lp, c in ref
        ], (trial, words)


def test_fuzz_byte_fallback_mixed_script_roundtrip(spark):
    """Byte-level coverage fuzz (VERDICT r09 order #2): seeded random
    mixed-script/punctuation corpora — Latin, Vietnamese diacritics,
    CJK, emoji, digits, punctuation — through encode_corpus with
    oov_fallback='bytes' under BOTH strategies. The two paths must
    agree symbol-for-symbol, and decoding (<0xNN> -> byte, vocab piece
    -> its UTF-8 bytes) must reproduce each doc's kept tokens exactly:
    no input is uncoverable and nothing is silently dropped."""
    from big_data_spark.operators.tokenizer import (
        apply_bpe,
        bpe_word_table,
        encode_corpus,
        encode_longest_match,
        train_bpe,
    )

    frags = [
        "abc", "ab", "ba", "cab", "xin", "chào", "triệu", "năm", "日本",
        "数据", "😀", "héllo", "a-b", "c.d", "(x)", "#tag", "42", "７",
        "ß", "Ωmega", "привет", "", "a",
        # \x0B (vertical tab) pins the ADVICE-r10 separator fix: Java's
        # \s includes it, RE2's does not, so PRE_TOKENIZE_PATTERN spells
        # the separator set out explicitly — all three engines must now
        # treat it as a token BOUNDARY (and the non-pre-tokenized path
        # must keep it INSIDE the space-delimited token, byte-covered).
        "a\x0Bb", "\x0B",
    ]
    rng = random.Random(8128)
    docs = []
    for i in range(60):
        docs.append(
            (i, " ".join(rng.choice(frags) for _ in range(rng.randint(0, 7))))
        )
    df = spark.createDataFrame(docs, "doc_id int, text string")
    # train only on pure-ascii-lowercase words: everything else is OOV
    words = bpe_word_table(df, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=4)
    lut = apply_bpe(words, merges)
    a = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(df, lut, oov_fallback="bytes").collect()
    }
    b = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            df, lut, strategy="map", oov_fallback="bytes"
        ).collect()
    }
    assert a == b

    def decode(pieces: list[str]) -> str:
        buf = bytearray()
        for p in pieces:
            if p.startswith("<0x") and p.endswith(">") and len(p) == 6:
                buf.append(int(p[3:5], 16))
            else:
                buf.extend(p.encode("utf-8"))
        return buf.decode("utf-8")

    for i, text in docs:
        kept = "".join(t for t in text.split(" ") if t != "")
        assert decode(a[i]) == kept, (i, text)

    # the longest-match encoder under the same fallback must also
    # cover every distinct word of the mixed corpus losslessly
    all_words = bpe_word_table(df)  # no pattern: every non-empty token
    vocab = [m.merged for m in merges] + list("abcx")
    enc = {
        r["w"]: list(r["lm_tokens"])
        for r in encode_longest_match(
            all_words, vocab, byte_fallback=True
        ).collect()
    }
    for w, pieces in enc.items():
        assert decode(pieces) == w, w

    # pre_tokenize=True over the same mixed corpus: the join path
    # (Java regexp_extract_all) and the map path (unicodedata
    # category splitter) must agree symbol-for-symbol, and both must
    # reproduce an INDEPENDENT engine's tokenization (DuckDB RE2 on
    # the identical pattern) through the byte-decode round trip
    from big_data_spark.operators.tokenizer import PRE_TOKENIZE_PATTERN

    pa = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            df, lut, oov_fallback="bytes", pre_tokenize=True
        ).collect()
    }
    pb = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus(
            df, lut, oov_fallback="bytes", pre_tokenize=True,
            strategy="map",
        ).collect()
    }
    assert pa == pb
    con = duckdb.connect()
    for i, text in docs:
        ref = con.execute(
            "SELECT regexp_extract_all(?, ?)", [text, PRE_TOKENIZE_PATTERN]
        ).fetchone()[0]
        assert decode(pa[i]) == "".join(ref), (i, text, ref)


def test_fuzz_corpus_encode_roundtrip(spark):
    """encode_corpus on seeded random documents: per-doc piece concat
    must reproduce exactly the kept tokens in order (the q192
    invariant, fuzzed), including docs whose tokens all filter out."""
    from big_data_spark.operators.tokenizer import (
        apply_bpe,
        bpe_word_table,
        encode_corpus,
        train_bpe,
    )

    rng = random.Random(31415)
    docs = []
    for i in range(40):
        toks = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            if rng.random() < 0.85
            else rng.choice(["XX", "42", ""])
            for _ in range(rng.randint(0, 8))
        ]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    words = bpe_word_table(df, token_pattern="^[a-z]+$")
    merges = train_bpe(words, num_merges=6)
    out = encode_corpus(
        df, apply_bpe(words, merges), token_pattern="^[a-z]+$"
    )
    got = {r["doc_id"]: "".join(r["doc_tokens"]) for r in out.collect()}
    for i, text in docs:
        kept = "".join(
            t for t in text.split(" ") if t and t.isalpha() and t.islower()
        )
        assert got[i] == kept, (i, text)
