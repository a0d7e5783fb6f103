"""Native expression library vs pure-Python oracles, plus
property tests (hypothesis) for the driver-side pure functions."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from big_data_spark.functions import (
    clean_tokens,
    cosine_similarity,
    dot,
    minhash,
    minhash_slices,
    set_overlap_ratio,
    shingles,
)
from big_data_spark.ml.pipelines import adaptive_rf_params
from big_data_spark.ml.serving import SALARY_BANDS, clamp_salary

TOKEN_ROWS = [
    (["  spark ", "a", "sql", " x ", "data  "],),
    ([],),
    (["ab", "abc"],),
]


def test_clean_tokens_matches_python(spark):
    df = spark.createDataFrame(TOKEN_ROWS, ["toks"])
    got = [r["out"] for r in df.select(clean_tokens(F.col("toks")).alias("out")).collect()]
    want = [
        [t.strip() for t in row[0] if len(t.strip()) > 2]
        for row in TOKEN_ROWS
    ]
    assert got == want


def test_cosine_and_dot_match_python(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine_similarity(F.col("a"), F.col("b")).alias("c"),
    ).first()
    pd_ = sum(x * y for x, y in zip(a, b))
    pc = pd_ / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    assert row["d"] == pytest.approx(pd_)
    assert row["c"] == pytest.approx(pc)
    # zero-norm guard -> NULL (reference UDF returned 0-div guard)
    z = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert z.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first()["c"] is None


def test_set_overlap_matches_python(spark):
    cases = [
        (["python", "sql"], ["python", "sql", "excel"]),
        (["go"], ["python"]),
        (["a"], []),
    ]
    df = spark.createDataFrame(cases, ["u", "j"])
    got = [
        r["s"]
        for r in df.select(set_overlap_ratio(F.col("u"), F.col("j")).alias("s")).collect()
    ]
    want = [
        (len(set(u) & set(j)) / len(set(j))) if j else 0.0 for u, j in cases
    ]
    assert got == pytest.approx(want)


def test_minhash_matches_python(spark):
    toks = ["spark", "sql", "data"]
    df = spark.createDataFrame([(toks,)], ["toks"])
    got = df.select(minhash(F.col("toks"), 3).alias("mh")).first()["mh"]
    want = min(hashlib.md5(f"{t}#3".encode()).hexdigest() for t in toks)
    assert got == want
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in toks]
    hdf = spark.createDataFrame([(hashes,)], ["th"])
    lanes = hdf.select(
        *[c.alias(f"l{i}") for i, c in enumerate(minhash_slices(F.col("th"), 4))]
    ).first()
    for i in range(4):
        assert lanes[f"l{i}"] == min(h[8 * i : 8 * i + 8] for h in hashes)


def test_shingles_match_python(spark):
    toks = ["a", "b", "c", "d"]
    df = spark.createDataFrame([(toks,), (["x", "y"],)], ["toks"])
    got = [r["s"] for r in df.select(shingles(F.col("toks"), 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than k -> empty


@given(
    raw=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    position=st.sampled_from(sorted(SALARY_BANDS) + ["nope"]),
    is_it=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_clamp_salary_properties(raw, position, is_it):
    floor, ceiling = SALARY_BANDS.get(position, (5.0, 100.0))
    out = clamp_salary(raw, position, is_it)
    assert floor <= out <= ceiling  # always inside the band
    if not is_it:
        assert out == max(floor, min(raw, ceiling))


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=200, deadline=None)
def test_adaptive_rf_monotone(n):
    trees, depth = adaptive_rf_params(n)
    trees2, depth2 = adaptive_rf_params(n + 1)
    assert trees2 >= trees and depth2 >= depth  # monotone in data size
    assert (trees, depth) in {(30, 8), (40, 10), (50, 12), (60, 15), (75, 18)}


def test_redact_pii_complete_and_idempotent(spark):
    """After one redaction pass no PII pattern matches remain, counts
    agree with Python re over the same RE2-safe patterns, and a second
    pass is a no-op (idempotence — placeholders contain no matchable
    text)."""
    import re

    from pyspark.sql import functions as F

    from big_data_spark.functions import EMAIL_RE, PHONE_RE, pii_counts, redact_pii

    texts = [
        "plain text no pii at all",
        "mail me at alice.smith+spam@example.co.uk today",
        "two mails a@b.io c.d@e-f.org and a phone +1-555-0199",
        "+1-555-1234 +1-555-9999",
        "almost@an @email .com +1-555-12 not matches",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    n_e, n_p = pii_counts(F.col("t"))
    once = df.select(
        "i",
        "t",
        n_e.alias("ne"),
        n_p.alias("np"),
        redact_pii(F.col("t")).alias("r1"),
    )
    twice = once.select("i", "t", "ne", "np", "r1", redact_pii(F.col("r1")).alias("r2"))
    for row in twice.collect():
        assert row["ne"] == len(re.findall(EMAIL_RE, row["t"])), row["t"]
        assert row["np"] == len(re.findall(PHONE_RE, row["t"])), row["t"]
        assert not re.search(EMAIL_RE, row["r1"]), row["r1"]
        assert not re.search(PHONE_RE, row["r1"]), row["r1"]
        assert row["r2"] == row["r1"]


def test_pandas_and_native_mad_agree(spark):
    """q76 (applyInPandas MAD, the Arrow-boundary anchor) and q125
    (pure-JVM twin) must produce identical medians and MADs — the
    UDF-to-native policy verified on robust statistics."""
    from big_data_spark.queries import QUERIES

    from .conftest import SF_ORACLE

    a = {
        r["o_orderpriority"]: (r["median_price"], r["mad"])
        for r in QUERIES["q76_priority_price_mad"].fn(spark, SF_ORACLE).collect()
    }
    b = {
        r["o_orderpriority"]: (r["median_price"], r["mad"])
        for r in QUERIES["q125_native_mad"].fn(spark, SF_ORACLE).collect()
    }
    assert a == b
