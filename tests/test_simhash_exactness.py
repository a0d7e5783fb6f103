"""q92's pigeonhole claim, proven: 4x8-bit banding loses NO pair
within Hamming distance 3 — the banded join's pair set equals the
brute-force all-pairs scan over the same signatures."""

from __future__ import annotations

from big_data_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_banded_hamming_pairs_equal_brute_force(spark):
    out = QUERIES["q92_simhash_hamming_pairs"].fn(spark, SF_SMOKE)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}

    # brute force over the same 32-bit signatures (recomputed with the
    # identical expression the query uses)
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split("text", " ")), lambda t: F.md5(t)
        ).alias("th"),
    )
    bit_sums = [
        F.aggregate(
            "th",
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, i + 1, 1) >= "8", 1).otherwise(-1),
        ).alias(f"b{i}")
        for i in range(32)
    ]
    sums = hashed.select("doc_id", *bit_sums).collect()
    sig_of = {
        r["doc_id"]: sum((1 << i) for i in range(32) if r[f"b{i}"] > 0)
        for r in sums
    }
    ids = sorted(sig_of)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sig_of[a] ^ sig_of[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert want, "degenerate corpus: no close pairs to check"
