"""The SimHash banding pigeonhole claim, proven at BOTH widths: the
banded join's pair set equals the brute-force all-pairs scan over the
same signatures — 32-bit/4x8 (q92, the oracle anchor) and 64-bit/4x16
(the 10^8+-distinct-signature scale form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.catalog import load_table
from big_data_spark.operators.simhash import (
    simhash_hamming_pairs,
    simhash_signatures,
)
from big_data_spark.queries import QUERIES

from .conftest import SF_SMOKE


def _brute_force(sig_of: dict, max_hamming: int) -> dict:
    ids = sorted(sig_of)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((sig_of[a] ^ sig_of[b]) & (2**64 - 1)).count("1")
            if d <= max_hamming:
                want[(a, b)] = d
    return want


@pytest.mark.parametrize("n_bits,n_bands", [(32, 4), (64, 4)])
def test_banded_hamming_pairs_equal_brute_force(spark, n_bits, n_bands):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = simhash_hamming_pairs(
        docs, n_bits=n_bits, n_bands=n_bands, max_hamming=3
    )
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}

    sig_of = {
        r["doc_id"]: r["sig"] & (2**64 - 1)
        for r in simhash_signatures(docs, n_bits=n_bits).collect()
    }
    want = _brute_force(sig_of, 3)
    assert got == want
    assert want, "degenerate corpus: no close pairs to check"


def test_q92_is_the_32bit_form(spark):
    """The registry's q92 (hash-matched against the DuckDB oracle) is
    exactly the operator at n_bits=32 — rewiring through
    operators.simhash changed no pair."""
    via_registry = QUERIES["q92_simhash_hamming_pairs"].fn(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    via_operator = simhash_hamming_pairs(docs, n_bits=32)
    a = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in via_registry.collect()}
    b = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in via_operator.collect()}
    assert a == b and a


def test_wide_form_tightens_candidate_buckets(spark):
    """64-bit sigs spread band values over the full 16-bit range (not
    just 256 buckets) and the 32- and 64-bit signatures agree on their
    shared bits: bit 2i of the wide sig IS bit i of the narrow sig
    (both read the high bit of md5 nibble i)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    narrow = {
        r["doc_id"]: r["sig"]
        for r in simhash_signatures(docs, n_bits=32).collect()
    }
    wide = {
        r["doc_id"]: r["sig"] & (2**64 - 1)
        for r in simhash_signatures(docs, n_bits=64).collect()
    }
    assert set(narrow) == set(wide)
    for doc_id, w in wide.items():
        evens = 0
        for i in range(32):
            evens |= ((w >> (2 * i)) & 1) << i
        assert evens == narrow[doc_id], doc_id
    # the wide band values actually use the larger space
    vals = {(w >> (16 * k)) & 0xFFFF for w in wide.values() for k in range(4)}
    assert max(vals) > 255, "64-bit bands collapsed into the 8-bit range"


def test_null_text_and_duplicate_id_contract(spark):
    """The edge semantics of the explode->groupBy shape, made
    explicit (ADVICE r06): a NULL-text doc produces NO signature row
    (explode of a null array emits nothing), and rows sharing an id
    MERGE their per-row-distinct token votes into one signature —
    equal to the signature of a single row whose votes are the sum
    of each row's distinct-token votes. Registry inputs (documents)
    have unique ids and non-null text, so neither edge is reachable
    there; this pins the operator's boundary for other callers."""
    docs = spark.createDataFrame(
        [
            ("keep", "alpha beta gamma"),
            ("null_text", None),
            ("dup", "alpha beta"),
            ("dup", "alpha delta"),
        ],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: r["sig"]
        for r in simhash_signatures(docs, n_bits=32).collect()
    }
    assert set(rows) == {"keep", "dup"}  # null-text row dropped

    # the merged-dup signature equals sign(votes(row1) + votes(row2)),
    # NOT the signature of the concatenated text (distinct-per-row:
    # 'alpha' votes twice)
    def votes(tokens: list[str]) -> list[int]:
        import hashlib

        out = [0] * 32
        for t in tokens:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(32):
                out[j] += 1 if h[j] >= "8" else -1
        return out

    merged = [
        a + b for a, b in zip(votes(["alpha", "beta"]), votes(["alpha", "delta"]))
    ]
    want = 0
    for j, v in enumerate(merged):
        if v > 0:
            want |= 1 << j
    assert rows["dup"] == want


def test_parameter_validation():
    """Bad parameterizations fail before touching any data — a wrong
    (n_bands, max_hamming) pairing would silently DROP pairs."""

    class _Fake:  # validation raises before the DataFrame is used
        pass

    with pytest.raises(ValueError, match="must divide"):
        simhash_hamming_pairs(_Fake(), n_bits=64, n_bands=5)
    with pytest.raises(ValueError, match="exact only"):
        simhash_hamming_pairs(_Fake(), n_bits=64, n_bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="n_bits"):
        simhash_signatures(_Fake(), n_bits=128)
