"""SimHash near-duplicate detection, parameterized by signature width.

Generalizes the registry's q92 form (32-bit signatures, 4x8-bit bands
-- kept as the DuckDB oracle anchor) to 64-bit signatures with 4x16-bit
bands. The wide form matters past ~10^8 DISTINCT signatures: 8-bit
bands give only 256 join buckets per band, so per-bucket candidate work
grows as (n_sigs/256)^2 -- a quadratic tail in the CANDIDATE set, not
just the output. 16-bit bands give 65,536 buckets per band (256x less
work per bucket) while the pigeonhole exactness guarantee is unchanged:
at most ``max_hamming <= n_bands - 1`` differing bits can corrupt at
most ``max_hamming`` bands, so every pair within the Hamming ball
shares at least one intact band.

Both widths derive every bit from the SAME md5 token digest (the
engine-portable hash this repo standardizes on): the 32-bit form reads
the high bit of each hex nibble, the 64-bit form reads the top TWO bits
of each nibble -- both as lexicographic character tests (hex chars sort
``0-9a-f``), so no per-character base conversion enters the hot path.

Background: Charikar, "Similarity estimation techniques from rounding
algorithms" (STOC '02); Manku, Jain & Das Sarma, "Detecting
near-duplicates for web crawling" (WWW '07), which uses 64-bit
signatures and band-permuted tables at web scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_vote(h: Column, j: int, n_bits: int) -> Column:
    """The ±1 vote token-hash ``h`` casts for signature bit ``j``."""
    if n_bits == 32:
        # high bit of hex nibble j — byte-compatible with the q92
        # DuckDB oracle's substring(md5, j+1, 1) >= '8' test
        is_set = F.substring(h, j + 1, 1) >= "8"
    elif n_bits == 64:
        # two bits per nibble: bit 2i is the nibble's high bit (value
        # & 8 <=> char >= '8'), bit 2i+1 its second bit (value & 4 <=>
        # char in 4-7 or c-f)
        c = F.substring(h, j // 2 + 1, 1)
        if j % 2 == 0:
            is_set = c >= "8"
        else:
            is_set = ((c >= "4") & (c <= "7")) | (c >= "c")
    else:
        raise ValueError(f"n_bits must be 32 or 64, got {n_bits}")
    return F.when(is_set, 1).otherwise(-1)


def simhash_signatures(
    docs: DataFrame,
    *,
    n_bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig): sign of per-bit ±1 votes over the doc's DISTINCT
    whitespace tokens. ``sig`` is a long holding the low ``n_bits``
    bits (for n_bits=64 the value uses the full signed range; all
    downstream ops are bitwise, so sign is irrelevant).

    Shape: explode -> codegen'd md5 -> ONE map-side-combinable
    per-doc aggregate carrying n_bits int partials. This replaced
    n_bits array-local F.aggregate folds: higher-order functions are
    CodegenFallback, so the folds re-walked every doc's token array
    n_bits times under interpreted evaluation (the q129 lesson —
    interpreted per-token CPU dominates the one exchange this buys
    by orders of magnitude). Vote sums are integers, so the result
    is bit-identical to the fold form in any order.

    Input contract (pinned by tests/test_simhash_exactness.py::
    test_null_text_and_duplicate_id_contract): rows
    with NULL ``text_col`` produce NO output row (explode of a null
    array emits nothing — a null doc has no signature), and rows
    sharing an ``id_col`` value MERGE their per-row-distinct token
    votes into ONE signature row (groupBy semantics). Callers that
    need one row per input row must dedup/normalize ids and null
    text upstream — every registry caller reads the documents table,
    whose ids are unique and text non-null."""
    if n_bits not in (32, 64):
        raise ValueError(f"n_bits must be 32 or 64, got {n_bits}")
    hashed = docs.select(
        id_col,
        F.explode(F.array_distinct(F.split(text_col, " "))).alias("_tok"),
    ).select(id_col, F.md5("_tok").alias("h"))
    sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(_bit_vote(F.col("h"), j, n_bits)).alias(f"b{j}")
            for j in range(n_bits)
        ]
    )
    sig = reduce(
        lambda acc, term: acc.bitwiseOR(term),
        [
            F.when(
                F.col(f"b{j}") > 0,
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(n_bits)
        ],
    )
    return sums.select(id_col, sig.alias("sig"))


def simhash_hamming_pairs(
    docs: DataFrame,
    *,
    n_bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All doc pairs within ``max_hamming`` SimHash bits of each other
    — EXACT via banding (pigeonhole: requires max_hamming < n_bands),
    never an all-pairs compare.

    The pair phase runs at SIGNATURE level, not doc level: docs
    collapse to distinct-signature groups first (identical-content
    clusters cost one representative), the band join + Hamming filter
    + multi-band dedup touch only sig pairs, and surviving sig pairs
    expand to doc pairs exactly once — output work proportional to the
    answer, not the candidate set. Same-signature groups contribute
    their C(n,2) hamming-0 pairs directly.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b, unordered (a
    pair SET; callers sort if they need a presentation order).
    """
    if n_bits % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide n_bits={n_bits}")
    if max_hamming >= n_bands:
        raise ValueError(
            f"banding is exact only for max_hamming <= n_bands - 1 "
            f"(got max_hamming={max_hamming}, n_bands={n_bands})"
        )
    width = n_bits // n_bands
    mask = (1 << width) - 1
    sigs = simhash_signatures(
        docs, n_bits=n_bits, id_col=id_col, text_col=text_col
    )
    groups = sigs.groupBy("sig").agg(F.collect_list(id_col).alias("docs"))
    bands = groups.select(
        "sig",
        "docs",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", width * k).bitwiseAND(F.lit(mask))
                    for k in range(n_bands)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    sig_pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.sig") < F.col("b.sig")),
        )
        .select(
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
            F.col("a.docs").alias("docs_a"),
            F.col("b.docs").alias("docs_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # multi-band dedup at sig level, BEFORE the doc expansion
        .dropDuplicates(["sig_a", "sig_b"])
    )
    cross = (
        sig_pairs.select("hamming", F.explode("docs_a").alias("x"), "docs_b")
        .select("hamming", "x", F.explode("docs_b").alias("y"))
        .select(
            F.least("x", "y").alias("doc_a"),
            F.greatest("x", "y").alias("doc_b"),
            "hamming",
        )
    )
    same = (
        groups.filter(F.size("docs") > 1)
        .select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(same)
