"""Native column-expression helpers.

Policy (SURVEY.md §2.11): the reference's three Python scalar UDFs
(cosine similarity ml_skills_recommendation.pyc:38, token filter
:202/:263, skill-set overlap :504) are re-expressed as built-in /
higher-order functions so they stay inside whole-stage codegen. At
100 TB the difference between a JVM expression and a row-at-a-time
Python UDF on these hot paths is ~10-100x.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance of two array<numeric> columns
    (JVM-side fold in array order — deterministic, no shuffle)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns.

    Replaces the reference's numpy UDF (ml_skills_recommendation
    .pyc:38 compute_cosine_similarity) with a codegen-friendly
    expression; null/zero-norm inputs yield NULL like the UDF's 0-div
    guard.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def clean_tokens(tokens: Column, min_len: int = 2) -> Column:
    """Trim tokens and drop short ones.

    Replaces the token-filter UDF (ml_skills_recommendation.pyc:202):
    [t.strip() for t in tokens if len(t.strip()) > 2] — expressed with
    higher-order transform/filter.
    """
    trimmed = F.transform(tokens, lambda t: F.trim(t))
    return F.filter(trimmed, lambda t: F.length(t) > min_len)


def set_overlap_ratio(user_skills: Column, job_skills: Column) -> Column:
    """|user ∩ job| / |job| set-overlap score.

    Replaces calculate_skill_match (ml_skills_recommendation.pyc:504)
    with array_intersect/size built-ins.
    """
    jsize = F.size(F.array_distinct(job_skills))
    return F.when(
        jsize > 0,
        F.size(F.array_intersect(F.array_distinct(user_skills), job_skills))
        / jsize.cast("double"),
    ).otherwise(F.lit(0.0))


def minhash(tokens: Column, seed: int) -> Column:
    """One MinHash value: lexicographic min of md5(token || seed).

    md5 is available with identical semantics in DuckDB, making the
    signature oracle-checkable — a deliberate choice over xxhash64
    (whose seeds/implementation differ across engines).
    """
    return F.array_min(
        F.transform(tokens, lambda t: F.md5(F.concat(t, F.lit(f"#{seed}"))))
    )


def minhash_slices(token_hashes: Column, k: int = 4) -> list[Column]:
    """k MinHash lanes from pre-hashed tokens (array of md5 hex).

    Each lane takes the min over a disjoint 8-hex-char slice of the
    token digest — statistically independent permutations at a quarter
    of the hashing cost of per-seed md5 (the hot-path variant used by
    the LSH dedup stage; ``minhash`` remains the per-seed reference
    form). Callers materialize ``transform(tokens, md5)`` once and
    pass that column in. k <= 4 fits in one 32-char md5.
    """
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (one md5 yields 4 lanes)")
    return [
        F.array_min(F.transform(token_hashes, lambda h: F.substring(h, 1 + 8 * i, 8)))
        for i in range(k)
    ]


# PII patterns (corpus-scrub stage): RE2-safe subsets so the DuckDB
# oracle replays them byte-identically (Java regex and RE2 agree on
# these constructs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in a text column — native
    regexp_extract_all, no Python in the scan."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))).cast("long"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))).cast("long"),
    )


def redact_pii(text: Column) -> Column:
    """Replace every email/phone match with a typed placeholder —
    the standard pre-training scrub step, as a pure column expression
    (fuses into the scan; at 100 TB this is a zero-shuffle map)."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def shingles(tokens: Column, k: int = 3) -> Column:
    """k-token shingles of an array<string> column (native, no UDF)."""
    n = F.size(tokens)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, (i + j).cast("int")) for j in range(k)]
            ),
        ),
    ).otherwise(F.array())
