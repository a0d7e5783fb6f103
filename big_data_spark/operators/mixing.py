"""Weighted corpus mixing — deterministic source-proportional sampling.

The standard training-data mixing step: each source in a corpus gets a
weight in basis points (10_000 bp = 1.0 epoch). Weights below 10_000
downsample the source, weights above upsample it (full repeat copies
plus a hash-selected fractional remainder). Selection is a pure hash
predicate on (salt, source, key) — deterministic, seedless, replayable
by any engine, and stable under reshuffles/retries, which per-partition
RNG sampling is not.

Scale notes (100 TB):
- The weights table is tiny (one row per source) and broadcast; the
  docs side is never shuffled — mixing is a map-only stage fused into
  the scan, so it composes with downstream ops at zero extra cost.
- The hash bucket is md5-derived (cross-engine reproducible; see the
  determinism rules in ``queries.py``). In a Spark-only pipeline
  ``xxhash64`` would be ~4x cheaper per row — the operator takes a
  ``bucket_expr`` hook for that swap.
- Upsampled copies materialize as an exploded ``copy_id`` so that a
  downstream global shuffle (e.g. repartition by random key for
  training-order mixing) spreads repeats across partitions.

Reference anchor: the reference's only sampling surface is
``randomSplit`` (train_gbt.py:139); source-weighted mixing is the
scale generalization a corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000
# Hashed in place of a NULL stratum/key so null rows split
# proportionally instead of funneling into one split (collision with a
# real value of the same spelling is accepted and documented).
NULL_SENTINEL = "__NULL__"


def mix_bucket(source: Column, key: Column, salt: str = "mix") -> Column:
    """Deterministic bucket in [0, 10000) from (salt, source, key).

    md5 -> first 8 hex chars -> int % 10000; identical in DuckDB as
    ``('0x' || substring(md5(...), 1, 8))::BIGINT % 10000``.

    8 hex chars (32 bits), not 4: 2^16 % 10000 != 0, so a 16-bit
    bucket has a ~1.7pp systematic modulo bias (buckets 0-5535 land
    7/65536 of keys, the rest 6/65536 — an 80/10/10 split would
    really be 81.7/9.2/9.2). With 32 bits the residual bias is
    2^32 mod 10000 = 7296 parts in 4.3e9 (~2e-6): negligible.
    """
    h = F.md5(F.concat_ws(":", F.lit(salt), source, key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def weighted_mix(
    docs: DataFrame,
    weights: DataFrame,
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
    weight_col: str = "weight_bp",
    salt: str = "mix",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Sample/repeat ``docs`` per-source according to ``weights``.

    ``weights`` has one row per source: (source_col, weight_col in
    basis points). A doc with weight w gets ``w // 10000`` full copies
    plus one more iff ``bucket < w % 10000``. Emits the input columns
    plus ``copy_id`` (1..n, long).
    """
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else mix_bucket(F.col(source_col), F.col(key_col), salt)
    )
    n_copies = (
        F.floor(F.col(weight_col) / BUCKETS)
        + F.when(bucket < F.col(weight_col) % BUCKETS, 1).otherwise(0)
    ).cast("long")
    one = F.lit(1).cast("long")
    copies = F.when(
        n_copies >= one, F.sequence(one, n_copies)
    ).otherwise(F.array().cast("array<long>"))
    return (
        docs.join(F.broadcast(weights), on=source_col, how="inner")
        .withColumn("copy_id", F.explode(copies))
        .drop(weight_col)
    )


def stratified_split(
    df: DataFrame,
    *,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (
        ("train", 8000),
        ("valid", 1000),
        ("test", 1000),
    ),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic stratified train/valid/test assignment.

    The corpus generalization of the reference's ``randomSplit``
    (train_gbt.py:139): every row gets a named split, with the given
    basis-point proportions holding *within each stratum* (hash
    buckets are uniform per (stratum, key)), not just globally.
    Pure column expression — map-only, fuses into the scan, stable
    under retries, and any engine can replay the assignment from the
    same md5 predicate (no RNG state).

    NULL handling: a NULL stratum or key is hashed as the sentinel
    ``__NULL__`` (so null-stratum rows still split 80/10/10 among
    themselves instead of all landing in the last split). An oracle
    replaying the assignment must apply the same
    ``COALESCE(col, '__NULL__')`` — plain SQL ``||`` propagates NULL
    while Spark's concat_ws skips it, so un-guarded expressions
    diverge between engines.
    """
    total = sum(bp for _, bp in splits)
    if total != BUCKETS:
        raise ValueError(f"split fractions must sum to {BUCKETS} bp, got {total}")
    if len(splits) == 1:
        return df.withColumn(split_col, F.lit(splits[0][0]))
    stratum = F.coalesce(F.col(stratum_col).cast("string"), F.lit(NULL_SENTINEL))
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(NULL_SENTINEL))
    bucket = mix_bucket(stratum, key, salt)
    col = None
    acc = 0
    for name, bp in splits[:-1]:
        acc += bp
        col = (F.when if col is None else col.when)(bucket < acc, name)
    col = col.otherwise(splits[-1][0])
    return df.withColumn(split_col, col)


def token_budget_mix(
    docs: DataFrame,
    budget_tokens: int,
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    salt: str = "budget",
) -> DataFrame:
    """Budget-based corpus mixing: split a global token budget equally
    across sources and keep each doc with its source's take fraction
    ``min(1, (budget/#sources)/source_tokens)`` via the deterministic
    hash bucket — the "give me N training tokens, balanced across
    sources" complement of rate-based ``weighted_mix``.

    Budget a source can't fill is NOT redistributed (single-pass
    determinism; redistribution would make every source's sample
    depend on every other source's size). Two tiny aggregates (per-
    source token totals, source count) broadcast back as the fraction
    dim; the corpus-side predicate is map-only and retry-stable.

    NULL handling: NULL-source rows are excluded BEFORE the totals
    aggregate (so they neither receive a budget slice that could
    never be spent nor dilute real sources' shares) and the inner
    equi-join back drops them from the output — identical in Spark
    and SQL replays, pinned by test. Coalesce to a sentinel upstream
    if NULL-source docs must sample.
    """
    totals = (
        docs.filter(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.sum(tokens_col).alias("_tot"))
    )
    ns = totals.agg(F.count("*").alias("_ns"))
    fracs = totals.crossJoin(F.broadcast(ns)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget_tokens)) / F.col("_ns") / F.col("_tot"),
        ).alias("_take_frac"),
    )
    bucket = mix_bucket(F.col(source_col), F.col(key_col), salt)
    return (
        docs.join(F.broadcast(fracs), source_col)
        .filter(bucket < F.col("_take_frac") * BUCKETS)
        .drop("_take_frac")
    )
