"""Corpus segmentation operators: stride chunking and C4-style
segment-level exact dedup.

Both are pure DataFrame transforms over a tokens array column, shared
by the registry queries (q106/q107) and any pipeline that needs the
operator directly. Reference anchor: the reference engine has no
corpus operators — these generalize its split/explode text handling
(train_gbt.py:59-62) to the training-data-pipeline surface.

Scale design (see SCALING.md):
- ``stride_chunks`` is explode+project — zero exchanges, fuses into
  the scan.
- ``segment_dedup`` elects first occurrences with a digest-only
  ``groupBy(md5).min(struct)`` aggregate (map-side combined); segment
  bodies shuffle exactly once, in the per-doc reassembly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_expr(tokens: Column, chunk_idx: Column, window: int, stride: int) -> Column:
    """The tokens of chunk ``chunk_idx``: a ``window``-token slice
    starting at ``chunk_idx * stride`` (0-based), clamped at the end
    of the document."""
    return F.slice(tokens, (chunk_idx * stride + 1).cast("int"), window)


def n_chunks_expr(tokens: Column, window: int, stride: int) -> Column:
    """Number of stride chunks: 1 for short docs, else enough for the
    last chunk to start within ``window`` of the end — every token is
    covered and no chunk starts past the end."""
    sz = F.size(tokens)
    return F.when(sz <= window, F.lit(1)).otherwise(
        F.ceil((sz - window) / F.lit(float(stride))).cast("int") + 1
    )


def stride_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "t",
    window: int = 30,
    stride: int = 20,
) -> DataFrame:
    """Sliding-window chunking: (id, chunk_idx, chunk<array<string>>)
    with ``window - stride`` tokens of overlap between neighbors and a
    possibly-short final chunk. Map-only (plan-asserted in
    tests/test_plans.py via q107)."""
    t = F.col(tokens_col)
    # guard: F.sequence(0, -1) yields a DESCENDING [0, -1] — an empty
    # or NULL tokens array (size(NULL) is -1 with ANSI off) must
    # produce zero chunks, not bogus ones
    idx_seq = F.when(F.size(t) <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks_expr(t, window, stride) - 1)
    )
    exploded = docs.select(
        id_col,
        tokens_col,
        F.explode(idx_seq).alias("chunk_idx"),
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        chunk_expr(F.col(tokens_col), F.col("chunk_idx"), window, stride).alias(
            "chunk"
        ),
    )


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "t",
    seg_len: int = 10,
) -> DataFrame:
    """C4-style segment-level exact dedup: cut docs into fixed
    ``seg_len``-token segments, keep each distinct segment text only
    at its first corpus occurrence (min (id, seg_idx)), reassemble
    docs from surviving segments. Docs whose every segment lost the
    election are dropped (C4 drops emptied docs).

    Returns (id, n_segs_kept, clean_text) — see q106 for the
    oracle-checked form and SCALING.md for the 100-TB argument
    (digest-only winner shuffle, bodies move once)."""
    t = F.col(tokens_col)
    nseg = F.ceil(F.size(t) / F.lit(float(seg_len))).cast("int")
    # guard: sequence(0, -1) is DESCENDING — empty or NULL docs
    # (size(NULL) is -1 with ANSI off) get no segments
    seg_arr = F.when(
        F.size(t) <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(
                " ", F.slice(t, (i * seg_len + 1).cast("int"), seg_len)
            ),
        )
    )
    segs = docs.select(
        id_col,
        F.posexplode(seg_arr).alias("seg_idx", "seg"),
    )
    winners = (
        segs.select(F.md5("seg").alias("h"), id_col, "seg_idx")
        .groupBy("h")
        .agg(F.min(F.struct(id_col, "seg_idx")).alias("w"))
        .select(
            F.col(f"w.{id_col}").alias(id_col),
            F.col("w.seg_idx").alias("seg_idx"),
        )
    )
    kept = segs.join(winners, [id_col, "seg_idx"], "left_semi")
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_segs_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda x: x["seg"],
            ),
        ).alias("clean_text"),
    )
