"""THE corpus quality/language gate expressions — single source of
truth.

q67 (batch corpus prep), q101 (per-source health rollup), and
streaming.corpus_quality_gates all apply the same token-count +
stopword-ratio quality gate and stopword-hit language gate. They used
to carry three hand-maintained copies; the stream==batch guarantee
("expression-identical by construction") only holds while no copy
drifts, so the expressions live HERE and every consumer builds from
them. All pure column expressions — valid on batch and streaming
DataFrames alike, fused into the scan by Catalyst.

Reference anchor: the gate thresholds model the minimal
quality/lang-ID stage of a training-corpus pipeline (SURVEY §2.13);
the reference repo has no corpus stage — these are the engine
generalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_TOKENS = 20
MAX_STOPWORD_RATIO = 0.5
MIN_EN_HIT_RATIO = 0.05
STOPWORDS = ("the", "a")
EN_MARKERS = ("the", "a", "value", "fast")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (the corpus pipelines' length basis)."""
    return F.size(F.split(text_col, " "))


def gate_counts(text_col: str = "text") -> tuple[Column, Column, Column]:
    """(n_tokens, n_stopword_hits, n_english_marker_hits)."""
    toks = F.split(text_col, " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    en_hits = F.size(F.filter(toks, lambda x: x.isin(*EN_MARKERS)))
    return n_tokens, n_stop, en_hits


def quality_lang_predicate(text_col: str = "text") -> Column:
    """True iff the document passes BOTH gates: long enough with a
    sane stopword ratio (quality) and enough English-marker hits
    (language)."""
    n_tokens, n_stop, en_hits = gate_counts(text_col)
    return (
        (n_tokens >= MIN_TOKENS)
        & (n_stop.cast("double") / n_tokens < MAX_STOPWORD_RATIO)
        & (en_hits.cast("double") / n_tokens >= MIN_EN_HIT_RATIO)
    )


def content_fingerprint(text_col: str = "text") -> Column:
    """md5 of normalized text — the exact-dedup identity used by q43,
    q67, the persistent dedup index, and the streaming ingest sink
    (identical everywhere so every dedup surface agrees on what
    "identical content" means)."""
    return F.md5(F.lower(F.trim(text_col)))
