"""Dedup-family stress harness: the production dedup paths on a
synthetic 500k-doc corpus (~100x sf0.1's documents table).

Generates a deterministic corpus with planted near-duplicates (20% of
docs copy their predecessor's 60-token stream with 3 token edits) and
measures, one JSON line each:

  exact_dedup      md5-fingerprint winner election (q43 shape)
  lsh_bands        _lsh_bands_of build (the q46/q47/q66 signature
                   stage, verbatim import — the deployed expressions)
  lsh_group        q47's full single-round grouping: band reps ->
                   doc-min join -> survivors (the linear 100-TB path)
  lsh_prop_round   ONE q66 label-propagation round (bmin + doc-min,
                   two hash shuffles) — per-round fixpoint cost
  simhash_pairs    operators.simhash.simhash_hamming_pairs at
                   n_bits=64/4x16 bands (the documented >=10^6-doc
                   scale form; 8-bit bands would go quadratic in the
                   256-bucket candidate sets at this signature count)

Usage: python tools/stress_dedup.py [n_docs] [n_tokens] [vocab]
Defaults 500_000 docs x 60 tokens, 50k vocab. Single-shot timings on
cache-warmed inputs — scale datapoints, not benchmarks.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.dedup_index import fingerprint
from big_data_spark.operators.simhash import simhash_hamming_pairs
from big_data_spark.queries import _lsh_bands_of
from big_data_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    spark = get_spark("stress-dedup")

    # Deterministic corpus: doc d's token at position p hashes from
    # (source_doc, p); docs with d % 5 == 0 copy doc d-1 except the
    # first 3 positions (a planted ~20% near-dup rate with small
    # edits — exactly what banded near-dup exists to catch).
    is_dup = F.col("id") % 5 == 0
    src_doc = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    tok = lambda d, p: F.concat(  # noqa: E731
        F.lit("t"),
        F.pmod(F.xxhash64(d * 131 + p), F.lit(vocab)).cast("string"),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tokens - 1)),
                    lambda p: F.when(is_dup & (p < 3), tok(F.col("id"), p))
                    .otherwise(tok(src_doc, p)),
                ),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    print(json.dumps({"corpus": {"docs": n, "tokens_per_doc": n_tokens,
                                 "vocab": vocab, "planted_dup_rate": 0.2}}),
          flush=True)

    def timed(op, fn):
        t0 = time.perf_counter()
        extra = fn()
        out = {"op": op, "wall_s": round(time.perf_counter() - t0, 2)}
        out.update(extra)
        print(json.dumps(out), flush=True)

    # exact dedup: fingerprint digest -> winner election (q43 shape);
    # planted dups have edits, so this only collapses exact repeats
    def _exact():
        fp = fingerprint(docs)
        survivors = (
            fp.groupBy("fingerprint")
            .agg(F.min("doc_id").alias("keep"))
            .count()
        )
        return {"survivors": survivors}

    timed("exact_dedup", _exact)

    # LSH band signatures (deployed expressions, verbatim)
    bands = None

    def _bands():
        nonlocal bands
        bands = _lsh_bands_of(docs).localCheckpoint(eager=True)
        return {"band_rows": bands.count()}

    timed("lsh_bands", _bands)

    # q47 single-round grouping over the materialized bands
    def _group():
        reps = bands.groupBy("band_idx", "band").agg(
            F.min("doc_id").alias("rep")
        )
        grouped = (
            bands.join(reps, ["band_idx", "band"])
            .groupBy("doc_id")
            .agg(F.min("rep").alias("rep"))
        )
        kept = grouped.filter(F.col("doc_id") == F.col("rep")).count()
        return {"survivors": kept}

    timed("lsh_group", _group)

    # one q66 label-propagation round (two hash shuffles)
    def _prop():
        labels = bands.select("doc_id").distinct().withColumn(
            "label", F.col("doc_id")
        )
        bmin = (
            bands.join(labels, "doc_id")
            .groupBy("band_idx", "band")
            .agg(F.min("label").alias("bmin"))
        )
        doc_min = (
            bands.join(bmin, ["band_idx", "band"])
            .groupBy("doc_id")
            .agg(F.min("bmin").alias("nl"))
        )
        return {"docs_relabeled": doc_min.filter(
            F.col("nl") != F.col("doc_id")
        ).count()}

    timed("lsh_prop_round", _prop)

    # SimHash banded pair enumeration, 64-bit scale form
    def _simhash():
        pairs = simhash_hamming_pairs(docs, n_bits=64, n_bands=4,
                                      max_hamming=3)
        return {"pairs": pairs.count()}

    timed("simhash_pairs", _simhash)
    spark.stop()


if __name__ == "__main__":
    main()
