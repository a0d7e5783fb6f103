"""Unigram-LM trainer stress harness: train_unigram at a
production-shaped vocabulary (the stress_bpe bar: >=100k docs).

Uses stress_bpe's deterministic corpus generator (same word-identity
hashing, same spellings — cost depends on the distinct-word STATE
SIZE, which `vocab` pins exactly), then measures the stages the
100-TB argument makes claims about, one JSON line per phase:

  word_table      the one corpus-scale groupBy (docs -> vocab+counts)
  seed            unigram_seed_vocab: the substring-candidate agg +
                  per-length-class rank (all codegen) at seed_size
  train           the hard-EM loop: wall seconds, E-steps executed,
                  E-steps/s, final vocab, shrink trajectory —
                  separates the per-E-step cost (one Arrow-batched
                  Viterbi pass over the word table + one vocab-sized
                  agg) from the prune (driver-side dict over the
                  piece table)
  encode          apply_unigram over the full word table (the map-only
                  Arrow stage): words/s

Usage: python tools/stress_unigram.py [n_docs] [tokens_per_doc]
                                      [vocab] [pieces] [seed_mult]
Defaults 100_000 docs x 80 tokens, 20k word vocab, 4k target pieces,
seed = 4x pieces. Single-shot timings on cache-warmed inputs — scale
datapoints, not benchmarks (run idle; see SCALING.md "Noise floor").
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.tokenizer import bpe_word_table
from big_data_spark.operators.unigram import (
    apply_unigram,
    train_unigram,
    unigram_seed_vocab,
)
from big_data_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    pieces_target = int(sys.argv[4]) if len(sys.argv) > 4 else 4_000
    seed_mult = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    max_piece_len = 8

    spark = get_spark("stress-unigram")

    # stress_bpe's deterministic generator (16-letter md5-hex
    # spellings, 4-8 chars): partition-independent word identities,
    # engine-portable spellings
    wid = F.pmod(
        F.xxhash64(F.col("doc") * 1315423911 + F.col("p")), F.lit(vocab)
    )
    spell = F.translate(
        F.md5(wid.cast("string")), "0123456789", "ghijklmnop"
    ).substr(F.lit(1), (F.lit(4) + F.pmod(wid, F.lit(5))).cast("int"))
    docs = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc"))
        .select(
            "doc",
            F.explode(F.sequence(F.lit(0), F.lit(n_tokens - 1))).alias("p"),
        )
        .select("doc", spell.alias("w"))
        .groupBy("doc")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
        .localCheckpoint(eager=True)
    )
    n = docs.count()

    t0 = time.perf_counter()
    words = bpe_word_table(docs, token_pattern="^[a-z]+$").localCheckpoint(
        eager=True
    )
    n_words = words.count()
    print(
        json.dumps(
            {
                "op": "word_table",
                "wall_s": round(time.perf_counter() - t0, 2),
                "docs": n,
                "corpus_tokens": n_docs * n_tokens,
                "distinct_words": n_words,
            }
        ),
        flush=True,
    )

    seed_size = seed_mult * pieces_target
    t0 = time.perf_counter()
    n_seed = unigram_seed_vocab(
        words, seed_size=seed_size, max_piece_len=max_piece_len
    ).count()
    print(
        json.dumps(
            {
                "op": "seed",
                "wall_s": round(time.perf_counter() - t0, 2),
                "seed_size": seed_size,
                "seed_pieces": n_seed,
            }
        ),
        flush=True,
    )

    t0 = time.perf_counter()
    model = train_unigram(
        words,
        vocab_size=pieces_target,
        seed_size=seed_size,
        max_piece_len=max_piece_len,
        em_iters=2,
    )
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "train",
                "wall_s": round(wall, 2),
                "vocab_size_target": pieces_target,
                "final_pieces": len(model),
                "em_steps": model.em_rounds,
                "em_steps_per_s": round(model.em_rounds / wall, 3),
                "shrink_trajectory": list(model.vocab_sizes),
                "top_pieces": [
                    (p.piece, p.count) for p in model[:5]
                ],
            }
        ),
        flush=True,
    )

    t0 = time.perf_counter()
    lut = apply_unigram(words, model).localCheckpoint(eager=True)
    n_enc = lut.count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "encode",
                "wall_s": round(wall, 2),
                "words_encoded": n_enc,
                "words_per_s": round(n_enc / wall),
            }
        ),
        flush=True,
    )

    # corpus-scale encode (q192's path): broadcast the vocab-sized
    # LUT back onto the full corpus with per-doc re-assembly — the
    # stage whose cost DOES scale with corpus bytes, measured so the
    # per-doc overhead is a number, not a guess
    from big_data_spark.operators.tokenizer import encode_corpus

    t0 = time.perf_counter()
    enc = encode_corpus(
        docs,
        lut,
        id_col="doc",
        pieces_col="pieces",
        token_pattern="^[a-z]+$",
    )
    # aggregate over the OUTPUT column: a bare count() lets column
    # pruning drop the piece-array assembly entirely (measured: 0.47 s
    # "encoding" 1M docs — a pruned plan, not a datapoint)
    row = enc.agg(
        F.count("*").alias("docs"),
        F.sum(F.size("doc_tokens")).alias("pieces"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "encode_corpus_join",
                "wall_s": round(wall, 2),
                "docs_encoded": row["docs"],
                "pieces_emitted": row["pieces"],
                "docs_per_s": round(row["docs"] / wall),
                "corpus_tokens_per_s": round(row["docs"] * n_tokens / wall),
            }
        ),
        flush=True,
    )

    t0 = time.perf_counter()
    enc_m = encode_corpus(
        docs,
        lut,
        id_col="doc",
        pieces_col="pieces",
        token_pattern="^[a-z]+$",
        strategy="map",
    )
    row = enc_m.agg(
        F.count("*").alias("docs"),
        F.sum(F.size("doc_tokens")).alias("pieces"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "encode_corpus_map",
                "wall_s": round(wall, 2),
                "docs_encoded": row["docs"],
                "pieces_emitted": row["pieces"],
                "docs_per_s": round(row["docs"] / wall),
                "corpus_tokens_per_s": round(row["docs"] * n_tokens / wall),
            }
        ),
        flush=True,
    )
    print("STRESS_UNIGRAM_DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
