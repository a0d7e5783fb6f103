"""BPE-trainer stress harness: train_bpe at a production-shaped
vocabulary (VERDICT r08 order #1's "done" bar: >=100k docs, merges/s).

Generates a deterministic corpus (docs of synthetic words drawn
Zipf-ish from a character-level generator, so adjacent-pair structure
exists to merge), builds the distinct-word table once (the corpus-
scale pass), then measures the TRAINING LOOP itself, one JSON line
per phase:

  word_table      the one corpus-scale groupBy (docs -> vocab+counts)
  train_k{K}      train_bpe at merges_per_round=K: wall seconds,
                  merges learned, rounds executed, merges/s —
                  separates the per-round fixed cost (one vocab-local
                  agg + one bounded collect, ~constant) from the
                  per-merge cost (one map-only replace), which is why
                  K=16 should approach K=1's per-merge cost / 16.

  encode_replay_m{M} / encode_trie_m{M}
                  the encode A/B (VERDICT r09 order #1): apply_bpe's
                  merge REPLAY (O(M) replace scans + an eager
                  localCheckpoint per REPLACE_DEPTH_CAP=96 merges)
                  vs encode_longest_match's greedy TRIE pass (one
                  Arrow map-only stage, cost independent of M), both
                  encoding the full distinct-word table against an
                  M-merge table. The table is the trained sequence
                  extended with never-matching synthetic merges
                  (symbols over the unused letter 'z') up to M —
                  provenance doesn't change either encoder's cost
                  model, only table SIZE does. total_pieces is
                  reported for both (they may differ: longest-match
                  is not replay — the divergence is documented in
                  operators/tokenizer.py).

Usage: python tools/stress_bpe.py [n_docs] [tokens_per_doc] [vocab]
                                  [num_merges] [alphabet]
                                  [encode_targets]
Defaults 100_000 docs x 80 tokens, 20k word vocab, 64 merges,
16-letter alphabet (md5-hex spellings), encode_targets 2048,32768
('' skips the A/B). alphabet=26 switches to per-character hashed
spellings over a-z — the knob that tests whether the non-overlap
filter's round fill is alphabet-bound. Single-shot timings on
cache-warmed inputs — scale datapoints, not benchmarks (run idle;
see SCALING.md "Noise floor").
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.tokenizer import (
    BPEMerge,
    apply_bpe,
    bpe_vocab_pieces,
    bpe_word_table,
    encode_longest_match,
    train_bpe,
)
from big_data_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    num_merges = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    alphabet = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    encode_targets = [
        int(x)
        for x in (sys.argv[6] if len(sys.argv) > 6 else "2048,32768").split(",")
        if x
    ]

    spark = get_spark("stress-bpe")

    # Deterministic corpus. Word identities hash uniformly from
    # (doc, position) — the knob that matters for training cost is
    # the distinct-word STATE SIZE, which this pins exactly at
    # `vocab`. Word SPELLINGS are the word id's md5 hex with digits
    # translated to letters (a 16-letter lowercase alphabet, 4-8
    # chars), so pair statistics are realistic in size without
    # mattering in content — this harness measures COST, not merge
    # quality. xxhash64 on derived literals is partition-independent
    # (the stress_graph lesson); md5 keeps spellings engine-portable.
    wid = F.pmod(
        F.xxhash64(F.col("doc") * 1315423911 + F.col("p")), F.lit(vocab)
    )
    if alphabet == 16:
        spell = F.translate(
            F.md5(wid.cast("string")), "0123456789", "ghijklmnop"
        ).substr(F.lit(1), (F.lit(4) + F.pmod(wid, F.lit(5))).cast("int"))
    else:
        # per-character hashed spelling over an `alphabet`-letter
        # lowercase range; lives only in the (checkpointed, untimed)
        # generator, so the transform lambda's CodegenFallback cost
        # never touches a measured phase
        spell = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(3) + F.pmod(wid, F.lit(5))),
                lambda d: F.char(
                    F.lit(97)
                    + F.pmod(F.xxhash64(wid * 53 + d), F.lit(alphabet)).cast(
                        "int"
                    )
                ),
            ),
        )
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

    for k in (1, 16, 64, 256):
        if k > num_merges:
            continue
        t0 = time.perf_counter()
        merges = train_bpe(
            words, num_merges=num_merges, merges_per_round=k
        )
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": f"train_k{k}",
                    "wall_s": round(wall, 2),
                    "merges_per_round": k,
                    "merges_learned": len(merges),
                    "merges_per_s": round(len(merges) / wall, 2),
                    # the non-overlap filter's fill curve: how many
                    # merges each round actually picked — measures
                    # whether large k fills as the symbol inventory
                    # grows (SCALING.md's round-fill claim)
                    "rounds": merges.last_rounds,
                    "round_picks": list(merges.round_picks),
                    "first_merges": [
                        (m.left, m.right, m.n) for m in merges[:5]
                    ],
                }
            ),
            flush=True,
        )

    # ---- encode A/B: merge replay vs greedy longest-match (trie) ----
    for target in encode_targets:
        if target <= len(merges):
            table = list(merges[:target])
        else:
            # pad with never-matching merges over the unused letter
            # 'z': replay still pays one replace scan (and its share
            # of depth-cap checkpoints) per merge — exactly the cost
            # a real 32k table charges — while the trie encoder's
            # cost stays bound by word length x max piece length.
            table = list(merges) + [
                BPEMerge(
                    rank=len(merges) + i + 1,
                    left=f"z{i}",
                    right="zz",
                    merged=f"z{i}zz",
                    n=0,
                )
                for i in range(target - len(merges))
            ]
        t0 = time.perf_counter()
        enc = apply_bpe(words, table)
        replay_pieces = enc.agg(
            F.sum(F.size("bpe_tokens")).alias("p")
        ).collect()[0]["p"]
        print(
            json.dumps(
                {
                    "op": f"encode_replay_m{target}",
                    "wall_s": round(time.perf_counter() - t0, 2),
                    "merge_table": target,
                    "words_encoded": n_words,
                    "total_pieces": int(replay_pieces),
                }
            ),
            flush=True,
        )
        t0 = time.perf_counter()
        pieces = bpe_vocab_pieces(words, table)
        trie = encode_longest_match(words, pieces)
        trie_pieces = trie.agg(
            F.sum(F.size("lm_tokens")).alias("p")
        ).collect()[0]["p"]
        print(
            json.dumps(
                {
                    "op": f"encode_trie_m{target}",
                    "wall_s": round(time.perf_counter() - t0, 2),
                    "merge_table": target,
                    "vocab_pieces": len(pieces),
                    "words_encoded": n_words,
                    "total_pieces": int(trie_pieces),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
