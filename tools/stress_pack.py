"""Sequence-packing stress harness: pack_sequences at token scale,
plus the measured A/B behind its one non-obvious plan decision — the
EXPLICIT (source, pack_id) repartition.

Catalyst elides the pack-level exchange if left alone: the doc-grain
window already hash-partitions on source, a SUBSET of the groupBy
keys, which satisfies the aggregate's clustering requirement — and
then every pack of a source re-assembles inside ONE task, capping the
token-grain stage's parallelism at #sources. pack_sequences forces
the exchange back (operators/chunking.py comment); this harness
measures both shapes on the same corpus so SCALING.md can state the
cost of the extra exchange and the cost of NOT paying it.

Measured, one JSON line each:

  pack_assign       q84's doc-grain assignment (window only — the
                    cheap path when downstream wants ids, not arrays)
  pack_assign_2pass the range-partitioned two-pass prefix sum — the
                    candidate upgrade for the doc-grain window's
                    known ceiling (VERDICT r11 "What's wrong" #3: the
                    running-sum window sorts each source's DOC rows
                    in ONE task). Pass 1: per-partition per-source
                    subtotals (bounded collect: partitions x
                    sources); pass 2: broadcast offsets + a window
                    WITHIN each (partition, source) — parallelism =
                    #partitions instead of #sources. Same cum values
                    (verified in-run against pack_assign's readout).
  pack_materialize  pack_sequences (explicit repartition — exchanges
                    = window + pack + none; parallelism = #packs)
  pack_elided       the identical pipeline MINUS the repartition
                    (Catalyst's preferred plan; parallelism =
                    #sources) — plan hash-exchange counts printed for
                    both so the elision is visible in the record

Usage: python tools/stress_pack.py [n_docs] [n_tokens] [n_sources]
                                   [seq_len]
Defaults 500_000 docs x 64 tokens, 4 sources, seq_len 512. Token
arrays are generated JVM-side and deterministic. Single-shot timings
on cache-warmed inputs — scale datapoints, not benchmarks (run idle).
Memory: the materialized packs live in one local-mode JVM; export
SPARK_GRAFT_DRIVER_MEM=16g at the default size (~32M tokens).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_spark.operators.chunking import pack_sequences
from big_data_spark.session import get_spark


def _force(df) -> float:
    """Materialize every pack's full contents (octet-sum over the
    joined arrays defeats any size()-only shortcut)."""
    t0 = time.perf_counter()
    df.select(
        F.sum(F.octet_length(F.concat_ws(" ", "tokens"))).alias("b")
    ).collect()
    return time.perf_counter() - t0


def _hash_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_sources = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    seq_len = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    spark = get_spark("stress-pack")
    docs = (
        spark.range(n_docs)
        .select(
            F.concat(F.lit("src"), (F.col("id") % n_sources)).alias("source"),
            F.col("id").alias("doc_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(n_tokens)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.hash(F.col("id") * 1000 + i), F.lit(50_000)),
                ),
            ).alias("doc_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    total = docs.select(F.sum(F.size("doc_tokens"))).collect()[0][0]
    print(
        json.dumps(
            {
                "corpus": {
                    "docs": n_docs,
                    "tokens": int(total),
                    "sources": n_sources,
                    "seq_len": seq_len,
                }
            }
        ),
        flush=True,
    )

    # 1) doc-grain assignment only (q84 shape)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t0 = time.perf_counter()
    assign = docs.select(
        "source",
        "doc_id",
        F.coalesce(F.sum(F.size("doc_tokens").cast("long")).over(w), F.lit(0)).alias(
            "cum"
        ),
    ).select(F.sum(F.floor(F.col("cum") / seq_len)).alias("x"))
    assign.collect()
    print(
        json.dumps(
            {"op": "pack_assign", "wall_s": round(time.perf_counter() - t0, 2)}
        ),
        flush=True,
    )

    # 1b) the two-pass range-partitioned prefix sum: same cum values,
    # #partitions-way parallel instead of one task per source
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.perf_counter()
    rp = (
        docs.repartitionByRange(nparts, "source", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids across reuse
    )
    subtotals = (
        rp.groupBy("_pid", "source")
        .agg(F.sum(F.size("doc_tokens").cast("long")).alias("s"))
        .collect()  # bounded: partitions x sources rows
    )
    per_src: dict[str, list[tuple[int, int]]] = {}
    for r in subtotals:
        per_src.setdefault(r["source"], []).append((r["_pid"], r["s"]))
    offsets = {}  # (pid, source) -> tokens before this partition
    for src, lst in per_src.items():
        acc = 0
        for pid, s in sorted(lst):
            offsets[(pid, src)] = acc
            acc += s
    off_items = [
        x
        for (pid, src), v in offsets.items()
        for x in (F.lit(f"{pid}|{src}"), F.lit(v))
    ]
    omap = F.create_map(*off_items)
    w2 = (
        Window.partitionBy("_pid", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum2 = rp.select(
        "source",
        "doc_id",
        (
            F.element_at(
                omap, F.concat_ws("|", F.col("_pid"), F.col("source"))
            )
            + F.coalesce(
                F.sum(F.size("doc_tokens").cast("long")).over(w2), F.lit(0)
            )
        ).alias("cum"),
    ).select(F.sum(F.floor(F.col("cum") / seq_len)).alias("x"))
    x2 = cum2.collect()[0][0]
    wall2 = time.perf_counter() - t0
    x1 = assign.collect()[0][0]  # re-read the 1-task readout to compare
    print(
        json.dumps(
            {
                "op": "pack_assign_2pass",
                "wall_s": round(wall2, 2),
                "partitions": nparts,
                "matches_window_readout": bool(x1 == x2),
            }
        ),
        flush=True,
    )

    # 2) pack_sequences (explicit pack-level repartition)
    packed = pack_sequences(docs, seq_len)
    wall = _force(packed)
    print(
        json.dumps(
            {
                "op": "pack_materialize",
                "hash_exchanges": _hash_exchanges(packed),
                "wall_s": round(wall, 2),
            }
        ),
        flush=True,
    )

    # 3) the elided plan: identical pipeline minus the repartition —
    # Catalyst reuses the window's hash(source) partitioning, so the
    # token-grain re-assembly runs #sources-wide
    with_cum = docs.select(
        "source",
        "doc_id",
        F.col("doc_tokens").alias("_toks"),
        F.coalesce(F.sum(F.size("doc_tokens").cast("long")).over(w), F.lit(0)).alias(
            "_cum_before"
        ),
    )
    toks = with_cum.select(
        "source",
        "_cum_before",
        F.posexplode("_toks").alias("_pos", "_tok"),
    ).select(
        "source",
        F.floor((F.col("_cum_before") + F.col("_pos")) / seq_len).alias("pack_id"),
        ((F.col("_cum_before") + F.col("_pos")) % seq_len).alias("_off"),
        "_tok",
    )
    elided = (
        toks.groupBy("source", "pack_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_off").alias("_o"), F.col("_tok").alias("_t"))
                    )
                ),
                lambda s: s["_t"],
            ).alias("tokens")
        )
    )
    wall = _force(elided)
    print(
        json.dumps(
            {
                "op": "pack_elided",
                "hash_exchanges": _hash_exchanges(elided),
                "wall_s": round(wall, 2),
            }
        ),
        flush=True,
    )
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
