"""Packed-shard writer stress: file-count vs shard-size tradeoff.

SCALING.md's shard section claims the q201 bench cost (~190 tiny
shard directories at sf0.1) is file-commit bound and amortizes when
``packs_per_shard`` sizes files realistically. This harness measures
it: the SAME packed frame written at a small and a large
packs_per_shard, reporting write wall, shard-file count, bytes, and
the full content-fingerprint verify wall (the auditor read).

One JSON line per cell:
  {"op": "shard_write", "packs_per_shard": N, "files": F,
   "write_s": W, "verify_content_s": V, "mb": MB}

Usage: python tools/stress_shards.py [n_packs] [seq_len] [n_sources]
                                     [pps_small] [pps_large]
Defaults 200_000 packs x 128 int32 ids, 8 sources, pps 16 vs 4096.
Single-shot timings on a cache-warmed input — scale datapoints, not
benchmarks (run idle). The packed frame is synthesized directly at
pack grain (deterministic ids from the pack key), so the measurement
isolates the WRITER, not pack_sequences.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.chunking import (
    read_packed_shards,
    write_packed_shards,
)
from big_data_spark.session import get_spark


def main() -> None:
    n_packs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_sources = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pps_small = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    pps_large = int(sys.argv[5]) if len(sys.argv) > 5 else 4096

    spark = get_spark("stress-shards")
    per_src = n_packs // n_sources
    packed = (
        spark.range(n_packs)
        .select(
            F.concat(F.lit("src"), (F.col("id") % n_sources)).alias("source"),
            (F.col("id") / n_sources).cast("long").alias("pack_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(seq_len)),
                lambda i: F.pmod(
                    F.hash(F.col("id") * 131 + i), F.lit(50_000)
                ).cast("int"),
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.lit(seq_len).cast("long"))
        .localCheckpoint(eager=True)
    )
    print(
        json.dumps(
            {
                "corpus": {
                    "packs": n_packs,
                    "packs_per_source": per_src,
                    "seq_len": seq_len,
                    "sources": n_sources,
                }
            }
        ),
        flush=True,
    )

    for pps in (pps_small, pps_large):
        out = tempfile.mkdtemp(prefix="stress_shards_")
        try:
            t0 = time.perf_counter()
            write_packed_shards(packed, out, packs_per_shard=pps)
            write_s = time.perf_counter() - t0
            files = glob.glob(
                os.path.join(out, "shards", "source=*", "shard=*", "*.parquet")
            )
            mb = sum(os.path.getsize(f) for f in files) / 1e6
            t0 = time.perf_counter()
            back = read_packed_shards(spark, out, verify="content")
            n = back.count()
            verify_s = time.perf_counter() - t0
            assert n == n_packs, (n, n_packs)
            print(
                json.dumps(
                    {
                        "op": "shard_write",
                        "packs_per_shard": pps,
                        "files": len(files),
                        "write_s": round(write_s, 2),
                        "verify_content_s": round(verify_s, 2),
                        "mb": round(mb, 1),
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
