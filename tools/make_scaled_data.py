"""Build a ~10x-scaled measurement dataset from sf0.1 (VERDICT r12
order #5: the bench at sf0.1 is job-floor-bound — nearly every query
shows an 8-vs-32-core ratio <= 1 — so the 100 TB plan-shape arguments
had no measured parallel-speedup datapoint. This synthesizes one).

NOT part of the bench or the oracle gate: the driver's testdata under
/root/testdata is read-only and never touched; output goes to a
scratch dir and is used only by tools/measure_scaling.py to record
8-vs-32-core ratios for the heaviest queries in SCALING.md.

Scaling recipe (keeps each query's plan shape and avoids pathological
duplicate blowups):

- ``lineitem``: K copies with ``l_orderkey`` and ``l_partkey`` offset
  per copy -> K disjoint co-purchase subgraphs (graph queries see K x
  nodes/edges; basket-size distribution unchanged).
- ``documents``: K copies with ``doc_id`` offset and every lowercase
  token PREFIXED with a copy letter (a, b, c, ...) -> corpus and
  vocabulary both grow ~K x while near-duplicate clusters stay
  within-copy (pair outputs scale ~K x, not K^2 — duplicating text
  verbatim would make every doc a near-dup of its 9 clones and blow
  up q92/q120 output quadratically, which no real sf1 corpus does).
- every other table: copied as-is (dimensions; the heavy queries do
  not scale with them).

Usage: python tools/make_scaled_data.py [--factor 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from big_data_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfscaled")
    args = ap.parse_args()
    k = args.factor

    spark = get_spark("make-scaled-data")
    os.makedirs(args.out, exist_ok=True)

    for t in TABLES:
        src = f"{args.src}/{t}.parquet"
        dst = f"{args.out}/{t}.parquet"
        df = spark.read.parquet(src)
        if t == "lineitem":
            o_off = 10 ** 12
            p_off = 10 ** 9
            copies = [
                df.withColumn(
                    "l_orderkey", (F.col("l_orderkey") + F.lit(i * o_off)).cast("long")
                ).withColumn(
                    "l_partkey", (F.col("l_partkey") + F.lit(i * p_off)).cast("long")
                )
                for i in range(k)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        elif t == "documents":
            d_off = 10 ** 9
            # prefix every lowercase-run token with the copy letter so
            # vocab grows with the corpus and clones are NOT near-dups
            copies = []
            for i in range(k):
                pre = chr(ord("a") + i)
                c = df.withColumn(
                    "doc_id", (F.col("doc_id") + F.lit(i * d_off)).cast("long")
                )
                if i > 0:
                    c = c.withColumn(
                        "text",
                        F.regexp_replace(
                            F.col("text"), r"\b([a-z]+)\b", pre + r"$1"
                        ),
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
        out.coalesce(max(1, k // 2)).write.mode("overwrite").parquet(dst)
        print(f"{t}: {spark.read.parquet(dst).count()} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
