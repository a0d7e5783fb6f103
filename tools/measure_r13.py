"""Round-13 optimization measurement harness (guide §1).

For each named query: time fn() construction (driver-side work —
training collects, bundle round-trips) separately from the timed
action, count Spark JOBS per phase via the status tracker
(deterministic — the r12 discipline: job counts are immune to host
noise), optionally run the action as the noop sink (guide §1.4), and
dump ``explain("formatted")`` to ``plans/r13/<name>_<tag>.txt``.

Usage:
  python tools/measure_r13.py [--tag before|after] [--reps N] q201 q191 ...
  python tools/measure_r13.py --tag before --all-bench

One fresh session for the whole run (matches the full-session bench
methodology); per-query numbers print as one JSON line each so runs
can be diffed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from big_data_spark.queries import QUERIES  # noqa: E402
from big_data_spark.session import get_spark  # noqa: E402


def resolve(prefixes: list[str]) -> list[str]:
    out = []
    for p in prefixes:
        hits = sorted(n for n in QUERIES if n == p or n.startswith(p))
        if not hits:
            raise SystemExit(f"no query matches {p!r}")
        out.extend(hits)
    return out


def _n_jobs(sc) -> int:
    tr = sc.statusTracker()
    return len(tr.getJobIdsForGroup(None) or [])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default=None, help="dump explain to plans/r13/<name>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--all-bench", action="store_true")
    ap.add_argument("--noop", action="store_true", help="also time the noop-sink action")
    args = ap.parse_args()

    names = resolve(args.names)
    if args.all_bench:
        import bench

        names = list(bench.BENCH_QUERIES)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure-r13")
    sc = spark.sparkContext
    plans_dir = Path(
        os.environ.get(
            "MEASURE_PLANS_DIR",
            Path(__file__).resolve().parent.parent / "plans" / "r13",
        )
    )
    if args.tag:
        plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = QUERIES[name].fn
        rows = []
        for rep in range(args.reps):
            j0 = _n_jobs(sc)
            sc.setJobDescription(f"{name}: construct")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _n_jobs(sc)
            sc.setJobDescription(f"{name}: count")
            n = df.count()
            t2 = time.perf_counter()
            j2 = _n_jobs(sc)
            noop_s = None
            noop_jobs = None
            if args.noop:
                sc.setJobDescription(f"{name}: noop")
                t3 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                noop_s = round(time.perf_counter() - t3, 3)
                noop_jobs = _n_jobs(sc) - j2
            sc.setJobDescription(None)
            rows.append(
                {
                    "rep": rep,
                    "construct_s": round(t1 - t0, 3),
                    "count_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "construct_jobs": j1 - j0,
                    "count_jobs": j2 - j1,
                    "noop_s": noop_s,
                    "noop_jobs": noop_jobs,
                    "rows": n,
                }
            )
            if args.tag and rep == 0:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(plans_dir / f"{name}_{args.tag}.txt", "w") as f:
                    f.write(buf.getvalue())
        print(json.dumps({"query": name, "reps": rows}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
