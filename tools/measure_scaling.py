"""8-vs-32-core ratios at scaled volume (VERDICT r12 order #5).

Runs each named query in a FRESH subprocess per (query, cores) cell —
`SPARK_GRAFT_CPUS` is read at session creation, so the subprocess is
the only honest way to vary it — against the scaled dataset built by
tools/make_scaled_data.py. Prints one JSON line per cell and a final
ratio table. Measurement-only: never touches the bench or the oracle
path.

Usage:
  python tools/measure_scaling.py [--sf-dir /tmp/sfscaled] [--reps 2] q146 q154 ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from big_data_spark.queries import QUERIES
from big_data_spark.session import get_spark
name, sf_dir, reps = {name!r}, {sf_dir!r}, {reps}
spark = get_spark(f"scale-{{name}}")
fn = QUERIES[name].fn
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    times.append(round(time.perf_counter() - t0, 3))
print("CELL_JSON:" + json.dumps({{"name": name, "reps": times, "rows": n}}),
      flush=True)
spark.stop()
"""


def run_cell(name: str, cores: int, sf_dir: str, reps: int, timeout: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    code = CHILD.format(repo=str(REPO), name=name, sf_dir=sf_dir, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CELL_JSON:"):
            return json.loads(line[len("CELL_JSON:"):])
    raise RuntimeError(f"{name}@{cores}: no CELL_JSON (rc={out.returncode})\n"
                       + out.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/tmp/sfscaled")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    results = {}
    for name in args.names:
        row = {}
        for cores in (32, 8):
            load1 = round(os.getloadavg()[0], 2)
            t0 = time.perf_counter()
            try:
                cell = run_cell(name, cores, args.sf_dir, args.reps, args.timeout)
            except Exception as exc:
                print(f"{name}@{cores}: FAILED {exc}", file=sys.stderr)
                row[cores] = None
                continue
            row[cores] = min(cell["reps"])
            print(json.dumps({"name": name, "cores": cores,
                              "reps": cell["reps"], "rows": cell["rows"],
                              "load1_before": load1,
                              "wall": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        results[name] = row
    print("\nquery                              32c_best  8c_best  ratio(8c/32c)")
    for name, row in results.items():
        if row.get(32) and row.get(8):
            print(f"{name:34} {row[32]:8.2f} {row[8]:8.2f} {row[8]/row[32]:8.2f}")


if __name__ == "__main__":
    main()
