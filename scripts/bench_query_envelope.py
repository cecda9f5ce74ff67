"""Multi-run envelope study for one headline query across scale points
(the r6 q7/q18 methodology, made a reusable tool — VERDICT r7 #4 asks it
for ``similarity_topk_cosine``).

For each scale dir, runs ``--runs`` FRESH interpreter/JVM processes,
each measuring the query's cold build + ``--reps`` steady plan-reuse
re-executions through the noop sink (bench.py's exact protocol). Prints
one JSON line per (dir, run) and a final summary line with the pooled
per-dir envelopes and the growth-ratio spread — the artifact that
classifies a ×-ratio as run variance (ratios of medians inside the
cross-run envelope) vs a real scale problem (entire envelope clear of
the data ratio).

Usage:
  python scripts/bench_query_envelope.py QUERY DIR [DIR ...]
      [--runs 3] [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from restaurant_etl_spark.operators.registry import load_all
from restaurant_etl_spark.session import get_spark
from restaurant_etl_spark.sources.tables import load_table

spark = get_spark("envelope")
spec = load_all()[{query!r}]
load_table(spark, {sf_dir!r}, "embeddings").count()  # warm file listing
t0 = time.time()
df = spec.fn(spark, {sf_dir!r})
df.write.format("noop").mode("overwrite").save()
cold = time.time() - t0
reps = []
for _ in range({reps}):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    reps.append(time.time() - t0)
print(json.dumps({{"cold": round(cold, 3),
                  "reps": [round(r, 3) for r in reps]}}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    per_dir: dict[str, list[float]] = {}
    medians: dict[str, list[float]] = {}
    for d in args.dirs:
        for run in range(args.runs):
            code = _WORKER.format(repo=REPO, query=args.query, sf_dir=d,
                                  reps=args.reps)
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True, cwd=REPO,
                                 timeout=3600)
            if out.returncode != 0:
                print(out.stderr[-2000:], file=sys.stderr)
                return 1
            r = json.loads(out.stdout.strip().splitlines()[-1])
            per_dir.setdefault(d, []).extend(r["reps"])
            medians.setdefault(d, []).append(
                round(statistics.median(r["reps"]), 3))
            print(json.dumps({"dir": d, "run": run, "cold": r["cold"],
                              "median": medians[d][-1],
                              "min": min(r["reps"]), "max": max(r["reps"])}),
                  flush=True)

    summary = {"query": args.query, "reps_per_run": args.reps,
               "runs": args.runs, "dirs": {}}
    for d in args.dirs:
        pool = per_dir[d]
        summary["dirs"][d] = {
            "run_medians": medians[d],
            "pooled_median": round(statistics.median(pool), 3),
            "envelope": [min(pool), max(pool)],
        }
    if len(args.dirs) == 2:
        a, b = args.dirs
        ma, mb = summary["dirs"][a], summary["dirs"][b]
        summary["growth"] = {
            "median_ratio": round(mb["pooled_median"] / ma["pooled_median"], 2),
            # spread of ratios across every (run_a, run_b) median pairing —
            # the honest variance band on the ratio itself
            "ratio_min": round(min(mb["run_medians"]) / max(ma["run_medians"]), 2),
            "ratio_max": round(max(mb["run_medians"]) / min(ma["run_medians"]), 2),
        }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
