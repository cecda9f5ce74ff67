"""SF-scaling curve (round-2 directive #7): run the headline bench at every
available scale factor and report how steady-state time grows with data
size. Near-linear growth (slope ≈ sf ratio on scan-bound queries, flatter
on small-output aggregations) is the evidence that the plans would survive
a 100× scale-up; any query whose time grows FASTER than the data is a
scale-killer candidate.

Usage: python scripts/bench_scaling.py [sf_dir ...] [--skew-dirs d1,d2,...]
       python scripts/bench_scaling.py --skew-only d1,d2   # re-bench ONLY the
         skew points and splice the skew section + narrative into the
         existing SCALING.md (uniform tables untouched)
       python scripts/bench_scaling.py --decade-only d1,d2  # bench ONE extra
         decade (e.g. sf1 -> sf10, VERDICT r8 #1) and splice its per-query
         growth section into the existing SCALING.md; an existing section
         for the same decade is replaced in place. Export SPARK_DRIVER_MEM
         (48g for sf10) and SPARK_GRAFT_BENCH_ITERS before running.

Scale-point dirs MUST contain a parseable "sf<N>" token (bench.py derives
the scale factor from the path: spark_graft_sf1, spark_graft_sf0.1skew);
a name like skew_sf01 parses as sf=1 and corrupts the growth ratios.
Writes SCALING.md at the repo root and prints one JSON line per SF.

``--skew-dirs`` additionally benches scale points synthesized with
``make_sfN.py --skew`` (power-law dup clusters, hot source, hot join
key) and appends a "Skewed-corpus decade" section — the proof that the
growth claims hold on a HOSTILE distribution, not just the uniform one
(VERDICT r6 #3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run_bench(sf_dir: str, timeout: int | None = None) -> dict:
    """Each SF runs in a FRESH interpreter/JVM so no cache, no broadcast
    reuse, and no shuffle files leak between scale points.

    Default timeout scales with SPARK_GRAFT_BENCH_ITERS (ADVICE r9):
    bench.py's envelope triage can append up to 2×steady_iters extra reps
    per out-of-band query, so a fixed 3600 s could newly kill a scale
    point with several flagged multi-second queries and lose the whole
    point's measurements."""
    if timeout is None:
        iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
        timeout = 3600 * max(1, (iters + 4) // 5) * 2
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed for {sf_dir} (rc={out.returncode}); "
            f"stderr tail: {out.stderr.strip()[-2000:]}"
        )
    return json.loads(lines[-1])


#: interpretation narrative preserved across regenerations (r6)
_NARRATIVE = """## The sf=1.0 scale point

sf1 (~6M lineitem rows, 50k docs, 20k vectors) is synthesized by
`scripts/make_sfN.py`: 10 key-remapped copies of sf0.1 with disjoint
per-domain key ranges (FK joins stay consistent), per-copy token suffixes
on document text and a per-copy rotation of embeddings — so duplicate /
near-neighbor RATES stay at source-corpus levels instead of exploding
with the multiplier. Dimensions (region/nation) are not duplicated.

## Reading the 0.1 -> 1.0 growth column (r6)

Data grows 10x, so <=10x growth = at-or-below linear scaling.

- **similarity_topk_cosine was FIXED in r6: 109x (r5) -> ~8.5x.** The
  r5 scale-killer was the query fixture (every 100th vec_id, so query
  count grew with the corpus and work was q x n ∝ n²). The query set is
  now capped at N_QUERIES=128 ids (`similarity.py:QUERY_ID_CAP`,
  mirrored in the DuckDB oracle; inactive below ~sf0.64 so all oracle
  hashes are unchanged) — the brute-force baseline scans O(corpus).
  The IVF probe fixtures share the cap.
- The exact inverted-index family (ngram Jaccard / containment /
  incremental batch, rewritten r6 to count capped commons directly +
  pair-driven hot correction) is linear: work ∝ Σ below-cap df² with
  the DF cap bounding every posting list.
- **`dedup_embedding_keep` is the corpus-adaptive band-width path
  (promoted r7; widened r8, VERDICT r7 #1)**: B = clamp(bit_length(n),
  8, 32) over a 64-bit hyperplane signature, resolved to a plan-time
  constant from the corpus count (the oracle computes the same integer
  bin-length in SQL; no log2 FP edge). The r7 32-bit signature capped B
  at 16, silently re-quadratizing random collisions past n≈65k — one
  decade beyond the then-largest test. r8 measured the fix on dedicated
  embeddings scale points (`make_sfN.py --tables embeddings`,
  `scripts/measure_adaptive_candidates.py`, waste = candidates failing
  the cosine verify, i.e. pure random band collisions):

  | n | B | waste pairs/vector (new clamp) | waste/vector @ pinned B=16 (old clamp, measured) |
  |---|---|---|---|
  | 2k | 11 | 1.24 | = (clamp inactive) |
  | 20k | 15 | 0.99 | = (clamp inactive) |
  | 200k | 18 | 1.43 | 5.52 |
  | 1M | 20 | 2.26 | 28.22 |

  Waste stays Θ(1)/vector across 2.7 decades (bound: 2·n/2^bit_length(n)
  ≤ 2, plus hyperplane-correlation slack) while the old clamp's waste
  grows ∝ n — 12.5× worse at 1M and diverging. True near-dup pairs are
  counted separately (they are the operator's OUTPUT — at 1M the
  rotation-wrap construction yields 3.8M genuine duplicate pairs, a data
  property any correct dedup must examine). Oracle hash-green through
  n=1M — the full keep-list verified value-identical across engines at
  every measured point (r9, `ORACLE_EMB1M_r09.log`: 1,000,000 rows,
  hash 027b1bb3de536cd1, 364.5 s). The fixed-24-bit
  formulation survives as the labeled calibration twin
  `dedup_embedding_keep_fixedband`; its random-collision candidate set
  is quadratic (measured 1,373 pairs at n=2k -> 144,922 at n=20k ≈
  2·C(n,2)/2^12, runtime ~11x/decade) — kept ONLY for pinned-width
  recall calibration, never production, and **r8: moved OUT of the
  headline bench into the calibration-only suite**
  (SPARK_GRAFT_BENCH_CALIBRATION=1; VERDICT r7 #5), so headline totals
  before/after r8 differ by its absence.
- Queries growing well below 10x are constant-cost-dominated at this
  SF (planning, tiny dims, shuffle setup) — the plan scales.
- The only quadratic op left anywhere is the labeled exact baseline
  `dedup_embedding_cosine`, hard-capped with a clear error above its
  documented row cap (r8: per-vector norms hoisted out of the pair
  product in both engines — identical values, ~6× fewer FLOPs — so the
  sf1 full-registry oracle run is bounded; `similarity_topk_cosine`
  got the same hoist on its O(corpus) scan, ~3× fewer FLOPs).
- Streaming live-path numbers (per-trigger latency / rows/s for the
  RocksDB session windows and the CDC MERGE sink with live
  auto-compaction) are benched by `scripts/bench_streaming.py` and
  recorded in STREAMING_BENCH_r{N}.json — the batch twins in this
  sweep measure plan throughput; that artifact measures the micro-batch
  machinery itself.
- r7: money aggregates ride the exact DECIMAL grid in both engines
  (`functions/money.py`) after the sf1 oracle replica caught DOUBLE
  summation drift crossing a cent on q7/q9 (ORACLE_SF1_r07.log) —
  the few-percent steady-total uptick vs the r6 sweep is that exactness
  plus the interval join's skew-proof bucket key, both constant factors
  that do not move the growth ratios.
- q1's in-bench steady (~0.9 s at sf0.1 / ~1.8 s at sf1) is first-query
  JIT warm-up: q1 runs first in the suite and its three "steady" re-runs
  coincide with C2 compilation of the new decimal aggregate paths. In
  isolation with a warm JVM the same plan runs 0.43 s at sf0.1 and
  0.49 s at sf1 (plan: one pushed-filter scan, partial+final hash agg,
  UnscaledValue long-backed decimal sums).

## Bench notes (r6): the q7/q18 r4->r5 deltas are noise

VERDICT r5 asked for a classification of q7_volume_shipping
0.318->0.358 s and q18_large_volume_customers 0.316->0.361 s (+13/14%
steady r4->r5 with no plan change). Two fresh same-HEAD runs in r6
measured q7 median 0.311 [0.271-0.398] and 0.351, q18 median 0.342
[0.334-0.414] and 0.397: both r4 and r5 medians sit inside a single
HEAD's min-max envelope, and the two r6 runs differ from each other by
about the same margin as r4 differed from r5. Classification: JVM/GC
run-to-run noise on ~0.3 s queries (the README's stated +-50-100 ms
band), not a regression; plans are identical (PLANS.md).
"""


def run_bench_full(sf_dir: str, env_extra: dict | None = None,
                   timeout: int = 10800) -> dict:
    """Like run_bench but returns the FULL stderr artifact (per-query
    stats, cold ledger) instead of the compact stdout line."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, **(env_extra or {}))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py failed for {sf_dir} (rc={out.returncode}); "
            f"stderr tail: {out.stderr.strip()[-2000:]}"
        )
    for line in reversed(out.stderr.strip().splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(f"no full artifact line on stderr for {sf_dir}")


def _cold_ledger_section(r: dict) -> list[str]:
    """Cold-path decomposition table (VERDICT r9 #2): where the sf10
    cold/steady ratio comes from, per query."""
    led = r.get("cold_ledger") or {}
    cold_q = r.get("cold_queries") or {}
    steady_q = r.get("queries") or {}
    lines = [
        f"## Cold-path ledger at sf={r.get('sf')} (VERDICT r9 #2)",
        "",
        "Cold per query = build (first query construction, INCLUDING any",
        "one-time artifact work it fronts: IVF index build, Z-order/staging",
        "writes, eager checkpoints) + first_exec (first-scan I/O,",
        "first-touch shuffles, whole-stage-codegen compilation). `plan` is",
        "a SECOND construction after artifacts/caches are warm — pure",
        "analysis; `one_time = build − plan` is the component a long-lived",
        "session never pays again. `first_exec − steady` is the",
        "first-execution surcharge (codegen + cache-cold scans + shuffle",
        "materialization that steady plan-reuse re-runs amortize away).",
        "",
        "| query | cold | build | one_time | plan | first_exec | steady | cold/steady |",
        "|---|---|---|---|---|---|---|---|",
    ]
    tot = {"cold": 0.0, "build": 0.0, "one": 0.0, "plan": 0.0,
           "fx": 0.0, "steady": 0.0}
    for q in sorted(led, key=lambda q: -cold_q.get(q, 0)):
        e = led[q]
        c, s = cold_q.get(q), steady_q.get(q)
        ratio = f"{c / s:.1f}×" if c and s else "—"
        lines.append(
            f"| {q} | {c} | {e['build']} | {e['one_time_artifacts']} | "
            f"{e['plan']} | {e['first_exec']} | {s} | {ratio} |"
        )
        tot["cold"] += c or 0; tot["build"] += e["build"]
        tot["one"] += e["one_time_artifacts"]; tot["plan"] += e["plan"]
        tot["fx"] += e["first_exec"]; tot["steady"] += s or 0
    lines.append(
        f"| **total** | {tot['cold']:.1f} | {tot['build']:.1f} | "
        f"{tot['one']:.1f} | {tot['plan']:.1f} | {tot['fx']:.1f} | "
        f"{tot['steady']:.1f} | "
        f"{tot['cold'] / tot['steady']:.1f}× |" if tot["steady"] else "| — |"
    )
    if tot["steady"]:
        surcharge = tot["fx"] - tot["steady"]
        lines += [
            "",
            f"Decomposition of cold_total − steady_total = "
            f"{tot['cold'] - tot['steady']:.1f} s: one-time artifact builds "
            f"{tot['one']:.1f} s + per-call plan/analysis {tot['plan']:.1f} s "
            f"+ first-execution surcharge {surcharge:.1f} s "
            f"(codegen + cache-cold scans + first-touch shuffle "
            f"materialization that `steady_state_plan_reuse` re-runs reuse).",
        ]
    return lines


def _norm(r: dict) -> dict:
    """bench.py's stdout line is the COMPACT form (r7: sized for the
    driver's tail capture) — normalize the fields this script reads."""
    r.setdefault("steady_total", r.get("value"))
    r.setdefault("errors", {})
    return r


def _decade_section(a: dict, b: dict) -> list[str]:
    """Per-query growth table for ONE extra measured decade (the r9
    sf1→sf10 splice mode). Mirrors the main per-query block but carries
    its own header + provenance so re-splicing replaces it in place."""
    data_ratio = b["sf"] / a["sf"]
    lines = [
        f"## Per-query growth {a['sf']} → {b['sf']} (data ×{data_ratio:.0f})",
        "",
        "Measured by `bench_scaling.py --decade-only` (fresh JVM per scale",
        "point, steady = median of "
        f"{os.environ.get('SPARK_GRAFT_BENCH_ITERS', '5')} plan-reuse re-runs,",
        f"SPARK_DRIVER_MEM={os.environ.get('SPARK_DRIVER_MEM', 'default')}).",
        "",
        "| query | steady@{} | steady@{} | growth |".format(a["sf"], b["sf"]),
        "|---|---|---|---|",
    ]
    for q in sorted(b["queries"], key=lambda q: -b["queries"][q]):
        ta, tb = a["queries"].get(q), b["queries"][q]
        if ta is None or ta <= 0:
            growth = "—"
        else:
            g = tb / ta
            growth = f"{g:.2f}×" + (" ⚠ super-linear" if g > data_ratio else "")
        lines.append(f"| {q} | {ta} | {tb} | {growth} |")
    lines += [
        "",
        f"steady_total {a['steady_total']} → {b['steady_total']} s "
        f"({b['steady_total'] / a['steady_total']:.2f}× on ×{data_ratio:.0f} data); "
        f"cold_total {a['cold_total']} → {b['cold_total']} s.",
        "⚠ rows get the fresh-JVM envelope treatment "
        "(`scripts/bench_query_envelope.py`) before being called scale problems.",
    ]
    return lines


def _splice_decade(section: list[str]) -> None:
    """Insert/replace the decade section in SCALING.md, leaving every
    other committed table and narrative untouched."""
    path = os.path.join(REPO, "SCALING.md")
    body = open(path).read()
    header = section[0]
    start = body.find(header)
    if start >= 0:  # replace the existing same-decade section in place
        end = body.find("\n## ", start + 1)
        tail = body[end:] if end >= 0 else "\n"
        body = body[:start] + "\n".join(section) + "\n" + tail.lstrip("\n")
    else:
        anchor = body.find("## Skewed-corpus decade")
        if anchor < 0:
            anchor = body.find("## The sf=1.0 scale point")
        if anchor < 0:
            body = body.rstrip() + "\n\n" + "\n".join(section) + "\n"
        else:
            body = (
                body[:anchor].rstrip()
                + "\n\n" + "\n".join(section) + "\n\n"
                + body[anchor:]
            )
    with open(path, "w") as f:
        f.write(body)
    print(f"spliced decade section into {path}")


def main() -> int:
    argv = sys.argv[1:]
    if "--cold-ledger" in argv:
        i = argv.index("--cold-ledger")
        d = argv[i + 1]
        r = run_bench_full(d, env_extra={"SPARK_GRAFT_BENCH_COLD_LEDGER": "1"})
        print(json.dumps({"sf": r.get("sf"), "cold_total": r.get("cold_total"),
                          "steady_total": r.get("steady_total"),
                          "errors": r.get("errors")}))
        _splice_decade(_cold_ledger_section(r))
        return 0
    if "--decade-only" in argv:
        i = argv.index("--decade-only")
        dirs = [d for d in argv[i + 1].split(",") if d]
        if len(dirs) != 2:
            print("--decade-only needs exactly two dirs (comma-separated)",
                  file=sys.stderr)
            return 2
        results = []
        for d in dirs:
            r = _norm(run_bench(d, timeout=10800))
            results.append(r)
            print(json.dumps({"sf": r["sf"], "steady_total": r["steady_total"],
                              "cold_total": r["cold_total"],
                              "errors": r["errors"]}))
        _splice_decade(_decade_section(results[0], results[1]))
        return 0
    skew_dirs: list[str] = []
    skew_only = False
    if "--skew-only" in argv:
        i = argv.index("--skew-only")
        skew_dirs = [d for d in argv[i + 1].split(",") if d]
        argv = argv[:i] + argv[i + 2:]
        skew_only = True
        if len(skew_dirs) < 2:  # splice needs [-2]/[-1] — fail BEFORE benching
            print("--skew-only needs at least two skew dirs (comma-separated)",
                  file=sys.stderr)
            return 2
    if "--skew-dirs" in argv:
        i = argv.index("--skew-dirs")
        skew_dirs = [d for d in argv[i + 1].split(",") if d]
        argv = argv[:i] + argv[i + 2:]
    sf_dirs = [] if skew_only else (argv or DEFAULT_SFS)
    results = []
    for d in sf_dirs:
        r = _norm(run_bench(d))
        results.append(r)
        print(json.dumps({"sf": r["sf"], "steady_total": r["steady_total"],
                          "cold_total": r["cold_total"], "errors": r["errors"]}))
    skew_results = []
    for d in skew_dirs:
        r = _norm(run_bench(d))
        skew_results.append(r)
        print(json.dumps({"sf": r["sf"], "skew": True,
                          "steady_total": r["steady_total"],
                          "cold_total": r["cold_total"], "errors": r["errors"]}))

    if skew_only:
        # surgical in-place replacement (r10): the old cut-at-marker
        # rebuild dropped every section BETWEEN the skew table and the
        # narrative (the r8 embedding-decade and envelope studies live
        # there) — reuse the decade splicer's section-bounded replace.
        _splice_decade(_skew_section(skew_results[-2], skew_results[-1]))
        return 0

    lines = [
        "# SCALING.md — headline bench vs scale factor",
        "",
        "Generated by `scripts/bench_scaling.py`; fresh JVM per scale point,",
        f"steady = median of {results[0].get('steady_iters', 3)} plan-reuse re-runs "
        f"(Spark {results[0].get('spark_version', '?')}).",
        "",
        "| sf | steady_total (s) | cold_total (s) | steady ×prev | data ×prev |",
        "|---|---|---|---|---|",
    ]
    prev = None
    for r in results:
        ratio = f"{r['steady_total'] / prev['steady_total']:.2f}×" if prev else "—"
        dratio = f"{r['sf'] / prev['sf']:.0f}×" if prev else "—"
        lines.append(
            f"| {r['sf']} | {r['steady_total']} | {r['cold_total']} | {ratio} | {dratio} |"
        )
        prev = r

    # per-query growth between the two largest SFs: flag anything growing
    # faster than the data
    if len(results) >= 2:
        a, b = results[-2], results[-1]
        data_ratio = b["sf"] / a["sf"]
        lines += [
            "",
            f"## Per-query growth {a['sf']} → {b['sf']} (data ×{data_ratio:.0f})",
            "",
            "| query | steady@{} | steady@{} | growth |".format(a["sf"], b["sf"]),
            "|---|---|---|---|",
        ]
        for q in sorted(b["queries"], key=lambda q: -b["queries"][q]):
            ta, tb = a["queries"].get(q), b["queries"][q]
            if ta is None or ta <= 0:
                growth = "—"
            else:
                g = tb / ta
                growth = f"{g:.2f}×" + (" ⚠ super-linear" if g > data_ratio else "")
            lines.append(f"| {q} | {ta} | {tb} | {growth} |")
        lines += [
            "",
            "⚠ flags growth above the data ratio. Sub-data-ratio growth means the",
            "constant-time share (planning, JVM, small-table work) still dominates",
            "at this SF — the plan scales; super-linear growth is a red flag to fix.",
        ]

    if len(skew_results) >= 2:
        lines += [""] + _skew_section(skew_results[-2], skew_results[-1])
    else:
        # a uniform-only re-run must not silently drop the committed skew
        # evidence — carry the existing section over verbatim
        lines += [""] + _existing_skew_section()

    lines += ["", _NARRATIVE.rstrip()]
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.join(REPO, 'SCALING.md')}")
    return 0


def _existing_skew_section() -> list[str]:
    path = os.path.join(REPO, "SCALING.md")
    if not os.path.exists(path):
        return []
    body = open(path).read()
    start = body.find("## Skewed-corpus decade")
    if start < 0:
        return []
    end = body.find("## The sf=1.0 scale point", start)
    section = body[start:end] if end >= 0 else body[start:]
    return section.rstrip().split("\n")


def _skew_section(a: dict, b: dict) -> list[str]:
    data_ratio = b["sf"] / a["sf"]
    lines = [
        f"## Skewed-corpus decade {a['sf']} → {b['sf']} (data ×{data_ratio:.0f})",
        "",
        "Scale points from `make_sfN.py --skew`: power-law duplicate",
        "clusters (sizes up to the 10× multiplier: measured 4×10 + 12×5 +",
        "47×2 per 5k docs), 75% of documents in ONE hot source, and one",
        "customer/user owning 20% of orders and events — the hostile",
        "distribution the uniform sweep never exercises (VERDICT r6 #3).",
        "AQE skew-join splitting is proven to engage under a hot key by",
        "`tests/test_plans.py::test_aqe_skew_join_split_fires`.",
        "",
        "| query | steady@{} (skew) | steady@{} (skew) | growth |".format(a["sf"], b["sf"]),
        "|---|---|---|---|",
    ]
    for q in sorted(b["queries"], key=lambda q: -b["queries"][q]):
        ta, tb = a["queries"].get(q), b["queries"][q]
        if ta is None or ta <= 0:
            growth = "—"
        else:
            g = tb / ta
            growth = f"{g:.2f}×" + (" ⚠ super-linear" if g > data_ratio else "")
        lines.append(f"| {q} | {ta} | {tb} | {growth} |")
    lines += [
        "",
        "Reading: the dedup family's inverted-index paths stay at-or-below",
        "the data ratio BECAUSE the duplicate-cluster sizes are bounded by",
        "the copy multiplier and every posting list is DF-capped — a hot",
        "shingle shared by a whole cluster contributes candidates through",
        "the pair-driven hot-correction, never a posting self-join. The hot",
        "join key rides AQE's skew split (and join_salted_skew's manual",
        "salting shows the pre-AQE mitigation on the same shape). The",
        "stream-stream interval join keys on (user, horizon-bucket), not",
        "user alone, so the hot user's view×purchase candidate set is",
        "adjacent-bucket pairs instead of all pairs — the r7 fix for the",
        "88.9×/84.7 s quadratic this sweep exposed (streaming/jobs.py).",
        "The embeddings table is NOT skew-transformed (make_sfN.py alters",
        "documents/orders/events only), so any embedding-family growth",
        "delta vs the uniform table is run variance on a sub-second",
        "denominator, not a distribution effect — compare the sf1 columns",
        "across the two tables, which agree within the noise band.",
    ]
    return lines


if __name__ == "__main__":
    sys.exit(main())
