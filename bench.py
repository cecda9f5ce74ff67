"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...},
     "query_stats": {"q1_pricing_summary": {"min":..,"median":..,"max":..,"n":5}, ...},
     "sf": 0.1}

``queries`` stays the per-query steady MEDIAN (n >= 5 plan-reuse re-runs);
``query_stats`` adds min/max so round-over-round deltas on sub-second
queries can be read as noise (inside the min..max envelope) vs a real plan
regression (outside it) straight from the artifact.

Each query is materialized through the noop sink (full execution, no
driver-side result marshalling) so the number measures engine throughput,
not collect() overhead. Timings exclude session startup.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from restaurant_etl_spark.operators.registry import load_all
from restaurant_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: one representative per operator family (kept in sync with
#: SURVEY.md §2 as coverage widens). Unregistered names are skipped so the
#: bench never breaks mid-build.
HEADLINE = [
    # relational / TPC-H shapes
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    # window functions
    "window_topk_per_group",
    "window_running_total",
    # grouping sets & set ops
    "agg_rollup_geo",
    "set_union_distinct",
    # as-of join
    "asof_purchase_last_view",
    # menu domain pipeline
    "menu_parse_items",
    "menu_category_summary",
    # TPC-H additions & rollup cascade
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q21_waiting_suppliers",
    "hypertable_rollup_cascade",
    # extension surface (registered in later milestones)
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_simhash_keep",
    "dedup_embedding_keep",
    "decontamination_overlap",
    "similarity_topk_cosine",
    "similarity_ivf_sqrtn_topk",
    "embedding_quantize_int8",
    "text_quality_score",
    "text_tfidf_top_terms",
    "stream_session_windows_batch",
    "stream_stream_interval_join_batch",
    # warehouse / graph / corpus-prep families (round 5)
    "merge_upsert_orders",
    "graph_pagerank_parts",
    "bpe_pair_counts",
    # round-6 additions: layout skipping, CDC pair, containment/
    # incremental dedup, BPE apply
    "layout_zorder_skipping",
    "cdc_apply_sequential",
    "dedup_containment",
    "dedup_incremental_batch",
    "dedup_source_overlap_matrix",
    "retrieval_hard_negatives",
    "bpe_apply_merges",
]

#: calibration-only suite (VERDICT r7 #5): registered + oracle-checked
#: queries that are deliberately NON-production baselines — the headline
#: total must measure the production surface, not a labeled quadratic
#: twin kept for pinned-width recall calibration. Benched only when
#: SPARK_GRAFT_BENCH_CALIBRATION=1; timings go to the stderr artifact
#: under "calibration" and never into value/steady_total/cold_total.
CALIBRATION = [
    "dedup_embedding_keep_fixedband",
]


def _newest_committed_bench_artifact() -> tuple[str, str] | None:
    """(path, commit) of the newest BENCH_r*.json that is actually IN a
    commit — the shared resolution both baseline consumers use (VERDICT
    r14 #6). Walking `os.listdir` newest-first alone is the hazard ADVICE
    r13 fixed in :func:`_tag_baseline_rev`: mid-round the driver drops
    THIS round's artifact into the working tree uncommitted, and a bench
    re-run would then compare HEAD against its own round's numbers —
    silently suppressing every envelope flag. An artifact without a
    commit is skipped, never used."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    cands = sorted(
        (f for f in os.listdir(here) if re.fullmatch(r"BENCH_r(\d+)\.json", f)),
        key=lambda f: int(re.findall(r"\d+", f)[0]),
        reverse=True,
    )
    for cand in cands:
        rev = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", cand],
            cwd=here, capture_output=True, text=True,
        ).stdout.strip()
        if rev:
            return os.path.join(here, cand), rev
    return None


def _previous_round_queries(sf: float | None) -> dict[str, float]:
    """Steady per-query medians from the newest COMMITTED BENCH_r*.json
    at the SAME scale factor — the round-over-round baseline the envelope
    triage compares against. SPARK_GRAFT_PREV_BENCH overrides the file;
    a missing/unparseable artifact or an sf mismatch silently disables
    the triage (first round at a new scale point has no baseline)."""
    path = os.environ.get("SPARK_GRAFT_PREV_BENCH")
    if not path:
        found = _newest_committed_bench_artifact()
        if found is None:
            return {}
        path = found[0]
    try:
        with open(path) as fh:
            doc = json.load(fh)
        parsed = doc.get("parsed") if isinstance(doc.get("parsed"), dict) else doc
        if parsed.get("sf") != sf:
            return {}
        q = parsed.get("queries")
        return q if isinstance(q, dict) else {}
    except (OSError, ValueError, AttributeError):
        return {}


def _tag_baseline_rev() -> str | None:
    """Resolve the previous round's commit: SPARK_GRAFT_TAG_BASELINE if it
    names a rev, else the commit that last touched the newest COMMITTED
    BENCH_r*.json (the round-artifact commit — this repo's 'tag').

    ADVICE r13: the newest artifact in the working tree is often the
    current round's UNCOMMITTED one — `git log -1 -- <it>` is empty and
    returning None here silently disabled the whole protocol in exactly
    the state it was built for. Resolution is the shared
    :func:`_newest_committed_bench_artifact` walk (VERDICT r14 #6)."""
    env = os.environ.get("SPARK_GRAFT_TAG_BASELINE", "auto")
    if env in ("off", "0", "none", ""):
        return None
    if env != "auto":
        return env
    found = _newest_committed_bench_artifact()
    return found[1] if found else None


def _parse_child_metrics(stdout: str) -> tuple[dict | None, str | None]:
    """Extract the compact metrics line from a child bench run. ADVICE
    r13: 'last line starting with {' made one stray diagnostic line (or a
    truncated final line) discard an hour of measurement via the broad
    except. Instead try to parse every line from the end and accept only
    a dict that self-identifies as the headline metric; on failure return
    the raw output tail so the error record keeps the evidence."""
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            doc = json.loads(line)
        except ValueError:
            continue
        if isinstance(doc, dict) and doc.get("metric") == "headline_total":
            return doc, None
    return None, stdout[-300:]


def _run_child_bench(bench_dir: str, timeout: int = 3600) -> dict:
    """Run ``{bench_dir}/bench.py`` as a FRESH child process against the
    same corpus and return its compact metrics — the shared measurement
    primitive for both arms of the same-boot comparison (tag worktree and
    HEAD). The child skips its own envelope/tag machinery (no recursion,
    no stale-artifact triage); the caller guarantees the parent Spark
    session is stopped so the child measures on an uncontended box.
    Returns {steady_total, cold_total, queries} or {"error": ...} —
    never raises."""
    import subprocess

    try:
        env = dict(os.environ)
        env["SPARK_GRAFT_TAG_BASELINE"] = "off"  # no recursion
        env["SPARK_GRAFT_PREV_BENCH"] = "/dev/null"  # no triage in children
        proc = subprocess.run(
            [sys.executable, os.path.join(bench_dir, "bench.py")],
            cwd=bench_dir, env=env, capture_output=True, text=True,
            timeout=timeout,
        )
        doc, tail = _parse_child_metrics(proc.stdout)
        if doc is None:
            return {"error": f"no metrics line (rc={proc.returncode}); "
                             f"stdout tail: {tail!r}; "
                             f"stderr tail: {proc.stderr[-200:]!r}"}
        return {
            "steady_total": doc.get("value"),
            "cold_total": doc.get("cold_total"),
            "queries": doc.get("queries", {}),
        }
    except Exception as exc:  # noqa: BLE001 — baseline is advisory
        return {"error": f"{type(exc).__name__}: {exc}"}


def _run_tag_baseline(rev: str) -> dict:
    """Same-boot whole-suite re-measurement at the previous round's commit
    (VERDICT r12 #6): check out ``rev`` into a throwaway git worktree and
    run ITS bench.py via :func:`_run_child_bench`. Because it runs in
    THIS session, any difference between the prior round's committed
    artifact and this reading is environment (the box drifts ~15% between
    boots — SCALING.md r11/r12 notes); the code-vs-environment verdict
    then compares this against the HEAD fresh-child reading — child to
    child, same boot, same protocol (VERDICT r13 #2)."""
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="bench_tag_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, rev],
            cwd=here, capture_output=True, text=True, check=True,
        )
        return {"rev": rev[:12], **_run_child_bench(wt)}
    except Exception as exc:  # noqa: BLE001 — baseline is advisory
        return {"rev": rev[:12], "error": f"{type(exc).__name__}: {exc}"}
    finally:
        import shutil

        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=here, capture_output=True, text=True)
        shutil.rmtree(wt, ignore_errors=True)


#: out-of-band delta triage noise band, seconds (established r8)
ENVELOPE_BAND = 0.100


def _apply_tag_verdicts(
    envelopes: dict,
    flagged: list[str],
    tag_baseline: dict,
    head_fresh: dict,
    timings: dict,
    stats: dict | None = None,
) -> None:
    """Child-to-child code-vs-environment verdicts for flagged queries
    (VERDICT r13 #2). Mutates ``envelopes`` (verdict + evidence keys),
    ``timings`` (flagged queries publish the HEAD fresh-child reading —
    the in-session number that tripped the flag came from a session state
    the comparison just found suspect), and ``stats`` (ADVICE r14: the
    query_stats median must agree with the published number; min/max stay
    the in-session envelope, marked as such, because the child reports
    only its median)."""
    tag_q = tag_baseline.get("queries", {})
    head_q = head_fresh.get("queries", {})
    for name in flagged:
        tq = tag_q.get(name)
        hq = head_q.get(name)
        if hq is not None:
            envelopes[name]["head_fresh"] = hq
            envelopes[name]["published"] = "head_fresh_child"
            envelopes[name]["in_session_now"] = timings[name]
            timings[name] = hq
            if stats is not None and name in stats:
                stats[name]["median"] = hq
                stats[name]["published"] = "head_fresh_child"
                stats[name]["minmax_basis"] = "in_session_envelope"
        if tq is None or not tq:
            envelopes[name]["tag_classification"] = "no_tag_reading"
            continue
        envelopes[name]["tag_now"] = tq
        # same-boot code effect, CHILD-TO-CHILD: HEAD fresh-child vs tag
        # fresh-child on identical iron and identical protocol. Within
        # the noise band → the code didn't move it, so the cross-round
        # delta is the environment. Falls back to the in-session reading
        # (recorded as such) only if the HEAD child failed outright.
        basis = hq if hq is not None else envelopes[name]["now"]
        envelopes[name]["tag_basis"] = (
            "head_fresh_child" if hq is not None else "head_in_session"
        )
        code_delta = abs(basis - tq)
        envelopes[name]["tag_classification"] = (
            "environment"
            if code_delta <= max(ENVELOPE_BAND, 0.15 * tq)
            else "code_change"
        )


def main() -> int:
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else None

    spark = get_spark("bench")
    spark_version = spark.version
    specs = load_all()

    # warmup: touch the big tables once so JVM/codegen/file-listing costs
    # don't land on the first measured query
    from restaurant_etl_spark.sources.tables import load_table

    for t in ("lineitem", "orders", "documents", "events"):
        load_table(spark, SF_DIR, t).count()

    # report BOTH timings per query: cold (first run, pays one-time
    # whole-stage-codegen compilation, ~1-3s per unique plan) and steady
    # (median of STEADY_ITERS re-runs — what a long-lived cluster session
    # amortizes to). The headline metric stays steady-state; cold_total
    # alongside keeps round-over-round comparisons honest about the mode.
    #
    # Every query is fault-isolated: one broken query records an "err"
    # entry and the bench still emits its JSON line for all the others —
    # a single AnalysisException must never zero a whole round's signal.
    steady_iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
    # Cold-path ledger (VERDICT r9 #2): with SPARK_GRAFT_BENCH_COLD_LEDGER=1
    # every query's cold time is decomposed into
    #   build      — first spec.fn() call: plan construction PLUS any
    #                one-time artifact work it fronts (IVF index build,
    #                Z-order/staging writes, eager checkpoints);
    #   first_exec — the first noop execution: first-scan I/O, first-touch
    #                shuffles, whole-stage-codegen compilation;
    #   plan       — a SECOND spec.fn() call after caches/artifacts are
    #                warm: pure DataFrame construction + analysis. The
    #                one-time artifact component is build − plan (work a
    #                second session call does NOT repay); staging a query
    #                repeats per call shows up in plan, honestly.
    # The extra fn() call is uncounted in cold/steady and gated off by
    # default so the driver's per-round run shape is unchanged.
    ledger_on = os.environ.get("SPARK_GRAFT_BENCH_COLD_LEDGER") == "1"
    cold_ledger: dict[str, dict] = {}
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        try:
            t0 = time.time()
            df = spec.fn(spark, SF_DIR)
            build_s = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            first_exec_s = time.time() - t0
            cold[name] = round(build_s + first_exec_s, 3)
            if ledger_on:
                t0 = time.time()
                df2 = spec.fn(spark, SF_DIR)
                plan_s = time.time() - t0
                del df2
                cold_ledger[name] = {
                    "build": round(build_s, 3),
                    "plan": round(plan_s, 3),
                    "one_time_artifacts": round(max(0.0, build_s - plan_s), 3),
                    "first_exec": round(first_exec_s, 3),
                }
            # steady-state re-executes the SAME resolved plan (what a
            # long-lived session does), so one-time costs the query builder
            # pays — plan analysis, eager checkpoints of tiny reused
            # tables — stay in cold
            reps = []
            for _ in range(max(1, steady_iters)):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                reps.append(time.time() - t0)
            timings[name] = round(statistics.median(reps), 3)
            # min/median/max per query so sub-300 ms round-over-round deltas
            # are classifiable as noise vs regression FROM THE ARTIFACT: a
            # delta inside [min, max] spread is noise; one clearing the whole
            # envelope is a plan change (VERDICT r4 #3)
            stats[name] = {
                "min": round(min(reps), 3),
                "median": timings[name],
                "max": round(max(reps), 3),
                "n": len(reps),
            }
            # drop the query's DataFrame promptly: localCheckpointed RDDs
            # and reusable shuffle stages stay pinned in the block manager
            # until the Python wrapper is collected, and letting ~30
            # queries' worth accumulate showed up as multi-second GC/evict
            # outliers in LATER queries' steady reps
            del df
            gc.collect()
        except Exception as exc:  # noqa: BLE001 — bench must survive any query
            msg = (str(exc).splitlines() or [""])[0][:300]
            errors[name] = f"{type(exc).__name__}: {msg}"
            # keep cold_total and steady_total aggregating the SAME query
            # set: a query that died mid-steady contributes to neither
            cold.pop(name, None)
            stats.pop(name, None)

    # Out-of-band delta triage (VERDICT r8 #8): any query whose steady
    # median moved more than ENVELOPE_BAND vs the PREVIOUS round's artifact
    # gets an automatic in-process envelope — two extra batches of steady
    # reps, pooled with the first — and a classification straight in the
    # artifact: "run_variance" if the previous reading sits inside the
    # pooled [min, max] at this HEAD, else "outside_envelope". The latter
    # is a CLAIM ABOUT THE EVIDENCE, not a verdict: a plan change lands
    # there, but so can cross-JVM drift (one process's pooled reps can't
    # see another JVM's JIT/GC context — q9's r8 flag read 0.25-0.35 in
    # one JVM and 0.35-0.88 in another at the SAME HEAD). That moves the
    # q9/q7-style investigations (judge-side in r7/r8) into the bench
    # protocol itself. The deep cross-JVM tool (scripts/
    # bench_query_envelope.py) remains the escalation for "outside_envelope".
    envelopes: dict[str, dict] = {}
    prev_queries = _previous_round_queries(sf)
    for name, now in timings.items():
        prev = prev_queries.get(name)
        if prev is None or abs(now - prev) <= ENVELOPE_BAND:
            continue
        spec = specs.get(name)
        pool = [stats[name]["min"], stats[name]["max"], now]
        rerun_err: str | None = None
        try:
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()  # rebuild, uncounted
            for _ in range(2 * max(1, steady_iters)):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                pool.append(round(time.time() - t0, 3))
            del df
            gc.collect()
        except Exception as exc:  # noqa: BLE001 — envelope is advisory, never fatal
            # ADVICE r9: a swallowed re-run used to let run_variance/
            # outside_envelope be emitted from the ORIGINAL 3-point pool with
            # zero additional evidence. A failed re-run is its own label.
            rerun_err = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
        lo, hi = min(pool), max(pool)
        envelopes[name] = {
            "prev": prev,
            "now": now,
            "delta": round(now - prev, 3),
            "pooled": {"min": lo, "max": hi, "n": len(pool)},
            "classification": (
                "envelope_rerun_failed"
                if rerun_err is not None
                else "run_variance" if lo <= prev <= hi else "outside_envelope"
            ),
            **({"rerun_error": rerun_err} if rerun_err else {}),
        }
        # VERDICT r13 #2 (tail): a query classified run_variance publishes
        # the POOLED median — the first batch's median was, by this very
        # classification, an outlier draw from the same distribution, and
        # publishing it as "the" number is how a noise spike poisons the
        # next round's baseline.
        if envelopes[name]["classification"] == "run_variance":
            pooled_median = round(statistics.median(pool), 3)
            envelopes[name]["published"] = "pooled_median"
            envelopes[name]["first_batch_median"] = timings[name]
            timings[name] = pooled_median
            stats[name]["median"] = pooled_median
            stats[name]["min"], stats[name]["max"] = lo, hi
            stats[name]["n"] = len(pool)

    calibration: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_CALIBRATION") == "1":
        for name in CALIBRATION:
            spec = specs.get(name)
            if spec is None:
                continue
            try:
                df = spec.fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()  # cold
                reps = []
                for _ in range(max(1, steady_iters)):
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    reps.append(time.time() - t0)
                calibration[name] = round(statistics.median(reps), 3)
                del df
                gc.collect()
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"

    # Tag-matched baseline (VERDICT r12 #6, made SYMMETRIC by VERDICT r13
    # #2): if any query classified outside_envelope, re-measure the WHOLE
    # suite at the previous round's commit AND at HEAD, each in its own
    # fresh child process in THIS boot, so drift classification lives in
    # the artifact instead of a later manual session. The r13 protocol
    # compared a fresh-child tag reading against HEAD's possibly-degraded
    # IN-SESSION medians — on a drifted session that asymmetry stamps
    # untouched code `code_change` (the driver's r13 artifact would have
    # flagged cdc/BPE, which the r13 diff never touched). Both arms now
    # run child-to-child on an uncontended box (the parent Spark session
    # stops first), and HEAD's published numbers for flagged queries are
    # repaired to the fresh-child readings.
    tag_baseline: dict | None = None
    head_fresh: dict | None = None
    flagged = [n for n, e in envelopes.items()
               if e["classification"] == "outside_envelope"]
    if flagged:
        rev = _tag_baseline_rev()
        if rev:
            spark.stop()
            tag_baseline = _run_tag_baseline(rev)
            here = os.path.dirname(os.path.abspath(__file__))
            head_fresh = _run_child_bench(here)
            _apply_tag_verdicts(envelopes, flagged, tag_baseline,
                                head_fresh, timings, stats)

    total = round(sum(timings.values()), 3)
    # Full detail (per-query min/median/max envelopes + cold timings) goes to
    # STDERR: the driver's artifact keeps only the LAST ~2000 chars of stdout
    # (BENCH_r06.json tail analysis — the verbose line overflowed it and
    # `parsed` came back null, losing most per-query history). Humans and
    # committed logs still get everything via 2>.
    full = {
        "metric": "headline_total",
        "spark_version": spark_version,
        "value": total,
        "unit": "sec",
        # steady re-executes the SAME resolved DataFrame (plan reuse, the
        # long-lived-session behavior); cold = build + first execution.
        # Mode is recorded so round-over-round comparisons stay honest.
        "mode": "steady_state_plan_reuse",
        "steady_iters": steady_iters,
        "cold_total": round(sum(cold.values()), 3),
        "steady_total": total,
        "queries": timings,
        "query_stats": stats,
        "cold_queries": cold,
        "cold_ledger": cold_ledger,
        "calibration": calibration,
        "envelopes": envelopes,
        "tag_baseline": tag_baseline,
        "head_fresh": head_fresh,
        "errors": errors,
        "sf": sf,
    }
    print(json.dumps(full), file=sys.stderr)
    # STDOUT gets ONE compact line sized to survive the 2000-char tail
    # capture: headline metric + the full per-query steady-median map.
    compact = {
        "metric": "headline_total",
        "spark_version": spark_version,
        "value": total,
        "unit": "sec",
        "mode": "steady_state_plan_reuse",
        "cold_total": full["cold_total"],
        "queries": timings,
        # out-of-band deltas vs the previous round, pre-classified (full
        # numbers in the stderr artifact); outside_envelope entries carry
        # the same-boot tag verdict when the tag baseline ran
        "envelopes": {
            k: (f"{v['classification']}:{v['tag_classification']}"
                if "tag_classification" in v else v["classification"])
            for k, v in envelopes.items()
        },
        "errors": {k: v[:80] for k, v in errors.items()},
        "sf": sf,
    }
    if tag_baseline is not None:
        compact["tag_baseline"] = {
            "rev": tag_baseline.get("rev"),
            "steady_total": tag_baseline.get("steady_total"),
            **({"error": tag_baseline["error"][:120]}
               if "error" in tag_baseline else {}),
        }
    if head_fresh is not None:
        compact["head_fresh"] = {
            "steady_total": head_fresh.get("steady_total"),
            **({"error": head_fresh["error"][:120]}
               if "error" in head_fresh else {}),
        }
    line = json.dumps(compact)
    if len(line) > 1950:  # belt-and-braces: never overflow the tail window
        compact.pop("errors", None)
        compact.pop("envelopes", None)
        line = json.dumps(compact)
    if len(line) > 1950:
        # still over budget: shed the smallest per-query timings (headline
        # total stays; full map is already on stderr) and say so loudly —
        # a silent overflow regresses the driver's parse to null
        dropped = 0
        for k in sorted(compact["queries"], key=compact["queries"].get):
            del compact["queries"][k]
            dropped += 1
            compact["queries_dropped"] = dropped
            line = json.dumps(compact)
            if len(line) <= 1950:
                break
        print(f"WARNING: compact stdout overflowed 1950 chars; dropped the "
              f"{dropped} smallest query timings from the stdout line",
              file=sys.stderr)
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
